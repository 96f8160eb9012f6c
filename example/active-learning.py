#!/usr/bin/env python
"""Active learning with predictive-variance acquisition (reference:
``example/active-learning.py``; QM7 atomization energies when network
access is available, synthetic molecules otherwise)."""
import numpy as np

from graphdot_tpu import Graph
from graphdot_tpu.kernel import Tang2019MolecularKernel
from graphdot_tpu.kernel.fix import Normalization
from graphdot_tpu.model.active_learning import (
    HierarchicalDrafter, VarianceMinimizer
)
from graphdot_tpu.model.gaussian_process import GaussianProcessRegressor


def load_data(n=64):
    try:
        from graphdot_tpu.dataset import QM7
        qm7 = QM7(ase=True).head(n)
        graphs = Graph.unify_datatype([
            Graph.from_ase(a) for a in qm7.atoms
        ])
        y = qm7.atomization_energy.values
        return graphs, y
    except Exception as e:
        print(f'QM7 unavailable ({e}); using synthetic molecules')
        from graphdot_tpu.testing import random_molecule_set
        graphs = random_molecule_set(0, n, n_atoms_range=(6, 14))
        rng = np.random.default_rng(0)
        y = np.array([
            -10.0 * len(g.nodes) + rng.normal() for g in graphs
        ])
        return graphs, y


graphs, y = load_data()
kernel = Normalization(Tang2019MolecularKernel(stopping_probability=0.05))

# pick an informative training subset by greedy variance minimization
drafter = HierarchicalDrafter(VarianceMinimizer(kernel))
train_idx = drafter(graphs, len(graphs) // 4, random_state=0)
test_idx = np.setdiff1d(np.arange(len(graphs)), train_idx)

gpr = GaussianProcessRegressor(kernel, alpha=1e-4, normalize_y=True)
gpr.fit([graphs[i] for i in train_idx], y[train_idx])
pred, std = gpr.predict([graphs[i] for i in test_idx], return_std=True)
mae = np.abs(pred - y[test_idx]).mean()
print(f'train {len(train_idx)} / test {len(test_idx)}: MAE = {mae:.3f}')
print(f'mean predictive std = {std.mean():.3f}')
