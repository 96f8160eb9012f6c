#!/usr/bin/env python
"""GPR on 3D molecular structures with the Tang2019 molecular kernel
(reference: ``example/molecular-3d.py``); works without ASE via the
built-in Atoms shim."""
import numpy as np

from graphdot_tpu import Graph
from graphdot_tpu.dataset._atoms import make_atoms
from graphdot_tpu.kernel import Tang2019MolecularKernel
from graphdot_tpu.kernel.fix import Normalization
from graphdot_tpu.model.gaussian_process import GaussianProcessRegressor

# a few tiny molecules (numbers, positions)
molecules = [
    make_atoms([8, 1, 1], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]]),
    make_atoms([6, 1, 1, 1, 1], [
        [0, 0, 0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63],
        [-0.63, 0.63, -0.63], [0.63, -0.63, -0.63]
    ]),
    make_atoms([7, 1, 1, 1], [
        [0, 0, 0], [0.94, 0, 0.33], [-0.47, 0.82, 0.33],
        [-0.47, -0.82, 0.33]
    ]),
    make_atoms([8, 6, 8], [[-1.16, 0, 0], [0, 0, 0], [1.16, 0, 0]]),
]
graphs = Graph.unify_datatype([Graph.from_ase(m) for m in molecules])
y = np.array([-76.4, -40.5, -56.6, -188.6])  # mock energies

kernel = Tang2019MolecularKernel(stopping_probability=0.05)
gpr = GaussianProcessRegressor(
    Normalization(kernel), alpha=1e-6, normalize_y=True
)
gpr.fit(graphs, y)
pred, std = gpr.predict(graphs, return_std=True)
print('training targets:', y)
print('GPR predictions: ', pred.round(2))
print('uncertainties:   ', std.round(4))
