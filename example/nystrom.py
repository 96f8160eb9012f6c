#!/usr/bin/env python
"""Low-rank Nystrom GPR on a larger dataset (reference:
``example/nystrom.py``)."""
import numpy as np

from graphdot_tpu.kernel import MarginalizedGraphKernel
from graphdot_tpu.kernel.fix import Normalization
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.model.gaussian_process import LowRankApproximateGPR
from graphdot_tpu.testing import random_molecule_set

graphs = random_molecule_set(0, 96, n_atoms_range=(6, 14))
rng = np.random.default_rng(0)
y = np.array([-10.0 * len(g.nodes) + rng.normal() for g in graphs])

kernel = Normalization(MarginalizedGraphKernel(
    TensorProduct(element=KroneckerDelta(0.2)),
    TensorProduct(length=SquareExponential(0.3)),
    q=0.05
))

core = list(range(0, len(graphs), 4))  # 24-graph core set
nys = LowRankApproximateGPR(kernel, alpha=1e-5, normalize_y=True)
nys.fit([graphs[i] for i in core], graphs, y)
pred, std = nys.predict(graphs[:16], return_std=True)
mae = np.abs(pred - y[:16]).mean()
print(f'Nystrom GPR with {len(core)}-graph core: train MAE = {mae:.3f}')
