#!/usr/bin/env python
"""MaxiMin graph distance (reference: ``example/metric-maximin.py``)."""
import numpy as np

from graphdot_tpu.metric import MaxiMin
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.testing import random_molecule_set

graphs = random_molecule_set(0, 6, n_atoms_range=(5, 10))
metric = MaxiMin(
    TensorProduct(element=KroneckerDelta(0.3)),
    TensorProduct(length=SquareExponential(0.3)),
    q=0.05
)
D, (h1, h2) = metric(graphs, return_hotspot=True)
print('MaxiMin distance matrix:')
print(np.asarray(D).round(4))
print('hotspot node pairs (largest-difference locations):')
print(h1)
print(h2)
