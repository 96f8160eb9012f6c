#!/usr/bin/env python
"""Similarity between unlabeled, unweighted graphs with the marginalized
graph kernel (reference: ``example/unlabeled-unweighted.py``).

All unlabeled/unweighted graphs are identical under the normalized
marginalized-graph-kernel similarity; the normalized Gram matrix is all
ones."""
import networkx as nx
import numpy as np

from graphdot_tpu import Graph
from graphdot_tpu.kernel.marginalized import MarginalizedGraphKernel
from graphdot_tpu.microkernel import Constant

g1 = nx.Graph()           # 0 -- 1
g1.add_edge(0, 1)

g2 = nx.Graph()           # 0 -- 1 -- 2
g2.add_edge(0, 1)
g2.add_edge(1, 2)

g3 = nx.complete_graph(3)  # triangle

mlgk = MarginalizedGraphKernel(Constant(1.0), Constant(1.0), q=0.05)
R = mlgk([Graph.from_networkx(g) for g in [g1, g2, g3]])

d = np.diag(R) ** -0.5
K = np.diag(d) @ R @ np.diag(d)

print('Raw similarity:')
print(R)
print('Normalized similarity (should be all ones):')
print(K)
assert np.allclose(K, 1.0, atol=1e-5)
