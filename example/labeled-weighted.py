#!/usr/bin/env python
"""Node- and edge-labeled, edge-weighted graphs (reference:
``example/labeled-weighted.py``)."""
import networkx as nx
import numpy as np

from graphdot_tpu import Graph
from graphdot_tpu.kernel.marginalized import MarginalizedGraphKernel
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)

g1 = nx.Graph(title='H2O')
g1.add_node('O1', element=8, charge=1.0)
g1.add_node('H1', element=1, charge=-1.0)
g1.add_node('H2', element=1, charge=2.0)
g1.add_edge('O1', 'H1', w=1.0, length=0.5)
g1.add_edge('O1', 'H2', w=2.0, length=1.0)

g2 = nx.Graph(title='H2')
g2.add_node('H1', element=1, charge=1.0)
g2.add_node('H2', element=1, charge=1.0)
g2.add_edge('H1', 'H2', w=3.0, length=1.0)

knode = TensorProduct(
    element=KroneckerDelta(0.3),
    charge=SquareExponential(1.0)
)
kedge = TensorProduct(length=SquareExponential(0.3))

mlgk = MarginalizedGraphKernel(knode, kedge, q=0.05)
G = Graph.unify_datatype([
    Graph.from_networkx(g1, weight='w'),
    Graph.from_networkx(g2, weight='w'),
])
R = mlgk(G)
print('Gram matrix:')
print(R)
d = np.diag(R) ** -0.5
print('Normalized:')
print(np.diag(d) @ R @ np.diag(d))
