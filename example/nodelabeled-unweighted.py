#!/usr/bin/env python
"""Node-labeled, unweighted graphs (reference:
``example/nodelabeled-unweighted.py``)."""
import networkx as nx
import numpy as np

from graphdot_tpu import Graph
from graphdot_tpu.kernel.marginalized import MarginalizedGraphKernel
from graphdot_tpu.microkernel import Constant, KroneckerDelta, TensorProduct

g1 = nx.Graph()
g1.add_node(0, element=6)
g1.add_node(1, element=1)
g1.add_edge(0, 1)

g2 = nx.Graph()
g2.add_node(0, element=6)
g2.add_node(1, element=8)
g2.add_edge(0, 1)

mlgk = MarginalizedGraphKernel(
    TensorProduct(element=KroneckerDelta(0.5)),
    Constant(1.0),
    q=0.05
)
G = Graph.unify_datatype([
    Graph.from_networkx(g1), Graph.from_networkx(g2)
])
R = mlgk(G)
print(R)
d = np.diag(R) ** -0.5
print(np.diag(d) @ R @ np.diag(d))
