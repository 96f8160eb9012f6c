#!/usr/bin/env python
"""Variable-length (sequence) node and edge features via the Convolution
microkernel (reference: ``example/variable-length-features.py``)."""
import networkx as nx
import numpy as np

from graphdot_tpu import Graph
from graphdot_tpu.kernel.marginalized import MarginalizedGraphKernel
from graphdot_tpu.microkernel import (
    Convolution, KroneckerDelta, SquareExponential, TensorProduct
)

g1 = nx.Graph()
g1.add_node(0, rings=(5, 6))
g1.add_node(1, rings=(3,))
g1.add_node(2, rings=(2, 3, 4))
g1.add_edge(0, 1, w=1.0, spectrum=(3, 4))
g1.add_edge(0, 2, w=2.0, spectrum=(3, 5))

g2 = nx.Graph()
g2.add_node(0, rings=(3, 4))
g2.add_node(1, rings=(3,))
g2.add_edge(0, 1, w=3.0, spectrum=(2, 4))

mlgk = MarginalizedGraphKernel(
    TensorProduct(rings=Convolution(KroneckerDelta(0.3))),
    TensorProduct(spectrum=Convolution(SquareExponential(1.0))),
    q=0.05
)
G = Graph.unify_datatype([
    Graph.from_networkx(g1, weight='w'),
    Graph.from_networkx(g2, weight='w'),
])
R = mlgk(G)
print(R)
d = np.diag(R) ** -0.5
print(np.diag(d) @ R @ np.diag(d))
