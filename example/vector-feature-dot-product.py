#!/usr/bin/env python
"""Vector-valued node features with the DotProduct microkernel (reference:
``example/vector-feature-dot-product.py``)."""
import networkx as nx
import numpy as np

from graphdot_tpu import Graph
from graphdot_tpu.kernel.marginalized import MarginalizedGraphKernel
from graphdot_tpu.microkernel import Constant, DotProduct, TensorProduct

g1 = nx.Graph()
g1.add_node(0, emb=(0.6, 0.8))
g1.add_node(1, emb=(1.0, 0.0))
g1.add_edge(0, 1)

g2 = nx.Graph()
g2.add_node(0, emb=(0.0, 1.0))
g2.add_node(1, emb=(0.8, 0.6))
g2.add_edge(0, 1)

mlgk = MarginalizedGraphKernel(
    TensorProduct(emb=DotProduct().normalized),
    Constant(1.0),
    q=0.05
)
G = Graph.unify_datatype([
    Graph.from_networkx(g1), Graph.from_networkx(g2)
])
R = mlgk(G)
print(R)
