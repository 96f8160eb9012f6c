"""Marginalized MiniMax (M3) metric between molecules (reference:
``graphdot/experimental/metric/m3.py:15``).

A pure-SciPy sparse-CG implementation of the MLGK product-graph solve;
retained (as in the reference) as an independent CPU oracle of the solver
semantics and a standalone molecular distance.
"""
import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from ...graph import Graph
from ...graph.adjacency.atomic import AtomicAdjacency
from ...microkernel import KroneckerDelta, SquareExponential, TensorProduct


class M3:
    """The Marginalized MiniMax (M3) metric between molecules."""

    def __init__(self, use_charge=False, adjacency='default', q=0.01,
                 element_delta=0.2, bond_eps=0.02, charge_eps=0.2):
        self.use_charge = use_charge
        if adjacency == 'default':
            self.adjacency = AtomicAdjacency(shape='tent2', zoom=0.75)
        else:
            self.adjacency = adjacency
        self.q = q
        if use_charge:
            self.node_kernel = TensorProduct(
                element=KroneckerDelta(element_delta),
                charge=SquareExponential(charge_eps),
            )
        else:
            self.node_kernel = TensorProduct(
                element=KroneckerDelta(element_delta)
            )
        self.edge_kernel = TensorProduct(
            length=SquareExponential(bond_eps)
        )

    def __call__(self, atoms1, atoms2):
        args = dict(use_charge=self.use_charge, adjacency=self.adjacency)
        g1 = Graph.from_ase(atoms1, **args)
        g2 = Graph.from_ase(atoms2, **args)

        R1 = self._mlgk(g1, g1).diagonal() ** -0.5
        R2 = self._mlgk(g2, g2).diagonal() ** -0.5
        R12 = self._mlgk(g1, g2)

        K = R1[:, None] * R12 * R2[None, :]
        D = np.sqrt(np.maximum(2 - 2 * K, 0))
        return max(D.min(axis=1).max(), D.min(axis=0).max())

    def _mlgk(self, g1, g2):
        n1, n2 = len(g1.nodes), len(g2.nodes)

        def sym_adj(g, n):
            A = scipy.sparse.csc_matrix(
                (g.edges['!w'], (g.edges['!i'], g.edges['!j'])), (n, n)
            )
            return A + A.T

        A1, A2 = sym_adj(g1, n1), sym_adj(g2, n2)
        d1 = np.asarray(A1.sum(axis=0)).ravel()
        d2 = np.asarray(A2.sum(axis=0)).ravel()
        Ax = scipy.sparse.kron(A1, A2)

        Vx = np.array([
            self.node_kernel(a1, a2)
            for a1 in g1.nodes.itertuples()
            for a2 in g2.nodes.itertuples()
        ])

        # product-edge couplings: one entry per orientation combination
        # of each pair of edges
        vals, rows, cols = [], [], []
        edges1 = list(zip(g1.edges['!i'], g1.edges['!j'],
                          g1.edges.itertuples()))
        edges2 = list(zip(g2.edges['!i'], g2.edges['!j'],
                          g2.edges.itertuples()))
        for i1, j1, e1 in edges1:
            for i2, j2, e2 in edges2:
                k = self.edge_kernel(e1, e2)
                for (a, b), (c, d) in (
                    ((i1, i2), (j1, j2)),
                    ((j1, i2), (i1, j2)),
                    ((j1, j2), (i1, i2)),
                    ((i1, j2), (j1, i2)),
                ):
                    vals.append(k)
                    rows.append(a * n2 + b)
                    cols.append(c * n2 + d)
        Ex = scipy.sparse.csc_matrix(
            (vals, (rows, cols)), (n1 * n2, n1 * n2)
        )

        Dx = np.kron(d1, d2) / (1 - self.q) ** 2
        Y = scipy.sparse.diags([Dx / Vx], [0]) - Ax.multiply(Ex)
        R, _ = scipy.sparse.linalg.cg(
            Y, Dx,
            M=scipy.sparse.diags([Vx / Dx], [0]),
            atol=1e-7
        )
        return R.reshape(n1, n2)
