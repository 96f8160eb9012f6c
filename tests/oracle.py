"""Dense NumPy/SciPy oracle for the marginalized graph kernel.

Independent implementation of the product-graph linear system used as the
ground truth throughout the test suite; mirrors the semantics of the
reference's CPU oracle (``test/kernel/marginalized/test_kernel.py:20-68``):

    Dx = kron(D1, D2) / (1-q)^2
    Vx[(i1, i2)] = k_node(f1_i1, f2_i2)
    Ex[(i1,i2),(j1,j2)] = k_edge(E1[i1,j1], E2[i2,j2])
    [diag(Dx / Vx) - kron(A1, A2) * Ex] x = Dx * q^2/q0^2
    K(G1, G2) = sum p1_i p2_j x_(i,j)
"""
import numpy as np
import scipy.sparse.linalg


def graph_arrays(G):
    """Weighted adjacency, degree vector, and per-edge feature rows."""
    n = len(G.nodes)
    A = np.zeros((n, n))
    ei = np.asarray(G.edges['!i'], dtype=int)
    ej = np.asarray(G.edges['!j'], dtype=int)
    w = (np.asarray(G.edges['!w'], dtype=float) if '!w' in G.edges
         else np.ones(len(ei)))
    A[ei, ej] = w
    A[ej, ei] = w
    D = A.sum(axis=1)
    return A, D, ei, ej


def mlgk_pair(G1, G2, knode, kedge, q, q0=None, lmin=0):
    """Full nodal similarity matrix R[i1, i2] between two graphs."""
    q0 = q if q0 is None else q0
    A1, D1, ei1, ej1 = graph_arrays(G1)
    A2, D2, ei2, ej2 = graph_arrays(G2)
    n1, n2 = len(D1), len(D2)
    N = n1 * n2

    nodes1 = list(G1.nodes.rows())
    nodes2 = list(G2.nodes.rows())
    edges1 = list(G1.edges.rows())
    edges2 = list(G2.edges.rows())

    Vx = np.zeros(N)
    for i1, f1 in enumerate(nodes1):
        for i2, f2 in enumerate(nodes2):
            Vx[i1 * n2 + i2] = knode(f1, f2)

    Ex = np.zeros((N, N))
    for a, e1 in enumerate(edges1):
        for b, e2 in enumerate(edges2):
            k = kedge(e1, e2)
            for (i1, j1) in {(ei1[a], ej1[a]), (ej1[a], ei1[a])}:
                for (i2, j2) in {(ei2[b], ej2[b]), (ej2[b], ei2[b])}:
                    Ex[i1 * n2 + i2, j1 * n2 + j2] = k

    Dx = np.kron(D1, D2) / (1 - q) ** 2
    Ax = np.kron(A1, A2)
    linsys = np.diag(Dx / Vx) - Ax * Ex
    rhs = Dx * q * q / (q0 * q0)

    x, info = scipy.sparse.linalg.cg(linsys, rhs, atol=1e-11, rtol=1e-11)
    assert info == 0
    if lmin == 1:
        x = x - Vx * q * q / (q0 * q0)
    return x.reshape(n1, n2)


def mlgk(G1, G2, knode, kedge, q, p=1.0, lmin=0):
    """Scalar kernel value K(G1, G2) with uniform starting probability."""
    R = mlgk_pair(G1, G2, knode, kedge, q, lmin=lmin)
    return p * p * R.sum()
