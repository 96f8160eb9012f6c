"""Synthetic data generators for tests, benchmarks and dry runs."""
import numpy as np

from .graph import Graph
from .graph.frame import DataFrame


def random_molecule_graph(rng, n_atoms, elements=(1, 6, 7, 8, 16)):
    """A random molecule-like graph: a connected chain plus extra short
    bonds, with 'element' node features and 'length' + '!w' edge features —
    the same feature signature as ``Graph.from_ase`` output."""
    n = int(n_atoms)
    element = rng.choice(elements, size=n).astype(np.int8)
    src = [i for i in range(n - 1)]
    dst = [i + 1 for i in range(n - 1)]
    extra = max(0, n // 3)
    for _ in range(extra):
        i, j = rng.integers(0, n, size=2)
        if i != j and abs(int(i) - int(j)) > 1:
            src.append(min(i, j))
            dst.append(max(i, j))
    # dedup
    seen = {}
    for i, j in zip(src, dst):
        seen[(int(i), int(j))] = True
    src, dst = zip(*seen.keys())
    length = rng.uniform(1.0, 1.8, size=len(src)).astype(np.float32)
    w = np.exp(-0.5 * (length - 1.4) ** 2).astype(np.float32)

    nodes = DataFrame({'!i': np.arange(n), 'element': element})
    edges = DataFrame({
        '!i': np.asarray(src, dtype=np.uint32),
        '!j': np.asarray(dst, dtype=np.uint32),
        '!w': w,
        'length': length,
    })
    return Graph(nodes, edges, title=f'random-{n}')


def random_molecule_set(seed, n_graphs, n_atoms_range=(9, 24)):
    """A list of random molecule graphs with unified dtypes."""
    rng = np.random.default_rng(seed)
    graphs = [
        random_molecule_graph(
            rng, rng.integers(n_atoms_range[0], n_atoms_range[1])
        )
        for _ in range(n_graphs)
    ]
    return Graph.unify_datatype(graphs)
