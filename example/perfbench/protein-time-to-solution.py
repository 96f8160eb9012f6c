#!/usr/bin/env python
"""Large-graph (protein-scale) time-to-solution benchmark (reference:
``example/perfbench/protein-time-to-solution.py``; the reference's PDB
input blob is stripped from its repo, so synthetic protein-like chain
graphs of comparable size are used). Usage:
``python protein-time-to-solution.py -n_graphs=16 -n_residues=150``."""
import sys
import time

import numpy as np


def parse_args(argv, **defaults):
    opts = dict(defaults)
    for a in argv:
        if a.startswith('-') and '=' in a:
            k, v = a[1:].split('=', 1)
            opts[k] = type(defaults.get(k, str))(v)
    return opts


def protein_like(rng, n_residues):
    """A backbone chain with short-range contact edges — the topology
    of a coarse-grained protein contact graph."""
    from graphdot_tpu.graph import Graph
    from graphdot_tpu.graph.frame import DataFrame

    n = n_residues
    src = list(range(n - 1))
    dst = list(range(1, n))
    # contact edges: each residue contacts ~2 random spatial neighbors
    for i in range(n):
        for _ in range(2):
            j = i + int(rng.integers(3, 12))
            if j < n:
                src.append(i)
                dst.append(j)
    pairs = sorted(set(zip(src, dst)))
    src, dst = zip(*pairs)
    length = rng.uniform(3.5, 8.0, size=len(src)).astype(np.float32)
    w = np.exp(-0.5 * (length / 4.0 - 1.0) ** 2).astype(np.float32)
    nodes = DataFrame({
        '!i': np.arange(n),
        'residue': rng.integers(0, 20, size=n).astype(np.int8),
    })
    edges = DataFrame({
        '!i': np.asarray(src, dtype=np.uint32),
        '!j': np.asarray(dst, dtype=np.uint32),
        '!w': w,
        'length': length,
    })
    return Graph(nodes, edges, title=f'protein-{n}')


def main():
    import jax
    import jax.numpy as jnp

    from graphdot_tpu.graph import Graph
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )

    opts = parse_args(sys.argv[1:], n_graphs=16, n_residues=150)
    rng = np.random.default_rng(0)
    graphs = Graph.unify_datatype([
        protein_like(rng, opts['n_residues'])
        for _ in range(opts['n_graphs'])
    ])
    n_pairs = opts['n_graphs'] * (opts['n_graphs'] + 1) // 2

    kernel = MarginalizedGraphKernel(
        TensorProduct(residue=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(1.0)),
        q=0.05,
    )
    t0 = time.perf_counter()
    R = kernel(graphs)
    t_first = time.perf_counter() - t0
    assert np.all(np.isfinite(R))

    t0 = time.perf_counter()
    kernel2 = MarginalizedGraphKernel(
        TensorProduct(residue=KroneckerDelta(0.25)),
        TensorProduct(length=SquareExponential(1.1)),
        q=0.05,
    )
    R = kernel2(graphs)
    dt = time.perf_counter() - t0
    print(
        f'{opts["n_graphs"]} graphs x {opts["n_residues"]} residues: '
        f'first {t_first:.2f} s (incl. compile), steady {dt:.2f} s '
        f'({n_pairs / dt:,.1f} pairs/s, product dim '
        f'{opts["n_residues"] ** 2:,})'
    )


if __name__ == '__main__':
    main()
