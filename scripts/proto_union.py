#!/usr/bin/env python
"""Prototype: cross-product union packing vs the production path
(VERDICT r3 #1 — measure, don't estimate, the shared-graph grouped
matvec before accepting the VPU-bound ceiling).

Idea: pack k graphs per side into one disjoint-union "super-graph". The
MLGK system of a union pair is block-diagonal over the k x k member-pair
blocks, so ONE CG solve at operand dims [k*M, k*N] yields k^2 member
kernel values. Unlike block-diagonal pair packing (the current
``pack='auto'``), whose VPU cost (T o H Hadamard, CG vector updates)
grows k-fold per pair, union packing keeps the per-pair VPU cost
CONSTANT — the k-fold waste lands only on the four one-hot MXU
contractions, where molecule-sized operands leave the MXU ~95% idle.

This script measures, on a single 16-node size class (64 molecules):
  a. production gram (pallas, pack='auto')          — baseline
  b. union gram at k in {2, 4, 8}                   — candidate
and validates that the union gram's (I, J) entry equals the sum of the
k^2 member-pair values from the baseline.

Run on TPU: python scripts/proto_union.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from graphdot_tpu.util import enable_compilation_cache
enable_compilation_cache()

from graphdot_tpu import Graph
from graphdot_tpu.inference import GramFactory
from graphdot_tpu.kernel import MarginalizedGraphKernel
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.testing import random_molecule_set


def scan_time(gram, theta0, W=10, n_rep=7):
    @jax.jit
    def loop(t, dts):
        def body(carry, dt):
            return carry + jnp.sum(gram(t + dt)), None
        s, _ = lax.scan(body, 0.0, dts)
        return s

    dts = jnp.asarray(1e-4 * np.arange(W), dtype=jnp.float32)
    loop(theta0, dts).block_until_ready()
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(theta0, dts))
        times.append(time.perf_counter() - t0)
    return float(np.min(times)) / W


def build(graphs, ftol=None):
    kw = {} if ftol is None else {'ftol': ftol}
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05, **kw,
    )
    factory = GramFactory(kernel, graphs, normalize=False)
    theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
    return factory, theta0


def main():
    n = 64
    graphs = random_molecule_set(42, n, n_atoms_range=(13, 16))
    n_pairs = n * (n + 1) // 2
    sizes = sorted({len(g.nodes) for g in graphs})
    print(f'{n} molecules, {sizes[0]}-{sizes[-1]} atoms, '
          f'{n_pairs} pairs')

    factory, theta0 = build(graphs)
    dt = scan_time(factory.gram, theta0)
    K_base = np.asarray(jax.jit(factory.gram)(theta0))
    print(f'a. production (pack=auto): {dt * 1e3:7.2f} ms/build '
          f'({n_pairs / dt:9,.0f} pairs/s)')

    base_ftol = factory.kernel.ftol
    min_ntrue = min(len(g.nodes) for g in graphs) ** 2

    for k in (2, 4, 8):
        blocks = [graphs[i:i + k] for i in range(0, n, k)]
        unions = Graph.unify_datatype(
            [Graph.disjoint_union(b) for b in blocks])
        # match the per-member tolerance: the union solve must reach
        # ftol * min-member-n_true, not ftol * union-n_true
        max_union_ntrue = max(len(u.nodes) for u in unions) ** 2
        ftol_k = base_ftol * min_ntrue / max_union_ntrue
        uf, _ = build(unions, ftol=ftol_k)
        dtu = scan_time(uf.gram, theta0)
        K_u = np.asarray(jax.jit(uf.gram)(theta0))

        # validation: union entry (I, J) == sum of member-pair tile
        nb = len(blocks)
        K_tiles = np.zeros((nb, nb))
        full = K_base  # symmetric, full matrix
        for bi in range(nb):
            for bj in range(nb):
                rows = slice(bi * k, min((bi + 1) * k, n))
                cols = slice(bj * k, min((bj + 1) * k, n))
                K_tiles[bi, bj] = full[rows, cols].sum()
        err = np.max(np.abs(K_u - K_tiles) / np.abs(K_tiles))
        print(f'b. union k={k}:            {dtu * 1e3:7.2f} ms/build '
              f'({n_pairs / dtu:9,.0f} pairs/s equiv, '
              f'x{dt / dtu:.2f} vs production, '
              f'tile-sum rel err {err:.2e})')


if __name__ == '__main__':
    main()
