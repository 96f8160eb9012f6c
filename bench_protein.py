#!/usr/bin/env python
"""Benchmark: protein-scale Gram build (the reference's
``example/perfbench/protein-time-to-solution.py`` workload shape).

11 protein-like contact-map graphs of 150-300 residues -> 66 graph pairs
with product spaces n1*n2 ~ 2e4-9e4 — far beyond the VMEM-resident fused
kernel, exercising the product-dimension-blocked streaming Pallas PCG
(T streamed from HBM; ops/pallas_pcg.py `_pcg_stream_kernel`).

Prints ONE JSON line like bench.py. Run with
GRAPHDOT_BENCH_BACKEND=edge to time the pure-XLA fallback instead.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    from graphdot_tpu.util import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_protein_set

    n_graphs = 11
    graphs = random_protein_set(7, n_graphs, n_residues_range=(150, 300))
    n_pairs = n_graphs * (n_graphs + 1) // 2

    backend = os.environ.get('GRAPHDOT_BENCH_BACKEND', 'pallas')
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(3.0)),
        q=0.05, backend=backend,
    )
    # one padded size class: heterogeneous bucketing would multiply
    # Mosaic compiles without changing what is being measured
    factory = GramFactory(kernel, graphs, normalize=True, buckets=False)
    theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
    gram = jax.jit(factory.gram)

    t0 = time.perf_counter()
    K = gram(theta0)
    K.block_until_ready()
    t_first = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(K))), 'non-finite Gram'

    times = []
    for r in range(7):
        t0 = time.perf_counter()
        gram(theta0 + 1e-5 * r).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.min(times))

    print(json.dumps({
        'metric': 'protein graph-pairs/s/chip (Gram build, 11 x '
                  '150-300-residue contact maps)',
        'value': round(n_pairs / dt, 1),
        'unit': 'pairs/s',
        'vs_baseline': 1.0,
    }))
    print(
        f'# details: {n_pairs} pairs, {dt * 1e3:.1f} ms/build steady, '
        f'{t_first:.1f} s first call (compile), backend={backend}, '
        f'platform={jax.devices()[0].platform}',
        file=sys.stderr
    )


if __name__ == '__main__':
    main()
