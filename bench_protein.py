#!/usr/bin/env python
"""Benchmark: protein-scale Gram builds at the reference's
time-to-solution sizes (``example/perfbench/protein-time-to-solution.py``
targets multi-hundred-residue contact maps; SURVEY §5 calls for product
spaces n1*n2 ~ 1e5-1e6).

Three size classes:
  small:  11 x 150-300 residues   (n1*n2 up to ~9e4)
  medium:  6 x 400-600 residues   (n1*n2 up to ~3.6e5)
  large:   4 x 800-1000 residues  (n1*n2 up to ~1e6)

The pallas backend auto-routes these to the sum-of-Kronecker solver
(Chebyshev-factorized edge kernel, dense node-space matmuls — see
docs/userguide/performance.md). Environment probes:
  GRAPHDOT_BENCH_BACKEND=edge  — pure-XLA edge-factored solver
  GRAPHDOT_KRON=0              — HBM-streaming Pallas PCG instead

Prints ONE JSON line (headline = the large class) plus per-class
detail lines with a FLOP model: useful = kron matvec FLOPs at true
node counts x measured CG iterations; executed multiplies the HIGH
(3-pass bf16) precision and padding.
"""
import json
import os
import sys
import time

import numpy as np


def bench_class(label, seed, n_graphs, rng_range, kernel_factory,
                reps=5, graphs=None):
    import jax
    import jax.numpy as jnp

    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.testing import random_protein_set
    from graphdot_tpu.util.flops import device_peak_flops

    if graphs is None:
        graphs = random_protein_set(seed, n_graphs,
                                    n_residues_range=rng_range)
    n_pairs = n_graphs * (n_graphs + 1) // 2
    kernel = kernel_factory()
    factory = GramFactory(kernel, graphs, normalize=True,
                          buckets=False, union=False)
    theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
    gram = jax.jit(factory.gram)

    t0 = time.perf_counter()
    K = gram(theta0)
    K.block_until_ready()
    t_first = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(K))), f'non-finite Gram {label}'

    # scan-slope timing: the tunnel's ~20-45 ms per-call round trip
    # would bias single-call timings (graphdot_tpu/util/timing.py)
    from graphdot_tpu.util.timing import scan_device_time
    dt, _ = scan_device_time(factory.gram, theta0, w1=2, w2=2 + reps)

    # FLOP model (kron path): R dense node-space matmul pairs per
    # matvec; useful charges true node counts and one pass, executed
    # charges padded dims x 3 (HIGH bf16 passes).
    mfu = exec_pct = iters_med = None
    n1n2_max = max(len(g.nodes) for g in graphs) ** 2
    try:
        mode = factory.kernel.backend.mode
        kron_min = int(os.environ.get('GRAPHDOT_KRON_MIN_N', 0))
        npad2 = max(len(g.nodes) for g in graphs)
        # the kron FLOP model applies only when the auto-switch routes
        # this class to the kron solver (see _solver.mlgk_solve)
        if mode == 'pallas' and os.environ.get('GRAPHDOT_KRON') != '0' \
                and npad2 * npad2 > kron_min \
                and factory._kron_ranks != 'off':
            from graphdot_tpu.kernel.marginalized._kron import \
                DEFAULT_RANK
            stats = factory.iteration_stats(theta0, mode='kron')
            (grp,) = stats
            iters = np.asarray(grp['iters'], dtype=float)
            iters_med = float(np.median(iters))
            sizes = np.array([len(g.nodes) for g in graphs])
            iu, ju = np.triu_indices(n_graphs)
            useful = executed = 0.0
            # the factory auto-calibrates the Chebyshev rank
            # (factorization_error-driven; VERDICT r4 #4)
            ranks = factory._kron_ranks
            R = (int(np.prod(ranks)) if isinstance(ranks, tuple)
                 else int(ranks or DEFAULT_RANK))
            npad = grp['ca']
            for a, b, it in zip(iu, ju, iters):
                na, nb = sizes[a], sizes[b]
                useful += it * 2 * R * (na * na * nb + na * nb * nb)
                executed += it * 2 * R * (npad ** 3 + npad ** 3) * 3
            peak = device_peak_flops()
            if peak:
                mfu = round(100.0 * useful / dt / peak, 2)
                exec_pct = round(100.0 * executed / dt / peak, 1)
    except Exception as e:                          # noqa: BLE001
        print(f'# {label}: FLOP accounting unavailable: {e}',
              file=sys.stderr)

    return {
        'label': label, 'n_pairs': n_pairs, 'n1n2_max': int(n1n2_max),
        'pairs_per_sec': round(n_pairs / dt, 2),
        'ms_per_build': round(dt * 1e3, 1),
        't_first_s': round(t_first, 1),
        'iters_median': iters_med,
        'mfu_pct': mfu, 'mxu_executed_pct': exec_pct,
    }


def main():
    from graphdot_tpu.util import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )

    backend = os.environ.get('GRAPHDOT_BENCH_BACKEND', 'pallas')

    def kernel_factory():
        return MarginalizedGraphKernel(
            TensorProduct(element=KroneckerDelta(0.2)),
            TensorProduct(length=SquareExponential(3.0)),
            q=0.05, backend=backend,
        )

    classes = [
        ('150-300res', 7, 11, (150, 300)),
        ('400-600res', 8, 6, (400, 600)),
        ('800-1000res', 9, 4, (800, 1000)),
    ]
    if os.environ.get('GRAPHDOT_PROTEIN_SMALL_ONLY'):
        classes = classes[:1]

    rows = []
    for label, seed, n, rng in classes:
        try:
            rows.append(bench_class(label, seed, n, rng,
                                    kernel_factory))
        except Exception as e:                      # noqa: BLE001
            # one class must not sink the whole bench (the dev
            # harness's TPU worker occasionally faults on first
            # compiles of large programs)
            rows.append({'label': label,
                         'error': f'{type(e).__name__}: {e}'[:200]})
        print(f'# {json.dumps(rows[-1])}', file=sys.stderr)

    # VERDICT r4 #7: the streaming kernel's exclusive niche — beyond-
    # RESIDENT-VMEM pairs whose edge kernel the Chebyshev factorization
    # cannot approximate (a categorical contact-type KroneckerDelta
    # factor: rank calibration rejects it and auto-selection falls back
    # to the streaming Pallas PCG). A/B'd against the pure-XLA edge
    # solver on the same graphs; GRAPHDOT_PROTEIN_NICHE=0 skips. Sized
    # 180-280 residues: past ~300 residues even the streaming kernel's
    # VMEM-resident part (one-hots + CG state) overflows the 100 MB
    # scoped limit and the solver already falls back to XLA edge, so
    # the niche itself is bounded.
    if os.environ.get('GRAPHDOT_PROTEIN_NICHE', '1') != '0' \
            and not os.environ.get('GRAPHDOT_PROTEIN_SMALL_ONLY'):
        import numpy as _np
        import warnings
        from graphdot_tpu.graph import Graph
        from graphdot_tpu.testing import random_protein_set

        base = random_protein_set(13, 6, n_residues_range=(180, 280))
        niche_graphs = []
        for g in base:
            e = g.edges
            ctype = _np.minimum(
                _np.abs(_np.asarray(e['!i'])
                        - _np.asarray(e['!j'])) // 6, 2
            ).astype(_np.float32)
            niche_graphs.append(Graph(
                nodes=g.nodes,
                edges={'!i': e['!i'], '!j': e['!j'], '!w': e['!w'],
                       'length': e['length'], 'ctype': ctype},
                title=g.title))
        niche_graphs = Graph.unify_datatype(niche_graphs)

        def niche_factory(be):
            def make():
                return MarginalizedGraphKernel(
                    TensorProduct(element=KroneckerDelta(0.2)),
                    TensorProduct(length=SquareExponential(3.0),
                                  ctype=KroneckerDelta(0.3)),
                    q=0.05, backend=be,
                )
            return make

        for be in ('pallas', 'edge'):
            try:
                with warnings.catch_warnings():
                    warnings.simplefilter('ignore')
                    rows.append(bench_class(
                        f'niche-180-280res-cat-edge[{be}]', 13, 6,
                        None, niche_factory(be), graphs=niche_graphs))
            except Exception as e:                  # noqa: BLE001
                rows.append({
                    'label': f'niche-250-350res-cat-edge[{be}]',
                    'error': f'{type(e).__name__}: {e}'[:200]})
            print(f'# {json.dumps(rows[-1])}', file=sys.stderr)

    done = [r for r in rows if 'error' not in r
            and not r['label'].startswith('niche')]
    head = done[-1] if done else {
        'label': 'none', 'pairs_per_sec': None, 'n1n2_max': 0}
    print(json.dumps({
        'metric': f'protein graph-pairs/s/chip (Gram build, '
                  f'{head["label"]} contact maps, '
                  f'n1*n2 up to {head["n1n2_max"]:.0e})',
        'value': head['pairs_per_sec'],
        'unit': 'pairs/s',
        'vs_baseline': None,
        'classes': rows,
        'backend': backend,
        'kron': os.environ.get('GRAPHDOT_KRON', '1') != '0',
    }))
    print(
        f'# platform={jax.devices()[0].platform}, '
        f'device={jax.devices()[0].device_kind}',
        file=sys.stderr
    )


if __name__ == '__main__':
    main()
