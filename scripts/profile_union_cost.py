#!/usr/bin/env python
"""Decompose the union-packed Gram build cost into theta-dependent setup
vs per-CG-iteration cost, by scan-slope timing the build at forced
iteration caps (VERDICT r4 #1 groundwork).

With the convergence tolerance unchanged, a cap C below the natural
convergence point (~13-19 iterations on the bench workload) makes every
Pallas block run exactly ~C iterations, so

    t(C) = setup + C * per_iter

and two caps give the split. Run on the TPU host.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--caps', type=int, nargs='+', default=[4, 12])
    ap.add_argument('--backend', default='auto')
    args = ap.parse_args()

    from graphdot_tpu.util import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set
    from graphdot_tpu.util.timing import scan_device_time

    graphs = random_molecule_set(42, 128, n_atoms_range=(9, 24))
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05, backend=args.backend,
    )
    results = {}
    for cap in args.caps + [None]:
        f = GramFactory(kernel, graphs, normalize=True, maxiter=cap)
        theta0 = jnp.asarray(f.theta0, dtype=jnp.float32)
        dt, _ = scan_device_time(f.gram, theta0, w1=10, w2=40)
        results[str(cap)] = dt * 1e3
        print(f'maxiter={cap}: {dt * 1e3:.3f} ms/build', flush=True)

    caps = sorted(int(c) for c in results if c != 'None')
    if len(caps) >= 2:
        c1, c2 = caps[0], caps[-1]
        per_iter = (results[str(c2)] - results[str(c1)]) / (c2 - c1)
        setup = results[str(c1)] - c1 * per_iter
        print(json.dumps({
            'setup_ms': round(setup, 3),
            'per_iter_ms': round(per_iter, 4),
            'full_ms': round(results['None'], 3),
            'implied_iters': round(
                (results['None'] - setup) / per_iter, 1),
        }))


if __name__ == '__main__':
    main()
