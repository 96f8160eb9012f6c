#!/usr/bin/env python
"""A/B the round-5 Gram-build levers on the TPU (VERDICT r4 #1):
  - precision: split2 (2-pass) vs refine (1-pass + periodic accurate
    residual replacement)
  - job order: construction order vs iteration-sorted blocks

Prints one scan-slope ms/build + drift-vs-edge line per combination.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--modes', nargs='+',
                    default=['split2', 'refine'])
    ap.add_argument('--orders', nargs='+', default=['plain', 'sorted'])
    args = ap.parse_args()

    from graphdot_tpu.util import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set
    from graphdot_tpu.util.timing import scan_device_time

    graphs = random_molecule_set(42, 128, n_atoms_range=(9, 24))
    n_pairs = 128 * 129 // 2

    def kern(be):
        return MarginalizedGraphKernel(
            TensorProduct(element=KroneckerDelta(0.2)),
            TensorProduct(length=SquareExponential(0.3)),
            q=0.05, backend=be,
        )

    fe = GramFactory(kern('edge'), graphs, normalize=True)
    t0 = jnp.asarray(fe.theta0, dtype=jnp.float32)
    K_edge = np.asarray(jax.jit(fe.gram)(t0))

    results = {}
    for mode in args.modes:
        os.environ['GRAPHDOT_PALLAS_MODE'] = mode
        for order in args.orders:
            key = f'{mode}/{order}'
            try:
                f = GramFactory(kern('pallas'), graphs,
                                normalize=True)
                if order == 'sorted':
                    f.reorder_by_iterations(t0)
                K = np.asarray(jax.jit(f.gram)(t0))
                drift = float(np.max(np.abs(K - K_edge)))
                dt, _ = scan_device_time(f.gram, t0, w1=10, w2=60)
                results[key] = {
                    'ms_per_build': round(dt * 1e3, 3),
                    'pairs_per_sec': round(n_pairs / dt, 0),
                    'drift_vs_edge': drift,
                }
            except Exception as e:                  # noqa: BLE001
                results[key] = {
                    'error': f'{type(e).__name__}: {e}'[:160]}
            print(key, json.dumps(results[key]), flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
