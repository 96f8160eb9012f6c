"""Sweep pair-packing factor and block_pairs on real TPU hardware
(VERDICT r2 #3: collect the projected lane-packing headroom, and retry
block_pairs > 16 against the current Mosaic toolchain).

Run (TPU): python scripts/sweep_pack.py [combos...]
Combos are 'pack:block' strings, e.g. 'auto:16 4:16 auto:32 8:8'.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    combos = sys.argv[1:] or [
        'auto:16', '4:16', '5:16', 'auto:32', 'auto:64', '8:8',
    ]
    from graphdot_tpu.util import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set

    n_graphs = 128
    graphs = random_molecule_set(42, n_graphs, n_atoms_range=(9, 24))
    n_pairs = n_graphs * (n_graphs + 1) // 2
    W = 10

    results = {}
    K_ref = None
    for combo in combos:
        pack, block = combo.split(':')
        os.environ['GRAPHDOT_PALLAS_PACK'] = pack
        os.environ['GRAPHDOT_PALLAS_BLOCK_PAIRS'] = block
        try:
            kernel = MarginalizedGraphKernel(
                TensorProduct(element=KroneckerDelta(0.2)),
                TensorProduct(length=SquareExponential(0.3)),
                q=0.05, backend='pallas',
            )
            factory = GramFactory(kernel, graphs, normalize=True)
            theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)

            @jax.jit
            def gram_loop(t, dts):
                def body(carry, dt):
                    return carry + jnp.sum(factory.gram(t + dt)), None
                s, _ = lax.scan(body, 0.0, dts)
                return s

            dts = jnp.asarray(1e-4 * np.arange(W), dtype=jnp.float32)
            t_compile = time.perf_counter()
            gram_loop(theta0, dts).block_until_ready()
            t_compile = time.perf_counter() - t_compile

            K = np.asarray(jax.jit(factory.gram)(theta0))
            if K_ref is None:
                K_ref = K
            drift = float(np.max(np.abs(K - K_ref)))

            times = []
            for rep in range(5):
                t = theta0 + 1e-5 * rep
                t0 = time.perf_counter()
                gram_loop(t, dts).block_until_ready()
                times.append((time.perf_counter() - t0) / W)
            dt = float(np.min(times))
            results[combo] = {
                'ms_per_build': round(dt * 1e3, 2),
                'pairs_per_s': round(n_pairs / dt, 0),
                'compile_s': round(t_compile, 1),
                'drift_vs_first': drift,
            }
            print(combo, results[combo], flush=True)
        except Exception as e:                      # noqa: BLE001
            results[combo] = {'error': f'{type(e).__name__}: {e}'[:300]}
            print(combo, 'FAILED:', results[combo]['error'], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
