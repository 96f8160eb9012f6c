#!/usr/bin/env python
"""Record Gram-build scaling over 1/2/4/8 virtual CPU devices.

Single-host CPU emulation of the multi-chip path: the virtual devices
share one socket's cores, so these numbers measure sharding *overheads*
(collectives, padding, lockstep) rather than real speedups — on real
multi-chip hardware each shard gets its own chip. Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_gram.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ.setdefault('XLA_FLAGS', '')
if 'host_platform_device_count' not in os.environ['XLA_FLAGS']:
    os.environ['XLA_FLAGS'] += ' --xla_force_host_platform_device_count=8'

import jax                                     # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np                             # noqa: E402
import jax.numpy as jnp                        # noqa: E402

from graphdot_tpu.inference import GramFactory            # noqa: E402
from graphdot_tpu.kernel import MarginalizedGraphKernel   # noqa: E402
from graphdot_tpu.microkernel import (                    # noqa: E402
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.parallel import make_mesh, sharded_gram_fn  # noqa: E402
from graphdot_tpu.testing import random_molecule_set      # noqa: E402


def main():
    graphs = random_molecule_set(42, 64, n_atoms_range=(9, 24))
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05, backend='edge',
    )
    factory = GramFactory(kernel, graphs, normalize=True)
    t0 = jnp.asarray(factory.theta0, dtype=jnp.float32)

    results = {}
    for d in (1, 2, 4, 8):
        mesh = make_mesh({'pairs': d}, devices=jax.devices()[:d])
        gram = sharded_gram_fn(factory, mesh)
        gram(t0).block_until_ready()
        ts = []
        for r in range(5):
            t = time.perf_counter()
            gram(t0 + 1e-5 * r).block_until_ready()
            ts.append(time.perf_counter() - t)
        results[d] = min(ts)
        print(f'{d} devices: {results[d]*1e3:8.1f} ms  '
              f'(x{results[1]/results[d]:.2f} vs 1 dev, '
              f'{100*results[1]/results[d]/d:.0f}% eff)')
    print('# virtual CPU devices share one socket; efficiency here '
          'bounds sharding overhead, not real-chip speedup')


if __name__ == '__main__':
    main()
