#!/usr/bin/env python
"""Record NUTS chains-axis scaling over 1/2/4/8 virtual CPU devices —
the chains-axis counterpart of ``scaling_gram.py`` (VERDICT r3 #3;
BASELINE's >=80% samples/s scaling target).

Fixed TOTAL work (16 chains x draws) sharded over the 'chains' mesh
axis; reports samples/s and min-bulk-ESS/s per device count. As with
the Gram table, virtual devices share one socket's cores, so the table
bounds sharding overhead (collectives in the pooled adaptation,
lockstep over chains) rather than demonstrating real-chip speedup. Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_nuts.py
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

from graphdot_tpu.inference import (           # noqa: E402
    GPRLogProb, resume_state, sample
)
from graphdot_tpu.inference.diagnostics import ess        # noqa: E402
from graphdot_tpu.kernel import MarginalizedGraphKernel   # noqa: E402
from graphdot_tpu.microkernel import (                    # noqa: E402
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.parallel import make_mesh    # noqa: E402
from graphdot_tpu.testing import random_molecule_set      # noqa: E402


def main(n_graphs=8, n_chains=8, n_samples=16, max_depth=4):
    graphs = random_molecule_set(7, n_graphs, n_atoms_range=(9, 24))
    rng = np.random.default_rng(0)
    y = np.array([
        -10.0 * len(g.nodes) + rng.normal() for g in graphs
    ])
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05, backend='edge',
    )
    logprob = GPRLogProb(kernel, graphs, y, alpha=1e-2,
                         normalize_y=True)
    init = jnp.asarray(logprob.theta0, dtype=jnp.float32)

    # adapt once (unsharded); every device count then resumes from the
    # same (step size, mass, positions) so the device work is identical
    out = sample(
        logprob, jax.random.PRNGKey(0), n_chains=n_chains, n_warmup=40,
        n_samples=2, init=init, max_depth=max_depth, init_jitter=0.05)
    init2, step_size, inv_mass = resume_state(out)

    results = {}
    for d in (1, 2, 4, 8):
        mesh = make_mesh({'chains': d}, devices=jax.devices()[:d])

        def run(seed):
            return sample(
                logprob, jax.random.PRNGKey(seed), n_chains=n_chains,
                n_samples=n_samples, init=jnp.asarray(init2),
                step_size=step_size, inv_mass=inv_mass,
                max_depth=max_depth, mesh=mesh)

        run(1)                                  # compile
        dt, out_d = float('inf'), None
        for rep in range(3):
            t0 = time.perf_counter()
            o = run(2 + rep)
            jax.block_until_ready(o['samples'])
            t = time.perf_counter() - t0
            if t < dt:
                dt, out_d = t, o
        sps = n_chains * n_samples / dt
        ess_min = float(np.min(ess(np.asarray(out_d['samples']))))
        results[d] = sps
        print(f'{d} devices: {sps:8.2f} samples/s  '
              f'{ess_min / dt:6.2f} ESS/s  '
              f'(x{sps / results[1]:.2f} vs unsharded)')
    print('# fixed total chains sharded over d virtual devices on one '
          'socket: >= 1.0x means the chains-axis sharding overhead '
          '(psum-pooled adaptation, per-device dispatch) is fully '
          'absorbed; the measured speedup comes from reduced '
          'max-over-chains lockstep per device. Real-chip scaling '
          '(d-times the chains at equal wall time) needs hardware '
          'this environment does not have.')


if __name__ == '__main__':
    main()
