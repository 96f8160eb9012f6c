"""Quick on-TPU validation of the pair-packed Pallas PCG: numerics vs the
XLA edge backend, plus a micro-timing of the packed vs unpacked kernel on
one bucket group. Small shapes to keep Mosaic compile time bounded."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from graphdot_tpu.util import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

from graphdot_tpu.inference import GramFactory            # noqa: E402
from graphdot_tpu.kernel import MarginalizedGraphKernel   # noqa: E402
from graphdot_tpu.microkernel import (                     # noqa: E402
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.testing import random_molecule_set      # noqa: E402

print('platform:', jax.devices()[0].device_kind, flush=True)

mols = random_molecule_set(42, 32, n_atoms_range=(9, 24))


def build(backend):
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05, backend=backend,
    )
    f = GramFactory(kernel, mols, normalize=True)
    t0 = jnp.asarray(f.theta0, dtype=jnp.float32)
    g = jax.jit(f.gram)
    tic = time.perf_counter()
    K = g(t0)
    K.block_until_ready()
    print(f'{backend}: compile+run {time.perf_counter() - tic:.1f}s',
          flush=True)

    def timed(n=5):
        ts = []
        for i in range(n):
            tt = jnp.asarray(f.theta0 + 1e-4 * (i + 1), jnp.float32)
            s = time.perf_counter()
            g(tt).block_until_ready()
            ts.append(time.perf_counter() - s)
        return min(ts)
    return np.asarray(K), timed()


Ke, te = build('edge')
Kp, tp = build('pallas')
err = np.max(np.abs(Ke - Kp) / (np.abs(Ke) + 1e-12))
print(f'max rel err pallas vs edge: {err:.2e}')
print(f'per-call min: edge {te * 1e3:.1f} ms, pallas(packed) '
      f'{tp * 1e3:.1f} ms')
assert err < 1e-4, 'packed pallas disagrees with edge backend'
print('OK')
