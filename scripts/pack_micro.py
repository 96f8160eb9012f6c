"""Microbenchmark: pallas PCG solve throughput, unpacked vs packed, on
the bench's dominant group shape. Isolates the kernel + packing-assembly
cost from the rest of the Gram build."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from graphdot_tpu.util import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
from jax import lax                           # noqa: E402

from graphdot_tpu.ops.pallas_pcg import pallas_pcg_solver  # noqa: E402

P, M, N = 2080, 64, 24
rng = np.random.default_rng(0)
T = jnp.asarray(rng.uniform(0.05, 0.2, (P, M, M)), jnp.float32)
ohs1 = jnp.asarray(np.eye(N, dtype=np.float32)[rng.integers(0, N, (P, M))])
ohd1 = jnp.asarray(np.eye(N, dtype=np.float32)[rng.integers(0, N, (P, M))])
ohs2 = jnp.asarray(np.eye(N, dtype=np.float32)[rng.integers(0, N, (P, M))])
ohd2 = jnp.asarray(np.eye(N, dtype=np.float32)[rng.integers(0, N, (P, M))])
diag = jnp.asarray(rng.uniform(3.0, 5.0, (P, N, N)), jnp.float32)
precond = 1.0 / diag
tol = jnp.full((P,), 1e-5 * N * N, jnp.float32)
b0 = jnp.asarray(rng.normal(size=(P, N * N)), jnp.float32)

W = 10


def bench(pack):
    sv = pallas_pcg_solver(T, ohs1, ohd1, ohs2, ohd2, diag, precond,
                           tol, maxiter=64, pack=pack)

    @jax.jit
    def loop(b, dts):
        def body(c, dt):
            x = sv(b * (1.0 + dt))
            return c + jnp.sum(x), None
        s, _ = lax.scan(body, 0.0, dts)
        return s

    dts = jnp.asarray(1e-4 * np.arange(W), jnp.float32)
    tic = time.perf_counter()
    loop(b0, dts).block_until_ready()
    compile_s = time.perf_counter() - tic
    times = []
    for r in range(7):
        t0 = time.perf_counter()
        loop(b0 + 1e-5 * r, dts).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times) / W
    print(f'pack={pack}: {dt * 1e3:.2f} ms/solve-batch '
          f'({P / dt / 1e3:.0f}k pairs/s), compile {compile_s:.0f}s',
          flush=True)
    return dt


d1 = bench(1)
d2 = bench(2)
d3 = bench('auto')
print(f'speedup k=2 vs 1: {d1 / d2:.2f}x ; auto vs 1: {d1 / d3:.2f}x')
