#!/usr/bin/env python
"""Profile the Gram-build: CG iteration counts, per-iteration matvec cost,
setup cost. Run on TPU (default) or CPU (JAX_PLATFORMS=cpu)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from graphdot_tpu.inference import GramFactory
from graphdot_tpu.kernel import MarginalizedGraphKernel
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.testing import random_molecule_set
import graphdot_tpu.kernel.marginalized._solver as S


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    n_graphs = 128
    graphs = random_molecule_set(42, n_graphs, n_atoms_range=(9, 24))
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    factory = GramFactory(kernel, graphs, normalize=True)
    theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)

    full = jax.jit(factory.gram)
    print(f'full gram: {timed(full, theta0):.1f} ms')

    # --- instrument: count CG iterations by patching pcg ---
    iter_count = {}
    orig_pcg = S.pcg

    def counting_pcg(matvec, b, precond, tol, maxiter):
        z0 = precond * b
        rr0 = jnp.sum(b * b, axis=-1)
        done0 = jnp.sqrt(rr0) < tol
        state0 = (jnp.zeros_like(b), b, z0, jnp.sum(b * z0, axis=-1),
                  done0, jnp.int32(0),
                  jnp.zeros(b.shape[0], jnp.int32))

        def cond(st):
            return (st[5] < maxiter) & jnp.any(~st[4])

        def body(st):
            x, r, p, rz, done, it, iters = st
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap, axis=-1)
            bad = (pAp == 0.0) | (rz == 0.0)
            step = ~(done | bad)
            alpha = jnp.where(step, rz / jnp.where(pAp == 0, 1., pAp), 0.)
            x = x + alpha[:, None] * p
            r = r - alpha[:, None] * Ap
            z = precond * r
            rz_new = jnp.sum(r * z, axis=-1)
            rr = jnp.sum(r * r, axis=-1)
            done_new = done | bad | (jnp.sqrt(rr) < tol)
            beta = jnp.where(done_new, 0., rz_new / jnp.where(rz == 0, 1., rz))
            p = z + beta[:, None] * p
            rz = jnp.where(done_new, rz, rz_new)
            iters = iters + (~done).astype(jnp.int32)
            return (x, r, p, rz, done_new, it + 1, iters)

        st = lax.while_loop(cond, body, state0)
        iter_count['iters'] = st[6]
        return st[0]

    orig_solve = S.solve_linear

    def plain_solve(matvec, b, precond, tol, maxiter, solve_impl=None):
        return counting_pcg(matvec, b, precond, tol, maxiter)

    S.solve_linear = plain_solve
    _ = jax.block_until_ready(factory.gram(theta0))  # eager: capture iters
    S.solve_linear = orig_solve
    it = np.asarray(iter_count['iters'])
    print(f'CG iters: min={it.min()} p50={np.percentile(it, 50):.0f} '
          f'p90={np.percentile(it, 90):.0f} p99={np.percentile(it, 99):.0f} '
          f'max={it.max()}')

    # --- fixed-iteration matvec cost: run the solve with while replaced
    # by K matvecs via monkeypatched solve ---
    def fixed_iter_gram(theta, k):
        def fixed_pcg(matvec, b, precond, tol, maxiter):
            def body(i, st):
                x, p = st
                Ap = matvec(p)
                return (x + 1e-9 * Ap, precond * Ap)
            x, _ = lax.fori_loop(0, k, body, (jnp.zeros_like(b), b))
            return x
        S.pcg = fixed_pcg
        try:
            out = factory.gram(theta)
        finally:
            S.pcg = orig_pcg
        return out

    for k in (1, 11, 51, 101):
        f = jax.jit(lambda t, k=k: fixed_iter_gram(t, k))
        print(f'fixed {k:3d} matvecs: {timed(f, theta0):.1f} ms')


if __name__ == '__main__':
    main()
