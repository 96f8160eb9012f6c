#!/usr/bin/env python
"""Prototype: VMEM-resident batched PCG in Pallas vs the XLA matvec loop.

Timing on the (24,24) bench group shape: P=2080 pairs, M=64, N=24.
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, M, N = 2080, 64, 24
ITERS = 16


def split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def bdot(a, b, ca, cb, prec):
    return lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)


def _kernel(T_ref, ohs1_ref, ohd1_ref, ohs2_ref, ohd2_ref, diag_ref,
            precond_ref, b_ref, x_ref, *, iters, prec2):
    T = T_ref[:]
    ohs1 = ohs1_ref[:]
    ohd1 = ohd1_ref[:]
    ohs2 = ohs2_ref[:]
    ohd2 = ohd2_ref[:]
    diag = diag_ref[:]
    precond = precond_ref[:]
    b = b_ref[:]

    if prec2 == 'split2':
        def mm(a, bb, ca, cb, which):
            # `which` = index of the general (non-one-hot) operand
            if which == 0:
                hi, lo = split(a)
                return (bdot(hi, bb, ca, cb, lax.Precision.DEFAULT)
                        + bdot(lo, bb, ca, cb, lax.Precision.DEFAULT))
            hi, lo = split(bb)
            return (bdot(a, hi, ca, cb, lax.Precision.DEFAULT)
                    + bdot(a, lo, ca, cb, lax.Precision.DEFAULT))
    else:
        p = getattr(lax.Precision, prec2)

        def mm(a, bb, ca, cb, which):
            return bdot(a, bb, ca, cb, p)

    def matvec(y):
        G = mm(ohd1, y, 2, 1, 1)          # [B,M,N]
        H = mm(G, ohd2, 2, 2, 0)          # [B,M,M]
        Z = T * H
        U = mm(ohs1, Z, 1, 1, 1)          # [B,N,M]
        out = mm(U, ohs2, 2, 1, 0)        # [B,N,N]
        return diag * y - out

    def psum(a):
        return jnp.sum(jnp.sum(a, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    z0 = precond * b
    state0 = (jnp.zeros_like(b), b, z0, psum(b * z0))

    def body(i, st):
        x, r, p, rz = st
        Ap = matvec(p)
        pAp = psum(p * Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond * r
        rz2 = psum(r * z)
        beta = rz2 / jnp.where(rz == 0, 1.0, rz)
        return (x, r, z + beta * p, rz2)

    x, _, _, _ = lax.fori_loop(0, iters, body, state0)
    x_ref[:] = x


@functools.partial(jax.jit, static_argnames=('B', 'iters', 'prec2'))
def pallas_solve(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b,
                 B=32, iters=ITERS, prec2='split2'):
    grid = (P // B,)

    def spec(shape):
        return pl.BlockSpec((B, *shape), lambda i: (i, *([0] * len(shape))),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, prec2=prec2),
        grid=grid,
        in_specs=[spec((M, M))] + [spec((M, N))] * 4 + [spec((N, N))] * 3,
        out_specs=spec((N, N)),
        out_shape=jax.ShapeDtypeStruct((P, N, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * iters * (2 * M * N * N + 2 * N * M * M),
            bytes_accessed=4 * P * (M * M + 4 * M * N + 4 * N * N),
            transcendentals=0),
    )(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b)


def xla_matvec_loop(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b, iters):
    HIGH = lax.Precision.HIGH

    def es(spec, a, bb):
        return jnp.einsum(spec, a, bb, precision=HIGH,
                          preferred_element_type=jnp.float32)

    def matvec(y):
        G = es('cen,cnk->cek', ohd1, y)
        H = es('cek,cfk->cef', G, ohd2)
        Z = T * H
        U = es('cef,cei->cif', Z, ohs1)
        return diag * y - es('cif,cfk->cik', U, ohs2)

    def psum(a):
        return jnp.sum(a, axis=(1, 2), keepdims=True)

    z0 = precond * b
    st0 = (jnp.zeros_like(b), b, z0, psum(b * z0))

    def body(i, st):
        x, r, p, rz = st
        Ap = matvec(p)
        pAp = psum(p * Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond * r
        rz2 = psum(r * z)
        beta = rz2 / jnp.where(rz == 0, 1.0, rz)
        return (x, r, z + beta * p, rz2)

    return lax.fori_loop(0, iters, body, st0)[0]


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    idx = jax.random.randint(ks[0], (4, P, M), 0, N)
    ohd1, ohd2, ohs1, ohs2 = [
        jax.nn.one_hot(idx[i], N, dtype=jnp.float32) for i in range(4)]
    T = jax.random.uniform(ks[1], (P, M, M)) * 0.2
    deg = jax.random.uniform(ks[2], (P, N, N), minval=1.0, maxval=4.0)
    diag = deg * 1.2
    precond = 1.0 / diag
    b = deg

    args = (T, ohs1, ohd1, ohs2, ohd2, diag, precond, b)

    x_ref = jax.jit(lambda *a: xla_matvec_loop(*a, ITERS))(*args)
    jax.block_until_ready(x_ref)

    def timed(fn, *a, **kw):
        # vary the RHS each call: the dev tunnel caches identical calls
        jax.block_until_ready(fn(*a, **kw))
        ts = []
        for i in range(10):
            aa = list(a)
            aa[-1] = a[-1] + 1e-6 * (i + 1)
            jax.block_until_ready(aa[-1])
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*aa, **kw))
            ts.append(time.perf_counter() - t0)
        return 1e3 * np.min(ts)

    print(f'XLA HIGH {ITERS} iters: '
          f'{timed(jax.jit(lambda *a: xla_matvec_loop(*a, ITERS)), *args):.2f} ms')

    for B in (8, 16):
        for prec2 in ('split2', 'HIGHEST', 'DEFAULT'):
            t0 = time.perf_counter()
            try:
                x = pallas_solve(*args, B=B, iters=ITERS, prec2=prec2)
                jax.block_until_ready(x)
                compile_s = time.perf_counter() - t0
                dt = timed(pallas_solve, *args, B=B, iters=ITERS,
                           prec2=prec2)
                err = float(jnp.abs(x - x_ref).max() /
                            jnp.abs(x_ref).max())
                print(f'pallas B={B:3d} {prec2:8s}: {dt:6.2f} ms  '
                      f'rel_err={err:.2e}  (compile {compile_s:.0f}s)')
            except Exception as e:
                print(f'pallas B={B:3d} {prec2:8s}: FAILED '
                      f'{str(e)[:100]}')


if __name__ == '__main__':
    main()
