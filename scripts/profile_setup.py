#!/usr/bin/env python
"""Split the pallas-path Gram build into theta-dependent setup vs CG
iteration cost, measured the same way as the bench headline (sustained
scan loop, min over repeats).

Three measurements on the 128-molecule bench workload:

1. no-CG gram: ``pallas_pcg_solver`` patched to identity solve — times
   everything except the CG loop (T/Vx/diag assembly, pallas operand
   prep, p-weighting, scatter, normalize).
2. full gram at the production settings (for reference).
3. forced-iteration sweep: ftol=0 (CG never converges) at several
   ``maxiter`` caps; the slope is the per-iteration cost, the intercept
   cross-checks (1).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from graphdot_tpu.util import enable_compilation_cache
enable_compilation_cache()

from graphdot_tpu.inference import GramFactory
from graphdot_tpu.kernel import MarginalizedGraphKernel
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.testing import random_molecule_set
import graphdot_tpu.kernel.marginalized._solver as S
import graphdot_tpu.ops.pallas_pcg as PP


def scan_time(factory, theta0, W=10, n_rep=7):
    @jax.jit
    def loop(t, dts):
        def body(carry, dt):
            Ki = factory.gram(t + dt)
            return carry + jnp.sum(Ki), None
        s, _ = lax.scan(body, 0.0, dts)
        return s

    dts = jnp.asarray(1e-4 * np.arange(W), dtype=jnp.float32)
    loop(theta0, dts).block_until_ready()
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(theta0, dts))
        times.append(time.perf_counter() - t0)
    return float(np.min(times)) / W


def build(graphs, ftol=None, maxiter=None):
    kw = {} if ftol is None else {'ftol': ftol}
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05, **kw,
    )
    factory = GramFactory(kernel, graphs, normalize=True,
                          maxiter=maxiter)
    theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
    return factory, theta0


if __name__ == '__main__':
    n_graphs = 128
    graphs = random_molecule_set(42, n_graphs, n_atoms_range=(9, 24))
    n_pairs = n_graphs * (n_graphs + 1) // 2

    # 1. no-CG gram
    orig = PP.pallas_pcg_solver

    def identity_solver(T, ohs1, ohd1, ohs2, ohd2, diag, precond, tol,
                        maxiter, mode='split2', pack='auto'):
        return lambda b: b

    PP.pallas_pcg_solver = identity_solver
    S.pallas_pcg_solver = identity_solver  # in case of direct import
    try:
        factory, theta0 = build(graphs)
        dt0 = scan_time(factory, theta0)
    finally:
        PP.pallas_pcg_solver = orig
        S.pallas_pcg_solver = orig
    print(f'no-CG gram:   {dt0 * 1e3:7.2f} ms/build')

    # 2. production gram
    factory, theta0 = build(graphs)
    dtp = scan_time(factory, theta0)
    print(f'full gram:    {dtp * 1e3:7.2f} ms/build '
          f'({n_pairs / dtp:,.0f} pairs/s)')

    # 3. forced-iteration sweep. NOTE on units: pallas_pcg_solver scales
    # the requested cap by each group's pack factor (maxiter_k =
    # maxiter * k), so one "maxiter unit" executes up to k packed CG
    # iterations; the slope below is per maxiter UNIT, not per raw CG
    # step. Print the pack factors so the reader can divide.
    ks = sorted({
        PP._best_pack(
            0x7fffffff,
            grp['batch1']['esrc'].shape[1] if 'esrc' in grp['batch1']
            else 0,
            grp['batch2']['esrc'].shape[1] if 'esrc' in grp['batch2']
            else 0,
            grp['ca'], grp['cb'])
        for grp in (factory._groups or [])
    }) if factory._groups else []
    pts = []
    for mi in (2, 4, 8, 16):
        factory, theta0 = build(graphs, ftol=0.0, maxiter=mi)
        dt = scan_time(factory, theta0)
        pts.append((mi, dt))
        print(f'forced {mi:3d} it: {dt * 1e3:7.2f} ms/build')
    its = np.array([p[0] for p in pts], dtype=float)
    ts = np.array([p[1] for p in pts])
    slope, intercept = np.polyfit(its, ts, 1)
    print(f'fit: setup {intercept * 1e3:.2f} ms + '
          f'{slope * 1e3:.3f} ms/maxiter-unit '
          f'(pack factors per group: {ks or [1]}; one unit runs up to '
          f'k packed CG steps)')
