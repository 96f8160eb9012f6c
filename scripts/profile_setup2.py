#!/usr/bin/env python
"""Finer split of the pallas-path Gram build's non-CG cost.

Stages timed (sustained scan loop, min over repeats), all on the
128-molecule bench workload:

a. assembly-only: per-group T + Vx + diag/precond/b (sum-reduced) —
   the theta-dependent XLA elementwise work including one-hot gathers.
b. no-CG gram (identity solve): a + p-weighting + scatter + normalize.
c. standalone packed pallas launches at maxiter=1 on pre-prepped
   operands — per-launch + kernel fixed cost without the XLA stages.
d. full gram at maxiter=1 (production tol): everything.
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


def scan_time(fn, theta0, W=10, n_rep=7):
    @jax.jit
    def loop(t, dts):
        def body(carry, dt):
            return carry + fn(t + dt), None
        s, _ = lax.scan(body, 0.0, dts)
        return s

    dts = jnp.asarray(1e-4 * np.arange(W), dtype=jnp.float32)
    loop(theta0, dts).block_until_ready()
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(theta0, dts))
        times.append(time.perf_counter() - t0)
    return float(np.min(times)) / W * 1e3


if __name__ == '__main__':
    n_graphs = 128
    graphs = random_molecule_set(42, n_graphs, n_atoms_range=(9, 24))

    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    factory = GramFactory(kernel, graphs, normalize=True)
    theta0 = jnp.asarray(factory.theta0, dtype=jnp.float32)

    # ---- a. assembly-only ----
    def assembly(theta_log):
        theta = factory.full_theta(theta_log)
        acc = jnp.float32(0.0)
        solves = []

        def capture_solver(T, ohs1, ohd1, ohs2, ohd2, diag, precond,
                           tol, maxiter, mode='split2', pack='auto'):
            solves.append((T, diag, precond))
            return lambda b: b

        orig = PP.pallas_pcg_solver
        PP.pallas_pcg_solver = capture_solver
        try:
            for grp in factory._groups:
                ops = factory._group_ops(
                    grp['batch1'], grp['batch2'],
                    grp['idx1'], grp['idx2'], grp['onehots'])
                S.mlgk_solve(
                    theta, ops, knode=kernel.node_kernel,
                    kedge=kernel.edge_kernel, n_p_theta=factory._n_p,
                    lmin=0, mode='pallas', maxiter=8)
        finally:
            PP.pallas_pcg_solver = orig
        for T, diag, precond in solves:
            acc = acc + jnp.sum(T) + jnp.sum(diag) + jnp.sum(precond)
        return acc

    print(f'a. assembly-only:      {scan_time(assembly, theta0):7.2f} ms')

    # ---- b. no-CG gram ----
    orig = PP.pallas_pcg_solver

    def identity_solver(*args, **kw):
        return lambda b: b

    PP.pallas_pcg_solver = identity_solver
    try:
        f2 = GramFactory(kernel, graphs, normalize=True)
        print(f'b. no-CG gram:         '
              f'{scan_time(lambda t: jnp.sum(f2.gram(t)), theta0):7.2f} ms')
    finally:
        PP.pallas_pcg_solver = orig

    # ---- c. standalone packed launches, maxiter=1 ----
    # capture prepped operands group by group by wrapping the real
    # pallas_pcg_packed
    captured = []
    orig_packed = PP.pallas_pcg_packed
    orig_plain = PP.pallas_pcg

    def cap_packed(*args, **kw):
        captured.append(
            ('packed', [(a.shape, a.dtype) for a in args], kw))
        return orig_packed(*args, **kw)

    def cap_plain(*args, **kw):
        captured.append(
            ('plain', [(a.shape, a.dtype) for a in args], kw))
        return orig_plain(*args, **kw)

    PP.pallas_pcg_packed = cap_packed
    PP.pallas_pcg = cap_plain
    try:
        f3 = GramFactory(kernel, graphs, normalize=True, maxiter=1)
        jax.block_until_ready(jax.jit(f3.gram)(theta0))
    finally:
        PP.pallas_pcg_packed = orig_packed
        PP.pallas_pcg = orig_plain
    print(f'   captured {len(captured)} launches: '
          f'{[(k, s[0][0]) for k, s, _ in captured]}')

    # synthetic operands of the captured shapes; tol microscopic so the
    # while-loop runs exactly its (tiny) maxiter trips
    rng = np.random.default_rng(0)

    def synth(shape, dtype, tiny=False):
        if tiny:
            return jnp.full(shape, 1e-30, dtype=dtype)
        return jnp.asarray(
            np.abs(rng.standard_normal(shape)).astype(dtype) + 0.1)

    ops_list = []
    for kind, shapes, kw in captured:
        arrs = [synth(s, d, tiny=(i == len(shapes) - 1))
                for i, (s, d) in enumerate(shapes)]
        ops_list.append((kind, arrs, kw))

    def launches(theta_log):
        acc = theta_log[0] * 1e-30   # theta-dependent: defeat LICM/CSE
        for kind, a, kw in ops_list:
            T = a[0] + acc * 1e-9      # theta-dependence: defeat CSE
            rest = a[1:]
            fn = orig_packed if kind == 'packed' else orig_plain
            x = fn(T, *rest, **kw)
            acc = acc + jnp.sum(x)
        return acc

    print(f'c. launches (mi as-captured, maxiter={ops_list[0][2].get("maxiter")}): '
          f'{scan_time(launches, theta0):7.2f} ms')

    # ---- d. full gram, maxiter=1 ----
    f4 = GramFactory(kernel, graphs, normalize=True, maxiter=1)
    print(f'd. full gram mi=1:     '
          f'{scan_time(lambda t: jnp.sum(f4.gram(t)), theta0):7.2f} ms')

    # ---- e. full gram production ----
    print(f'e. full gram (prod):   '
          f'{scan_time(lambda t: jnp.sum(factory.gram(t)), theta0):7.2f} ms')
