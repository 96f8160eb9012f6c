"""Fused product-graph PCG in Pallas — the TPU counterpart of the
reference's single-kernel CUDA solver
(``graphdot/cpp/marginalized_kernel.h:189-490``).

The XLA path re-reads the per-pair edge-coupling matrix ``T`` (and the
incidence one-hots) from HBM on every CG iteration; this kernel instead
grids over blocks of pairs, loads each block's operands into VMEM once,
and runs the entire Jacobi-PCG loop in VMEM — HBM traffic drops from
O(iterations x P x M^2) to O(P x M^2), the same trick as the reference's
shared-memory octile cache but at block-of-pairs granularity.

The matvec is the edge-factored form used by the XLA backend:
``out = diag * Y - S1^T (T o (D1 Y D2^T)) S2`` with one-hot incidence
matrices, i.e. four MXU contractions per iteration, batched over the pair
block (Mosaic lowers batched 3-D dot_generals directly).

Precision: the MXU multiplies in bfloat16. Mosaic exposes DEFAULT
(1 pass, ~3 significant digits) and HIGHEST (6-pass double-bfloat16,
f32-exact) but not HIGH. Because one operand of every contraction here is
a 0/1 incidence one-hot — exactly representable in bfloat16 — f32-level
accuracy needs only a 2-pass split of the *general* operand
(x = hi + lo in bfloat16 halves; the one-hot side contributes no rounding
error). That is the default mode ('split2'): ~f32 accuracy at 2 MXU
passes per contraction, vs 3 for XLA HIGH and 6 for HIGHEST. The split
intermediates live in VMEM/registers, so unlike an XLA-level split there
is no extra HBM traffic. Measured on the bench workload (2080 pairs of
24-node molecules, 16 CG iterations): 3.5 ms vs 10.5 ms for the XLA HIGH
loop, at 7.5e-6 relative agreement.
"""
import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _bdot(a, b, ca, cb, precision):
    """Batched (leading-dim) matmul contracting axis ca of a with cb of
    b."""
    return lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision
    )


def _make_mm(mode):
    if mode == 'split2':
        def mm(a, b, ca, cb, general):
            """general = index (0/1) of the non-one-hot operand."""
            if general == 0:
                hi, lo = _split(a)
                return (_bdot(hi, b, ca, cb, lax.Precision.DEFAULT)
                        + _bdot(lo, b, ca, cb, lax.Precision.DEFAULT))
            hi, lo = _split(b)
            return (_bdot(a, hi, ca, cb, lax.Precision.DEFAULT)
                    + _bdot(a, lo, ca, cb, lax.Precision.DEFAULT))
        return mm
    prec = {
        'default': lax.Precision.DEFAULT,
        'highest': lax.Precision.HIGHEST,
    }[mode]

    def mm(a, b, ca, cb, general):
        return _bdot(a, b, ca, cb, prec)
    return mm


# VMEM sizing: v5e exposes 128 MiB of VMEM but XLA's default scoped-vmem
# limit is 16 MiB; pallas_call raises it per-kernel via
# CompilerParams(vmem_limit_bytes=_VMEM_LIMIT). The block-pair chooser
# fills up to _VMEM_BUDGET of estimated working set, capped at
# _MAX_BLOCK_PAIRS pairs per program. Pairs whose working set exceeds
# _RESIDENT_PAIR_LIMIT switch to the streaming kernel (T in HBM).
_VMEM_LIMIT = 100 << 20
# CG steps per while-loop trip in the resident kernels. Measured on
# v5e (128-molecule bench, auto pack): 1 -> 645k pairs/s, 2 -> 676k,
# 3 -> 667k; the win is fewer loop-control + convergence reductions,
# the eventual loss is redundant masked steps after convergence.
_DEFAULT_UNROLL = 2
# progress steps per residual replacement in mode='refine'
_REFINE_UNROLL = 4
_VMEM_BUDGET = 48 << 20
_MAX_BLOCK_PAIRS = 16
_RESIDENT_PAIR_LIMIT = 48 << 20


def _bytes_per_pair(M1, M2, N1, N2):
    """Estimated VMEM working set of one pair: resident operands + CG
    state + the split-operand matvec intermediates (the Hadamard product
    and its bf16 hi/lo halves are all M1 x M2)."""
    return 4 * (
        5 * M1 * M2 + 2 * M1 * N1 + 2 * M2 * N2 + 14 * N1 * N2
        + 2 * M1 * N2 + 2 * N1 * M2
    )


# ---------------------------------------------------------------------------
# pair packing ("lane packing")
#
# Molecule-sized pairs have M, N ~ 16-64 -- far below the 128x128 MXU tile
# and the 128-lane VPU registers, so each batched per-pair matmul wastes
# most of every hardware pass. Packing k pairs *block-diagonally* into one
# "super-pair" (operand dims k*M x k*N) fills the tiles: the union system
# is still symmetric positive definite and block-diagonal, so one CG on it
# solves all k member systems exactly (the iterates never leave the
# diagonal-block support because T, the incidence one-hots, diag, precond
# and b are all block-structured). CG step sizes become shared across the
# k members, which only changes the *path*, not the fixed point; using the
# min of the member tolerances keeps the per-pair accuracy contract
# (sqrt(sum_p r_p^2) < min_p tol_p implies |r_p| < tol_p for every p).
# ---------------------------------------------------------------------------


def _c128(d):
    return -(-d // 128)


def _pack_cost(k, M1, M2, N1, N2):
    """Relative per-pair cost model: MXU 128^3 passes of the 4 matvec
    contractions (one pass ~ 128 cycles) + VPU 8x128 chunks of the
    elementwise work (~4 M-space ops for the Hadamard product and operand
    splits, ~12 N-space ops for the CG vector updates and dots)."""
    mxu = (_c128(k * M1) * _c128(k * N1) * _c128(k * N2)
           + _c128(k * M1) * _c128(k * N2) * _c128(k * M2)
           + _c128(k * N1) * _c128(k * M1) * _c128(k * M2)
           + _c128(k * N1) * _c128(k * M2) * _c128(k * N2))
    vpu = (4 * (-(-k * M1 // 8)) * _c128(k * M2)
           + 12 * (-(-k * N1 // 8)) * _c128(k * N2))
    return (2 * 128 * mxu + vpu) / k


def _best_pack(P, M1, M2, N1, N2):
    best_k, best_cost = 1, _pack_cost(1, M1, M2, N1, N2)
    for k in range(2, 9):
        if k > P:
            break
        if k * max(M1, M2, N1, N2) > 512:
            break
        if _bytes_per_pair(k * M1, k * M2, k * N1, k * N2) > _VMEM_BUDGET:
            break
        cost = _pack_cost(k, M1, M2, N1, N2)
        if cost < best_cost - 1e-9:
            best_k, best_cost = k, cost
    return best_k


def resolve_pack_params(P, M1, M2, N1, N2, pack='auto', interpret=False):
    """Resolve the (pack factor k, block_pairs B, unroll) triple for the
    VMEM-resident kernel, honoring the GRAPHDOT_PALLAS_PACK /
    GRAPHDOT_PALLAS_BLOCK_PAIRS / GRAPHDOT_PALLAS_UNROLL env overrides.
    The single source of truth shared by :func:`pallas_pcg_solver` and
    the executed-FLOP model (``util.flops.gram_flop_report``), so
    reported MXU-executed%% always reflects what actually ran."""
    if pack == 'auto':
        pack = os.environ.get('GRAPHDOT_PALLAS_PACK', 'auto')
    max_block = int(os.environ.get(
        'GRAPHDOT_PALLAS_BLOCK_PAIRS', _MAX_BLOCK_PAIRS))
    unroll = int(os.environ.get('GRAPHDOT_PALLAS_UNROLL', _DEFAULT_UNROLL))
    if pack == 'auto':
        k = 1 if interpret else _best_pack(P, M1, M2, N1, N2)
    else:
        k = max(1, int(pack))
    bpp = _bytes_per_pair(k * M1, k * M2, k * N1, k * N2)
    B = int(max(1, min(max_block, -(-P // k),
                       _VMEM_BUDGET // max(bpp, 1))))
    return k, B, unroll


def _cg_solve_values(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b,
                     tol, maxiter, mode, unroll=1):
    """The batched VMEM-resident Jacobi-PCG loop on materialized values;
    shared by the plain and the packing kernels. ``tol`` is [B, 1, 1].
    ``done`` is carried as a float mask (1.0 = converged): boolean
    vectors in while-loop carries fail Mosaic legalization.

    ``unroll``: CG steps per while-loop trip. The extra steps are
    "light" — they keep the breakdown guard but skip the convergence
    test and its residual-norm reduction, so converged pairs may run up
    to ``unroll - 1`` extra (masked-no-op-on-x) steps; the fixed point
    is unchanged. This trades a bounded amount of redundant arithmetic
    for fewer loop-control + convergence reductions per iteration —
    profitable when the kernel is control-bound (molecule-sized pairs).

    ``mode='refine'``: mixed-precision restarted CG. The recurrence
    runs with single-pass bf16 matvecs (half the MXU work of the
    2-pass 'split2'); every ``unroll``-th step, instead of a recurrence
    update, the TRUE residual ``b - A x`` is recomputed with the
    accurate 2-pass matvec, convergence is tested against it, and the
    search direction restarts from the preconditioned true residual
    (periodic residual replacement). The bf16 recurrence stagnates
    near ~4e-3 relative, but each replacement round re-anchors the
    recurrence at the true residual, so successive rounds multiply the
    reduction — the scheme reaches the same ftol*N contract as
    'split2' at ~1.5 MXU passes per progress step instead of 2
    (measured: equal drift on the bench Gram at the 1e-8 ftol).
    """
    refine = mode == 'refine'
    mm = _make_mm('default' if refine else mode)
    mm_acc = _make_mm('split2') if refine else None

    def matvec_with(mmf, y):
        G = mmf(ohd1, y, 2, 1, 1)        # [B, M1, N2]
        H = mmf(G, ohd2, 2, 2, 0)        # [B, M1, M2]
        Z = T * H
        U = mmf(ohs1, Z, 1, 1, 1)        # [B, N1, M2]
        out = mmf(U, ohs2, 2, 1, 0)      # [B, N1, N2]
        return diag * y - out

    def matvec(y):
        return matvec_with(mm, y)

    def psum(a):
        # [B, N1, N2] -> [B, 1, 1]
        return jnp.sum(jnp.sum(a, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    z0 = precond * b
    rr0 = psum(b * b)
    done0 = (jnp.sqrt(rr0) < tol).astype(jnp.float32)
    state0 = (
        jnp.zeros_like(b),               # x
        b,                               # r
        z0,                              # p
        psum(b * z0),                    # rz [B, 1, 1]
        done0,                           # [B, 1, 1]
        jnp.int32(0),
    )

    def cond(state):
        _, _, _, _, done, it = state
        return (it < maxiter) & (jnp.sum(done) < done.shape[0])

    def cg_step(x, r, p, rz, done, check_conv):
        Ap = matvec(p)
        pAp = psum(p * Ap)
        bad = ((pAp == 0.0) | (rz == 0.0)).astype(jnp.float32)
        live = (1.0 - done) * (1.0 - bad)
        alpha = live * rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond * r
        rz_new = psum(r * z)
        if check_conv:
            rr = psum(r * r)
            conv = (jnp.sqrt(rr) < tol).astype(jnp.float32)
            done_new = jnp.maximum(done, jnp.maximum(bad, conv))
        else:
            done_new = jnp.maximum(done, bad)
        beta = (1.0 - done_new) * rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        rz = done_new * rz + (1.0 - done_new) * rz_new
        return x, r, p, rz, done_new

    def replace_step(x, r, p, rz, done):
        # periodic residual replacement: accurate true residual,
        # convergence test, restart direction (costs one 2-pass
        # matvec and performs no CG update)
        r_true = b - matvec_with(mm_acc, x)
        rr = psum(r_true * r_true)
        conv = (jnp.sqrt(rr) < tol).astype(jnp.float32)
        done_new = jnp.maximum(done, conv)
        keep = done_new
        r = keep * r + (1.0 - keep) * r_true
        z = precond * r_true
        p = keep * p + (1.0 - keep) * z
        rz_new = psum(r_true * z)
        rz = keep * rz + (1.0 - keep) * rz_new
        return x, r, p, rz, done_new

    if refine:
        def body(state):
            x, r, p, rz, done, it = state
            for _ in range(unroll):
                x, r, p, rz, done = cg_step(x, r, p, rz, done,
                                            check_conv=False)
            x, r, p, rz, done = replace_step(x, r, p, rz, done)
            return (x, r, p, rz, done, it + unroll)
    else:
        def body(state):
            x, r, p, rz, done, it = state
            for _ in range(unroll - 1):
                x, r, p, rz, done = cg_step(x, r, p, rz, done,
                                            check_conv=False)
            x, r, p, rz, done = cg_step(x, r, p, rz, done,
                                        check_conv=True)
            return (x, r, p, rz, done, it + unroll)

    x, _, _, _, _, _ = lax.while_loop(cond, body, state0)
    return x


def _pcg_kernel(T_ref, ohs1_ref, ohd1_ref, ohs2_ref, ohd2_ref,
                diag_ref, precond_ref, b_ref, tol_ref, maxiter_ref,
                x_ref, *, mode, unroll=1):
    x_ref[:] = _cg_solve_values(
        T_ref[:], ohs1_ref[:], ohd1_ref[:], ohs2_ref[:], ohd2_ref[:],
        diag_ref[:], precond_ref[:], b_ref[:],
        tol_ref[:, :, 0:1], maxiter_ref[0], mode, unroll=unroll
    )


def _pcg_pack_kernel(T_ref, ohs1_ref, ohd1_ref, ohs2_ref, ohd2_ref,
                     diag_ref, precond_ref, b_ref, tol_ref,
                     maxiter_ref, x_ref,
                     Tp, s1p, d1p, s2p, d2p, dgp, pcp, bp,
                     *, mode, k, unroll=1):
    """Resident kernel with in-VMEM block-diagonal pair packing.

    Inputs arrive compact ([B, k, ...] — one slot per packed member);
    the packed operands are assembled into zeroed VMEM scratch with k
    static diagonal-block writes. Compared to packing at the XLA level
    this removes the k-times HBM blowup of the packed zeros entirely:
    HBM traffic stays at the compact operand size while the MXU still
    sees full [k*M, k*N] tiles. The solution is likewise emitted
    compact.
    """
    B, _, M1, M2 = T_ref.shape
    N1 = ohs1_ref.shape[3]
    N2 = ohs2_ref.shape[3]

    # The packed scratch is written in the same diagonal-block pattern by
    # every grid program, so the off-diagonal zeros survive from program
    # to program: zero the scratch once, in the first program, instead of
    # per program (TPU grid programs run sequentially on one core and
    # scratch persists across them — the standard Pallas accumulator
    # idiom). On the bench workload the per-program zero-fill was a
    # measurable slice of the ~2.5 ms non-iteration kernel cost.
    @pl.when(pl.program_id(0) == 0)
    def _zero_scratch():
        for ref in (Tp, s1p, d1p, s2p, d2p, dgp, pcp, bp):
            ref[:] = jnp.zeros_like(ref)

    for i in range(k):
        r1 = slice(i * M1, (i + 1) * M1)
        r2 = slice(i * M2, (i + 1) * M2)
        c1 = slice(i * N1, (i + 1) * N1)
        c2 = slice(i * N2, (i + 1) * N2)
        Tp[:, r1, r2] = T_ref[:, i]
        s1p[:, r1, c1] = ohs1_ref[:, i]
        d1p[:, r1, c1] = ohd1_ref[:, i]
        s2p[:, r2, c2] = ohs2_ref[:, i]
        d2p[:, r2, c2] = ohd2_ref[:, i]
        dgp[:, c1, c2] = diag_ref[:, i]
        pcp[:, c1, c2] = precond_ref[:, i]
        bp[:, c1, c2] = b_ref[:, i]

    x = _cg_solve_values(
        Tp[:], s1p[:], d1p[:], s2p[:], d2p[:], dgp[:], pcp[:], bp[:],
        tol_ref[:, :, 0:1], maxiter_ref[0], mode, unroll=unroll
    )
    for i in range(k):
        x_ref[:, i] = x[:, i * N1:(i + 1) * N1, i * N2:(i + 1) * N2]


def pallas_pcg_solver(T, ohs1, ohd1, ohs2, ohd2, diag, precond, tol,
                      maxiter, mode='split2', pack='auto'):
    """Returns a ``solve(b_flat)`` closure over the system operands, for
    use as the primal/tangent solver inside ``lax.custom_linear_solve``,
    or ``None`` when the pair working set exceeds even the streaming
    kernel's VMEM-resident part — the caller then falls back to the XLA
    PCG. Molecule-scale pairs run the fully VMEM-resident kernel (with
    pair-count padding and block-diagonal pair packing: ``pack='auto'``
    chooses the MXU-cost-optimal factor, an int forces it, interpret mode
    defaults to 1 since packing only pays on the MXU); protein-scale
    pairs (working set > ~48 MB) run the product-dimension-blocked
    streaming kernel instead (see :func:`pallas_pcg_stream`)."""
    P = T.shape[0]
    M1, M2 = T.shape[-2:]
    N1, N2 = diag.shape[-2:]
    interpret = jax.default_backend() != 'tpu'
    force_stream = bool(os.environ.get('GRAPHDOT_PALLAS_STREAM'))
    if (force_stream
            or _bytes_per_pair(M1, M2, N1, N2) > _RESIDENT_PAIR_LIMIT):
        return _stream_solver(
            T, ohs1, ohd1, ohs2, ohd2, diag, precond, tol, maxiter,
            # the streaming kernel has no refine loop; split2 gives the
            # same accuracy contract
            mode='split2' if mode == 'refine' else mode,
            interpret=interpret
        )
    k, B, unroll = resolve_pack_params(
        P, M1, M2, N1, N2, pack=pack, interpret=interpret)
    if mode == 'refine':
        if 'GRAPHDOT_PALLAS_UNROLL' not in os.environ:
            # under refine, `unroll` is the number of 1-pass progress
            # steps per accurate residual replacement: 4 amortizes the
            # 2-pass replacement matvec to ~1.5 passes per progress
            # step
            unroll = _REFINE_UNROLL
        if 'GRAPHDOT_PALLAS_BLOCK_PAIRS' not in os.environ:
            # the replacement matvec adds a second set of in-flight
            # matvec temporaries on top of the recurrence's; shrink
            # the block so the real VMEM working set stays within the
            # split2-calibrated budget
            B = max(1, (2 * B) // 3)
    P_pad = -(-P // (k * B)) * (k * B)

    def _pad(a):
        return jnp.pad(a, [(0, P_pad - P)] + [(0, 0)] * (a.ndim - 1))

    def _group(a):
        a = _pad(a)
        return a.reshape(P_pad // k, k, *a.shape[1:])

    tol_p = jnp.pad(tol, (0, P_pad - P), constant_values=1.0)
    # the union system has k x the dof; scale the iteration bound
    maxiter_k = min(maxiter * k, 16384)

    if k == 1:
        ops = tuple(_pad(a) for a in (T, ohs1, ohd1, ohs2, ohd2,
                                      diag, precond))

        def solve(b_flat):
            b = _pad(b_flat.reshape(P, N1, N2))
            x = pallas_pcg(
                *ops, b, tol_p,
                block_pairs=B, maxiter=maxiter_k, interpret=interpret,
                mode=mode, unroll=unroll
            )
            return x[:P].reshape(P, N1 * N2)

        return solve

    ops = tuple(_group(a) for a in (T, ohs1, ohd1, ohs2, ohd2,
                                    diag, precond))
    # min over packed members: the combined residual norm then bounds
    # every member's residual by its own tolerance
    tol_g = jnp.min(tol_p.reshape(P_pad // k, k), axis=1)

    def solve(b_flat):
        b = _group(b_flat.reshape(P, N1, N2))
        x = pallas_pcg_packed(
            *ops, b, tol_g,
            block_pairs=B, k=k, maxiter=maxiter_k,
            interpret=interpret, mode=mode, unroll=unroll
        )
        return x.reshape(P_pad, N1, N2)[:P].reshape(P, N1 * N2)

    return solve


@functools.partial(
    jax.jit,
    static_argnames=('block_pairs', 'maxiter', 'interpret', 'mode',
                     'unroll')
)
def pallas_pcg(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b, tol,
               block_pairs=16, maxiter=1024, interpret=False,
               mode='split2', unroll=1):
    """Solve the batched product-graph systems with the fused kernel.

    Parameters
    ----------
    T: [P, M1, M2] edge-coupling matrices (zero rows/cols for padding).
    ohs1, ohd1: [P, M1, N1] one-hot incidence matrices of side 1.
    ohs2, ohd2: [P, M2, N2] one-hot incidence matrices of side 2.
    diag, precond, b: [P, N1, N2] diagonal coefficient, Jacobi
        preconditioner, and right-hand side on the product space.
    tol: [P] absolute residual-norm thresholds.
    block_pairs: pairs per Pallas program (VMEM working set knob).
    maxiter: static CG iteration bound.
    mode: 'split2' (2-pass, ~f32, default) | 'default' | 'highest'.

    Returns
    -------
    x: [P, N1, N2]
    """
    P, M1, M2 = T.shape
    N1, N2 = diag.shape[-2:]
    B = block_pairs
    assert P % B == 0, f'P={P} not a multiple of block_pairs={B}'
    grid = (P // B,)

    def specs(shape):
        return pl.BlockSpec(
            (B, *shape), lambda i: (i, *([0] * len(shape))),
            memory_space=pltpu.VMEM
        )

    maxiter_arr = jnp.full((1,), maxiter, dtype=jnp.int32)
    tol = jnp.broadcast_to(tol[:, None, None], (P, 1, 128))

    passes = {'split2': 2, 'default': 1, 'highest': 6,
              'refine': 1.5}[mode]
    flops_matvec = 2 * B * (M1 * N1 * N2 + M1 * M2 * N2 + N1 * M1 * M2
                            + N1 * M2 * N2) * passes

    return pl.pallas_call(
        functools.partial(_pcg_kernel, mode=mode, unroll=unroll),
        grid=grid,
        in_specs=[
            specs((M1, M2)),         # T
            specs((M1, N1)),         # ohs1
            specs((M1, N1)),         # ohd1
            specs((M2, N2)),         # ohs2
            specs((M2, N2)),         # ohd2
            specs((N1, N2)),         # diag
            specs((N1, N2)),         # precond
            specs((N1, N2)),         # b
            specs((1, 128)),         # tol (lane-replicated)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # maxiter
        ],
        out_specs=specs((N1, N2)),
        out_shape=jax.ShapeDtypeStruct((P, N1, N2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_matvec * 32),
            bytes_accessed=4 * B * (M1 * M2 + 2 * M1 * N1 + 2 * M2 * N2
                                    + 4 * N1 * N2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b, tol, maxiter_arr)


# ---------------------------------------------------------------------------
# protein-scale streaming kernel
#
# For large product spaces (n1*n2 ~ 1e4-1e6; the reference's protein
# workload, example/perfbench/protein-time-to-solution.py) a single pair's
# operands no longer fit in VMEM — dominated by the M1 x M2 edge-coupling
# matrix T (e.g. 2560^2 f32 = 26 MB). The streaming kernel blocks the
# product dimension the way the reference streams octiles through shared
# memory under a budget (marginalized_kernel.h:157-161): one pair per
# (sequential) grid program, CG state + incidence one-hots resident in
# VMEM, and T double-buffer-DMA'd from HBM in TM-row tiles inside the
# matvec. HBM traffic is T once per CG iteration (unavoidable: T cannot
# be resident) while every intermediate stays on-chip; converged pairs
# exit their while-loop early, so the grid never rides along with the
# slowest pair the way a batched XLA solve does.
# ---------------------------------------------------------------------------


def _mm2(a, b, ca, cb, general, mode):
    """2-D matmul contracting axis ca of a with cb of b, with the same
    precision modes as the batched ``_make_mm`` (the ``general`` operand
    is the non-one-hot side that needs the bf16 hi/lo split)."""
    def dot(x, y, prec):
        return lax.dot_general(
            x, y, (((ca,), (cb,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec
        )
    if mode == 'split2':
        if general == 0:
            hi, lo = _split(a)
            return (dot(hi, b, lax.Precision.DEFAULT)
                    + dot(lo, b, lax.Precision.DEFAULT))
        hi, lo = _split(b)
        return (dot(a, hi, lax.Precision.DEFAULT)
                + dot(a, lo, lax.Precision.DEFAULT))
    prec = {
        'default': lax.Precision.DEFAULT,
        'highest': lax.Precision.HIGHEST,
    }[mode]
    return dot(a, b, prec)


def _pcg_stream_kernel(T_hbm, ohs1_ref, ohd1_ref, ohs2_ref, ohd2_ref,
                       diag_ref, precond_ref, b_ref, tol_ref,
                       maxiter_ref, x_ref, Tbuf, sem, *, mode, tile_m):
    i = pl.program_id(0)
    M1 = ohs1_ref.shape[1]
    M2 = ohs2_ref.shape[1]
    n_tiles = M1 // tile_m

    ohs2 = ohs2_ref[0]
    ohd2 = ohd2_ref[0]
    diag = diag_ref[0]
    precond = precond_ref[0]
    b = b_ref[0]
    tol = tol_ref[i, 0]
    maxiter = maxiter_ref[0]

    def tile_dma(slot, t):
        # T is passed flattened to [P*M1, M2]: Mosaic miscompiles HBM
        # memref slices with two dynamic offsets (pair + row tile), but a
        # single dynamic row offset into a 2-D memref is solid
        return pltpu.make_async_copy(
            T_hbm.at[pl.ds(i * M1 + t * tile_m, tile_m), :],
            Tbuf.at[slot],
            sem.at[slot],
        )

    def matvec(y):
        tile_dma(0, 0).start()

        def body(t, U):
            slot = t % 2

            @pl.when(t + 1 < n_tiles)
            def _():
                tile_dma((t + 1) % 2, t + 1).start()

            tile_dma(slot, t).wait()
            d1_t = ohd1_ref[0, pl.ds(t * tile_m, tile_m), :]
            s1_t = ohs1_ref[0, pl.ds(t * tile_m, tile_m), :]
            G = _mm2(d1_t, y, 1, 0, general=1, mode=mode)   # [TM, N2]
            H = _mm2(G, ohd2, 1, 1, general=0, mode=mode)   # [TM, M2]
            Z = Tbuf[slot] * H
            return U + _mm2(s1_t, Z, 0, 0, general=1, mode=mode)

        N1 = diag.shape[0]
        U = lax.fori_loop(
            0, n_tiles, body,
            jnp.zeros((N1, M2), dtype=jnp.float32)
        )
        out = _mm2(U, ohs2, 1, 0, general=0, mode=mode)     # [N1, N2]
        return diag * y - out

    # scalar-carried Jacobi-PCG; float flags (bool while-carries are
    # fragile under Mosaic legalization)
    z0 = precond * b
    rr0 = jnp.sum(b * b)
    done0 = (jnp.sqrt(rr0) < tol).astype(jnp.float32)
    state0 = (
        jnp.zeros_like(b),           # x
        b,                           # r
        z0,                          # p
        jnp.sum(b * z0),             # rz
        done0,
        jnp.int32(0),
    )

    def cond(state):
        _, _, _, _, done, it = state
        return (it < maxiter) & (done < 0.5)

    def body(state):
        x, r, p, rz, done, it = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        bad = ((pAp == 0.0) | (rz == 0.0)).astype(jnp.float32)
        live = (1.0 - done) * (1.0 - bad)
        alpha = live * rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond * r
        rz_new = jnp.sum(r * z)
        rr = jnp.sum(r * r)
        conv = (jnp.sqrt(rr) < tol).astype(jnp.float32)
        done_new = jnp.maximum(done, jnp.maximum(bad, conv))
        beta = (1.0 - done_new) * rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        rz = done_new * rz + (1.0 - done_new) * rz_new
        return (x, r, p, rz, done_new, it + 1)

    x, _, _, _, _, _ = lax.while_loop(cond, body, state0)
    x_ref[0] = x


# the streaming kernel is sized against the 100 MB scoped VMEM: unlike
# the resident kernel it runs one big pair per program, so there is no
# block_pairs knob to absorb estimate error. Leave ~28% headroom: at
# M ~ 5k, N ~ 344 (the categorical-edge niche class) the compiler's
# actual stack allocation ran ~18 MB above the _stream_bytes model
# (while-carry duplication + matvec temporaries), OOMing the 88 MB
# budget that molecule/150-300res shapes tolerated.
_STREAM_BUDGET = 72 << 20


def _stream_bytes(M1, M2, N1, N2, tile_m):
    """VMEM working set of the streaming kernel. Pallas double-buffers
    every VMEM-blocked input/output across grid programs, hence the x2 on
    the per-pair blocks; CG state lives in while-loop carries and the U
    accumulator + split halves are matvec temporaries."""
    blocks = 2 * (2 * M1 * N1 + 2 * M2 * N2 + 4 * N1 * N2)
    state = 8 * N1 * N2
    accum = 3 * N1 * M2                 # U + bf16 hi/lo halves
    tiles = (2 + 3) * tile_m * M2 + 3 * tile_m * N2
    return 4 * (blocks + state + accum + tiles)


def _pick_tile_m(M1, M2, N1, N2):
    """Largest power-of-two row tile (>= 8) that keeps the streaming
    working set within budget; None if even the smallest tile busts it."""
    tile_m = 1 << max(3, min(9, (M1 - 1).bit_length() - 1))
    while tile_m > 8 and _stream_bytes(
            M1, M2, N1, N2, tile_m) > _STREAM_BUDGET:
        tile_m //= 2
    if _stream_bytes(M1, M2, N1, N2, tile_m) > _STREAM_BUDGET:
        return None
    return tile_m


def _make_stream_call(maxiter, tile_m, interpret, mode):
    """The streaming kernel behind a custom vmap rule: Pallas's native
    batching rule would try to block the HBM-resident (ANY-space) T
    operand, which Mosaic rejects. Instead a batch axis (e.g. vmapped
    MCMC chains driving protein-scale Grams) is folded into the pair
    axis — batched operands reshape for free, unbatched ones broadcast —
    so the grid simply runs C-times-P sequential pair programs at the
    kernel's native shapes. (A lax.map over per-member kernel calls was
    tried first: the dynamic-slice fusions XLA builds around each call
    exceed the 16 MB scoped-vmem limit at protein operand sizes.)"""

    @jax.custom_batching.custom_vmap
    def call(T, s1, d1, s2, d2, dg, pc, b, tol):
        return pallas_pcg_stream(
            T, s1, d1, s2, d2, dg, pc, b, tol,
            maxiter=maxiter, tile_m=tile_m, interpret=interpret,
            mode=mode
        )

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        C = axis_size

        # Common case (vmapped chains over a fixed graph set): the heavy
        # solver operands — T (HBM-resident, ~MBs/pair), one-hots — are
        # closed-over constants and only diag/precond/b/tol carry the
        # batch axis. Scanning the members reuses the constants in place
        # instead of materializing C physical copies (which would
        # multiply the HBM footprint C-fold). The grid runs pair
        # programs sequentially either way, so the scan costs no
        # parallelism.
        if not any(in_batched[:5]):
            light = args[5:]
            light_batched = in_batched[5:]
            moving = tuple(
                a for a, ib in zip(light, light_batched) if ib)

            def member(_, slices):
                cursor = iter(slices)
                full = [
                    next(cursor) if ib else a
                    for a, ib in zip(light, light_batched)
                ]
                return None, call(*args[:5], *full)

            _, out = jax.lax.scan(member, None, moving)
            return out, True

        # General case: fold the batch axis into the pair axis (batched
        # operands reshape for free; unbatched ones replicate).
        def fold(a, ib):
            if ib:
                return a.reshape(C * a.shape[1], *a.shape[2:])
            return jnp.broadcast_to(
                a[None], (C, *a.shape)
            ).reshape(C * a.shape[0], *a.shape[1:])

        out = call(*[fold(a, ib) for a, ib in zip(args, in_batched)])
        return out.reshape(C, -1, *out.shape[1:]), True

    return call


def _stream_solver(T, ohs1, ohd1, ohs2, ohd2, diag, precond, tol,
                   maxiter, mode, interpret):
    P, M1, M2 = T.shape
    N1, N2 = diag.shape[-2:]
    # M2 is the lane dimension of the HBM-resident T: Mosaic requires
    # 128-lane alignment to slice it with a dynamic row offset. Padding
    # adds zero one-hot rows on side 2, which contribute nothing.
    M2p = -(-M2 // 128) * 128
    tile_m = _pick_tile_m(M1, M2p, N1, N2)
    if tile_m is None:
        return None
    M1p = -(-M1 // tile_m) * tile_m

    def _pad(a, rows, cols):
        return jnp.pad(a, ((0, 0), (0, rows), (0, cols)))

    Tp = _pad(T, M1p - M1, M2p - M2)
    ohs1p = _pad(ohs1, M1p - M1, 0)
    ohd1p = _pad(ohd1, M1p - M1, 0)
    ohs2p = _pad(ohs2, M2p - M2, 0)
    ohd2p = _pad(ohd2, M2p - M2, 0)
    call = _make_stream_call(maxiter, tile_m, interpret, mode)

    def solve(b_flat):
        b = b_flat.reshape(P, N1, N2)
        x = call(Tp, ohs1p, ohd1p, ohs2p, ohd2p, diag, precond, b, tol)
        return x.reshape(P, N1 * N2)

    return solve


@functools.partial(
    jax.jit,
    static_argnames=('maxiter', 'tile_m', 'interpret', 'mode')
)
def pallas_pcg_stream(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b, tol,
                      maxiter=1024, tile_m=512, interpret=False,
                      mode='split2'):
    """Solve protein-scale product-graph systems with the streaming
    fused kernel: one pair per grid program, T streamed from HBM in
    ``tile_m``-row tiles.

    Parameters as :func:`pallas_pcg`, except ``T``/``ohs1``/``ohd1``
    must have M1 divisible by ``tile_m`` (zero-pad rows; zero one-hot
    rows contribute nothing).
    """
    P, M1, M2 = T.shape
    N1, N2 = diag.shape[-2:]
    assert M1 % tile_m == 0, f'M1={M1} not a multiple of tile_m={tile_m}'
    # 2-D layout for the HBM-resident T (see tile_dma in the kernel)
    T = T.reshape(P * M1, M2)

    def vspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1, *shape), lambda i: (i, *([0] * nd)),
            memory_space=pltpu.VMEM
        )

    maxiter_arr = jnp.full((1,), maxiter, dtype=jnp.int32)
    tol2d = tol[:, None].astype(jnp.float32)

    passes = {'split2': 2, 'default': 1, 'highest': 6,
              'refine': 1.5}[mode]
    flops_matvec = 2 * (M1 * N1 * N2 + M1 * M2 * N2 + N1 * M1 * M2
                        + N1 * M2 * N2) * passes

    return pl.pallas_call(
        functools.partial(
            _pcg_stream_kernel, mode=mode, tile_m=tile_m),
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # T stays in HBM
            vspec(M1, N1),           # ohs1
            vspec(M1, N1),           # ohd1
            vspec(M2, N2),           # ohs2
            vspec(M2, N2),           # ohd2
            vspec(N1, N2),           # diag
            vspec(N1, N2),           # precond
            vspec(N1, N2),           # b
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tol [P, 1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # maxiter
        ],
        out_specs=vspec(N1, N2),
        out_shape=jax.ShapeDtypeStruct((P, N1, N2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_m, M2), jnp.float32),   # T double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(flops_matvec * 32),
            bytes_accessed=4 * (32 * M1 * M2 + 2 * M1 * N1
                                + 2 * M2 * N2 + 4 * N1 * N2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b, tol2d, maxiter_arr)


@functools.partial(
    jax.jit,
    static_argnames=('block_pairs', 'k', 'maxiter', 'interpret', 'mode',
                     'unroll')
)
def pallas_pcg_packed(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b, tol,
                      block_pairs=16, k=4, maxiter=1024,
                      interpret=False, mode='split2', unroll=1):
    """Solve with block-diagonal pair packing assembled inside the
    kernel. All operands carry a compact member axis: T [S, k, M1, M2],
    one-hots [S, k, M, N], diag/precond/b [S, k, N1, N2], tol [S] (the
    min over each group's members). Returns x [S, k, N1, N2].
    """
    S = T.shape[0]
    M1, M2 = T.shape[-2:]
    N1, N2 = diag.shape[-2:]
    B = block_pairs
    assert S % B == 0, f'S={S} not a multiple of block_pairs={B}'
    grid = (S // B,)

    def specs(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (B, k, *shape), lambda i: (i, 0, *([0] * nd)),
            memory_space=pltpu.VMEM
        )

    maxiter_arr = jnp.full((1,), maxiter, dtype=jnp.int32)
    tol = jnp.broadcast_to(tol[:, None, None], (S, 1, 128))

    passes = {'split2': 2, 'default': 1, 'highest': 6,
              'refine': 1.5}[mode]
    kM1, kM2, kN1, kN2 = k * M1, k * M2, k * N1, k * N2
    flops_matvec = 2 * B * (kM1 * kN1 * kN2 + kM1 * kM2 * kN2
                            + kN1 * kM1 * kM2 + kN1 * kM2 * kN2) * passes

    # INVARIANT: the grid dimension must stay SEQUENTIAL (the default —
    # do not add dimension_semantics=('parallel',) here). The kernel
    # zeroes its packed scratch only in program 0 and relies on the
    # off-diagonal zeros persisting across grid programs on one core; a
    # 'parallel' grid (e.g. Megacore partitioning on v4/v5p) would give
    # each core its own scratch and cores not running program 0 would
    # read garbage off-diagonal blocks, silently corrupting solves.
    return pl.pallas_call(
        functools.partial(_pcg_pack_kernel, mode=mode, k=k,
                          unroll=unroll),
        grid=grid,
        in_specs=[
            specs(M1, M2),           # T (compact)
            specs(M1, N1),           # ohs1
            specs(M1, N1),           # ohd1
            specs(M2, N2),           # ohs2
            specs(M2, N2),           # ohd2
            specs(N1, N2),           # diag
            specs(N1, N2),           # precond
            specs(N1, N2),           # b
            pl.BlockSpec((B, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # tol
            pl.BlockSpec(memory_space=pltpu.SMEM),   # maxiter
        ],
        out_specs=specs(N1, N2),
        out_shape=jax.ShapeDtypeStruct((S, k, N1, N2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, kM1, kM2), jnp.float32),   # Tp
            pltpu.VMEM((B, kM1, kN1), jnp.float32),   # s1p
            pltpu.VMEM((B, kM1, kN1), jnp.float32),   # d1p
            pltpu.VMEM((B, kM2, kN2), jnp.float32),   # s2p
            pltpu.VMEM((B, kM2, kN2), jnp.float32),   # d2p
            pltpu.VMEM((B, kN1, kN2), jnp.float32),   # dgp
            pltpu.VMEM((B, kN1, kN2), jnp.float32),   # pcp
            pltpu.VMEM((B, kN1, kN2), jnp.float32),   # bp
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(flops_matvec * 32),
            bytes_accessed=4 * B * k * (M1 * M2 + 2 * M1 * N1
                                        + 2 * M2 * N2 + 4 * N1 * N2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(T, ohs1, ohd1, ohs2, ohd2, diag, precond, b, tol, maxiter_arr)
