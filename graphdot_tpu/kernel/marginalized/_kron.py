"""Sum-of-Kronecker MLGK solver for protein-scale pairs.

The edge-factored matvec ``S1^T (T o (D1 Y D2^T)) S2`` couples the two
graphs through the M1 x M2 edge-kernel matrix ``T`` — at protein scale
(M ~ 1e4 directed contacts) T reaches GBs per pair and the solve is
HBM-bandwidth-bound no matter how it is scheduled (the streaming Pallas
kernel re-reads T once per CG iteration).

For the workload the reference's protein benchmark actually runs
(``example/perfbench/protein-time-to-solution.py``: contact maps whose
edges carry ONE scalar feature, the residue distance), T has low
*numerical* rank: ``T[e1, e2] = w1 w2 k_edge(x[e1], y[e2])`` is a smooth
kernel of two scalars, so Chebyshev interpolation gives

    k(x, y) ~= sum_{p,q} L_p(x) C_pq L_q(y),   C_pq = k(t_p, t_q)

with R ~ 16-48 nodes at near-machine precision. Substituting collapses
the edge space entirely:

    offdiag(Y) = sum_p A1_p Y B_p^T,   B_p = sum_q C_pq A2_q
    A1_p[i, j] = sum_{e: src=i, dst=j} w[e] L_p(x[e])

— R dense node-space [N, N] matmuls per matvec: no T, no edge-space
operands, every FLOP on the MXU at tile-friendly sizes. Per CG
iteration this is R*(N1^2 N2 + N1 N2^2) FLOPs vs the edge path's
~2*M1*M2*(N1+N2): ~10x fewer at 300 residues, ~50x at 1000, with HBM
traffic dropping from O(M1*M2) to O(R*N^2).

All theta-dependence sits in the R x R matrix ``C``; the Chebyshev
basis values and the scatter pattern of the A-stacks are data. Pairs
are solved in chunks (``lax.map``) so the [chunk, R, N, N] A-stacks
bound memory instead of scaling with the full pair batch.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Chebyshev nodes for the edge-kernel interpolation. 32 first-kind
# nodes interpolate the bench's SquareExponential(3.0) over a ~30 A
# contact-length domain to ~1e-7 relative; sharper kernels (small
# length scale relative to the data range) need more — the runtime
# diagnostic `factorization_error` measures the actual residual.
DEFAULT_RANK = int(os.environ.get('GRAPHDOT_KRON_RANK', 32))


def kron_eligible(ops):
    """The Kronecker path applies when each side carries exactly one
    plain scalar edge-feature column (the contact-map shape)."""
    f1 = ops.get('edge_elist_feats_1')
    f2 = ops.get('edge_elist_feats_2')
    if not f1 or not f2 or len(f1) != 1 or len(f2) != 1:
        return False
    (v1,) = f1.values()
    (v2,) = f2.values()
    return (not isinstance(v1, tuple) and not isinstance(v2, tuple)
            and np.ndim(v1) == 2 and np.ndim(v2) == 2)


def _cheb_nodes(lo, hi, R):
    """First-kind Chebyshev nodes on [lo, hi] and their barycentric
    weights (O'Neill/Trefethen form; scale-invariant up to a common
    factor that cancels in the barycentric ratio)."""
    i = jnp.arange(R, dtype=jnp.float32)
    ang = jnp.pi * (2 * i + 1) / (2 * R)
    t = (lo + hi) / 2 + (hi - lo) / 2 * jnp.cos(ang)
    w = (-1.0) ** i * jnp.sin(ang)
    return t, w


def _cheb_basis(x, t, w):
    """Barycentric Lagrange basis values L_p(x): [..., R]. Exact hits
    x == t_p resolve to the one-hot row (the 0/0 limit)."""
    d = x[..., None] - t                        # [..., R]
    hit = d == 0.0
    any_hit = jnp.any(hit, axis=-1, keepdims=True)
    ratio = w / jnp.where(hit, 1.0, d)
    L_smooth = ratio / jnp.sum(ratio, axis=-1, keepdims=True)
    return jnp.where(any_hit, hit.astype(x.dtype), L_smooth)


def _feature_domain(x1, ew1, x2, ew2):
    """Joint range of the real (weight-carrying) edge features of both
    sides; padding edges (w == 0) are excluded."""
    big = jnp.float32(3e38)

    def lohi(x, ew):
        real = ew != 0
        lo = jnp.min(jnp.where(real, x, big))
        hi = jnp.max(jnp.where(real, x, -big))
        return lo, hi

    lo1, hi1 = lohi(x1, ew1)
    lo2, hi2 = lohi(x2, ew2)
    lo = jnp.minimum(lo1, lo2)
    hi = jnp.maximum(hi1, hi2)
    lo = jnp.minimum(lo, hi)                    # empty-graph guard
    hi = jnp.where(hi - lo < 1e-6, lo + 1.0, hi)
    return lo, hi


def _edge_kernel_grid(apply_on_features, kedge, te, feats_name, t):
    """C[p, q] = k_edge(t_p, t_q) on the Chebyshev grid."""
    X = {feats_name: t[:, None]}
    Y = {feats_name: t[None, :]}
    return apply_on_features(kedge, te, X, Y)


def _assemble_stack(esrc, edst, ew, L, n_pad):
    """A_p[i, j] = sum_{e: src=i, dst=j} w[e] L_p(x[e]) for one side of
    a chunk: esrc/edst [c, M], ew [c, M], L [c, M, R] -> [c, R, N, N].
    Padding edges carry w = 0 and scatter nothing."""
    c, M, R = L.shape
    A = jnp.zeros((c, R, n_pad, n_pad), dtype=jnp.float32)
    vals = jnp.swapaxes(ew[:, :, None] * L, 1, 2)     # [c, R, M]
    ci = jnp.arange(c)[:, None, None]
    ri = jnp.arange(R)[None, :, None]
    return A.at[ci, ri, esrc[:, None, :], edst[:, None, :]].add(vals)


def factorization_error(apply_on_features, kedge, te, feats_name,
                        x1, ew1, x2, ew2, R=DEFAULT_RANK,
                        n_sample=1024, seed=0):
    """Max |k(x, y) - Chebyshev approx| over a random sample of real
    edge pairs — the runtime accuracy diagnostic for the Kronecker
    path (per-batch, any shapes)."""
    lo, hi = _feature_domain(x1, ew1, x2, ew2)
    t, w = _cheb_nodes(lo, hi, R)
    C = _edge_kernel_grid(apply_on_features, kedge, te, feats_name, t)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    xs = jnp.clip(jax.random.choice(k1, x1.reshape(-1), (n_sample,)),
                  lo, hi)
    ys = jnp.clip(jax.random.choice(k2, x2.reshape(-1), (n_sample,)),
                  lo, hi)
    exact = apply_on_features(
        kedge, te, {feats_name: xs}, {feats_name: ys})
    approx = jnp.einsum(
        'sp,pq,sq->s', _cheb_basis(xs, t, w), C,
        _cheb_basis(ys, t, w))
    return jnp.max(jnp.abs(exact - approx))


def kron_mlgk_solve(theta_ops, *, apply_on_features, kedge, te,
                    feats_name, maxiter, rank=None, chunk=None,
                    solve_linear=None, return_resnorm=False,
                    return_iters=False):
    """Solve the batched MLGK systems with the sum-of-Kronecker matvec.

    ``theta_ops`` carries the already-computed N-space operands
    (diag_coef, precond_diag, b, valid masks, tol) plus the raw edge
    lists (esrc/edst/ew [P, M]) and the scalar feature columns
    (x1/x2 [P, M]); see the call site in ``mlgk_solve``.

    Returns x [P, n1, n2] (and, with ``return_resnorm``, the per-pair
    relative residual of the factorized operator).
    """
    R = rank or DEFAULT_RANK
    esrc1, edst1, ew1 = (theta_ops[k] for k in
                         ('esrc_1', 'edst_1', 'ew_1'))
    esrc2, edst2, ew2 = (theta_ops[k] for k in
                         ('esrc_2', 'edst_2', 'ew_2'))
    x1, x2 = theta_ops['x_1'], theta_ops['x_2']
    diag = theta_ops['diag']                  # [P, n1, n2]
    precond = theta_ops['precond']
    b = theta_ops['b']
    tol = theta_ops['tol']                    # [P]

    P, n1, n2 = diag.shape
    # chunk size: bound the [c, R, N, N] A-stacks (both sides) to
    # ~1.5 GB of HBM. Preferring one big chunk also avoids nesting a
    # while-loop CG inside lax.map, which the dev harness's TPU worker
    # is fragile against (ROADMAP known-issue 1).
    if chunk is None:
        budget = int(os.environ.get('GRAPHDOT_KRON_CHUNK_BYTES',
                                    3 << 29))
        chunk = int(max(1, min(
            P, budget // (4 * R * max(n1, n2) ** 2 * 2))))
        # balance the chunks (P=66 at cap 63 should run 2x33, not
        # 63 + 3-real-pairs-plus-60-phantoms)
        chunk = -(-P // (-(-P // chunk)))
    P_pad = -(-P // chunk) * chunk

    lo, hi = _feature_domain(x1, ew1, x2, ew2)
    t, w = _cheb_nodes(lo, hi, R)
    C = _edge_kernel_grid(apply_on_features, kedge, te, feats_name, t)

    # clamp into the interpolation domain before evaluating the basis:
    # padding edges carry feature 0, which can sit far OUTSIDE
    # [lo, hi], where the barycentric denominator suffers catastrophic
    # cancellation (inf/NaN that even the ew = 0 weight cannot kill,
    # since NaN * 0 = NaN). Real features lie inside by construction,
    # so the clamp is the identity for them.
    L1 = _cheb_basis(jnp.clip(x1, lo, hi), t, w)   # [P, M1, R]
    L2 = _cheb_basis(jnp.clip(x2, lo, hi), t, w)

    def _pad(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((P_pad - P, *a.shape[1:]), fill, a.dtype)]
        ) if P_pad != P else a

    def _chunks(a):
        return a.reshape(P_pad // chunk, chunk, *a.shape[1:])

    ops_c = [
        _chunks(_pad(a)) for a in
        (esrc1, edst1, ew1, L1, esrc2, edst2, ew2, L2,
         diag, precond, b)
    ]
    tol_c = _chunks(_pad(tol, fill=1.0))

    def solve_chunk(args):
        (es1, ed1, w1, l1, es2, ed2, w2, l2, dg, pc, bb), tl = args
        A1 = _assemble_stack(es1, ed1, w1, l1, n1)    # [c, R, n1, n1]
        # fold the theta-dependent grid kernel into the side-2 BASIS
        # before scattering: B2_p = sum_q C_pq A2_q assembled directly
        # (a [c, M, R] @ [R, R] matmul pre-scatter), so no R-broadcast
        # contraction over the [c, R, n2, n2] stack is ever emitted —
        # XLA's remote TPU compiler crashes on broadcast-batched
        # dot_generals at these shapes.
        l2c = jnp.einsum('cmq,pq->cmp', l2, C,
                         precision=lax.Precision.HIGHEST)
        B2 = _assemble_stack(es2, ed2, w2, l2c, n2)   # [c, R, n2, n2]

        dgf = dg.reshape(chunk, n1 * n2)
        pcf = pc.reshape(chunk, n1 * n2)
        bf = bb.reshape(chunk, n1 * n2)

        # HIGH (3-pass bf16) restores ~f32 accuracy; unlike the
        # edge-factored path no operand here is an exact-bf16 one-hot,
        # so the 2-pass split-operand shortcut does not apply.
        # The rank axis is a static Python loop of standard batched
        # matmuls (see the B2 note above for why), which also keeps the
        # per-term intermediate at [c, n1, n2] instead of R times that.
        def matvec(yf):
            Y = yf.reshape(chunk, n1, n2)
            out = dgf * yf
            for r in range(R):
                G = jnp.einsum(
                    'cij,cjk->cik', A1[:, r], Y,
                    precision=lax.Precision.HIGH,
                    preferred_element_type=jnp.float32)
                O = jnp.einsum(
                    'cik,clk->cil', G, B2[:, r],
                    precision=lax.Precision.HIGH,
                    preferred_element_type=jnp.float32)
                out = out - O.reshape(chunk, n1 * n2)
            return out

        if return_iters:
            from ._solver import pcg
            xf, iters = pcg(matvec, bf, pcf, tl, maxiter,
                            return_iters=True)
            return xf.reshape(chunk, n1, n2), iters
        xf = solve_linear(matvec, bf, pcf, tl, maxiter)
        if return_resnorm:
            leftover = jnp.linalg.norm(bf - matvec(xf), axis=-1)
            scale = jnp.linalg.norm(bf, axis=-1)
            rel = leftover / jnp.where(scale > 0, scale, 1.0)
            return xf.reshape(chunk, n1, n2), rel
        return xf.reshape(chunk, n1, n2)

    # Python loop over chunks, unrolled at trace time: wrapping the CG
    # while-loop in lax.map produced map{while{einsum}} programs that
    # fault the dev harness's TPU worker (the same fragility ROADMAP
    # known-issue 1 records for scan{vmap{while}} nests); a flat
    # sequence of chunk solves in one program is equivalent and robust.
    # n_chunks is small (typically 1-8), so program-size growth is
    # bounded.
    outs = [
        solve_chunk((tuple(a[i] for a in ops_c), tol_c[i]))
        for i in range(P_pad // chunk)
    ]
    if return_resnorm or return_iters:
        xs = jnp.concatenate([o[0] for o in outs])
        aux = jnp.concatenate([o[1] for o in outs])
        return xs[:P], aux[:P]
    return jnp.concatenate(outs)[:P]
