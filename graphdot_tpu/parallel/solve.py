"""Distributed GP linear algebra: row-sharded CG for K^-1 y.

For n >= ~1k training graphs the replicated Cholesky in the GP log-prob
(``inference/gp_logprob.py``) stops scaling: every device factorizes the
full n x n Gram. This module keeps K row-sharded across the mesh (tiles
stay where the sharded Gram build computed them) and solves K^-1 y with a
conjugate-gradient iteration whose only communication is one all-gather
of the search direction per matvec plus psum'd dot products — the
SURVEY §2.9.2 collective-reduction pattern over ICI/DCN.

Vectors are sharded along the same axis as K's rows; the returned
solution is sharded likewise (all-gather it outside if a replicated
result is needed).
"""
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map


def sharded_cg_solve_fn(mesh, axis='pairs', tol=1e-6, maxiter=1000):
    """Build a jitted sharded CG solve ``(K_rows, y, alpha) -> x`` with
    ``(K + alpha I) x = y``.

    Parameters
    ----------
    mesh: jax.sharding.Mesh
    axis: mesh axis that K's rows (and all vectors) are sharded along.
        n must be divisible by the axis size.
    tol: relative residual-norm stopping threshold.
    maxiter: static iteration bound.

    Returns
    -------
    solve(K, y, alpha) -> x, all arguments/result sharded:
        K: [n, n] rows sharded; y: [n] sharded; x: [n] sharded.
    """

    def local_solve(K_loc, y_loc, alpha):
        # K_loc: [n/d, n]; y_loc: [n/d]
        n_loc = y_loc.shape[0]
        d = lax.axis_index(axis)
        row0 = d * n_loc

        def matvec(p_loc):
            # one all-gather per iteration: the full search direction
            p_full = lax.all_gather(p_loc, axis, tiled=True)
            out = K_loc @ p_full + alpha * p_loc
            return out

        def pdot(a, b):
            return lax.psum(jnp.dot(a, b), axis)

        bnorm = jnp.sqrt(pdot(y_loc, y_loc))
        atol = tol * jnp.maximum(bnorm, 1e-30)

        # Jacobi preconditioner from the local diagonal block
        diag = jnp.diagonal(
            lax.dynamic_slice(K_loc, (0, row0), (n_loc, n_loc))
        ) + alpha
        precond = 1.0 / jnp.where(diag > 0, diag, 1.0)

        z0 = precond * y_loc
        state0 = (
            jnp.zeros_like(y_loc),    # x
            y_loc,                    # r
            z0,                       # p
            pdot(y_loc, z0),          # rz
            jnp.int32(0),
        )

        def cond(s):
            _, r, _, _, it = s
            return (it < maxiter) & (jnp.sqrt(pdot(r, r)) > atol)

        def body(s):
            x, r, p, rz, it = s
            Ap = matvec(p)
            pAp = pdot(p, Ap)
            alpha_k = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha_k * p
            r = r - alpha_k * Ap
            z = precond * r
            rz_new = pdot(r, z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            return (x, r, p, rz_new, it + 1)

        x, _, _, _, _ = lax.while_loop(cond, body, state0)
        return x

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_gp_solve(mesh, K, y, alpha, axis='pairs', tol=1e-6,
                     maxiter=1000):
    """One-shot helper: K^-1 y with K rows sharded over ``axis``.

    Accepts replicated inputs; shards them, solves, and returns the
    replicated solution. For repeated solves build the function once via
    :func:`sharded_cg_solve_fn`.
    """
    solve = sharded_cg_solve_fn(mesh, axis=axis, tol=tol,
                                maxiter=maxiter)
    from jax.sharding import NamedSharding
    Ks = jax.device_put(K, NamedSharding(mesh, P(axis, None)))
    ys = jax.device_put(y, NamedSharding(mesh, P(axis)))
    x = solve(Ks, ys, jnp.float32(alpha))
    return jax.device_put(x, NamedSharding(mesh, P()))
