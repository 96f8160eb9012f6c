"""Conjugate-gradient solve-operator on the accelerator.

Fills the role of the reference's scipy CG wrapper
(``graphdot/linalg/cg.py:7``) behind the same ``solver @ b`` protocol as
:class:`graphdot_tpu.linalg.cholesky.CholSolver`, but runs the iteration
as a jitted JAX program (``jax.scipy.sparse.linalg.cg``) so large host-API
solves execute on device. Nothing is precomputed: each ``@`` application
runs CG from scratch, which pays off when only a few right-hand sides are
needed for a large, well-conditioned system.
"""
import functools

import numpy as np
import jax
import jax.scipy.sparse.linalg

from ._exec import run


@functools.partial(jax.jit, static_argnames=('rtol', 'atol', 'maxiter'))
def _cg(A, b, rtol, atol, maxiter):
    x, _ = jax.scipy.sparse.linalg.cg(
        A, b, tol=rtol, atol=atol, maxiter=maxiter)
    return x


class CGSolver:
    """Iterative ``A x = b`` solve on each ``@`` application.

    Parameters
    ----------
    A: square matrix
    rtol, atol: float
        Convergence thresholds on the residual norm.
    maxiter: int or None
        Iteration cap (defaults to the system dimension).
    """

    def __init__(self, A, rtol=1e-7, atol=0.0, maxiter=None):
        self.A = np.asarray(A)
        self.rtol = float(rtol)
        self.atol = float(atol)
        self.maxiter = maxiter if maxiter is None else int(maxiter)

    def __matmul__(self, b):
        b = np.asarray(b)
        x = run(
            functools.partial(
                _cg, rtol=self.rtol, atol=self.atol,
                maxiter=self.maxiter),
            self.A, b,
        )
        residual = np.linalg.norm(self.A @ x - b)
        bound = max(self.rtol * np.linalg.norm(b), self.atol)
        if not np.isfinite(residual) or (
                bound > 0 and residual > 10 * bound):
            raise RuntimeError(
                f'CG did not converge: |r| = {residual:.3g} '
                f'(target {bound:.3g}).')
        return x

    def todense(self):
        """``A^-1`` as a dense matrix (one batched CG solve)."""
        return self @ np.eye(self.A.shape[0])

    def diagonal(self):
        return self.todense().diagonal()
