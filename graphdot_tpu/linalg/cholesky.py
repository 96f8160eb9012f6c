"""Cholesky factor-and-solve, executed on the accelerator through JAX.

Replaces the reference's scipy ``solve_triangular`` pair
(``graphdot/linalg/cholesky.py:22``) with a device-side
``cho_solve``; JAX's Cholesky signals indefiniteness with NaNs rather
than exceptions, so positive-definiteness is checked once at
factorization time and surfaced as ``numpy.linalg.LinAlgError`` to keep
the caller contract.
"""
import numpy as np

from ._exec import cho_apply, cholesky


class CholSolver:
    """Factorizes ``A = L L^T`` once; ``solver @ b`` then solves."""

    def __init__(self, A):
        A = np.asarray(A)
        factor = cholesky(A)
        if not np.isfinite(factor).all():
            raise np.linalg.LinAlgError(
                'Matrix is not positive definite.')
        self._factor = factor

    def __matmul__(self, b):
        return cho_apply(self._factor, np.asarray(b))

    def todense(self):
        return self @ np.eye(len(self._factor), dtype=self._factor.dtype)

    def diagonal(self):
        return self.todense().diagonal()


def chol_solve(A, b):
    """One-shot ``A^-1 b`` through a Cholesky factorization."""
    return CholSolver(A) @ b
