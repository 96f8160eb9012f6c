"""Cholesky factor-and-solve (reference: ``graphdot/linalg/cholesky.py:22``)."""
import numpy as np
import scipy.linalg


def chol_solve(A, b):
    return CholSolver(A) @ b


class CholSolver:
    """Factorizes A = L L^T once and exposes ``solver @ b`` solves."""

    def __init__(self, A):
        self.L = np.linalg.cholesky(A)

    def __matmul__(self, b):
        y = scipy.linalg.solve_triangular(
            self.L, b, lower=True, check_finite=False
        )
        return scipy.linalg.solve_triangular(
            self.L, y, trans='C', lower=True, check_finite=False
        )

    def todense(self):
        return self @ np.eye(*self.L.shape)

    def diagonal(self):
        return self.todense().diagonal()
