"""Conjugate-gradient solve-operator (fills the role of the reference's
``graphdot/linalg/cg.py:7``).

Wraps scipy's CG behind the same ``solver @ b`` protocol as
:class:`graphdot_tpu.linalg.cholesky.CholSolver`, so model code can swap a
direct factorization for an iterative solve without touching call sites.
Unlike the Cholesky path nothing is precomputed: each application runs CG
from scratch, which pays off when only a few right-hand sides are needed
for a large, well-conditioned system.
"""
import numpy as np
import scipy.sparse.linalg


class CGSolver:
    """Iterative ``A x = b`` solve on each ``@`` application.

    Parameters
    ----------
    A: matrix or LinearOperator
    options: forwarded to ``scipy.sparse.linalg.cg`` (rtol, atol,
        maxiter, M, ...).
    """

    def __init__(self, A, **options):
        self.A = A
        self.options = dict(options)

    def __matmul__(self, b):
        solution, status = scipy.sparse.linalg.cg(
            self.A, b, **self.options
        )
        if status != 0:
            raise RuntimeError(
                f'CG solver failed with error code {status}.'
            )
        return solution

    def todense(self):
        """A^-1 as a dense matrix (one CG solve per column)."""
        return self @ np.eye(self.A.shape[0])

    def diagonal(self):
        return self.todense().diagonal()
