"""Greedy determinant maximization (reference:
``graphdot/model/active_learning/determinant_maximizer.py``; the numba
``forceobj`` jit there adds nothing — plain numpy is used here)."""
import numpy as np


class DeterminantMaximizer:
    """Select a subset whose kernel submatrix has (approximately) maximal
    determinant — i.e. samples as linearly independent as possible in the
    RKHS — via repeated projection-deflation.

    Parameters
    ----------
    kernel: callable or 'precomputed'
        Symmetric PSD kernel, or 'precomputed' to pass a square kernel
        matrix directly to ``__call__``.
    kernel_options: dict
    """

    def __init__(self, kernel, kernel_options=None):
        assert kernel == 'precomputed' or callable(kernel)
        self.kernel = kernel
        self.kernel_options = kernel_options or {}

    def __call__(self, X, n):
        """Pick indices of n samples from X."""
        assert len(X) >= n
        if isinstance(self.kernel, str) and self.kernel == 'precomputed':
            assert (
                isinstance(X, np.ndarray) and X.ndim == 2
                and X.shape[0] == X.shape[1]
            ), 'A precomputed kernel matrix must be square.'
            K = X
        else:
            K = self.kernel(X, **self.kernel_options)
        return self._choose(np.array(K, dtype=np.float32), n)

    @staticmethod
    def _choose(K, n):
        chosen = []
        for _ in range(n):
            L = np.sum(K ** 2, axis=1)
            L[chosen] = -np.inf  # never re-select
            i = int(np.argmax(L))
            chosen.append(i)
            v = K[i, :] / np.linalg.norm(K[i, :])
            K = K - np.outer(K @ v, v)
        return chosen
