"""Greedy posterior-variance minimization (reference:
``graphdot/model/active_learning/variance_minimizer.py``)."""
import numpy as np

from ...linalg.block import binvh1


class VarianceMinimizer:
    """Select a subset so that the GP posterior variance (Nystrom residual
    norm) of the UNSELECTED samples is minimized, using an incremental
    bordered-block inverse (``binvh1``) and swap-to-front bookkeeping.

    Parameters
    ----------
    kernel: callable or 'precomputed'
        Symmetric PSD kernel, or 'precomputed' to pass a square kernel
        matrix directly to ``__call__``.
    alpha: float
        Diagonal regularization of the kernel matrix.
    kernel_options: dict
    """

    def __init__(self, kernel, alpha=1e-6, kernel_options=None):
        assert kernel == 'precomputed' or callable(kernel)
        self.kernel = kernel
        self.alpha = alpha
        self.kernel_options = kernel_options or {}

    def __call__(self, X, n):
        """Pick indices of n samples from X."""
        assert len(X) >= n
        if isinstance(self.kernel, str) and self.kernel == 'precomputed':
            assert (
                isinstance(X, np.ndarray) and X.ndim == 2
                and X.shape[0] == X.shape[1]
            ), 'A precomputed kernel matrix must be square.'
            K = np.copy(X).astype(float)
        else:
            K = self.kernel(X, **self.kernel_options).astype(float)

        K.flat[::len(K) + 1] += self.alpha
        return self._choose(K, n)

    @staticmethod
    def _choose(K, n):
        chosen = []
        index = np.arange(len(K))
        inv = np.zeros((0, 0))
        for i in range(n):
            posterior = K[i:, i:] - K[i:, :i] @ inv @ K[:i, i:]
            j = i + np.argmax(np.sum(posterior, axis=1))
            chosen.append(index[j])
            index[[i, j]] = index[[j, i]]
            K[[i, j], :] = K[[j, i], :]
            K[:, [i, j]] = K[:, [j, i]]
            if i < n - 1:
                inv = binvh1(inv, K[:i, i], K[i, i])
        return chosen
