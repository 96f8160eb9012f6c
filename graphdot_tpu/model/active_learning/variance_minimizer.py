"""Greedy posterior-variance minimization (fills the role of the
reference's ``graphdot/model/active_learning/variance_minimizer.py``).

Greedily grows a subset so that the GP posterior variance (Nystrom
residual) of the REMAINING samples is minimized; the inverse of the chosen
block is maintained incrementally with a rank-1 bordered update
(``binvh1``), and chosen rows are swapped to the matrix front so the
posterior update stays a contiguous block operation.
"""
import numpy as np

from ...linalg.block import binvh1


class VarianceMinimizer:
    """Subset selector by greedy posterior-variance reduction.

    Parameters
    ----------
    kernel: callable or 'precomputed'
        Symmetric PSD kernel; with 'precomputed', ``__call__`` expects a
        square kernel matrix.
    alpha: float
        Diagonal jitter added before selection.
    kernel_options: dict
    """

    def __init__(self, kernel, alpha=1e-6, kernel_options=None):
        assert kernel == 'precomputed' or callable(kernel)
        self.kernel = kernel
        self.alpha = alpha
        self.kernel_options = kernel_options or {}

    def __call__(self, X, n):
        """Indices of n greedily chosen samples of X."""
        assert len(X) >= n
        if isinstance(self.kernel, str) and self.kernel == 'precomputed':
            assert (
                isinstance(X, np.ndarray) and X.ndim == 2
                and X.shape[0] == X.shape[1]
            ), 'A precomputed kernel matrix must be square.'
            K = np.array(X, dtype=float)
        else:
            K = np.array(
                self.kernel(X, **self.kernel_options), dtype=float
            )
        K[np.diag_indices_from(K)] += self.alpha
        return self._choose(K, n)

    @staticmethod
    def _choose(K, n):
        chosen = []
        labels = np.arange(len(K))
        inv_front = np.zeros((0, 0))
        for step in range(n):
            # posterior covariance of the unchosen block given the front
            tail = K[step:, step:]
            cross = K[step:, :step]
            posterior = tail - cross @ inv_front @ cross.T
            pick = step + int(np.argmax(posterior.sum(axis=1)))
            chosen.append(labels[pick])
            # swap the pick to the front of the working matrix
            labels[[step, pick]] = labels[[pick, step]]
            K[[step, pick], :] = K[[pick, step], :]
            K[:, [step, pick]] = K[:, [pick, step]]
            if step + 1 < n:
                inv_front = binvh1(
                    inv_front, K[:step, step], K[step, step]
                )
        return chosen
