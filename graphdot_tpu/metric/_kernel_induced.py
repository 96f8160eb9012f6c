"""Kernel-induced distance (reference:
``graphdot/metric/_kernel_induced.py:5``)."""
import numpy as np


class KernelInducedDistance:
    r"""The kernel-induced distance
    :math:`d(x, y) = \sqrt{\frac{1}{2}(k(x, x) + k(y, y)) - k(x, y)}`.

    Parameters
    ----------
    kernel: callable
        A positive semidefinite kernel.
    kernel_options: dict
        Additional arguments forwarded to the kernel.
    """

    # slight off-1/2 factor and denominator nudge for numeric stability
    # near zero distance (mirrors the reference's tweaks)
    _half = 0.4999997
    _eps = 1e-4

    def __init__(self, kernel, kernel_options={}):
        self.kernel = kernel
        self.kernel_options = kernel_options

    def __call__(self, X, Y=None, eval_gradient=False):
        """Computes the distance matrix and optionally its gradient with
        respect to (linear-scale) hyperparameters."""
        if Y is None:
            if eval_gradient is True:
                K12, dK12 = self.kernel(
                    X, eval_gradient=True, **self.kernel_options
                )
                K1 = K2 = K12.diagonal().copy()
                dK1 = dK2 = dK12[np.diag_indices_from(K12)].copy()
            else:
                K12 = self.kernel(X, **self.kernel_options)
                K1 = K2 = K12.diagonal().copy()
        else:
            if eval_gradient is True:
                K12, dK12 = self.kernel(
                    X, Y, eval_gradient=True, **self.kernel_options
                )
                K1, dK1 = self.kernel.diag(
                    X, True, **self.kernel_options
                )
                K2, dK2 = self.kernel.diag(
                    Y, True, **self.kernel_options
                )
            else:
                K12 = self.kernel(X, Y, **self.kernel_options)
                K1 = self.kernel.diag(X, **self.kernel_options)
                K2 = self.kernel.diag(Y, **self.kernel_options)

        distance = np.sqrt(np.maximum(
            0.0,
            self._half * K1[:, None] + self._half * K2[None, :] - K12
        ))

        if eval_gradient is True:
            gradient = (
                0.5 * dK1[:, None, :] + 0.5 * dK2[None, :, :] - dK12
            ) * (0.5 / (distance + self._eps))[:, :, None]
            return distance, gradient
        else:
            return distance

    @property
    def hyperparameters(self):
        return self.kernel.hyperparameters

    @property
    def theta(self):
        return self.kernel.theta

    @theta.setter
    def theta(self, value):
        self.kernel.theta = value

    @property
    def bounds(self):
        return self.kernel.bounds

    def clone_with_theta(self, theta=None):
        if theta is None:
            theta = self.theta
        return type(self)(
            self.kernel.clone_with_theta(theta), self.kernel_options
        )
