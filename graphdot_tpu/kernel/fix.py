"""Gram-level kernel modifiers (reference: ``graphdot/kernel/fix.py``).

``Normalization`` applies cosine normalization at the Gram-matrix level
(with the full chain rule on gradients); ``Exponentiation`` raises a kernel
to a trainable power.
"""
import copy

import numpy as np

from ..util.pretty_tuple import pretty_tuple


class Normalization:
    r"""Normalizes a kernel via
    :math:`k_n(x, y) = k(x, y) / \sqrt{k(x, x) k(y, y)}`.

    Parameters
    ----------
    kernel: object
        The kernel to be normalized (any object with the graph-kernel
        call signature).
    """

    def __init__(self, kernel):
        self.kernel = kernel

    def __call__(self, X, Y=None, eval_gradient=False, **options):
        """Normalized outcome of ``self.kernel(X, Y, ...)``."""
        if eval_gradient is True:
            R, dR = self.kernel(X, Y, eval_gradient=True, **options)
            if Y is None:
                ldiag = rdiag = R.diagonal()
                ldDiag = rdDiag = np.stack(
                    [dR[:, :, i].diagonal() for i in range(dR.shape[-1])],
                    axis=1
                )
            else:
                ldiag, ldDiag = self.kernel.diag(X, True, **options)
                rdiag, rdDiag = self.kernel.diag(Y, True, **options)
            ldiag_inv = 1 / ldiag
            rdiag_inv = 1 / rdiag
            ldiag_rsqrt = np.sqrt(ldiag_inv)
            rdiag_rsqrt = np.sqrt(rdiag_inv)
            K = ldiag_rsqrt[:, None] * R * rdiag_rsqrt[None, :]
            dK = np.empty((*K.shape, dR.shape[-1]), order='F')
            for i in range(dR.shape[-1]):
                dr = dR[:, :, i]
                lddiag = ldDiag[:, i]
                rddiag = rdDiag[:, i]
                dK[:, :, i] = (
                    ldiag_rsqrt[:, None] * dr * rdiag_rsqrt[None, :]
                    - 0.5 * ldiag_inv[:, None] * K * rdiag_inv[None, :] * (
                        np.outer(lddiag, rdiag) + np.outer(ldiag, rddiag)
                    )
                )
            return K, dK
        else:
            R = self.kernel(X, Y, **options)
            if Y is None:
                ldiag = rdiag = R.diagonal()
            else:
                ldiag = self.kernel.diag(X, **options)
                rdiag = self.kernel.diag(Y, **options)
            ldiag_rsqrt = ldiag ** -0.5
            rdiag_rsqrt = rdiag ** -0.5
            return ldiag_rsqrt[:, None] * R * rdiag_rsqrt[None, :]

    def diag(self, X, eval_gradient=False, **options):
        """Diagonal of the normalized kernel — identically ones."""
        if eval_gradient is True:
            return (
                np.ones(len(X)),
                np.zeros((len(X), len(self.kernel.theta)))
            )
        else:
            return np.ones(len(X))

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
    def hyperparameter_bounds(self):
        return self.kernel.hyperparameter_bounds

    @property
    def bounds(self):
        return self.kernel.bounds

    def clone_with_theta(self, theta):
        clone = copy.deepcopy(self)
        clone.theta = theta
        return clone


class Exponentiation:
    r"""Raises a kernel to a power: :math:`k_e(x, y) = k(x, y)^\xi`.

    Parameters
    ----------
    kernel: object
        The graph kernel to be exponentiated.
    xi: float
        The exponent.
    xi_bounds: (float, float)
        Search range of the exponent during hyperparameter optimization.
    """

    def __init__(self, kernel, xi=1.0, xi_bounds=(0.1, 20.0)):
        self.kernel = kernel
        self.xi = xi
        self.xi_bounds = xi_bounds

    def __call__(self, X, Y=None, eval_gradient=False, **options):
        if eval_gradient is True:
            R, dR = self.kernel(X, Y, eval_gradient=True, **options)
            K = R ** self.xi
            dK = [K * np.log(R)]  # d(R^xi)/d(xi)
            KK = self.xi * R ** (self.xi - 1)
            for i in range(dR.shape[-1]):
                dK.append(KK * dR[:, :, i])
            return K, np.stack(dK, axis=2)
        else:
            return self.kernel(X, Y, **options) ** self.xi

    def diag(self, X, **options):
        return self.kernel.diag(X, **options) ** self.xi

    @property
    def hyperparameters(self):
        return pretty_tuple('Exponentiation', ['xi', 'kernel'])(
            self.xi, self.kernel.hyperparameters
        )

    @property
    def theta(self):
        return np.concatenate((np.log([self.xi]), self.kernel.theta))

    @theta.setter
    def theta(self, value):
        self.xi = np.exp(value[0])
        self.kernel.theta = value[1:]

    @property
    def hyperparameter_bounds(self):
        return pretty_tuple('Exponentiation', ['xi', 'kernel'])(
            self.xi_bounds, self.kernel.hyperparameter_bounds
        )

    @property
    def bounds(self):
        return np.vstack((np.log([self.xi_bounds]), self.kernel.bounds))

    def clone_with_theta(self, theta):
        clone = copy.deepcopy(self)
        clone.theta = theta
        return clone
