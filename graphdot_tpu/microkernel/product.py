"""Direct product microkernel (reference:
``graphdot/microkernel/product.py:9``)."""
import numpy as np

from ._base import MicroKernel


class Product(MicroKernel):
    """Direct product between features, :math:`k(x, y) = x y`; used for
    edge weights."""

    @property
    def name(self):
        return 'Product'

    def __call__(self, x1, x2, jac=False):
        if jac is True:
            return x1 * x2, np.array([])
        else:
            return x1 * x2

    def __repr__(self):
        return f'{self.name}()'

    @property
    def n_theta(self):
        return 0

    def apply(self, theta, X, Y):
        return X * Y

    @property
    def theta(self):
        return tuple()

    @theta.setter
    def theta(self, seq):
        pass

    @property
    def bounds(self):
        return tuple()

    @property
    def minmax(self):
        return (None, None)
