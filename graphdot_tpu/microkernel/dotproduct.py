"""Dot product microkernel (reference:
``graphdot/microkernel/dotproduct.py:8``)."""
import numpy as np
import jax.numpy as jnp

from ._base import MicroKernel


def DotProduct():
    r"""Computes the inner product between two vector-valued features.
    No tunable hyperparameters."""

    class DotProductKernel(MicroKernel):

        @property
        def name(self):
            return 'DotProduct'

        def __call__(self, X, Y, jac=False):
            X = np.asarray(X)
            Y = np.asarray(Y)
            if jac is True:
                return X @ Y, np.array([])
            else:
                return X @ Y

        def __repr__(self):
            return f'{self.name}()'

        @property
        def n_theta(self):
            return 0

        def apply(self, theta, X, Y):
            # variable-length features arrive as (values, mask) with a
            # trailing padded axis; padded values are zero so a plain
            # contraction is exact.
            vx, _ = X
            vy, _ = Y
            return jnp.sum(vx * vy, axis=-1)

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
            return (0, np.inf)

    return DotProductKernel()
