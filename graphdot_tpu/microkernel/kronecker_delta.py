"""Kronecker delta microkernel (reference:
``graphdot/microkernel/kronecker_delta.py:9``)."""
import numpy as np
import jax.numpy as jnp

from ..util.pretty_tuple import pretty_tuple
from ._base import MicroKernel


def KroneckerDelta(h, h_bounds=(1e-3, 1)):
    r"""Returns 1 when two features compare equal and ``h`` otherwise:
    :math:`k_\delta(i, j) = \begin{cases} 1, i = j \\ h, \text{otherwise}
    \end{cases}`.

    Parameters
    ----------
    h: float in (0, 1)
        The value of the microkernel when two features do not compare
        equal.
    h_bounds: tuple or "fixed"
        Lower and upper optimization bounds, or "fixed".
    """

    class KroneckerDeltaKernel(MicroKernel):

        @property
        def name(self):
            return 'KroneckerDelta'

        def __init__(self, h, h_bounds):
            self.h = float(h)
            self.h_bounds = h_bounds
            self._assert_bounds('h', h_bounds)

        def __call__(self, i, j, jac=False):
            if jac is True:
                return (
                    1.0 if i == j else self.h,
                    np.array([0.0 if i == j else 1.0])
                )
            else:
                return 1.0 if i == j else self.h

        def __repr__(self):
            return f'{self.name}({self.h})'

        @property
        def n_theta(self):
            return 1

        def apply(self, theta, X, Y):
            return jnp.where(X == Y, 1.0, theta[0])

        @property
        def theta(self):
            return pretty_tuple(self.name, ['h'])(self.h)

        @theta.setter
        def theta(self, seq):
            self.h = seq[0]

        @property
        def bounds(self):
            return (self.h_bounds,)

        @property
        def minmax(self):
            return (self.h, 1)

    return KroneckerDeltaKernel(h, h_bounds)
