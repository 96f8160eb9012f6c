"""Rational quadratic microkernel (reference:
``graphdot/microkernel/rational_quadratic.py:7``)."""
import numpy as np

from ._base import MicroKernel

RationalQuadratic = MicroKernel.from_sympy(
    'RationalQuadratic',

    r"""A rational quadratic kernel is equivalent to the sum of many square
    exponential kernels with different length scales. `alpha` tunes the
    relative weights between large and small length scales; as alpha
    approaches infinity the kernel becomes a square exponential.""",

    '(1 + (x - y)**2 / (2 * alpha * length_scale**2))**(-alpha)',

    ('x', 'y'),

    ('length_scale', np.float32, 1e-6, np.inf,
     r"""The smallest length scale of the square exponential components."""),
    ('alpha', np.float32, 1e-3, np.inf,
     r"""The relative weights of large-scale square exponential components;
     larger alpha decays the weights of large length scales faster."""),

    minmax=(0, 1)
)
