"""Microkernels: positive-semidefinite functions between individual nodes
and edges of graphs (reference: ``graphdot/microkernel/__init__.py``).

TPU-native design: each microkernel doubles as (a) a host-side scalar
callable with analytic jacobians (API parity with the reference) and (b) a
vectorized jnp expression (``apply``) traced directly into the product-graph
solver — JAX tracing replaces the reference's CUDA codegen layer entirely.
"""
from ._base import MicroKernel, Constant, Normalize
from .product import Product
from .kronecker_delta import KroneckerDelta
from .square_exponential import SquareExponential
from .rational_quadratic import RationalQuadratic
from .composite import Composite
from .additive import Additive
from .tensor_product import TensorProduct
from .convolution import Convolution
from .dotproduct import DotProduct

__all__ = [
    'MicroKernel',
    'Product',
    'Constant',
    'KroneckerDelta',
    'SquareExponential',
    'RationalQuadratic',
    'Normalize',
    'Composite',
    'TensorProduct',
    'Additive',
    'Convolution',
    'DotProduct',
]
