"""Node- and edge-level base kernels ("microkernels").

A microkernel is a positive-semidefinite similarity on individual node or
edge features. Each one is simultaneously a host-side scalar callable with
analytic jacobians (API parity with the reference) and a traced jnp
expression (``apply``) consumed by the product-graph solver — JAX tracing
replaces the reference CUDA codegen layer entirely.
"""
from ._base import Constant, MicroKernel, Normalize
from .additive import Additive
from .composite import Composite
from .convolution import Convolution
from .dotproduct import DotProduct
from .kronecker_delta import KroneckerDelta
from .product import Product
from .rational_quadratic import RationalQuadratic
from .square_exponential import SquareExponential
from .tensor_product import TensorProduct

__all__ = [
    'MicroKernel',
    'Constant',
    'Normalize',
    'Product',
    'KroneckerDelta',
    'SquareExponential',
    'RationalQuadratic',
    'Composite',
    'TensorProduct',
    'Additive',
    'Convolution',
    'DotProduct',
]
