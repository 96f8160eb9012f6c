"""Tensor product composite (reference:
``graphdot/microkernel/tensor_product.py:6``)."""
from .composite import Composite


def TensorProduct(**kw_kernels):
    r"""Alias of ``Composite('*', **kw_kernels)``:
    :math:`k_\otimes(X, Y) = \prod_{a} k_a(X_a, Y_a)`"""
    return Composite('*', **kw_kernels)
