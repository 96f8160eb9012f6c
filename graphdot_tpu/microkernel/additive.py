"""Additive composite (reference: ``graphdot/microkernel/additive.py:6``)."""
from .composite import Composite


def Additive(**kw_kernels):
    r"""Alias of ``Composite('+', **kw_kernels)``:
    :math:`k_\oplus(X, Y) = \sum_{a} k_a(X_a, Y_a)`"""
    return Composite('+', **kw_kernels)
