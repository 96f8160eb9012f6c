"""Graph kernels and kernel wrappers."""
from .marginalized import MarginalizedGraphKernel

__all__ = ['MarginalizedGraphKernel']
