"""Graph distance metrics (reference: ``graphdot/metric/``)."""
from ._kernel_induced import KernelInducedDistance
from .maximin import MaxiMin

__all__ = ['MaxiMin', 'KernelInducedDistance']
