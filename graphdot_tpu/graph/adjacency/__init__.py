from .atomic import AtomicAdjacency
from .euclidean import CompactBell, Gaussian, Tent

__all__ = ['AtomicAdjacency', 'Gaussian', 'Tent', 'CompactBell']
