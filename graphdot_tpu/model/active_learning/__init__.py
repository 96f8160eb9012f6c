from .determinant_maximizer import DeterminantMaximizer
from .hierarchical_drafter import HierarchicalDrafter
from .variance_minimizer import VarianceMinimizer

__all__ = [
    'HierarchicalDrafter', 'DeterminantMaximizer', 'VarianceMinimizer'
]
