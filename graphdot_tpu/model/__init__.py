"""Models: Gaussian processes, Gaussian fields, active learning, and tree
search (reference: ``graphdot/model/``)."""
from .gaussian_process import (
    GaussianProcessRegressor,
    GPROutlierDetector,
    LowRankApproximateGPR,
)

__all__ = [
    'GaussianProcessRegressor', 'LowRankApproximateGPR',
    'GPROutlierDetector'
]
