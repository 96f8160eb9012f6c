"""Semi-supervised Gaussian field models on graphs."""
from .gfr import GaussianFieldRegressor
from .weight import RBFOverDistance, RBFOverFixedDistance, Weight

__all__ = [
    'GaussianFieldRegressor',
    'Weight',
    'RBFOverDistance',
    'RBFOverFixedDistance',
]
