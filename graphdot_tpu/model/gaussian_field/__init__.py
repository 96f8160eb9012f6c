from .gfr import GaussianFieldRegressor
from .weight import RBFOverDistance, RBFOverFixedDistance, Weight

__all__ = [
    'GaussianFieldRegressor', 'Weight', 'RBFOverDistance',
    'RBFOverFixedDistance'
]
