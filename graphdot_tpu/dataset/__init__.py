"""Dataset loaders (reference: ``graphdot/dataset/``)."""
from ._get import get
from .ames import AMES
from .metlin_smrt import METLIN_SMRT
from .qm7 import QM7
from .qm9 import QM9

__all__ = ['get', 'QM7', 'QM9', 'METLIN_SMRT', 'AMES']
