"""Alias module for API parity with the reference ``graphdot.minipandas``."""
from ..graph.frame import DataFrame, Series

__all__ = ['DataFrame', 'Series']
