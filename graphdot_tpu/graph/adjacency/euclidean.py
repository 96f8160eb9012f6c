"""Shape functions mapping interatomic distance to edge weight (fill the
role of the reference's ``graphdot/graph/adjacency/euclidean.py``).

Each shape is a callable ``w(d, length_scale)`` decaying with distance,
paired with a ``cutoff`` beyond which the weight is (treated as) zero.
"""
import numpy as np


class Gaussian:
    """w = exp(-d^2 / 2 sigma^2); infinite support."""

    def __call__(self, d, length_scale):
        return np.exp(-0.5 * (d / length_scale) ** 2)

    def cutoff(self, length_scale):
        return np.inf


class Tent:
    """w = max(0, 1 - d/(3 sigma))^n; compact support at 3 sigma."""

    def __init__(self, ord):
        assert ord >= 1
        self.ord = ord

    def cutoff(self, length_scale):
        return 3 * length_scale

    def __call__(self, d, length_scale):
        s = 1 - d / self.cutoff(length_scale)
        return s ** self.ord if s >= 0 else 0


class CompactBell:
    """A smooth compactly-supported bell
    w = (a s^b - b s^a) / (a - b) with s = max(0, 1 - d/(3 sigma)),
    requiring a > b >= 2 so that w and w' vanish at the cutoff."""

    def __init__(self, a, b):
        assert a > b and b >= 2
        self.a = a
        self.b = b

    def cutoff(self, length_scale):
        return 3 * length_scale

    def __call__(self, d, length_scale):
        s = 1 - d / self.cutoff(length_scale)
        if s < 0:
            return 0
        a, b = self.a, self.b
        return (a * s ** b - b * s ** a) / (a - b)
