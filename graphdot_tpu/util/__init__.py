"""Utilities: tag-based Timer (reference: ``graphdot/util/__init__.py:19``)."""
import time
from collections import OrderedDict

from .compile_cache import enable_compilation_cache  # noqa: F401


def add_classmethod(cls, override=False):
    def decorate(func):
        if override is not True and hasattr(cls, func.__name__):
            raise RuntimeError(
                'Class %s already has a method named %s'
                % (repr(cls), func.__name__)
            )
        clsm = classmethod(func)
        clsm.__doc__ = 'Add-on classmethod of %s\n\n%s' % (cls, func.__doc__)
        setattr(cls, func.__name__, clsm)
        return clsm
    return decorate


class Timer:
    """Tag-based tic/toc timer used to report per-phase timings."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t = OrderedDict()
        self.dt = OrderedDict()

    def tic(self, tag):
        self.t[tag] = time.perf_counter()

    def toc(self, tag):
        self.dt[tag] = time.perf_counter() - self.t[tag]
        del self.t[tag]

    def report(self, unit='s'):
        scale = {'s': 1.0, 'ms': 1e3, 'us': 1e6, 'ns': 1e9}.get(unit)
        if scale is None:
            raise ValueError('Unknown unit %s' % unit)
        for tag, dt in self.dt.items():
            print('%9.1f %s on %s' % (dt * scale, unit, tag))
