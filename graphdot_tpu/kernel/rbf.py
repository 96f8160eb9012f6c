"""Standalone RBF kernel over vector data (fills the role of the
reference's ``graphdot/kernel/rbf.py:11``); built on SymPy lambdify
instead of runtime-compiled ufuncs."""
from collections import OrderedDict

import numpy as np
import scipy.spatial.distance
import sympy
from sympy.utilities.lambdify import lambdify


class RBFKernel:
    """k(x, y) = f(||x - y||) for a SymPy expression f of a distance
    variable and named hyperparameters.

    Parameters
    ----------
    expr: str
        SymPy expression, e.g. ``'exp(-0.5 * d**2 / s**2)'``.
    x: str
        The distance variable's name in ``expr``.
    hyperparameters: name=value pairs for the remaining symbols.
    """

    def __init__(self, expr, x, **hyperparameters):
        self.expr = sympy.sympify(expr)
        self._params = OrderedDict(hyperparameters)
        symbols = (sympy.Symbol(x),) + tuple(
            sympy.Symbol(name) for name in self._params
        )
        self._fun = lambdify(symbols, self.expr)
        self._grad = [
            lambdify(symbols, self.expr.diff(sympy.Symbol(name)))
            for name in self._params
        ]

    def _values(self):
        return tuple(self._params.values())

    def get_params(self):
        return self._params

    @property
    def theta(self):
        return np.log(list(self._params.values()))

    @theta.setter
    def theta(self, args):
        for name, value in zip(self._params, np.exp(args)):
            self._params[name] = value

    def __call__(self, X, Y=None):
        d = scipy.spatial.distance.cdist(X, X if Y is None else Y)
        return self._fun(d, *self._values())

    def gradient(self, X):
        d = scipy.spatial.distance.cdist(X, X)
        return [g(d, *self._values()) for g in self._grad]

    def diag(self, X):
        return self._fun(np.zeros(len(X)), *self._values())
