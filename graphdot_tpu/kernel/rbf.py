"""Standalone RBF-over-distance kernel for vector data (reference:
``graphdot/kernel/rbf.py:11``). Uses SymPy lambdify (numpy) instead of the
reference's compiled ufuncify — no runtime C compilation needed."""
from collections import OrderedDict

import numpy as np
import scipy.spatial.distance
import sympy
from sympy.core.sympify import sympify
from sympy.utilities.lambdify import lambdify


class RBFKernel:
    """A radial basis function kernel k(x, y) = f(||x - y||).

    Parameters
    ----------
    expr: str
        SymPy expression of the kernel in terms of the distance variable.
    x: str
        Name of the distance variable in ``expr``.
    hyperparameters: dict
        name=value pairs of the expression's hyperparameters.
    """

    def __init__(self, expr, x, **hyperparameters):
        self.expr = sympify(expr)
        self._params = OrderedDict(**hyperparameters)
        self._param = (
            sympy.symbols(x),
            *[sympy.symbols(k) for k in self._params]
        )
        self._fun = lambdify(self._param, self.expr)
        self._grad = [
            lambdify(self._param, sympy.diff(self.expr, t))
            for t in self._params
        ]

    def get_params(self):
        return self._params

    @property
    def theta(self):
        return np.log(list(self._params.values()))

    @theta.setter
    def theta(self, args):
        for k, v in zip(self._params, np.exp(args)):
            self._params[k] = v

    def __call__(self, X, Y=None):
        if Y is None:
            d = scipy.spatial.distance.cdist(X, X)
        else:
            d = scipy.spatial.distance.cdist(X, Y)
        return self._fun(d, *self._params.values())

    def gradient(self, X):
        d = scipy.spatial.distance.cdist(X, X)
        return [g(d, *self._params.values()) for g in self._grad]

    def diag(self, X):
        return self._fun(np.zeros(len(X)), *self._params.values())
