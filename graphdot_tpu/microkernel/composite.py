"""Composite (multi-feature) microkernel (reference:
``graphdot/microkernel/composite.py:10``)."""
import numpy as np

from ..util.pretty_tuple import pretty_tuple
from ._base import MicroKernel


def Composite(oper, **kw_kernels):
    r"""Combines microkernels on individual features with a reduction
    operator: :math:`k_\mathrm{composite}(X, Y; \mathrm{op}) =
    k_{a_1}(X_{a_1}, Y_{a_1})\,\mathrm{op}\,k_{a_2}(X_{a_2}, Y_{a_2})
    \ldots`

    Parameters
    ----------
    oper: str
        '+' or '*' (limited by positive-definiteness requirements).
    kw_kernels: dict of attribute=kernel pairs
    """
    oplib = {
        '+': dict(
            ufunc=np.add,
            jfunc=lambda F, f, j: j,
            opname='Additive',
        ),
        '*': dict(
            ufunc=np.multiply,
            jfunc=lambda F, f, j: F / f * j,
            opname='Product',
        ),
    }

    if oper not in oplib:
        raise ValueError(f'Invalid reduction operator {repr(oper)}.')

    class CompositeKernel(MicroKernel):

        @property
        def name(self):
            return 'Composite'

        @property
        def opname(self):
            return self._opname

        def __init__(self, opstr, ufunc, jfunc, opname, **kw_kernels):
            self.opstr = opstr
            self.ufunc = ufunc
            self.jfunc = jfunc
            self._opname = opname
            self.kw_kernels = kw_kernels

        def __repr__(self):
            kwexpr = ', '.join(
                f'{k}={repr(K)}' for k, K in self.kw_kernels.items()
            )
            return f'{self.name}({repr(self.opstr)}, {kwexpr})'

        def __call__(self, X, Y, jac=False):
            if jac is True:
                F, J = list(
                    zip(*[kernel(X[key], Y[key], True)
                          for key, kernel in self.kw_kernels.items()])
                )
                S = self.ufunc.reduce(F)
                jacobian = np.array([
                    self.jfunc(S, f, j)
                    for i, f in enumerate(F) for j in J[i]
                ])
                return S, jacobian
            else:
                return self.ufunc.reduce([
                    f(X[k], Y[k]) for k, f in self.kw_kernels.items()
                ])

        @property
        def n_theta(self):
            return sum(k.n_theta for k in self.kw_kernels.values())

        def apply(self, theta, X, Y):
            out = None
            offset = 0
            for key, kernel in self.kw_kernels.items():
                t = theta[offset:offset + kernel.n_theta]
                offset += kernel.n_theta
                val = kernel.apply(t, X[key], Y[key])
                if out is None:
                    out = val
                elif self.opstr == '+':
                    out = out + val
                else:
                    out = out * val
            return out

        @property
        def theta(self):
            return pretty_tuple(
                self.name,
                self.kw_kernels.keys()
            )(*[k.theta for k in self.kw_kernels.values()])

        @theta.setter
        def theta(self, seq):
            for kernel, value in zip(self.kw_kernels.values(), seq):
                kernel.theta = value

        @property
        def bounds(self):
            return pretty_tuple(
                self.name,
                self.kw_kernels.keys()
            )(*[k.bounds for k in self.kw_kernels.values()])

        @property
        def minmax(self):
            return tuple(self.ufunc.reduce(
                [k.minmax for k in self.kw_kernels.values()], axis=0
            ))

    for key in kw_kernels:
        setattr(CompositeKernel, key,
                property(lambda self, key=key: self.kw_kernels[key]))

    opts = dict(oplib[oper])
    opts.pop('jgen', None)
    return CompositeKernel(oper, **opts, **kw_kernels)
