"""Named-tuple factory with a pretty tree-style repr.

API parity with the reference ``graphdot/util/pretty_tuple.py:7`` — used to
expose hierarchical hyperparameter trees such as ``kernel.theta``.
"""
from collections import namedtuple


def pretty_tuple(name, fields):
    """Create a namedtuple subclass with a hierarchical repr."""

    class PrettyTuple(namedtuple(name, fields)):

        def __repr__(self):
            return '\n'.join(self._repr_lines())

        def _repr_lines(self, prefix=''):
            lines = [name]
            n = len(self._fields)
            for i, (field, value) in enumerate(zip(self._fields, self)):
                last = i == n - 1
                branch = '└── ' if last else '├── '
                cont = '    ' if last else '│   '
                if hasattr(value, '_repr_lines'):
                    sub = value._repr_lines()
                    lines.append(f'{branch}{field}: {sub[0]}')
                    lines.extend(cont + s for s in sub[1:])
                else:
                    lines.append(f'{branch}{field}: {value!r}')
            return lines

    PrettyTuple.__name__ = name
    return PrettyTuple
