"""Type inference over heterogeneous feature columns.

Numpy-2-compatible re-design of the reference type bridge
(``graphdot/codegen/typetool.py:26,114``). The reference used this layer to
map Python feature values onto aligned C structs for CUDA codegen; here it
only has to find the smallest common dtype so that feature columns can be
packed into dense jnp arrays for the TPU solver.
"""
import numpy as np


def _is_scalar_dtype(t):
    """True if ``t`` is (convertible to) a concrete numpy scalar dtype."""
    try:
        return np.dtype(t).kind not in 'O'
    except TypeError:
        return False


class common_min_type:
    """Smallest common dtype over values or types (reference
    ``typetool.py:26``)."""

    @staticmethod
    def of_values(iterable, coerce=True, min_float=np.float32,
                  ensure_signed=True):
        t = None
        for i in iterable:
            r = np.min_scalar_type(i) if np.isscalar(i) else type(i)
            if ensure_signed and isinstance(r, np.dtype) and r.kind == 'u':
                r = np.promote_types(r, np.int8)
            t = t if t is not None else r
            if t != r:
                if coerce:
                    if isinstance(t, np.dtype) and isinstance(r, np.dtype):
                        t = np.promote_types(t, r)
                    else:
                        return None
                else:
                    return None
        if isinstance(t, np.dtype) and t.kind == 'f':
            t = np.promote_types(t, min_float)
        return t

    @staticmethod
    def of_types(types, coerce=True, min_float=np.float32,
                 ensure_signed=True):
        t = None
        for r in types:
            if ensure_signed and isinstance(r, np.dtype) and r.kind == 'u':
                r = np.promote_types(r, np.int8)
            t = t if t is not None else r
            if t != r:
                if coerce:
                    if isinstance(t, np.dtype) and isinstance(r, np.dtype):
                        t = np.promote_types(t, r)
                    else:
                        return None
                else:
                    return None
        if isinstance(t, np.dtype) and t.kind == 'f':
            t = np.promote_types(t, min_float)
        return t


class common_concrete_type:
    """Common concrete Python type of all elements, or None (reference
    ``typetool.py:114``)."""

    @staticmethod
    def of_values(iterable):
        t = None
        for i in iterable:
            r = type(i)
            t = t or r
            if t != r:
                return None
        return t

    @staticmethod
    def of_types(types):
        t = None
        for r in types:
            t = t or r
            if t != r:
                return None
        return t


def is_object_dtype(t):
    return not _is_scalar_dtype(t)
