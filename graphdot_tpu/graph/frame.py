"""Lightweight dict-of-columns frame for graph node/edge attributes.

API parity with the reference minipandas layer
(``graphdot/minipandas/dataframe.py:9``, ``series.py:7``), rebuilt on modern
numpy. Columns are 1-D numpy arrays; object columns (variable-length
features) track their common ``concrete_type`` so they can later be packed
into padded jnp arrays by :mod:`graphdot_tpu.graph.batch`.
"""
from collections import namedtuple
import numpy as np

from .typetool import common_concrete_type, common_min_type, _is_scalar_dtype


class Series(np.ndarray):
    """1-D ndarray that tracks the concrete element type of object columns
    (reference ``minipandas/series.py:7``)."""

    def __new__(cls, input):
        if isinstance(input, Series):
            return input
        if isinstance(input, np.ndarray):
            series = input.view(cls)
            if input.dtype.kind != 'O':
                series._concrete_type = series.dtype
            else:
                series._concrete_type = common_concrete_type.of_values(input)
        else:
            input = list(input)
            t = common_min_type.of_values(input)
            dtype = np.dtype(t) if _is_scalar_dtype(t) else np.dtype(object)
            series = np.empty(len(input), dtype=dtype).view(cls)
            series[:] = input
            series._concrete_type = t
        return series

    def __repr__(self):
        return np.array2string(self, separator=',', max_line_width=int(1e20))

    @property
    def concrete_type(self):
        try:
            return self._concrete_type
        except AttributeError:
            return self.dtype if self.dtype.kind != 'O' else None

    def __reduce__(self):
        recon, args, state = super().__reduce__()
        return (recon, args, (state, self.__dict__))

    def __setstate__(self, states):
        state, dict_ = states
        self.__dict__.update(**dict_)
        super().__setstate__(state)


class DataFrame:
    """Dict-of-columns data frame (reference
    ``minipandas/dataframe.py:9``)."""

    def __init__(self, data=None):
        self._data = {}
        if isinstance(data, dict):
            for key, value in data.items():
                self[key] = value

    def __getitem__(self, key):
        if isinstance(key, str):
            return self._data[key]
        elif hasattr(key, '__iter__'):
            i = np.array(key)
            if i.dtype.kind == 'b':
                return self.__class__({k: v[i] for k, v in self._data.items()})
            else:
                return self.__class__({k: self._data[k] for k in key})
        else:
            raise TypeError(f'Invalid column index {key}')

    def __setitem__(self, key, value):
        self._data[key] = Series(value)

    def __getattr__(self, name):
        if '_data' in self.__dict__ and name in self._data.keys():
            return self._data[name]
        else:
            raise AttributeError(f'Dataframe has no column {name}.')

    def __repr__(self):
        return repr(self._data)

    def __len__(self):
        return max([0] + [len(array) for array in self._data.values()])

    def __contains__(self, item):
        return item in self._data

    def __iter__(self):
        yield from self._data

    @property
    def columns(self):
        return list(self._data.keys())

    def rowtype(self, pack=True):
        """A numpy struct dtype describing one row; used as the graph
        signature for type-compatibility checks (reference
        ``dataframe.py:55-63``)."""
        cols = np.array(list(self.columns))
        ctypes = {}
        for key in cols:
            t = self[key].concrete_type
            ctypes[key] = (np.dtype(t) if _is_scalar_dtype(t)
                           else np.dtype(object))
        if pack is True:
            perm = np.argsort([-ctypes[key].itemsize for key in self.columns])
            cols = cols[perm]
        return np.dtype(
            [(str(key), ctypes[key].newbyteorder('=')) for key in cols],
            align=True
        )

    def rows(self, rowname='row'):
        """Iterate over rows as namedtuples, skipping non-identifier columns
        such as '!i'."""
        visible = [key for key in self._data if key.isidentifier()]

        class RowTuple(namedtuple(rowname, visible)):
            def __getitem__(self, key):
                if isinstance(key, str):
                    return getattr(self, key)
                else:
                    return super().__getitem__(key)

        RowTuple.__name__ = rowname

        for i in range(len(self)):
            yield RowTuple(*[self[key][i] for key in visible])

    def itertuples(self, tuplename='tuple'):
        yield from self.rows(rowname=tuplename)

    def iterrows(self, rowname='row'):
        yield from enumerate(self.rows(rowname=rowname))

    def to_pandas(self):
        import pandas as pd
        return pd.DataFrame({k: np.asarray(v) for k, v in self._data.items()})

    def copy(self, deep=False):
        if deep:
            return self.__class__({
                key: np.copy(value) for key, value in self._data.items()
            })
        else:
            return self.__class__(self._data)

    def drop(self, keys, inplace=False):
        if inplace is True:
            for key in keys:
                del self._data[key]
        else:
            return self[[k for k in self.columns if k not in keys]]
