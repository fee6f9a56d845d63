"""DataFrame — pandas-API multi-column frame.

TPU-native equivalent of cudf-python DataFrame
(reference: python/cudf/cudf/core/dataframe.py, indexed_frame.py:324).
Wraps a ``core.Table`` (pytree of Columns) + an Index; every operation
dispatches to the ops layer and stays on device.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
import pandas as pd

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, as_column, _is_null
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying, sort as sort_ops, stream_compaction as sc, unary
from cudf_tpu.frame.index import Index, MultiIndex, RangeIndex, default_index, _as_index
from cudf_tpu.frame.series import Series, _align


class DataFrame:
    def __init__(self, data=None, index=None, columns=None, dtype=None, table=None):
        if table is not None:
            self._table = table
        elif isinstance(data, DataFrame):
            self._table = data._table
            index = index if index is not None else data._index
        elif isinstance(data, Table):
            self._table = data
        elif isinstance(data, pd.DataFrame):
            other = DataFrame.from_pandas(data)
            self._table = other._table
            if index is None:
                index = other._index
        elif isinstance(data, Series):
            name = data.name if data.name is not None else 0
            self._table = Table({name: data._column})
            if index is None and not isinstance(data._index, RangeIndex):
                index = data._index
        elif data is None:
            self._table = Table({})
        elif isinstance(data, dict):
            cols: Dict[str, Column] = {}
            n = None
            lengths = [
                len(v) for v in data.values()
                if not (np.isscalar(v) or v is None or _is_null(v))
            ]
            n = lengths[0] if lengths else (len(_as_index(index)) if index is not None else 1)
            for k, v in data.items():
                if isinstance(v, Series):
                    if index is None and not isinstance(v._index, RangeIndex):
                        index = v._index
                    cols[k] = v._column
                elif np.isscalar(v) or v is None or _is_null(v):
                    cols[k] = Column.full(n, v, dtype=dt.dtype(dtype) if dtype else None)
                else:
                    cols[k] = as_column(v, dtype=dt.dtype(dtype) if dtype else None)
            self._table = Table(cols)
        elif isinstance(data, np.ndarray) and data.ndim == 2:
            names = columns if columns is not None else list(range(data.shape[1]))
            self._table = Table({n: as_column(data[:, i])
                                 for i, n in enumerate(names)})
            columns = None
        elif isinstance(data, (list, tuple)):
            if data and isinstance(data[0], dict):  # records
                keys = list(dict.fromkeys(k for r in data for k in r))
                _dt = dt.dtype(dtype) if dtype else None
                self._table = Table({k: as_column([r.get(k) for r in data],
                                                  dtype=_dt) for k in keys})
            elif not data and columns is None:
                # pandas: DataFrame([]) has ZERO columns (not one named 0)
                self._table = Table({})
            else:
                names = columns if columns is not None else [0]
                _dt = dt.dtype(dtype) if dtype else None
                if data and isinstance(data[0], (list, tuple)):
                    ncol = len(data[0])
                    names = columns if columns is not None else list(range(ncol))
                    self._table = Table({n: as_column([r[i] for r in data],
                                                      dtype=_dt)
                                         for i, n in enumerate(names)})
                    columns = None
                else:
                    self._table = Table({names[0]: as_column(list(data),
                                                             dtype=_dt)})
                    columns = None
        else:
            raise TypeError(f"cannot construct DataFrame from {type(data)}")
        if columns is not None and not isinstance(data, (np.ndarray, list, tuple)):
            existing = [c for c in columns if c in self._table.names]
            self._table = self._table.select(existing)
            for c in columns:
                if c not in self._table.names:
                    n = self._table.num_rows
                    self._table = self._table.insert(c, Column.full(n, None, dtype=dt.FLOAT64))
            self._table = self._table.select(list(columns))
        self._index: Index = (
            _as_index(index) if index is not None else default_index(self._table.num_rows)
        )
        if len(self._index) != self._table.num_rows:
            if self._table.num_columns == 0:
                pass
            else:
                raise ValueError("index length mismatch")

    @classmethod
    def _from(cls, table: Table, index: Index) -> "DataFrame":
        df = cls.__new__(cls)
        df._table = table
        df._index = index
        return df

    # ------------------------------------------------------------------
    @property
    def index(self) -> Index:
        return self._index

    @index.setter
    def index(self, value):
        idx = _as_index(value)
        if len(idx) != len(self):
            raise ValueError("length mismatch")
        self._index = idx

    @property
    def columns(self):
        import pandas as pd

        return pd.Index(self._table.names)

    @columns.setter
    def columns(self, names):
        names = list(names)
        if len(names) != self._table.num_columns:
            raise ValueError("length mismatch")
        self._table = Table.from_pairs(names, self._table.columns)

    @property
    def dtypes(self):
        import pandas as pd

        return pd.Series(
            [c.dtype.to_numpy() for c in self._table.columns], index=list(self._table.names)
        )

    @property
    def shape(self):
        return (len(self), self._table.num_columns)

    @property
    def size(self) -> int:
        return len(self) * self._table.num_columns

    @property
    def ndim(self) -> int:
        return 2

    @property
    def empty(self) -> bool:
        return len(self) == 0 or self._table.num_columns == 0

    @property
    def values(self):
        return np.column_stack([c.to_numpy() for c in self._table.columns])

    def __len__(self) -> int:
        return self._table.num_rows

    def __contains__(self, name):
        return name in self._table

    def __iter__(self):
        return iter(self._table.names)

    def __repr__(self):
        return repr(self.to_pandas())

    def copy(self, deep=True) -> "DataFrame":
        return DataFrame._from(self._table, self._index.copy())

    def items(self):
        for n in self._table.names:
            yield n, self[n]

    iteritems = items

    def iterrows(self):
        pdf = self.to_pandas()
        return pdf.iterrows()

    def itertuples(self, index=True, name="Pandas"):
        return self.to_pandas().itertuples(index=index, name=name)

    def keys(self):
        return self.columns

    # ------------------------------------------------------------------
    # export / import
    # ------------------------------------------------------------------
    def to_pandas(self):
        # construct with REAL pandas even when the cudf_tpu.pandas
        # accelerator is installed (sys.modules["pandas"].DataFrame is the
        # proxy class there; building a proxy from to_pandas would make
        # __repr__ recurse fast→slow→fast forever)
        import sys

        pd = sys.modules.get("_slow_pandas") or __import__("pandas")
        from cudf_tpu.frame.series import column_to_pandas_array

        data = {n: column_to_pandas_array(c, pd) for n, c in self._table.items()}
        return pd.DataFrame(data, index=self._index.to_pandas())

    def to_arrow(self):
        return self._table.to_arrow()

    def __arrow_c_array__(self, requested_schema=None):
        return self._table.__arrow_c_array__(requested_schema)

    def __arrow_c_stream__(self, requested_schema=None):
        return self._table.__arrow_c_stream__(requested_schema)

    def to_numpy(self):
        return self.values

    def to_dict(self, orient="dict"):
        return self.to_pandas().to_dict(orient)

    def to_records(self, index=True):
        return self.to_pandas().to_records(index=index)

    @classmethod
    def from_pandas(cls, pdf) -> "DataFrame":
        import pandas as pd

        idx = None
        if isinstance(pdf.index, pd.MultiIndex):
            cols = [as_column(pdf.index.get_level_values(i)) for i in range(pdf.index.nlevels)]
            idx = MultiIndex(cols, list(pdf.index.names))
        elif not isinstance(pdf.index, pd.RangeIndex):
            idx = Index(as_column(pd.Series(pdf.index)), name=pdf.index.name)
        return cls._from(Table.from_pandas(pdf.reset_index(drop=True)),
                         idx if idx is not None else default_index(len(pdf)))

    @classmethod
    def from_arrow(cls, tbl) -> "DataFrame":
        t = Table.from_arrow(tbl)
        return cls._from(t, default_index(t.num_rows))

    @classmethod
    def from_records(cls, data, columns=None) -> "DataFrame":
        return cls(list(data), columns=columns)

    @classmethod
    def from_dict(cls, data, orient="columns") -> "DataFrame":
        if orient == "columns":
            return cls(data)
        if orient == "index":
            import pandas as pd

            return cls.from_pandas(pd.DataFrame.from_dict(data, orient="index"))
        raise ValueError(orient)

    def to_csv(self, path=None, **kw):
        from cudf_tpu.io.csv import write_csv

        return write_csv(self, path, **kw)

    def to_parquet(self, path, **kw):
        from cudf_tpu.io.parquet import write_parquet

        return write_parquet(self, path, **kw)

    def to_json(self, path=None, **kw):
        from cudf_tpu.io.json import write_json

        return write_json(self, path, **kw)

    def to_tpudf(self, path):
        """Near-memcpy fast format (cudftable equivalent, io/cudftable.cpp)."""
        from cudf_tpu.io.tpudf_file import write_tpudf

        return write_tpudf(self, path)

    def to_feather(self, path, **kw):
        from cudf_tpu.io.feather import write_feather

        return write_feather(self, path, **kw)

    def to_orc(self, path, **kw):
        from cudf_tpu.io.orc import write_orc

        return write_orc(self, path, **kw)

    # ------------------------------------------------------------------
    # column access
    # ------------------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str) or np.isscalar(key):
            return Series._from(self._table[key], self._index, key)
        if isinstance(key, Series) and key.dtype.is_bool:
            return self._filter(key)
        if isinstance(key, slice):
            return self.iloc[key]
        if isinstance(key, (list, np.ndarray)) and len(key) and isinstance(key[0], (bool, np.bool_)):
            return self._filter(Series(np.asarray(key), index=self._index))
        if isinstance(key, (list, tuple, np.ndarray)):
            return DataFrame._from(self._table.select(list(key)), self._index)
        raise KeyError(key)

    def __setitem__(self, key, value):
        if isinstance(key, (list, np.ndarray)) and not isinstance(key, str):
            # multi-column assign
            if isinstance(value, DataFrame):
                for k, vn in zip(key, value._table.names):
                    self[k] = value[vn]
                return
            raise NotImplementedError("multi-column assignment needs a DataFrame")
        if isinstance(value, Series):
            if not value._index.equals(self._index) and len(self) == len(value):
                col = value._column
            elif not value._index.equals(self._index):
                pos = value._index.get_indexer_for(self._index._column)
                col = copying.gather(value._column, pos, bounds_check=True)
            else:
                col = value._column
        elif np.isscalar(value) or value is None or _is_null(value):
            col = Column.full(len(self), value)
        else:
            col = as_column(value)
        if self._table.num_columns == 0 and len(self._index) == 0:
            self._index = default_index(col.length)
        self._table = self._table.insert(key, col)

    def __getattr__(self, name):
        try:
            table = object.__getattribute__(self, "_table")
        except AttributeError:
            raise AttributeError(name)
        if name in table.names:
            return self[name]
        raise AttributeError(name)

    def __delitem__(self, key):
        self._table = self._table.drop([key])

    def pop(self, key) -> Series:
        s = self[key]
        del self[key]
        return s

    def insert(self, loc, name, value):
        col = value._column if isinstance(value, Series) else (
            Column.full(len(self), value) if np.isscalar(value) or value is None else as_column(value)
        )
        self._table = self._table.insert(name, col, loc=loc)

    def assign(self, **kwargs) -> "DataFrame":
        out = self.copy()
        for k, v in kwargs.items():
            out[k] = v(out) if callable(v) else v
        return out

    def rename(self, mapper=None, columns=None, index=None, axis=0, **kw) -> "DataFrame":
        if mapper is not None:
            if axis in (1, "columns"):
                columns = mapper
            else:
                index = mapper
        out = self.copy()
        if columns is not None:
            m = columns if isinstance(columns, dict) else {
                c: columns(c) for c in self._table.names}
            out._table = out._table.rename(m)
        if index is not None:
            # index relabeling is label metadata: map on host
            labels = self._index.to_pandas().tolist()
            fn = (index.get if isinstance(index, dict) else index)
            new = [fn(l) if not isinstance(index, dict) else index.get(l, l)
                   for l in labels]
            out._index = Index(new, name=self._index.name)
        return out

    def drop(self, labels=None, axis=0, columns=None, index=None, errors="raise") -> "DataFrame":
        if columns is not None or axis in (1, "columns"):
            names = columns if columns is not None else labels
            names = [names] if isinstance(names, str) else list(names)
            if errors == "raise":
                for n in names:
                    if n not in self._table:
                        raise KeyError(n)
            return DataFrame._from(self._table.drop(names), self._index)
        labels = index if index is not None else labels
        labels = [labels] if np.isscalar(labels) else list(labels)
        pos = self._index.get_indexer_for(labels)
        n = len(self)
        keep_mask = jnp.ones((n,), jnp.bool_).at[jnp.clip(pos, 0, n - 1)].set(pos < 0)
        keep = sc.filter_indices(keep_mask)
        return self.take(keep)

    # ------------------------------------------------------------------
    # row access
    # ------------------------------------------------------------------
    @property
    def iloc(self):
        return _DataFrameILoc(self)

    @property
    def loc(self):
        return _DataFrameLoc(self)

    def take(self, indices) -> "DataFrame":
        idx = jnp.asarray(indices, dtype=jnp.int64) if not isinstance(indices, jnp.ndarray) else indices.astype(jnp.int64)
        return DataFrame._from(
            copying.gather_table(self._table, idx, bounds_check=False), self._index.take(idx)
        )

    def head(self, n=5) -> "DataFrame":
        return self.iloc[:n]

    def tail(self, n=5) -> "DataFrame":
        if n == 0:
            return self.iloc[0:0]
        if n < 0:
            # pandas: tail(-n) = all rows except the first n
            return self.iloc[-n:]
        return self.iloc[len(self) - min(n, len(self)):]

    def _filter(self, mask: Series) -> "DataFrame":
        m = mask._column.data
        if mask._column.validity is not None:
            m = m & mask._column.validity
        keep = sc.filter_indices(m)
        return self.take(keep)

    def sample(self, n=None, frac=None, replace=False, random_state=0):
        import jax

        if n is None:
            n = int(round((frac or 1.0) * len(self)))
        key = jax.random.PRNGKey(int(random_state or 0))
        if replace:
            idx = jax.random.randint(key, (n,), 0, len(self), dtype=jnp.int64)
        else:
            idx = jax.random.permutation(key, len(self))[:n].astype(jnp.int64)
        return self.take(idx)

    def reset_index(self, level=None, drop=False) -> "DataFrame":
        if level is not None:
            # partial reset: named/numbered levels become columns, the
            # rest stay as the index (pandas level= semantics)
            levels = [level] if not isinstance(level, (list, tuple)) \
                else list(level)
            if isinstance(self._index, MultiIndex):
                names = list(self._index.names)
                sel = [names[lv] if isinstance(lv, int) else lv
                       for lv in levels]
                keep = [(c, nm) for c, nm in
                        zip(self._index._columns, names) if nm not in sel]
                out_cols: Dict[str, Column] = {}
                if not drop:
                    for i, (c, nm) in enumerate(
                            zip(self._index._columns, names)):
                        if nm in sel:
                            out_cols[nm if nm is not None
                                     else f"level_{i}"] = c
                for n, c in self._table.items():
                    out_cols[n] = c
                if len(keep) == 0:
                    idx = default_index(len(self))
                elif len(keep) == 1:
                    idx = Index(column=keep[0][0], name=keep[0][1])
                else:
                    idx = MultiIndex([c for c, _ in keep],
                                     [nm for _, nm in keep])
                return DataFrame._from(Table(out_cols), idx)
            # single index: level must refer to it; same as full reset
        if drop:
            return DataFrame._from(self._table, default_index(len(self)))
        out_cols: Dict[str, Column] = {}
        if isinstance(self._index, MultiIndex):
            for i, (c, nm) in enumerate(zip(self._index._columns, self._index.names)):
                out_cols[nm if nm is not None else f"level_{i}"] = c
        else:
            nm = self._index.name if self._index.name is not None else "index"
            out_cols[nm] = self._index._column
        for n, c in self._table.items():
            out_cols[n] = c
        return DataFrame._from(Table(out_cols), default_index(len(self)))

    def set_index(self, keys, drop=True) -> "DataFrame":
        if isinstance(keys, str):
            keys = [keys]
        if len(keys) == 1:
            idx = Index(column=self._table[keys[0]], name=keys[0])
        else:
            idx = MultiIndex([self._table[k] for k in keys], keys)
        table = self._table.drop(keys) if drop else self._table
        return DataFrame._from(table, idx)

    def set_axis(self, labels, axis=0):
        if axis in (0, "index"):
            return DataFrame._from(self._table, _as_index(labels))
        out = self.copy()
        out.columns = labels
        return out

    # ------------------------------------------------------------------
    # missing data
    # ------------------------------------------------------------------
    def isna(self) -> "DataFrame":
        return self._per_column(lambda s: s.isna())

    isnull = isna

    def notna(self) -> "DataFrame":
        return self._per_column(lambda s: s.notna())

    notnull = notna

    def fillna(self, value=None, method=None) -> "DataFrame":
        if isinstance(value, dict):
            out = self.copy()
            for k, v in value.items():
                if k in out._table:
                    out[k] = out[k].fillna(v)
            return out
        return self._per_column(lambda s: s.fillna(value, method))

    def ffill(self):
        return self._per_column(lambda s: s.ffill())

    def bfill(self):
        return self._per_column(lambda s: s.bfill())

    def dropna(self, axis=0, how="any", subset=None, thresh=None) -> "DataFrame":
        names = subset if subset is not None else list(self._table.names)
        from cudf_tpu.ops._utils import materialize_validity
        from cudf_tpu.ops.replace import nans_to_nulls

        masks = []
        for n in names:
            c = self._table[n]
            if c.dtype.is_float:
                c = nans_to_nulls(c)
            masks.append(materialize_validity(c))
        if thresh is not None:
            cnt = sum(m.astype(jnp.int64) for m in masks)
            keep_m = cnt >= thresh
        elif how == "any":
            keep_m = masks[0]
            for m in masks[1:]:
                keep_m = keep_m & m
        else:
            keep_m = masks[0]
            for m in masks[1:]:
                keep_m = keep_m | m
        return self.take(sc.filter_indices(keep_m))

    # ------------------------------------------------------------------
    # per-column mapping
    # ------------------------------------------------------------------
    def _per_column(self, fn) -> "DataFrame":
        cols = {}
        for n in self._table.names:
            cols[n] = fn(self[n])._column
        return DataFrame._from(Table(cols), self._index)

    def astype(self, dtype, copy=None, errors="raise") -> "DataFrame":
        if isinstance(dtype, dict):
            out = self.copy()
            for k, v in dtype.items():
                out[k] = out[k].astype(v)
            return out
        return self._per_column(lambda s: s.astype(dtype, errors=errors))

    def abs(self):
        return self._per_column(lambda s: s.abs())

    def round(self, decimals=0):
        return self._per_column(
            lambda s: s.round(decimals) if s.dtype.is_numeric else s
        )

    def clip(self, lower=None, upper=None):
        return self._per_column(lambda s: s.clip(lower, upper))

    def where(self, cond, other=None):
        if isinstance(cond, DataFrame):
            cols = {n: self[n].where(cond[n], other)._column for n in self._table.names}
            return DataFrame._from(Table(cols), self._index)
        return self._per_column(lambda s: s.where(cond, other))

    def mask(self, cond, other=None):
        if isinstance(cond, DataFrame):
            cols = {n: self[n].mask(cond[n], other)._column for n in self._table.names}
            return DataFrame._from(Table(cols), self._index)
        return self._per_column(lambda s: s.mask(cond, other))

    def replace(self, to_replace, value=None):
        return self._per_column(lambda s: s.replace(to_replace, value))

    def shift(self, periods=1, freq=None, axis=0, fill_value=None):
        if freq is not None:
            import pandas as pd

            idx = self._index.to_pandas().shift(periods, freq=freq)
            out = self.copy()
            out._index = Index(pd.Series(idx), name=self._index.name)
            return out
        if axis in (1, "columns"):
            # column-axis shift: realign columns positionally
            names = list(self._table.names)
            cols = {}
            for i, n in enumerate(names):
                j = i - periods
                if 0 <= j < len(names):
                    src = self._table[names[j]]
                    cols[n] = src
                else:
                    cols[n] = Column.full(len(self), None,
                                          dtype=self._table[n].dtype)
            return DataFrame._from(Table(cols), self._index)
        return self._per_column(lambda s: s.shift(periods, fill_value=fill_value))

    def diff(self, periods=1):
        return self._per_column(lambda s: s.diff(periods))

    def cumsum(self):
        return self._num_per_column(lambda s: s.cumsum())

    def cumprod(self):
        return self._num_per_column(lambda s: s.cumprod())

    def cummin(self):
        return self._num_per_column(lambda s: s.cummin())

    def cummax(self):
        return self._num_per_column(lambda s: s.cummax())

    def _num_per_column(self, fn) -> "DataFrame":
        cols = {}
        for n in self._table.names:
            s = self[n]
            cols[n] = fn(s)._column if (s.dtype.is_numeric or s.dtype.is_bool) else s._column
        return DataFrame._from(Table(cols), self._index)

    # ------------------------------------------------------------------
    # arithmetic (column-broadcast)
    # ------------------------------------------------------------------
    def _binop(self, other, op):
        if isinstance(other, DataFrame):
            names = [n for n in self._table.names if n in other._table]
            cols = {n: self[n]._binop(other[n], op)._column for n in names}
            return DataFrame._from(Table(cols), self._index)
        if isinstance(other, Series):
            # align on columns (pandas broadcasts series over columns)
            labels = other._index.to_pylist()
            cols = {}
            for n in self._table.names:
                if n in labels:
                    cols[n] = self[n]._binop(other.loc[n], op)._column
                else:
                    cols[n] = Column.full(len(self), None, dtype=dt.FLOAT64)
            return DataFrame._from(Table(cols), self._index)
        return self._per_column(lambda s: s._binop(other, op))

    # ------------------------------------------------------------------
    # reductions
    # ------------------------------------------------------------------
    def _reduce(self, name: str, numeric_only=False, **kw) -> Series:
        vals = []
        names = []
        for n in self._table.names:
            s = self[n]
            if numeric_only and not (s.dtype.is_numeric or s.dtype.is_bool):
                continue
            if name in ("sum", "mean", "std", "var", "median", "prod", "sem",
                        "skew", "kurtosis") and s.dtype.is_string:
                continue
            vals.append(getattr(s, name)(**kw))
            names.append(n)
        return Series(vals, index=Index(names))

    def sum(self, axis=0, numeric_only=False, **kw):
        if axis in (1, "columns"):
            return self._row_reduce("sum")
        return self._reduce("sum", numeric_only)

    def mean(self, axis=0, numeric_only=False, **kw):
        if axis in (1, "columns"):
            return self._row_reduce("mean")
        return self._reduce("mean", numeric_only)

    def min(self, axis=0, numeric_only=False, **kw):
        return self._reduce("min", numeric_only)

    def max(self, axis=0, numeric_only=False, **kw):
        return self._reduce("max", numeric_only)

    def std(self, axis=0, ddof=1, numeric_only=False, **kw):
        return self._reduce("std", numeric_only, ddof=ddof)

    def var(self, axis=0, ddof=1, numeric_only=False, **kw):
        return self._reduce("var", numeric_only, ddof=ddof)

    def median(self, axis=0, numeric_only=False, **kw):
        return self._reduce("median", numeric_only)

    def prod(self, axis=0, numeric_only=False, **kw):
        return self._reduce("prod", numeric_only)

    def count(self, axis=0):
        return self._reduce("count")

    def nunique(self, axis=0):
        return self._reduce("nunique")

    def any(self, axis=0):
        return self._reduce("any")

    def all(self, axis=0):
        return self._reduce("all")

    def _row_reduce(self, name: str) -> Series:
        num = [n for n in self._table.names if self._table[n].dtype.is_numeric]
        if not num:
            return Series([], index=self._index)
        datas = []
        valids = []
        for n in num:
            c = self._table[n]
            d = c.data.astype(jnp.float64)
            v = jnp.ones((len(self),), jnp.bool_) if c.validity is None else c.validity
            if c.dtype.is_float:
                v = v & ~jnp.isnan(c.data)
            datas.append(jnp.where(v, d, 0.0))
            valids.append(v)
        stacked = jnp.stack(datas)
        vstacked = jnp.stack(valids)
        total = stacked.sum(axis=0)
        cnt = vstacked.sum(axis=0)
        if name == "sum":
            out = total
        else:
            out = total / jnp.maximum(cnt, 1)
        col = Column(dt.FLOAT64, len(self), data=out)
        return Series._from(col, self._index, None)

    def describe(self):
        import pandas as pd

        num = [n for n in self._table.names if self._table[n].dtype.is_numeric]
        rows = ["count", "mean", "std", "min", "25%", "50%", "75%", "max"]
        data = {}
        for n in num:
            s = self[n]
            data[n] = [float(s.count()), s.mean(), s.std(), s.min(),
                       s.quantile(0.25), s.quantile(0.5), s.quantile(0.75), s.max()]
        return DataFrame(data, index=Index(rows))

    def quantile(self, q=0.5, numeric_only=True, **kw):
        if not numeric_only and any(
                self._table[n].dtype.is_temporal for n in self._table.names):
            # datetime/timedelta quantiles have pandas-specific NaT and
            # unit rules — host tier (the proxy falls back)
            raise NotImplementedError("non-numeric quantile")
        num = [n for n in self._table.names if self._table[n].dtype.is_numeric]
        vals = [self[n].quantile(q) for n in num]
        if np.isscalar(q):
            return Series(vals, index=Index(num), name=q)
        return DataFrame({n: v for n, v in zip(num, vals)}, index=Index(list(np.atleast_1d(q))))

    def memory_usage(self, deep=False):
        vals = [c.nbytes for c in self._table.columns]
        return Series(vals, index=Index(list(self._table.names)))

    def idxmax(self, axis=0):
        return self._reduce("idxmax")

    def idxmin(self, axis=0):
        return self._reduce("idxmin")

    def mode(self, axis=0):
        modes = {n: self[n].mode() for n in self._table.names}
        width = max((len(m) for m in modes.values()), default=0)
        cols = {}
        for n, m in modes.items():
            pad = width - len(m)
            col = m._column
            if pad:
                col = copying.concatenate([col, Column.full(pad, None, dtype=col.dtype)])
            cols[n] = col
        return DataFrame._from(Table(cols), default_index(width))

    # ------------------------------------------------------------------
    # sorting / dedup
    # ------------------------------------------------------------------
    def sort_values(self, by, ascending=True, na_position="last", ignore_index=False, kind=None):
        by = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(by) if isinstance(ascending, bool) else list(ascending)
        from cudf_tpu.ops.replace import nans_to_nulls

        keys = []
        for n in by:
            c = self._table[n]
            keys.append(nans_to_nulls(c) if c.dtype.is_float else c)
        order = sort_ops.sorted_order(keys, asc, na_position)
        out = self.take(order)
        if ignore_index:
            out._index = default_index(len(out))
        return out

    def sort_index(self, ascending=True):
        order = sort_ops.sorted_order([self._index._column], [ascending], "last")
        return self.take(order)

    def _nselect(self, n, columns, keep, largest: bool):
        """pandas n-select semantics: string/object columns raise, ties
        resolve in original (keep='first') or reversed (keep='last')
        row order, keep='all' retains every boundary tie."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        method = "nlargest" if largest else "nsmallest"
        for c in cols:
            d = self._table[c].dtype
            if d.is_string or d.is_dictionary:
                raise TypeError(
                    f"Column {c!r} has dtype str, cannot use method "
                    f"{method!r} with this dtype")
        n = max(int(n), 0)
        keys = [self._table[c] for c in cols]
        pos = Column.from_numpy(np.arange(len(self), dtype=np.int64))
        order = sort_ops.sorted_order(
            keys + [pos], [not largest] * len(cols) + [keep != "last"],
            "last")
        out = self.take(order)
        if keep == "all" and len(out) > n and n > 0:
            bound = out.iloc[n - 1]
            eq = None
            for c in cols:
                e = (out[c] == bound[c]).to_numpy()
                eq = e if eq is None else (eq & e)
            # ties are contiguous after the sort: extend past n while
            # rows still equal the boundary on every key column
            ext = n
            while ext < len(out) and bool(eq[ext]):
                ext += 1
            n = ext
        return out.head(n)

    def nlargest(self, n, columns, keep="first"):
        return self._nselect(n, columns, keep, largest=True)

    def nsmallest(self, n, columns, keep="first"):
        return self._nselect(n, columns, keep, largest=False)

    def drop_duplicates(self, subset=None, keep="first", ignore_index=False):
        names = [subset] if isinstance(subset, str) else list(subset or self._table.names)
        idx = sc.distinct_indices([self._table[n] for n in names],
                                  keep if keep is not False else "none")
        out = self.take(idx)
        if ignore_index:
            out._index = default_index(len(out))
        return out

    def duplicated(self, subset=None, keep="first") -> Series:
        names = [subset] if isinstance(subset, str) else list(subset or self._table.names)
        mask = sc.duplicated_mask([self._table[n] for n in names],
                                  keep if keep is not False else "none")
        return Series._from(Column(dt.BOOL8, len(self), data=mask), self._index, None)

    def hash_values(self, method="murmur3", seed=0) -> Series:
        """Per-row hash (cudf DataFrame.hash_values; cpp/include/cudf/hashing.hpp).

        ``murmur3``/``xxhash64`` run on device; md5/sha* are host checksums.
        """
        from cudf_tpu.ops import hashing

        col = hashing.hash_values(list(self._table.columns), method, seed)
        return Series._from(col, self._index, None)

    def value_counts(self, subset=None, normalize=False, sort=True, ascending=False, dropna=True):
        names = [subset] if isinstance(subset, str) else list(subset or self._table.names)
        gb = self.groupby(names, dropna=dropna, sort=not sort)
        out = gb.size()
        if normalize:
            out = out / len(self)
        if sort:
            out = out.sort_values(ascending=ascending)
        out.name = "proportion" if normalize else "count"
        return out

    # ------------------------------------------------------------------
    # merge / join / groupby
    # ------------------------------------------------------------------
    def merge(self, right, on=None, how="inner", left_on=None, right_on=None,
              left_index=False, right_index=False, suffixes=("_x", "_y"), sort=False):
        from cudf_tpu.frame.join import merge as _merge

        return _merge(self, right, on=on, how=how, left_on=left_on, right_on=right_on,
                      left_index=left_index, right_index=right_index,
                      suffixes=suffixes, sort=sort)

    def join(self, other, on=None, how="left", lsuffix="", rsuffix=""):
        from cudf_tpu.frame.join import merge as _merge

        if on is not None:
            # left column(s) against the right index (pandas join(on=...))
            right = other.reset_index()
            ridx_name = other._index.name if other._index.name is not None else "index"
            out = _merge(self, right, left_on=on, right_on=ridx_name, how=how,
                         suffixes=(lsuffix or "_x", rsuffix or "_y"))
            return out.drop(columns=[ridx_name]) if ridx_name in out._table and ridx_name != on else out
        return _merge(self, other, how=how, left_index=True, right_index=True,
                      suffixes=(lsuffix or "_x", rsuffix or "_y"))

    def groupby(self, by=None, level=None, sort=False, dropna=True,
                as_index=True, group_keys=True, observed=False):
        from cudf_tpu.frame.groupby import DataFrameGroupBy

        return DataFrameGroupBy(self, by, level=level, sort=sort, dropna=dropna, as_index=as_index)

    def pivot_table(self, values=None, index=None, columns=None, aggfunc="mean"):
        from cudf_tpu.frame.reshape import pivot_table

        return pivot_table(self, values=values, index=index, columns=columns, aggfunc=aggfunc)

    def melt(self, id_vars=None, value_vars=None, var_name=None, value_name="value"):
        from cudf_tpu.frame.reshape import melt

        return melt(self, id_vars=id_vars, value_vars=value_vars,
                    var_name=var_name, value_name=value_name)

    def explode(self, column, ignore_index=False):
        from cudf_tpu.core.dtypes import TypeId
        from cudf_tpu.ops import lists

        col = self._table[column]
        if col.dtype.id != TypeId.LIST:
            return self.copy()
        child, row_map = lists.explode(col, outer=True)
        cols = {}
        for n, c in self._table.items():
            cols[n] = child if n == column else copying.gather(c, row_map, bounds_check=False)
        idx = default_index(child.length) if ignore_index else self._index.take(row_map)
        return DataFrame._from(Table(cols), idx)

    def stack(self, level=-1, dropna=True):
        """host tier (pivot-family reshape; device melt covers the common
        long-format path)"""
        import pandas as pd

        res = self.to_pandas().stack(level)
        flat = res.reset_index(drop=False)
        if isinstance(flat, pd.Series):
            flat = flat.to_frame("0")
        flat.columns = [str(c) for c in flat.columns]
        return DataFrame.from_pandas(flat)

    def unstack(self, level=-1):
        from cudf_tpu.frame.reshape import unstack as _unstack

        return _unstack(self, level)

    def transpose(self):
        num = all(c.dtype.is_numeric for c in self._table.columns)
        if num and self._table.num_columns:
            # device transpose (cpp/src/transpose/transpose.cu equivalent)
            mat = jnp.stack([c.data.astype(jnp.float64) for c in self._table.columns])
            cols = {}
            labels = self._index.to_pylist()
            for j in range(len(self)):
                cols[labels[j]] = Column(dt.FLOAT64, self._table.num_columns, data=mat[:, j])
            return DataFrame._from(Table(cols), Index(list(self._table.names)))
        return DataFrame.from_pandas(self.to_pandas().T)

    @property
    def T(self):
        return self.transpose()

    # ------------------------------------------------------------------
    # apply / query / eval
    # ------------------------------------------------------------------
    def agg(self, func, axis=0):
        if isinstance(func, dict):
            vals, names = [], []
            for col_name, f in func.items():
                fs = [f] if isinstance(f, str) else list(f)
                for fn in fs:
                    vals.append(getattr(self[col_name], fn)())
                    names.append(col_name if len(fs) == 1 else f"{col_name}_{fn}")
            return Series(vals, index=Index(names))
        if isinstance(func, str):
            return self._reduce(func)
        if isinstance(func, (list, tuple)):
            data = {}
            for n in self._table.names:
                s = self[n]
                if s.dtype.is_numeric or s.dtype.is_bool:
                    data[n] = [getattr(s, f)() for f in func]
            return DataFrame(data, index=Index(list(func)))
        raise TypeError(func)

    aggregate = agg

    def transform(self, func):
        if isinstance(func, str):
            return self._per_column(lambda s: getattr(s, func)())
        return self._per_column(lambda s: s.apply(func))

    def apply(self, func, axis=0, **kw):
        if axis in (0, "index"):
            out = {}
            for n in self._table.names:
                r = func(self[n])
                out[n] = r
            if all(np.isscalar(v) or v is None for v in out.values()):
                return Series(list(out.values()), index=Index(list(out.keys())))
            return DataFrame(out)
        if kw.get("engine", None) == "jax":
            # rowwise UDF on device: vmap over a dict of column buffers —
            # the TPU-native replacement for numba-CUDA masked UDFs
            # (reference: core/udf/, Series.apply/DataFrame.apply JIT engine)
            import jax as _jax

            kw.pop("engine")
            if kw.pop("masked", False):
                # null-aware UDF: each field is a Masked (value, valid) pair
                # (reference: core/udf/masked_typing.py semantics)
                from cudf_tpu.utils.masked import Masked

                arrays = {}
                for n in self._table.names:
                    c = self._table[n]
                    if not (c.dtype.is_numeric or c.dtype.is_bool):
                        continue
                    v = c.validity if c.validity is not None else jnp.ones(
                        (c.length,), jnp.bool_)
                    arrays[n] = Masked(c.data, v)
                out = _jax.vmap(func)(arrays)
                if isinstance(out, Masked):
                    col = Column(dt.dtype(np.dtype(out.value.dtype)), len(self),
                                 data=out.value, validity=out.valid)
                    return Series._from(col, self._index, None)
                return Series._from(Column.from_jnp(out), self._index, None)
            arrays = {n: self._table[n].data for n in self._table.names
                      if self._table[n].dtype.is_numeric or self._table[n].dtype.is_bool}
            out = _jax.vmap(func)(arrays)
            return Series._from(Column.from_jnp(out), self._index, None)
        # axis=1: rowwise host fallback
        pdf = self.to_pandas()
        res = pdf.apply(func, axis=1, **kw)
        if hasattr(res, "to_frame") and res.ndim == 1:
            return Series(list(res.values), index=self._index)
        return DataFrame.from_pandas(res)

    def query(self, expr: str) -> "DataFrame":
        mask = self.eval(expr)
        return self._filter(mask)

    def eval(self, expr: str):
        """Evaluate a column expression (AST → ops; replaces
        cudf::compute_column / transform AST, cpp/src/transform)."""
        from cudf_tpu.frame.eval_expr import evaluate

        return evaluate(self, expr)

    def rolling(self, window, min_periods=None, center=False):
        from cudf_tpu.frame.window import Rolling

        return Rolling(self, window, min_periods, center)

    def resample(self, rule, on=None):
        from cudf_tpu.frame.resample import Resampler

        return Resampler(self, rule, on=on)

    def corr(self, method="pearson"):
        num = [n for n in self._table.names if self._table[n].dtype.is_numeric]
        k = len(num)
        out = np.ones((k, k))
        for i in range(k):
            for j in range(i + 1, k):
                c = self[num[i]].corr(self[num[j]])
                out[i, j] = out[j, i] = c
        return DataFrame({n: out[:, i] for i, n in enumerate(num)}, index=Index(num))

    def cov(self, ddof=1):
        num = [n for n in self._table.names if self._table[n].dtype.is_numeric]
        k = len(num)
        out = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                c = self[num[i]].cov(self[num[j]], ddof=ddof)
                out[i, j] = out[j, i] = c
        return DataFrame({n: out[:, i] for i, n in enumerate(num)}, index=Index(num))

    def rank(self, method="average", ascending=True, pct=False, numeric_only=False):
        cols = {}
        for n in self._table.names:
            s = self[n]
            if s.dtype.is_numeric or s.dtype.is_bool or s.dtype.is_temporal:
                cols[n] = s.rank(method=method, ascending=ascending, pct=pct)._column
        return DataFrame._from(Table(cols), self._index)

    def combine_first(self, other: "DataFrame") -> "DataFrame":
        out = self.copy()
        for n in other._table.names:
            if n in out._table:
                out[n] = out[n].combine_first(other[n])
            else:
                out[n] = other[n]
        return out

    def info(self, *a, **k):
        print(f"<class 'cudf_tpu.DataFrame'>  {len(self)} rows, {self._table.num_columns} columns")
        for n, c in self._table.items():
            print(f"  {n}: {c.dtype!r}, {c.null_count} nulls")

    def equals(self, other) -> bool:
        if not isinstance(other, DataFrame):
            return False
        if self._table.names != other._table.names or len(self) != len(other):
            return False
        return all(self[n].equals(other[n]) for n in self._table.names)

    def select_dtypes(self, include=None, exclude=None):
        def matches(d: dt.DType, spec) -> bool:
            specs = [spec] if not isinstance(spec, (list, tuple)) else spec
            for s in specs:
                if s in ("number", np.number):
                    if d.is_numeric:
                        return True
                elif s in ("object", str, "str"):
                    if d.is_string:
                        return True
                elif s == "bool" or s is bool:
                    if d.is_bool:
                        return True
                elif s == "datetime" or s == "datetime64":
                    if d.is_timestamp:
                        return True
                elif s == "category":
                    if d.is_dictionary:
                        return True
                else:
                    try:
                        if dt.dtype(s) == d:
                            return True
                    except TypeError:
                        pass
            return False

        names = list(self._table.names)
        if include is not None:
            names = [n for n in names if matches(self._table[n].dtype, include)]
        if exclude is not None:
            names = [n for n in names if not matches(self._table[n].dtype, exclude)]
        return DataFrame._from(self._table.select(names), self._index)

    @property
    def at(self):
        return self.loc

    @property
    def iat(self):
        return self.iloc


for _dunder, _op in [
    ("__add__", "add"), ("__sub__", "sub"), ("__mul__", "mul"),
    ("__truediv__", "truediv"), ("__floordiv__", "floordiv"),
    ("__mod__", "mod"), ("__pow__", "pow"),
    ("__eq__", "eq"), ("__ne__", "ne"), ("__lt__", "lt"),
    ("__gt__", "gt"), ("__le__", "le"), ("__ge__", "ge"),
    ("__and__", "bitand"), ("__or__", "bitor"), ("__xor__", "bitxor"),
]:
    def _mk(op=_op):
        def f(self, other):
            return self._binop(other, op)
        return f
    setattr(DataFrame, _dunder, _mk())


class _DataFrameILoc:
    def __init__(self, df: DataFrame):
        self._df = df

    def __getitem__(self, key):
        df = self._df
        if isinstance(key, tuple):
            rows, cols = key
            sub = df.iloc[rows] if not isinstance(rows, tuple) else df
            if isinstance(sub, dict):
                pass
            names = list(df._table.names)
            if isinstance(cols, int):
                name = names[cols]
                res = sub[name] if isinstance(sub, DataFrame) else sub[name]
                return res
            if isinstance(cols, slice):
                sel = names[cols]
            else:
                sel = [names[c] for c in np.atleast_1d(cols)]
            return sub[sel] if isinstance(sub, DataFrame) else sub[sel]
        if isinstance(key, (int, np.integer)):
            row = {n: df._table[n][int(key)] for n in df._table.names}
            return Series(list(row.values()), index=Index(list(row.keys())),
                          name=df._index[int(key)])
        if isinstance(key, slice):
            start, stop, step = key.indices(len(df))
            if step == 1:
                cols = {n: copying.slice(c, start, stop) for n, c in df._table.items()}
                return DataFrame._from(Table(cols), df._index.slice(start, stop))
            idx = jnp.arange(start, stop, step, dtype=jnp.int64)
            return df.take(idx)
        arr = np.asarray(key)
        if arr.dtype == bool:
            return df._filter(Series(arr, index=df._index))
        return df.take(jnp.asarray(arr, dtype=jnp.int64))


class _DataFrameLoc:
    def __init__(self, df: DataFrame):
        self._df = df

    def __getitem__(self, key):
        df = self._df
        if isinstance(key, tuple):
            rows, cols = key
            sub = df.loc[rows]
            if isinstance(cols, str):
                return sub[cols] if isinstance(sub, DataFrame) else sub[cols]
            if isinstance(cols, slice):
                names = list(df._table.names)
                s = names.index(cols.start) if cols.start is not None else 0
                e = names.index(cols.stop) + 1 if cols.stop is not None else len(names)
                sel = names[s:e]
            else:
                sel = list(cols)
            return sub[sel] if isinstance(sub, DataFrame) else sub[sel]
        if isinstance(key, Series) and key.dtype.is_bool:
            return df._filter(key)
        if isinstance(key, slice):
            if key.start is None and key.stop is None:
                return df.copy()
            start = 0 if key.start is None else int(df._index.get_indexer_for([key.start])[0])
            stop = len(df) - 1 if key.stop is None else int(df._index.get_indexer_for([key.stop])[0])
            return df.iloc[start:stop + 1]
        if np.isscalar(key):
            pos = df._index._positions_of(key)
            if pos.shape[0] == 0:
                raise KeyError(key)
            if pos.shape[0] == 1:
                row = {n: df._table[n][int(pos[0])] for n in df._table.names}
                return Series(list(row.values()), index=Index(list(row.keys())), name=key)
            return df.take(pos)
        arr = np.asarray(key)
        if arr.dtype == bool:
            return df._filter(Series(arr, index=df._index))
        pos = df._index.get_indexer_for(list(arr))
        missing = np.asarray(pos) < 0
        if missing.any():
            raise KeyError(list(np.asarray(arr)[missing]))
        return df.take(pos)

    def __setitem__(self, key, value):
        df = self._df
        if isinstance(key, tuple):
            rows, col = key
            if isinstance(rows, Series) and rows.dtype.is_bool:
                s = df[col] if col in df._table else Series(
                    Column.full(len(df), None), index=df._index
                )
                s = Series._from(s._column, df._index, col)
                s[rows] = value
                df[col] = s
                return
        raise NotImplementedError("loc setitem form not supported yet")
