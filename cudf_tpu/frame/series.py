"""Series — pandas-API single-column frame.

TPU-native equivalent of cudf-python Series
(reference: python/cudf/cudf/core/series.py, single_column_frame.py:43).
All compute stays on device via the ops layer; only repr/exports sync host.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, as_column, _is_null
from cudf_tpu.ops import (
    binaryop,
    copying,
    reductions,
    replace as replace_ops,
    scan as scan_ops,
    search as search_ops,
    sort as sort_ops,
    stream_compaction as sc,
    unary,
)
from cudf_tpu.frame.index import Index, MultiIndex, RangeIndex, default_index, _as_index

_BINOPS = {
    "__add__": "add", "__sub__": "sub", "__mul__": "mul",
    "__truediv__": "truediv", "__floordiv__": "floordiv", "__mod__": "mod",
    "__pow__": "pow",
    "__eq__": "eq", "__ne__": "ne", "__lt__": "lt", "__gt__": "gt",
    "__le__": "le", "__ge__": "ge",
    "__and__": "bitand", "__or__": "bitor", "__xor__": "bitxor",
}
_RBINOPS = {
    "__radd__": "add", "__rsub__": "sub", "__rmul__": "mul",
    "__rtruediv__": "truediv", "__rfloordiv__": "floordiv", "__rmod__": "mod",
    "__rpow__": "pow", "__rand__": "bitand", "__ror__": "bitor", "__rxor__": "bitxor",
}


def column_to_pandas_array(col: Column, pd):
    """Column → pandas 1-D array preserving extension dtypes: arrow-backed
    columns → ArrowExtensionArray, nullable → masked Integer/Float/Boolean
    arrays, everything else through pyarrow (keeps tz/categorical)."""
    if col.dtype.arrow:
        arr = col.to_arrow()
        return pd.arrays.ArrowExtensionArray(
            arr if not hasattr(arr, "combine_chunks") else arr)
    if col.dtype.nullable:
        # round-trip pandas nullable extension dtypes (Int64/UInt8/
        # boolean/Float64/string) through our validity instead of
        # float+NaN
        if col.dtype.is_string:
            arr = col.to_arrow()
            if hasattr(arr, "combine_chunks"):
                arr = arr.combine_chunks()
            return pd.StringDtype().__from_arrow__(arr)
        vals = np.asarray(col.data)
        mask = (~np.asarray(col.validity) if col.validity is not None
                else np.zeros(col.length, bool))
        if col.dtype.is_bool:
            return pd.arrays.BooleanArray(vals.astype(bool), mask)
        if col.dtype.is_float:
            return pd.arrays.FloatingArray(vals.astype(col.dtype.storage), mask)
        return pd.arrays.IntegerArray(vals.astype(col.dtype.storage), mask)
    return col.to_arrow().to_pandas().reset_index(drop=True).array


class Series:
    def __init__(self, data=None, index=None, dtype=None, name=None, column=None):
        if dtype is not None and data is not None:
            t = dt.dtype(dtype)
            src = getattr(data, "dtype", None)
            naive = (isinstance(src, np.dtype) and src.kind == "M") or (
                isinstance(src, dt.DType) and src.is_timestamp
                and src.tz is None)
            if t.is_timestamp and t.tz is not None and naive:
                # pandas: naive -> aware conversion must go through
                # tz_localize, construction/astype raise
                raise TypeError(
                    "Cannot use .astype to convert from timezone-naive "
                    "dtype to timezone-aware dtype. "
                    "Use ser.dt.tz_localize instead.")
        if column is not None:
            self._column = column
        elif isinstance(data, Series):
            self._column = data._column
            index = index if index is not None else data._index
            name = name if name is not None else data.name
            if dtype is not None:
                self._column = unary.cast(self._column, dt.dtype(dtype))
        elif isinstance(data, Column):
            self._column = data if dtype is None else unary.cast(data, dt.dtype(dtype))
        elif data is None or np.isscalar(data) or _is_null(data):
            if index is not None:
                n = len(_as_index(index))
                self._column = Column.full(n, data, dtype=dt.dtype(dtype) if dtype else None)
            else:
                self._column = as_column([data] if data is not None else [], dtype=dtype)
        elif isinstance(data, dict):
            index = Index(list(data.keys())) if index is None else index
            self._column = as_column(list(data.values()), dtype=dt.dtype(dtype) if dtype else None)
        else:
            self._column = as_column(data, dtype=dt.dtype(dtype) if dtype else None)
        self._index: Index = (
            _as_index(index) if index is not None else default_index(self._column.length)
        )
        if len(self._index) != self._column.length:
            raise ValueError("index length mismatch")
        self.name = name

    @classmethod
    def _from(cls, column: Column, index: Index, name=None) -> "Series":
        s = cls.__new__(cls)
        s._column = column
        s._index = index
        s.name = name
        return s

    # ------------------------------------------------------------------
    # basic protocol
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
    def dtype(self):
        return self._column.dtype

    @property
    def shape(self):
        return (len(self),)

    @property
    def size(self) -> int:
        return len(self)

    @property
    def ndim(self) -> int:
        return 1

    @property
    def empty(self) -> bool:
        return len(self) == 0

    @property
    def values(self):
        return self._column.to_numpy()

    @property
    def hasnans(self) -> bool:
        if self._column.null_count > 0:
            return True
        if self.dtype.is_float:
            return bool(jnp.any(jnp.isnan(self._column.data)))
        return False

    def __len__(self) -> int:
        return self._column.length

    def __repr__(self) -> str:
        pd_s = self.to_pandas()
        return repr(pd_s)

    def __iter__(self):
        return iter(self.to_pylist())

    def __array__(self, dtype=None):
        arr = self._column.to_numpy()
        return arr.astype(dtype) if dtype is not None else arr

    def __bool__(self):
        raise ValueError("truth value of a Series is ambiguous")

    def copy(self, deep=True) -> "Series":
        return Series._from(self._column.copy(), self._index.copy(), self.name)

    def rename(self, name=None, **kw) -> "Series":
        if callable(name) or isinstance(name, dict):
            # mapping/callable relabels the INDEX (pandas Series.rename)
            labels = self._index.to_pandas().tolist()
            new = [name.get(l, l) if isinstance(name, dict) else name(l)
                   for l in labels]
            return Series._from(self._column,
                                Index(new, name=self._index.name), self.name)
        return Series._from(self._column, self._index, name)

    # ------------------------------------------------------------------
    # export
    # ------------------------------------------------------------------
    def to_pandas(self):
        # real pandas even under the accelerator (proxy pd.Series would
        # recurse in __repr__ — see DataFrame.to_pandas)
        import sys

        pd = sys.modules.get("_slow_pandas") or __import__("pandas")
        arr = column_to_pandas_array(self._column, pd)
        return pd.Series(arr, index=self._index.to_pandas(), name=self.name)

    def to_numpy(self):
        return self._column.to_numpy()

    def to_arrow(self):
        return self._column.to_arrow()

    def __arrow_c_array__(self, requested_schema=None):
        from cudf_tpu import arrow_cdata

        return arrow_cdata.column_capsules(
            self._column, name=str(self.name) if self.name is not None else "",
            requested_schema=requested_schema)

    def tolist(self):
        return self._column.to_pylist()

    to_list = tolist

    def to_pylist(self):
        return self._column.to_pylist()

    def to_frame(self, name=None):
        from cudf_tpu.frame.dataframe import DataFrame

        nm = name if name is not None else (self.name if self.name is not None else 0)
        return DataFrame({nm: self})

    def to_jax(self) -> jnp.ndarray:
        """Zero-copy device buffer view (valid rows only meaningful)."""
        return self._column.data

    # ------------------------------------------------------------------
    # arithmetic / comparison
    # ------------------------------------------------------------------
    def _binop(self, other, op: str, reflect: bool = False) -> "Series":
        if isinstance(other, Series):
            lhs, rhs, index = _align(self, other)
        else:
            if isinstance(other, (list, np.ndarray, jnp.ndarray)):
                other = Series(other, index=self._index)
                return self._binop(other, op, reflect)
            lhs, rhs, index = self._column, other, self._index
        if reflect:
            lhs, rhs = rhs, lhs
        out = binaryop.binary_operation(lhs, rhs, op)
        # pandas numpy-dtype comparison semantics: missing values (NaN)
        # compare False (True for !=), never null.  Nullable/arrow
        # extension dtypes keep propagating NA.
        if op in ("eq", "ne", "lt", "gt", "le", "ge") and out.validity is not None:
            ext = self.dtype.nullable or self.dtype.arrow or (
                isinstance(other, Series) and (other.dtype.nullable or other.dtype.arrow))
            if not ext:
                fill = jnp.asarray(op == "ne")
                out = out.__class__(out.dtype, out.length,
                                    data=jnp.where(out.validity, out.data, fill))
        name = self.name if not isinstance(other, Series) or other.name == self.name else None
        return Series._from(out, index, name)

    def __invert__(self) -> "Series":
        if self.dtype.is_bool:
            return Series._from(unary.unary_operation(self._column, "not"), self._index, self.name)
        return Series._from(unary.unary_operation(self._column, "bit_invert"), self._index, self.name)

    def __neg__(self) -> "Series":
        return Series._from(unary.unary_operation(self._column, "negate"), self._index, self.name)

    def __abs__(self) -> "Series":
        return self.abs()

    def abs(self) -> "Series":
        return Series._from(unary.unary_operation(self._column, "abs"), self._index, self.name)

    # named binops (pandas API)
    def add(self, other, fill_value=None):
        return self._fill_binop(other, "add", fill_value)

    def sub(self, other, fill_value=None):
        return self._fill_binop(other, "sub", fill_value)

    subtract = sub

    def mul(self, other, fill_value=None):
        return self._fill_binop(other, "mul", fill_value)

    multiply = mul

    def div(self, other, fill_value=None):
        return self._fill_binop(other, "truediv", fill_value)

    truediv = div
    divide = div

    def floordiv(self, other, fill_value=None):
        return self._fill_binop(other, "floordiv", fill_value)

    def mod(self, other, fill_value=None):
        return self._fill_binop(other, "mod", fill_value)

    def pow(self, other, fill_value=None):
        return self._fill_binop(other, "pow", fill_value)

    def eq(self, other):
        return self._binop(other, "eq")

    def ne(self, other):
        return self._binop(other, "ne")

    def lt(self, other):
        return self._binop(other, "lt")

    def gt(self, other):
        return self._binop(other, "gt")

    def le(self, other):
        return self._binop(other, "le")

    def ge(self, other):
        return self._binop(other, "ge")

    def _fill_binop(self, other, op, fill_value):
        if fill_value is None:
            return self._binop(other, op)
        if isinstance(other, Series):
            # pandas flex-arithmetic semantics: align FIRST, then
            # fill_value patches positions missing from exactly ONE
            # side (incl. alignment-introduced holes); missing from
            # both stays NaN
            lhs, rhs, index = _align(self, other)
            from cudf_tpu.ops._utils import materialize_validity

            lv = materialize_validity(lhs)
            rv = materialize_validity(rhs)
            both_missing = None
            if lhs.validity is not None or rhs.validity is not None:
                both_missing = ~(lv | rv) if (
                    lhs.validity is not None
                    and rhs.validity is not None) else None
            a = Series._from(lhs, index).fillna(fill_value)
            b = Series._from(rhs, index).fillna(fill_value)
            out = a._binop(b, op)
            if both_missing is not None and bool(both_missing.any()):
                col = out._column
                v = (materialize_validity(col) & ~both_missing) \
                    if col.validity is not None else ~both_missing
                out = Series._from(col.with_validity(v), index, out.name)
            return out
        a = self.fillna(fill_value)
        return a._binop(other, op)

    def radd(self, other, fill_value=None):
        return self._fill_binop(other, "add", fill_value)

    def rsub(self, other, fill_value=None):
        s = self if fill_value is None else self.fillna(fill_value)
        return s._binop(other, "sub", reflect=True)

    # ------------------------------------------------------------------
    # indexing
    # ------------------------------------------------------------------
    @property
    def iloc(self):
        return _SeriesILoc(self)

    @property
    def loc(self):
        return _SeriesLoc(self)

    def __getitem__(self, key):
        if isinstance(key, slice):
            return self.iloc[key]
        if isinstance(key, Series) and key.dtype.is_bool:
            return self._filter(key)
        if isinstance(key, (list, np.ndarray, jnp.ndarray)):
            arr = np.asarray(key)
            if arr.dtype == bool:
                return self._filter(Series(arr, index=self._index))
            return self.loc[key]
        return self.loc[key]

    def __setitem__(self, key, value):
        _check_setitem_compat(self._column.dtype, value)
        if isinstance(key, (np.ndarray, list)) and len(key) == len(self) and all(
            isinstance(v, (bool, np.bool_)) for v in (key if isinstance(key, list) else key[:1])
        ) and (not isinstance(key, np.ndarray) or key.dtype == bool):
            key = Series(np.asarray(key, dtype=bool))
        if isinstance(key, Series) and key.dtype.is_bool:
            mask = key._column.data
            if key._column.validity is not None:
                mask = mask & key._column.validity
            if np.isscalar(value) or value is None or _is_null(value):
                self._column = replace_ops.replace_where(
                    self._column, mask, value)
            elif isinstance(value, Series) and len(value) == len(self):
                # Series rhs: aligned full-length elementwise replacement
                self._column = copying.copy_if_else(
                    mask, as_column(value), self._column)
            else:
                # list-like rhs: pandas requires length == mask.sum() and
                # scatters into the selected positions in order
                vals = as_column(value)
                sel = sc.filter_indices(mask)
                if vals.length != int(sel.shape[0]):
                    raise ValueError(
                        "cannot set using a list-like indexer with a "
                        "different length than the value")
                self._column = copying.scatter(vals, sel, self._column)
            return
        if isinstance(key, slice):
            start, stop, step = key.indices(len(self))
            idx = jnp.arange(start, stop, step, dtype=jnp.int64)
        else:
            pos = self._index.get_indexer_for([key] if np.isscalar(key) else key)
            idx = pos[pos >= 0]
        if np.isscalar(value) or value is None:
            self._column = copying.scatter_scalar(value, idx, self._column)
        else:
            self._column = copying.scatter(as_column(value), idx, self._column)

    def _filter(self, mask: "Series") -> "Series":
        m = mask._column.data
        if mask._column.validity is not None:
            m = m & mask._column.validity
        keep = sc.filter_indices(m)
        return self.take(keep)

    def take(self, indices) -> "Series":
        idx = jnp.asarray(indices, dtype=jnp.int64) if not isinstance(indices, jnp.ndarray) else indices.astype(jnp.int64)
        return Series._from(
            copying.gather(self._column, idx, bounds_check=False),
            self._index.take(idx),
            self.name,
        )

    def head(self, n: int = 5) -> "Series":
        return self.iloc[:n]

    def tail(self, n: int = 5) -> "Series":
        if n == 0:
            return self.iloc[0:0]
        if n < 0:
            # pandas: tail(-n) = all rows except the first n
            return self.iloc[-n:]
        return self.iloc[len(self) - min(n, len(self)):]

    def reset_index(self, drop=False, name=None):
        if drop:
            return Series._from(self._column, default_index(len(self)), self.name)
        from cudf_tpu.frame.dataframe import DataFrame

        idx_name = self._index.name if self._index.name is not None else "index"
        return DataFrame(
            {idx_name: Series._from(self._index._column, default_index(len(self))),
             (self.name if self.name is not None else 0): Series._from(self._column, default_index(len(self)))}
        )

    def set_axis(self, labels, axis=0):
        return Series._from(self._column, _as_index(labels), self.name)

    # ------------------------------------------------------------------
    # missing data
    # ------------------------------------------------------------------
    def isna(self) -> "Series":
        out = unary.is_null(self._column)
        if self.dtype.is_float:
            nan = unary.is_nan(self._column)
            out = binaryop.binary_operation(out, nan.with_validity(None), "or").with_validity(None)
            out = Column(dt.BOOL8, len(self), data=out.data)
        return Series._from(out, self._index, self.name)

    isnull = isna

    def notna(self) -> "Series":
        isna = self.isna()
        return Series._from(unary.unary_operation(isna._column, "not"), self._index, self.name)

    notnull = notna

    def fillna(self, value=None, method=None) -> "Series":
        if method is not None:
            col = replace_ops.ffill(self._column) if method in ("ffill", "pad") else replace_ops.bfill(self._column)
            return Series._from(col, self._index, self.name)
        col = self._column
        if self.dtype.is_float:
            col = replace_ops.nans_to_nulls(col)
        if isinstance(value, Series):
            lhs, rhs, index = _align(self, value)
            return Series._from(replace_ops.replace_nulls_column(lhs, rhs), index, self.name)
        return Series._from(replace_ops.replace_nulls_scalar(col, value), self._index, self.name)

    def ffill(self, limit=None) -> "Series":
        col = replace_ops.nans_to_nulls(self._column) if self.dtype.is_float else self._column
        return Series._from(replace_ops.ffill(col, limit), self._index, self.name)

    pad = ffill

    def bfill(self, limit=None) -> "Series":
        col = replace_ops.nans_to_nulls(self._column) if self.dtype.is_float else self._column
        return Series._from(replace_ops.bfill(col, limit), self._index, self.name)

    backfill = bfill

    def dropna(self) -> "Series":
        col = replace_ops.nans_to_nulls(self._column) if self.dtype.is_float else self._column
        if col.validity is None:
            return self.copy()
        keep = sc.filter_indices(col.validity)
        return self.take(keep)

    def interpolate(self, method="linear", **kw) -> "Series":
        # linear interpolation between valid neighbors
        if method != "linear" or kw.get("limit") is not None or kw:
            # index/spline/pad variants carry pandas-internal semantics
            raise NotImplementedError(f"interpolate(method={method!r})")
        col = replace_ops.nans_to_nulls(self._column) if self.dtype.is_float else self._column
        if col.validity is None:
            return self.copy()
        n = len(self)
        import jax

        x = col.data.astype(jnp.float64)
        idx = jnp.arange(n, dtype=jnp.float64)
        valid = col.validity
        iidx = jnp.arange(n, dtype=jnp.int64)
        prev = jax.lax.associative_scan(jnp.maximum, jnp.where(valid, iidx, -1))
        nxt_rev = jax.lax.associative_scan(jnp.maximum, jnp.where(valid[::-1], iidx, -1))
        nxt = (n - 1) - nxt_rev[::-1]
        pv = jnp.take(x, jnp.clip(prev, 0, n - 1))
        nv = jnp.take(x, jnp.clip(nxt, 0, n - 1))
        denom = jnp.maximum((nxt - prev).astype(jnp.float64), 1.0)
        interp = pv + (nv - pv) * (idx - prev.astype(jnp.float64)) / denom
        has_prev = prev >= 0
        has_next = nxt <= (n - 1)
        out = jnp.where(valid, x, jnp.where(has_prev & has_next, interp,
                        jnp.where(has_prev, pv, jnp.nan)))
        validity = valid | has_prev
        if bool(jnp.all(validity)):
            validity = None
        return Series._from(Column(dt.FLOAT64, n, data=out, validity=validity), self._index, self.name)

    # ------------------------------------------------------------------
    # reductions
    # ------------------------------------------------------------------
    def _reduce_scalar(self, value, skipna=True):
        """pandas scalar conventions: NA for nullable/arrow dtypes, NaT for
        temporal, and nan-poisoning when skipna=False with nulls present."""
        import pandas as pd

        if not skipna and self._has_nulls_or_nans():
            value = None
        is_missing = value is None or (isinstance(value, float) and np.isnan(value))
        if is_missing:
            if self.dtype.is_timestamp:
                return pd.NaT
            if self.dtype.is_duration:
                return pd.NaT
            if self.dtype.nullable or self.dtype.arrow:
                return pd.NA
            return float("nan")
        if isinstance(value, np.datetime64):
            return pd.Timestamp(value)     # pandas boxes temporal scalars
        if isinstance(value, np.timedelta64):
            return pd.Timedelta(value)
        return value

    def _has_nulls_or_nans(self) -> bool:
        col = self._column
        if col.null_count > 0:
            return True
        if col.dtype.is_float:
            return bool(jnp.any(jnp.isnan(col.data)))
        return False

    def sum(self, skipna=True, min_count=0):
        return reductions.sum(self._column, min_count)

    def prod(self, skipna=True):
        return reductions.product(self._column)

    product = prod

    def mean(self, skipna=True):
        return self._reduce_scalar(reductions.mean(self._column), skipna)

    def min(self, skipna=True):
        return self._reduce_scalar(reductions.min(self._column), skipna)

    def max(self, skipna=True):
        return self._reduce_scalar(reductions.max(self._column), skipna)

    def var(self, ddof=1, skipna=True):
        return self._reduce_scalar(reductions.var(self._column, ddof), skipna)

    def std(self, ddof=1, skipna=True):
        return self._reduce_scalar(reductions.std(self._column, ddof), skipna)

    def median(self, skipna=True):
        return self._reduce_scalar(reductions.median(self._column), skipna)

    def sem(self, ddof=1):
        n = self.count()
        return float(np.sqrt(reductions.var(self._column, ddof) / n)) if n > ddof else float("nan")

    def skew(self):
        return reductions.skew(self._column)

    def kurtosis(self):
        return reductions.kurtosis(self._column)

    kurt = kurtosis

    def any(self, skipna=True):
        got = reductions.any(self._column)
        if not skipna and self._column.null_count > 0 and (
            self.dtype.nullable or self.dtype.arrow
        ):
            # Kleene: unknowns only matter when no definite True exists
            if not got:
                import pandas as pd

                return pd.NA
        return got

    def all(self, skipna=True):
        got = reductions.all(self._column)
        if not skipna and self._column.null_count > 0 and (
            self.dtype.nullable or self.dtype.arrow
        ):
            if got:  # no definite False: nulls make it unknown
                import pandas as pd

                return pd.NA
        return got

    def count(self):
        return reductions.count(self._column)

    def nunique(self, dropna=True):
        return reductions.nunique(self._column, dropna)

    def quantile(self, q=0.5, interpolation="linear"):
        import pandas as pd

        col = self._column
        temporal = col.dtype.is_temporal
        if temporal:
            # quantile over ticks, back to Timestamp/Timedelta (pandas:
            # datetime quantiles interpolate on the tick grid)
            col = Column(dt.INT64, col.length, data=col.data.astype(jnp.int64),
                         validity=col.validity)
        out = reductions.quantile(col, q, interpolation)

        def fix(v):
            missing = v is None or (isinstance(v, float) and np.isnan(v))
            if temporal:
                if missing:
                    return pd.NaT
                unit = self.dtype.time_unit or "ns"
                iv = int(round(v))
                if self.dtype.is_timestamp:
                    return pd.Timestamp(np.datetime64(iv, unit))
                return pd.Timedelta(np.timedelta64(iv, unit))
            if missing and (self.dtype.nullable or self.dtype.arrow):
                return pd.NA
            return v

        if np.isscalar(q):
            return fix(out)
        vals = [fix(v) for v in np.atleast_1d(np.asarray(out)).tolist()]
        s = Series(vals, index=Index(list(np.atleast_1d(q))), name=self.name)
        if (self.dtype.nullable or self.dtype.arrow) and s.dtype.is_float:
            s._column = Column(
                dt.DType(s._column.dtype.id, nullable=self.dtype.nullable,
                         arrow=self.dtype.arrow),
                s._column.length, data=s._column.data,
                validity=s._column.validity)
        return s

    def idxmin(self):
        pos = reductions.argmin(self._column)
        return self._index[pos]

    def idxmax(self):
        pos = reductions.argmax(self._column)
        return self._index[pos]

    def argmin(self):
        return reductions.argmin(self._column)

    def argmax(self):
        return reductions.argmax(self._column)

    def mode(self, dropna=True) -> "Series":
        vc = self.value_counts(dropna=dropna, sort=False)
        mx = vc.max()
        top = vc[vc == mx]
        return Series._from(
            sort_ops.sort(top._index._column), default_index(len(top)), self.name
        )

    def describe(self):
        if self.dtype.is_numeric or self.dtype.is_bool:
            stats = {
                "count": float(self.count()),
                "mean": self.mean(),
                "std": self.std(),
                "min": self.min(),
                "25%": self.quantile(0.25),
                "50%": self.quantile(0.5),
                "75%": self.quantile(0.75),
                "max": self.max(),
            }
        else:
            vc = self.value_counts()
            stats = {
                "count": self.count(),
                "unique": self.nunique(),
                "top": vc._index[0] if len(vc) else None,
                "freq": vc.iloc[0] if len(vc) else None,
            }
        return Series(list(stats.values()), index=Index(list(stats.keys())), name=self.name)

    # ------------------------------------------------------------------
    # scans / window
    # ------------------------------------------------------------------
    def cumsum(self):
        return Series._from(scan_ops.cumsum(self._nan_null()), self._index, self.name)

    def cumprod(self):
        return Series._from(scan_ops.cumprod(self._nan_null()), self._index, self.name)

    def cummin(self):
        return Series._from(scan_ops.cummin(self._nan_null()), self._index, self.name)

    def cummax(self):
        return Series._from(scan_ops.cummax(self._nan_null()), self._index, self.name)

    def _nan_null(self):
        return replace_ops.nans_to_nulls(self._column) if self.dtype.is_float else self._column

    def shift(self, periods=1, freq=None, fill_value=None):
        if freq is not None:
            # freq shift moves the INDEX, values stay aligned (pandas)
            import pandas as pd

            idx = self._index.to_pandas().shift(periods, freq=freq)
            return Series._from(self._column, Index(pd.Series(idx),
                                                    name=self._index.name),
                                self.name)
        return Series._from(copying.shift(self._column, periods, fill_value), self._index, self.name)

    def diff(self, periods=1):
        return self - self.shift(periods)

    def pct_change(self, periods=1):
        prev = self.shift(periods)
        return (self - prev) / prev

    def rolling(self, window, min_periods=None, center=False):
        from cudf_tpu.frame.window import Rolling

        return Rolling(self, window, min_periods, center)

    def resample(self, rule):
        from cudf_tpu.frame.resample import Resampler

        return Resampler(self, rule)

    def argsort(self, ascending=True):
        order = sort_ops.sorted_order([self._nan_null()], [ascending], "last")
        return Series._from(Column(dt.INT64, len(self), data=order), self._index, self.name)

    def combine_first(self, other: "Series") -> "Series":
        lhs, rhs, index = _align(self, other)
        return Series._from(replace_ops.replace_nulls_column(lhs, rhs), index, self.name)

    def update(self, other: "Series") -> None:
        pos = self._index.get_indexer_for(other._index._column)
        ok = pos >= 0
        keep = sc.filter_indices(ok)
        src = copying.gather(other._column, keep, bounds_check=False)
        dst_idx = jnp.take(pos, keep)
        # only non-null source values overwrite (pandas semantics)
        if src.validity is not None:
            valid_keep = sc.filter_indices(src.validity)
            src = copying.gather(src, valid_keep, bounds_check=False)
            dst_idx = jnp.take(dst_idx, valid_keep)
        self._column = copying.scatter(src, dst_idx, self._column)

    def first_valid_index(self):
        v = self._nan_null().validity
        if v is None:
            return self._index[0] if len(self) else None
        pos = sc.filter_indices(v)
        return self._index[int(pos[0])] if pos.shape[0] else None

    def last_valid_index(self):
        v = self._nan_null().validity
        if v is None:
            return self._index[len(self) - 1] if len(self) else None
        pos = sc.filter_indices(v)
        return self._index[int(pos[-1])] if pos.shape[0] else None

    def ewm(self, com=None, span=None, halflife=None, alpha=None, adjust=True, ignore_na=False):
        if alpha is None:
            if com is not None:
                alpha = 1.0 / (1.0 + com)
            elif span is not None:
                alpha = 2.0 / (span + 1.0)
            elif halflife is not None:
                alpha = 1.0 - np.exp(-np.log(2.0) / halflife)
        from cudf_tpu.frame.window import EWM

        return EWM(self, alpha, adjust, ignore_na)

    def rank(self, method="average", ascending=True, na_option="keep", pct=False):
        col = sort_ops.rank(self._nan_null(), method, ascending, na_option, pct)
        if (self.dtype.nullable or self.dtype.arrow) and not col.dtype.nullable:
            # pandas: rank of a nullable/arrow extension series is
            # Float64|double[pyarrow] (average/pct) or UInt64|uint64[pyarrow]
            # (min/max/first/dense) with NA — not NaN — at the null slots
            validity = col.validity
            if col.dtype.is_float:
                nn = ~jnp.isnan(col.data)
                validity = nn if validity is None else (validity & nn)
            is_arrow = self.dtype.arrow
            if method in ("min", "max", "first", "dense") and not pct:
                data = jnp.nan_to_num(col.data).astype(jnp.uint64)
                col = Column(dt.DType(dt.TypeId.UINT64, nullable=not is_arrow,
                                      arrow=is_arrow),
                             col.length, data=data, validity=validity)
            else:
                col = Column(dt.DType(col.dtype.id, nullable=not is_arrow,
                                      arrow=is_arrow), col.length,
                             data=col.data, validity=validity)
        return Series._from(col, self._index, self.name)

    # ------------------------------------------------------------------
    # sorting / dedup
    # ------------------------------------------------------------------
    def sort_values(self, ascending=True, na_position="last", ignore_index=False, kind=None):
        order = sort_ops.sorted_order([self._nan_null()], [ascending], na_position)
        out = self.take(order)
        if ignore_index:
            out._index = default_index(len(out))
        return out

    def sort_index(self, ascending=True):
        order = sort_ops.sorted_order([self._index._column], [ascending], "last")
        return self.take(order)

    def _check_n_selectable(self, n):
        if not (self.dtype.is_numeric or self.dtype.is_bool or self.dtype.is_temporal):
            raise TypeError(
                f"Cannot use method 'nlargest/nsmallest' with dtype {self.dtype}")
        return max(int(n), 0)  # pandas: n <= 0 selects nothing

    def nlargest(self, n=5, keep="first"):
        n = self._check_n_selectable(n)
        return self.sort_values(ascending=False).head(n)

    def nsmallest(self, n=5, keep="first"):
        n = self._check_n_selectable(n)
        return self.sort_values(ascending=True).head(n)

    def unique(self):
        idx = sc.distinct_indices([self._column], "first")
        return copying.gather(self._column, idx, bounds_check=False).to_numpy()

    def drop_duplicates(self, keep="first", ignore_index=False):
        idx = sc.distinct_indices([self._column], keep if keep is not False else "none")
        out = self.take(idx)
        if ignore_index:
            out._index = default_index(len(out))
        return out

    def duplicated(self, keep="first"):
        mask = sc.duplicated_mask([self._column], keep if keep is not False else "none")
        return Series._from(Column(dt.BOOL8, len(self), data=mask), self._index, self.name)

    def hash_values(self, method="murmur3", seed=0) -> "Series":
        """Per-element hash (cudf Series.hash_values)."""
        from cudf_tpu.ops import hashing

        col = hashing.hash_values([self._column], method, seed)
        return Series._from(col, self._index, self.name)

    def value_counts(self, normalize=False, sort=True, ascending=False, dropna=True):
        from cudf_tpu.ops import groupby as gb
        from cudf_tpu.core.table import Table

        keys = Table({"k": self._column})
        gk, ga = gb.groupby_agg(keys, [("count", self._column, "size")], dropna=dropna)
        counts = ga["count"]
        out = Series._from(counts, Index(column=gk["k"], name=self.name), name="count")
        if normalize:
            total = reductions.sum(counts)
            out = out / total
            out.name = "proportion"
        if sort:
            order = sort_ops.sorted_order([out._column], [ascending], "last")
            out = out.take(order)
        return out

    def isin(self, values) -> "Series":
        has_na = False
        if not isinstance(values, (Series, Column)):
            import pandas as pd

            values = list(values)
            # pandas: a null element matches only the *exact* NA marker of
            # the masked family (pd.NA) — nan/NaT/None do not match NA
            has_na = any(v is pd.NA for v in values)
            nonnull = [v for v in values if not _is_null(v)]
            vals = as_column(nonnull) if nonnull else None
        else:
            vals = values._column if isinstance(values, Series) else values
            if vals.validity is not None:
                has_na = bool(jnp.any(~vals.validity))
        if vals is None:
            mask = jnp.zeros((len(self),), jnp.bool_)
        else:
            mask = search_ops.contains(vals, self._column)
        # pandas: NA elements match iff NA is among the values
        if self._column.validity is not None:
            mask = jnp.where(self._column.validity, mask, has_na)
        out_dtype = (dt.DType(dt.TypeId.BOOL8, nullable=self.dtype.nullable,
                              arrow=self.dtype.arrow)
                     if (self.dtype.nullable or self.dtype.arrow) else dt.BOOL8)
        return Series._from(Column(out_dtype, len(self), data=mask),
                            self._index, self.name)

    def between(self, left, right, inclusive="both"):
        lo = self >= left if inclusive in ("both", "left") else self > left
        hi = self <= right if inclusive in ("both", "right") else self < right
        return lo & hi

    def searchsorted(self, value, side="left"):
        needles = as_column([value] if np.isscalar(value) else list(value))
        out = search_ops.lower_bound(self._column, needles, side)
        return int(out[0]) if np.isscalar(value) else np.asarray(out)

    def factorize(self, sort=False):
        from cudf_tpu.ops.dictionary import factorize as fz

        codes, keys = fz(self._column, sort=sort)
        codes_np = np.asarray(codes).astype(np.int64)
        if self._column.validity is not None:
            codes_np[~np.asarray(self._column.validity)] = -1
        return codes_np, Index(column=keys)

    # ------------------------------------------------------------------
    # transforms
    # ------------------------------------------------------------------
    def astype(self, dtype, copy=None, errors="raise") -> "Series":
        dtype_ = dtype
        target = dt.dtype(dtype_)
        col = self._column
        if (errors == "raise" and target.is_timestamp
                and getattr(target, "tz", None) is not None
                and col.dtype.is_timestamp
                and getattr(col.dtype, "tz", None) is None):
            raise TypeError(
                "Cannot use .astype to convert from timezone-naive dtype "
                "to timezone-aware dtype. Use ser.dt.tz_localize instead.")
        if errors == "raise" and target.is_integer and not target.nullable:
            # pandas astype: lossy NA/inf -> int conversions raise
            bad = col.null_count > 0
            if not bad and col.dtype.is_float:
                bad = bool(jnp.any(~jnp.isfinite(col.data)))
            if bad:
                raise ValueError(
                    "Cannot convert non-finite values (NA or inf) to integer")
        try:
            out = unary.cast(col, target)
        except Exception:
            if errors == "ignore":
                return self.copy()
            raise
        return Series._from(out, self._index, self.name)

    def where(self, cond, other=None) -> "Series":
        condcol = cond._column if isinstance(cond, Series) else as_column(cond)
        m = condcol.data.astype(jnp.bool_)
        if condcol.validity is not None:
            m = m & condcol.validity
        if other is None or _is_null(other):
            return Series._from(replace_ops.replace_where(self._column, ~m, None), self._index, self.name)
        if np.isscalar(other):
            return Series._from(replace_ops.replace_where(self._column, ~m, other), self._index, self.name)
        ocol = other._column if isinstance(other, Series) else as_column(other)
        return Series._from(copying.copy_if_else(m, self._column, ocol), self._index, self.name)

    def mask(self, cond, other=None) -> "Series":
        c = cond if isinstance(cond, Series) else Series(cond, index=self._index)
        return self.where(~c, other)

    def clip(self, lower=None, upper=None) -> "Series":
        return Series._from(replace_ops.clamp(self._column, lower, upper), self._index, self.name)

    def round(self, decimals=0) -> "Series":
        return Series._from(unary.round(self._column, decimals), self._index, self.name)

    def replace(self, to_replace, value=None) -> "Series":
        if isinstance(to_replace, dict):
            olds, news = list(to_replace.keys()), list(to_replace.values())
        elif isinstance(to_replace, (list, np.ndarray)):
            olds = list(to_replace)
            news = list(value) if isinstance(value, (list, np.ndarray)) else [value] * len(olds)
        else:
            olds, news = [to_replace], [value]
        out = replace_ops.replace_values(
            self._column, as_column(olds, dtype=self.dtype), as_column(news)
        )
        return Series._from(out, self._index, self.name)

    def map(self, arg, na_action=None) -> "Series":
        if isinstance(arg, Series):
            # Series mapper: lookup by ITS index (pandas semantics)
            arg = dict(zip(arg._index.to_pandas().tolist(),
                           arg.to_pylist()))
        else:
            try:
                import pandas as _pd

                if isinstance(arg, _pd.Series):
                    arg = arg.to_dict()
            except Exception:
                pass
        if isinstance(arg, dict):
            olds = as_column(list(arg.keys()))
            news = as_column(list(arg.values()))
            from cudf_tpu.ops.join import _aligned_keys, _lex_searchsorted
            import jax

            l_ops, o_ops = _aligned_keys([self._column], [olds])
            no = olds.length
            oidx = jnp.arange(no, dtype=jnp.int64)
            res = jax.lax.sort([*o_ops, oidx], num_keys=len(o_ops), is_stable=True)
            o_sorted, o_order = list(res[:-1]), res[-1]
            lo = _lex_searchsorted(o_sorted, l_ops, "left")
            hi = _lex_searchsorted(o_sorted, l_ops, "right")
            found = hi > lo
            pick = jnp.where(found, jnp.take(o_order, jnp.clip(lo, 0, max(no - 1, 0))), -1)
            out = copying.gather(news, pick, bounds_check=True)
            return Series._from(out, self._index, self.name)
        # callable: host map (vmap-able UDFs go through .apply)
        vals = self.to_pylist()
        return Series([None if v is None else arg(v) for v in vals], index=self._index, name=self.name)

    def apply(self, func, convert_dtype=True, masked=False) -> "Series":
        """Elementwise UDF.  jnp-traceable funcs run on device via vmap
        (replaces numba-CUDA UDF JIT, core/udf/); others fall back to host.
        ``masked=True`` hands the UDF a Masked (value, valid) pair for
        null-aware logic (core/udf/masked_typing.py semantics)."""
        import jax

        if masked:
            from cudf_tpu.utils.masked import Masked

            v = (self._column.validity if self._column.validity is not None
                 else jnp.ones((len(self),), jnp.bool_))
            out = jax.vmap(func)(Masked(self._column.data, v))
            if isinstance(out, Masked):
                col = Column(dt.dtype(np.dtype(out.value.dtype)), len(self),
                             data=out.value, validity=out.valid)
            else:
                col = Column.from_jnp(out)
            return Series._from(col, self._index, self.name)
        try:
            out = jax.vmap(func)(self._column.data)
            col = Column.from_jnp(out, validity=self._column.validity)
            return Series._from(col, self._index, self.name)
        except Exception:
            return self.map(func)

    def pipe(self, func, *args, **kwargs):
        return func(self, *args, **kwargs)

    def agg(self, func):
        if isinstance(func, str):
            return getattr(self, func)()
        if isinstance(func, (list, tuple)):
            return Series([getattr(self, f)() for f in func], index=Index(list(func)),
                          name=self.name)
        return func(self)

    aggregate = agg

    def transform(self, func):
        if isinstance(func, str):
            return getattr(self, func)() if func in ("cumsum", "cummax") else self.apply(func)
        return self.apply(func)

    def repeat(self, repeats) -> "Series":
        col = copying.repeat(self._column, repeats)
        idx = Index(column=copying.repeat(self._index._column, repeats), name=self._index.name)
        return Series._from(col, idx, self.name)

    def explode(self, ignore_index=False):
        from cudf_tpu.core.dtypes import TypeId

        if self.dtype.id != TypeId.LIST:
            return self.copy()
        from cudf_tpu.ops import lists

        child, row_map = lists.explode(self._column, outer=True)
        idx = self._index.take(row_map) if not ignore_index else default_index(child.length)
        return Series._from(child, idx, self.name)

    def memory_usage(self, deep=False):
        return self._column.nbytes

    @property
    def nbytes(self):
        return self._column.nbytes

    def equals(self, other) -> bool:
        if not isinstance(other, Series) or len(self) != len(other):
            return False
        if len(self) == 0:
            return True
        eq = binaryop.binary_operation(self._column, other._column, "null_equals")
        return bool(jnp.all(eq.data))

    def corr(self, other: "Series", method="pearson"):
        a, b, _ = _align(self, other)
        av = a.data.astype(jnp.float64)
        bv = b.data.astype(jnp.float64)
        valid = jnp.ones((a.length,), jnp.bool_)
        if a.validity is not None:
            valid &= a.validity
        if b.validity is not None:
            valid &= b.validity
        valid &= ~jnp.isnan(av) & ~jnp.isnan(bv)
        n = jnp.sum(valid)
        av = jnp.where(valid, av, 0.0)
        bv = jnp.where(valid, bv, 0.0)
        ma, mb = jnp.sum(av) / n, jnp.sum(bv) / n
        da = jnp.where(valid, av - ma, 0.0)
        db = jnp.where(valid, bv - mb, 0.0)
        return float(jnp.sum(da * db) / jnp.sqrt(jnp.sum(da * da) * jnp.sum(db * db)))

    def cov(self, other: "Series", ddof=1):
        a, b, _ = _align(self, other)
        av = a.data.astype(jnp.float64)
        bv = b.data.astype(jnp.float64)
        valid = jnp.ones((a.length,), jnp.bool_)
        if a.validity is not None:
            valid &= a.validity
        if b.validity is not None:
            valid &= b.validity
        valid &= ~jnp.isnan(av) & ~jnp.isnan(bv)
        n = jnp.sum(valid)
        av = jnp.where(valid, av, 0.0)
        bv = jnp.where(valid, bv, 0.0)
        ma, mb = jnp.sum(av) / n, jnp.sum(bv) / n
        da = jnp.where(valid, av - ma, 0.0)
        db = jnp.where(valid, bv - mb, 0.0)
        return float(jnp.sum(da * db) / (n - ddof))

    def autocorr(self, lag=1):
        return self.corr(self.shift(lag))

    def sample(self, n=None, frac=None, replace=False, random_state=0):
        if n is None:
            n = int(round((frac or 1.0) * len(self)))
        import jax

        key = jax.random.PRNGKey(int(random_state or 0))
        if replace:
            idx = jax.random.randint(key, (n,), 0, len(self), dtype=jnp.int64)
        else:
            idx = jax.random.permutation(key, len(self))[:n].astype(jnp.int64)
        return self.take(idx)

    # ------------------------------------------------------------------
    # groupby / accessors
    # ------------------------------------------------------------------
    def groupby(self, by=None, level=None, sort=False, dropna=True,
                group_keys=True, observed=False):
        from cudf_tpu.frame.groupby import SeriesGroupBy

        return SeriesGroupBy(self, by, level=level, sort=sort, dropna=dropna)

    @property
    def str(self):
        from cudf_tpu.frame.accessors import StringMethods

        return StringMethods(self)

    @property
    def dt(self):
        from cudf_tpu.frame.accessors import DatetimeProperties

        return DatetimeProperties(self)

    @property
    def cat(self):
        from cudf_tpu.frame.accessors import CategoricalAccessor

        return CategoricalAccessor(self)

    @property
    def list(self):
        from cudf_tpu.frame.accessors import ListMethods

        return ListMethods(self)

    @property
    def struct(self):
        from cudf_tpu.frame.accessors import StructMethods

        return StructMethods(self)


for dunder, op in _BINOPS.items():
    def _make(op=op):
        def f(self, other):
            return self._binop(other, op)
        return f
    setattr(Series, dunder, _make())

for dunder, op in _RBINOPS.items():
    def _make_r(op=op):
        def f(self, other):
            return self._binop(other, op, reflect=True)
        return f
    setattr(Series, dunder, _make_r())


class _SeriesILoc:
    def __init__(self, s: Series):
        self._s = s

    def __getitem__(self, key):
        s = self._s
        if isinstance(key, int) or isinstance(key, np.integer):
            return s._column[int(key)]
        if isinstance(key, slice):
            start, stop, step = key.indices(len(s))
            if step == 1:
                return Series._from(
                    copying.slice(s._column, start, stop), s._index.slice(start, stop), s.name
                )
            idx = jnp.arange(start, stop, step, dtype=jnp.int64)
            return s.take(idx)
        arr = np.asarray(key)
        if arr.dtype == bool:
            return s._filter(Series(arr, index=s._index))
        return s.take(jnp.asarray(arr, dtype=jnp.int64))

    def __setitem__(self, key, value):
        s = self._s
        _check_setitem_compat(s._column.dtype, value)
        if isinstance(key, int):
            key = [key]
        if isinstance(key, slice):
            start, stop, step = key.indices(len(s))
            idx = jnp.arange(start, stop, step, dtype=jnp.int64)
        else:
            idx = jnp.asarray(np.asarray(key), dtype=jnp.int64)
        if np.isscalar(value) or value is None:
            s._column = copying.scatter_scalar(value, idx, s._column)
        else:
            s._column = copying.scatter(as_column(value), idx, s._column)


class _SeriesLoc:
    def __init__(self, s: Series):
        self._s = s

    def __getitem__(self, key):
        s = self._s
        if isinstance(key, Series) and key.dtype.is_bool:
            return s._filter(key)
        if isinstance(key, slice):
            # label slice: positions of start/stop (inclusive)
            if key.start is None and key.stop is None:
                return s.copy()
            start = 0 if key.start is None else int(s._index.get_indexer_for([key.start])[0])
            stop = len(s) - 1 if key.stop is None else int(s._index.get_indexer_for([key.stop])[0])
            return s.iloc[start:stop + 1]
        if np.isscalar(key) or key is None:
            pos = s._index._positions_of(key)
            if pos.shape[0] == 0:
                raise KeyError(key)
            if pos.shape[0] == 1:
                return s._column[int(pos[0])]
            return s.take(pos)
        arr = np.asarray(key)
        if arr.dtype == bool:
            return s._filter(Series(arr, index=s._index))
        pos = s._index.get_indexer_for(list(arr))
        missing = np.asarray(pos) < 0
        if missing.any():
            raise KeyError(list(np.asarray(arr)[missing]))
        return s.take(pos)

    def __setitem__(self, key, value):
        s = self._s
        _check_setitem_compat(s._column.dtype, value)
        if isinstance(key, Series) and key.dtype.is_bool:
            s[key] = value
            return
        if isinstance(key, (list, np.ndarray)):
            arr = np.asarray(key)
            if arr.dtype == bool:
                s[Series(arr, index=s._index)] = value
                return
        pos = s._index.get_indexer_for([key] if np.isscalar(key) else list(key))
        idx = pos[pos >= 0]
        if np.isscalar(value) or value is None:
            s._column = copying.scatter_scalar(value, idx, s._column)
        else:
            s._column = copying.scatter(as_column(value), idx, s._column)


# ----------------------------------------------------------------------
# index alignment for binary ops
# ----------------------------------------------------------------------

def _align(a: Series, b: Series):
    """pandas-style alignment: equal indexes fast-path, else sorted outer
    union with missing labels becoming nulls."""
    if a._index.equals(b._index):
        return a._column, b._column, a._index
    union = _union_index(a._index, b._index)
    pos_a = a._index.get_indexer_for(union._column)
    pos_b = b._index.get_indexer_for(union._column)
    ca = copying.gather(a._column, pos_a, bounds_check=True)
    cb = copying.gather(b._column, pos_b, bounds_check=True)
    return ca, cb, union


def _union_index(a: Index, b: Index) -> Index:
    both = copying.concatenate([a._column, b._column])
    idx = sc.distinct_indices([both], "first")
    col = copying.gather(both, idx, bounds_check=False)
    col = copying.gather(col, sort_ops.sorted_order([col]), bounds_check=False)
    name = a.name if a.name == b.name else None
    return Index(column=col, name=name)


def _check_setitem_compat(dtype, value):
    """pandas-3 setitem strictness (PDEP-6): values that cannot be held
    losslessly by the column dtype RAISE instead of silently coercing."""
    import numbers

    def one(v):
        if v is None or _is_null(v):
            if dtype.is_integer or dtype.is_bool:
                raise TypeError(
                    f"Invalid value {v!r} for dtype {dtype}")
            return
        if dtype.is_bool:
            if not isinstance(v, (bool, np.bool_)):
                raise TypeError(f"Invalid value {v!r} for dtype bool")
            return
        if dtype.is_integer:
            if isinstance(v, (bool, np.bool_)):
                raise TypeError(f"Invalid value {v!r} for dtype {dtype}")
            if isinstance(v, numbers.Real) and not isinstance(v, numbers.Integral):
                if float(v) != int(v):
                    raise TypeError(
                        f"Invalid value {v!r} for dtype {dtype}")
                return
            if not isinstance(v, numbers.Integral):
                raise TypeError(f"Invalid value {v!r} for dtype {dtype}")
            return
        if dtype.is_float:
            if isinstance(v, (bool, np.bool_)) or not isinstance(v, numbers.Real):
                raise TypeError(f"Invalid value {v!r} for dtype {dtype}")
            return
        if dtype.is_string and not isinstance(v, str):
            raise TypeError(f"Invalid value {v!r} for dtype str")

    if np.isscalar(value) or value is None or _is_null(value) or \
            isinstance(value, (np.datetime64, np.timedelta64)):
        one(value)
    elif isinstance(value, (list, tuple)) and len(value) <= 64:
        for v in value:
            one(v)
    elif isinstance(value, np.ndarray) and value.ndim <= 1 and \
            value.size and value.size <= 64:
        if (dtype.is_bool and value.dtype.kind != "b") or \
                (dtype.is_integer and value.dtype.kind in "fcmM") or \
                ((dtype.is_integer or dtype.is_float)
                 and value.dtype.kind in "mM"):
            # lossy ndarray payloads: spot-check elementwise (float
            # arrays holding integral values are allowed into int)
            for v in value.tolist():
                one(v)
