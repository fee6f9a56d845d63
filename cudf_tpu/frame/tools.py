"""Top-level tools: to_datetime, to_numeric, cut/qcut, date_range, etc.

(reference: python/cudf/cudf/core/tools/ — datetimes.py, numeric.py;
cut/qcut python/cudf/cudf/core/cut.py)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, as_column, _is_null
from cudf_tpu.frame.index import Index, default_index
from cudf_tpu.frame.series import Series


def to_datetime(arg, format=None, errors="raise", unit=None):
    if isinstance(arg, Series):
        col = arg._column
        if col.dtype.is_timestamp:
            return arg
        if col.dtype.is_string:
            from cudf_tpu.ops.strings import to_timestamps

            return Series._from(to_timestamps(col, None, format), arg._index, arg.name)
        if col.dtype.is_numeric:
            u = unit or "ns"
            target = dt.unit_dtype("M", u)
            from cudf_tpu.ops.unary import cast

            return Series._from(cast(col, target), arg._index, arg.name)
    import pandas as pd

    out = pd.to_datetime(arg, format=format, errors=errors, unit=unit)
    if isinstance(out, pd.Series):
        return Series(out.to_numpy())
    if np.isscalar(out) or isinstance(out, pd.Timestamp):
        return out
    return Index(Column.from_numpy(out.to_numpy()))


def to_numeric(arg, errors="raise", downcast=None):
    if isinstance(arg, Series):
        col = arg._column
        if col.dtype.is_numeric:
            return arg
        from cudf_tpu.ops.strings import to_numbers

        out = to_numbers(col, dt.FLOAT64)
        # integers stay ints when lossless
        data = np.asarray(out.data)
        valid = np.asarray(out.validity) if out.validity is not None else np.ones(len(data), bool)
        if valid.all() and np.all(data == np.floor(data)) and np.all(np.abs(data) < 2**63):
            from cudf_tpu.ops.unary import cast

            out = cast(out, dt.INT64)
        if errors == "raise" and out.validity is not None and col.validity is None:
            raise ValueError("unable to parse some values")
        return Series._from(out, arg._index, arg.name)
    return to_numeric(Series(arg), errors=errors)


def cut(x, bins, labels=None, right=True, include_lowest=False):
    """Bin values (cudf/core/cut.py equivalent) via searchsorted."""
    s = x if isinstance(x, Series) else Series(x)
    col = s._column
    if isinstance(bins, int):
        mn = float(np.asarray(col.data).min())
        mx = float(np.asarray(col.data).max())
        edges = np.linspace(mn, mx, bins + 1)
        edges[0] -= (mx - mn) * 0.001
    else:
        edges = np.asarray(bins, dtype=np.float64)
    side = "left" if right else "right"
    pos = jnp.searchsorted(jnp.asarray(edges), col.data.astype(jnp.float64), side=side)
    bin_idx = pos - 1
    oob = (bin_idx < 0) | (bin_idx >= len(edges) - 1)
    if include_lowest:
        at_lo = col.data.astype(jnp.float64) == edges[0]
        bin_idx = jnp.where(at_lo, 0, bin_idx)
        oob = oob & ~at_lo
    if labels is None:
        cats = []
        lb = "(" if not include_lowest else "["
        for i in range(len(edges) - 1):
            if right:
                cats.append(f"({edges[i]:g}, {edges[i+1]:g}]")
            else:
                cats.append(f"[{edges[i]:g}, {edges[i+1]:g})")
    elif labels is False:
        validity = None if not bool(jnp.any(oob)) else ~oob
        out = Column(dt.INT64, col.length, data=jnp.where(oob, -1, bin_idx), validity=validity)
        return Series._from(out, s._index, s.name)
    else:
        cats = list(labels)
    keys = Column.from_strings([str(c) for c in cats])
    validity = ~oob
    if col.validity is not None:
        validity = validity & col.validity
    if bool(jnp.all(validity)):
        validity = None
    out = Column(dt.dictionary_dtype(dt.STRING), col.length,
                 data=jnp.where(oob, 0, bin_idx).astype(jnp.int32),
                 validity=validity, children=(keys,))
    return Series._from(out, s._index, s.name)


def qcut(x, q, labels=None):
    s = x if isinstance(x, Series) else Series(x)
    qs = np.linspace(0, 1, q + 1) if isinstance(q, int) else np.asarray(q)
    from cudf_tpu.ops.reductions import quantile

    edges = quantile(s._column, qs)
    edges = np.unique(edges)
    return cut(s, edges, labels=labels, include_lowest=True)


def date_range(start=None, end=None, periods=None, freq=None, name=None):
    import pandas as pd

    rng = pd.date_range(start=start, end=end, periods=periods, freq=freq, name=name)
    return Index(Column.from_numpy(rng.to_numpy()), name=name)


def factorize(values, sort=False):
    s = values if isinstance(values, Series) else Series(values)
    return s.factorize(sort=sort)


def unique(values):
    s = values if isinstance(values, Series) else Series(values)
    return s.unique()


def isna(obj):
    if isinstance(obj, Series):
        return obj.isna()
    if hasattr(obj, "isna"):
        return obj.isna()
    if np.isscalar(obj) or obj is None:
        return _is_null(obj)
    return Series(obj).isna()


isnull = isna


def notna(obj):
    out = isna(obj)
    if isinstance(out, bool):
        return not out
    return ~out


notnull = notna
