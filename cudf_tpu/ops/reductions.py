"""Full-column reductions (null-skipping) and quantiles.

TPU-native equivalent of libcudf's reductions
(reference: cpp/src/reductions/*.cu).  Tier-1 XLA: single fused reduce over
HBM; float32 sums accumulate in float64 to stay bit-comparable with pandas.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops._utils import materialize_validity


def _masked(col: Column, identity) -> jnp.ndarray:
    if col.validity is None:
        return col.data
    return jnp.where(col.validity, col.data, jnp.asarray(identity, dtype=col.data.dtype))


def _valid_n(col: Column) -> int:
    return col.length - col.null_count


def _nan_aware_validity(col: Column):
    """pandas skipna also skips NaN values in float columns."""
    v = col.validity
    if col.dtype.is_float:
        notnan = ~jnp.isnan(col.data)
        v = notnan if v is None else (v & notnan)
    return v


def count(col: Column) -> int:
    v = _nan_aware_validity(col)
    return col.length if v is None else int(jnp.sum(v))


def sum(col: Column, min_count: int = 0):  # noqa: A001
    if col.dtype.is_string:
        raise TypeError("sum of string column")
    v = _nan_aware_validity(col)
    data = col.data if v is None else jnp.where(v, col.data, 0)
    if col.dtype.is_bool or col.dtype.is_integer:
        out = jnp.sum(data.astype(jnp.int64))
        res = int(out)
    else:
        out = jnp.sum(data.astype(jnp.float64))
        res = float(out)
        if col.dtype == dt.FLOAT32:
            res = float(np.float32(res)) if False else res
    if min_count > 0 and count(col) < min_count:
        return None
    return res


def product(col: Column, min_count: int = 0):
    v = _nan_aware_validity(col)
    data = col.data if v is None else jnp.where(v, col.data, 1)
    if col.dtype.is_integer or col.dtype.is_bool:
        return int(jnp.prod(data.astype(jnp.int64)))
    return float(jnp.prod(data.astype(jnp.float64)))


def sum_of_squares(col: Column):
    v = _nan_aware_validity(col)
    data = col.data if v is None else jnp.where(v, col.data, 0)
    if col.dtype.is_integer or col.dtype.is_bool:
        return int(jnp.sum(data.astype(jnp.int64) ** 2))
    return float(jnp.sum(data.astype(jnp.float64) ** 2))


def minmax(col: Column):
    return min(col), max(col)


def min(col: Column):  # noqa: A001
    return _minmax(col, "min")


def max(col: Column):  # noqa: A001
    return _minmax(col, "max")


def _minmax(col: Column, which: str):
    if count(col) == 0:
        return None
    if col.dtype.is_string:
        from cudf_tpu.ops.sort import sorted_order

        order = sorted_order([col], ascending=[which == "min"], na_position="last")
        return col[int(order[0])]
    if col.dtype.is_dictionary:
        return _minmax(col.decode_dictionary(), which)
    v = _nan_aware_validity(col)
    if col.dtype.is_float:
        fill = jnp.inf if which == "min" else -jnp.inf
    else:
        info = np.iinfo(col.dtype.storage) if not col.dtype.is_bool else None
        if col.dtype.is_bool:
            fill = True if which == "min" else False
        else:
            fill = info.max if which == "min" else info.min
    data = col.data if v is None else jnp.where(v, col.data, jnp.asarray(fill, col.data.dtype))
    out = jnp.min(data) if which == "min" else jnp.max(data)
    val = out.item()
    if col.dtype.is_temporal:
        return np.int64(val).astype(col.dtype.to_numpy())
    if col.dtype.is_bool:
        return bool(val)
    return val


def mean(col: Column):
    n = count(col)
    if n == 0:
        return float("nan")
    return float(sum(col)) / n


def var(col: Column, ddof: int = 1):
    n = count(col)
    if n - ddof <= 0:
        return float("nan")
    v = _nan_aware_validity(col)
    data = col.data.astype(jnp.float64)
    data = data if v is None else jnp.where(v, data, 0.0)
    s = jnp.sum(data)
    mu = s / n
    centered = data - mu
    centered = centered if v is None else jnp.where(v, centered, 0.0)
    return float(jnp.sum(centered * centered) / (n - ddof))


def std(col: Column, ddof: int = 1):
    return float(np.sqrt(var(col, ddof)))


def any(col: Column) -> bool:  # noqa: A001
    data = _masked(col, False).astype(jnp.bool_)
    return bool(jnp.any(data))


def all(col: Column) -> bool:  # noqa: A001
    data = _masked(col, True).astype(jnp.bool_)
    return bool(jnp.all(data))


def argmin(col: Column) -> int:
    v = _nan_aware_validity(col)
    data = col.data.astype(jnp.float64) if col.dtype.is_float else col.data
    if v is not None:
        big = jnp.asarray(np.inf if col.dtype.is_float else np.iinfo(np.int64).max, data.dtype)
        data = jnp.where(v, data, big)
    return int(jnp.argmin(data))


def argmax(col: Column) -> int:
    v = _nan_aware_validity(col)
    data = col.data.astype(jnp.float64) if col.dtype.is_float else col.data
    if v is not None:
        small = jnp.asarray(-np.inf if col.dtype.is_float else np.iinfo(np.int64).min, data.dtype)
        data = jnp.where(v, data, small)
    return int(jnp.argmax(data))


def nunique(col: Column, dropna: bool = True) -> int:
    from cudf_tpu.ops import stream_compaction

    return stream_compaction.distinct_count(col, dropna=dropna)


def quantile(col: Column, q, interpolation: str = "linear"):
    """cudf::quantile (cpp/src/quantiles/quantile.cu); pandas 'linear' default."""
    v = _nan_aware_validity(col)
    if v is not None:
        from cudf_tpu.ops.stream_compaction import apply_boolean_mask

        col = apply_boolean_mask(col, Column(dt.BOOL8, col.length, data=v))
    if col.length == 0:
        return float("nan") if np.isscalar(q) else np.full(len(q), np.nan)
    data = jnp.sort(col.data.astype(jnp.float64))
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    pos = qs * (col.length - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.ceil(pos).astype(np.int64)
    dlo = np.asarray(data[jnp.asarray(lo)])
    dhi = np.asarray(data[jnp.asarray(hi)])
    if interpolation == "linear":
        out = dlo + (pos - lo) * (dhi - dlo)
    elif interpolation == "lower":
        out = dlo
    elif interpolation == "higher":
        out = dhi
    elif interpolation == "nearest":
        out = np.where(pos - lo <= 0.5, dlo, dhi)
    elif interpolation == "midpoint":
        out = (dlo + dhi) / 2
    else:
        raise ValueError(interpolation)
    return float(out[0]) if np.isscalar(q) else out


def median(col: Column):
    return quantile(col, 0.5)


def skew(col: Column):
    """Fisher-Pearson adjusted skewness, pandas semantics."""
    n = count(col)
    if n < 3:
        return float("nan")
    v = _nan_aware_validity(col)
    data = col.data.astype(jnp.float64)
    data = data if v is None else jnp.where(v, data, 0.0)
    mu = float(jnp.sum(data)) / n
    d = data - mu
    d = d if v is None else jnp.where(v, d, 0.0)
    m2 = float(jnp.sum(d**2)) / n
    m3 = float(jnp.sum(d**3)) / n
    if m2 == 0:
        return float("nan")
    g1 = m3 / m2**1.5
    return float(g1 * np.sqrt(n * (n - 1)) / (n - 2))


def kurtosis(col: Column):
    n = count(col)
    if n < 4:
        return float("nan")
    v = _nan_aware_validity(col)
    data = col.data.astype(jnp.float64)
    data = data if v is None else jnp.where(v, data, 0.0)
    mu = float(jnp.sum(data)) / n
    d = data - mu
    d = d if v is None else jnp.where(v, d, 0.0)
    m2 = float(jnp.sum(d**2)) / n
    m4 = float(jnp.sum(d**4)) / n
    if m2 == 0:
        return float("nan")
    g2 = m4 / m2**2 - 3
    return float(((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6))
