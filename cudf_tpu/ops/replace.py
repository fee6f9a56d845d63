"""Replace: fill nulls, ffill/bfill, value replacement, clamp.

TPU-native equivalent of libcudf replace
(reference: cpp/src/replace/ — nulls.cu, clamp.cu, replace.cu).
ffill/bfill are expressed as an associative max-scan over last-valid-index
(parallel prefix on the VPU, replacing the reference's specialized kernels).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cudf_tpu.core import bitmask as bm
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, _is_null
from cudf_tpu.ops import copying
from cudf_tpu.ops._utils import materialize_validity


def replace_nulls_scalar(col: Column, value) -> Column:
    """cudf::replace_nulls with a scalar."""
    if col.validity is None:
        return col
    if col.dtype.is_string:
        fill = Column.from_strings([str(value)] * col.length)
        from cudf_tpu.ops.binaryop import _select_strings

        return _select_strings(col.validity, col, fill).with_validity(None)
    from cudf_tpu.core.column import _coerce_value

    target = col.dtype
    if col.dtype.is_integer and isinstance(value, float) and not value.is_integer():
        target = dt.FLOAT64
        col = _cast(col, target)
    v = _coerce_value(value, target)
    data = jnp.where(col.validity, col.data, jnp.asarray(v, col.data.dtype))
    return Column(target, col.length, data=data)


def _cast(col, target):
    from cudf_tpu.ops.unary import cast

    return cast(col, target)


def replace_nulls_column(col: Column, other: Column) -> Column:
    if col.validity is None:
        return col
    return copying.copy_if_else(col.validity, col, other)


def ffill(col: Column, limit: Optional[int] = None) -> Column:
    """Forward fill (replace_nulls policy PRECEDING)."""
    if col.validity is None:
        return col
    n = col.length
    idx = jnp.arange(n, dtype=jnp.int64)
    last_valid = jax.lax.associative_scan(jnp.maximum, jnp.where(col.validity, idx, -1))
    if limit is not None:
        dist = idx - last_valid
        last_valid = jnp.where(dist <= limit, last_valid, -1)
    out = copying.gather(col, last_valid, bounds_check=True)
    return out


def bfill(col: Column, limit: Optional[int] = None) -> Column:
    if col.validity is None:
        return col
    n = col.length
    rev = copying.reverse(col)
    filled = ffill(rev, limit)
    return copying.reverse(filled)


def replace_values(col: Column, old_values: Column, new_values: Column) -> Column:
    """cudf::find_and_replace_all."""
    from cudf_tpu.ops.join import _aligned_keys, _lex_searchsorted

    l_ops, o_ops = _aligned_keys([col], [old_values])
    no = old_values.length
    oidx = jnp.arange(no, dtype=jnp.int64)
    sorted_all = jax.lax.sort([*o_ops, oidx], num_keys=len(o_ops), is_stable=True)
    o_sorted, o_order = sorted_all[:-1], sorted_all[-1]
    lo = _lex_searchsorted(list(o_sorted), l_ops, "left")
    hi = _lex_searchsorted(list(o_sorted), l_ops, "right")
    found = hi > lo
    repl_idx = jnp.where(found, jnp.take(o_order, jnp.clip(lo, 0, max(no - 1, 0))), -1)
    replacement = copying.gather(new_values, repl_idx, bounds_check=True)
    out = copying.copy_if_else(found, replacement, col)
    # rows that were replaced take the new value's validity; others keep old
    return out


def replace_where(col: Column, mask: jnp.ndarray, value) -> Column:
    """col[i] = value where mask[i] (scalar fast path of copy_if_else)."""
    if _is_null(value):
        validity = materialize_validity(col) & ~mask
        return col.with_validity(validity)
    fill = Column.full(col.length, value, dtype=col.dtype)
    return copying.copy_if_else(mask, fill, col)


def clamp(col: Column, lo=None, hi=None) -> Column:
    data = col.data
    if lo is not None:
        data = jnp.maximum(data, jnp.asarray(lo, data.dtype))
    if hi is not None:
        data = jnp.minimum(data, jnp.asarray(hi, data.dtype))
    return Column(col.dtype, col.length, data=data, validity=col.validity)


def normalize_nans_and_zeros(col: Column) -> Column:
    if not col.dtype.is_float:
        return col
    data = jnp.where(col.data == 0, jnp.zeros_like(col.data), col.data)
    data = jnp.where(jnp.isnan(data), jnp.full_like(data, jnp.nan), data)
    return Column(col.dtype, col.length, data=data, validity=col.validity)


def nans_to_nulls(col: Column) -> Column:
    if not col.dtype.is_float:
        return col
    nan = jnp.isnan(col.data)
    if not bool(jnp.any(nan)):
        return col
    validity = materialize_validity(col) & ~nan
    return col.with_validity(validity)
