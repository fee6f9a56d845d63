"""Stream compaction: filter, drop_nulls, unique, distinct.

TPU-native equivalent of libcudf stream_compaction
(reference: cpp/src/stream_compaction/ — apply_boolean_mask.cu, distinct.cu
with cuco hash sets, unique.cu).

Variable-size outputs use the two-phase count→allocate→retrieve pattern:
a device popcount, one host sync for the output shape, then a shaped
``jnp.nonzero(size=...)`` compact — XLA's static-shape analogue of
thrust::copy_if.  ``distinct`` is sort-based (ONE fused lax.sort over the
row-operator keys + adjacent-compare), replacing the cuco hash-set build:
on a vector machine a bitonic/merge sort at full HBM bandwidth beats
scalar-probing a hash table.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying
from cudf_tpu.ops._utils import materialize_validity
from cudf_tpu.ops.row_ops import equality_keys, lex_sort_indices


def filter_indices(mask: jnp.ndarray) -> jnp.ndarray:
    """bool[n] → int64[k] indices of True entries (two-phase, one host sync)."""
    k = int(jnp.sum(mask))
    if k == 0:
        return jnp.zeros((0,), jnp.int64)
    return jnp.nonzero(mask, size=k)[0].astype(jnp.int64)


def apply_boolean_mask(col: Column, mask: Column) -> Column:
    """cudf::apply_boolean_mask — null mask entries count as False."""
    m = mask.data.astype(jnp.bool_)
    if mask.validity is not None:
        m = m & mask.validity
    return copying.gather(col, filter_indices(m), bounds_check=False)


def apply_boolean_mask_table(table: Table, mask: Column) -> Table:
    m = mask.data.astype(jnp.bool_)
    if mask.validity is not None:
        m = m & mask.validity
    idx = filter_indices(m)
    return copying.gather_table(table, idx, bounds_check=False)


def drop_nulls(col: Column) -> Column:
    if col.validity is None:
        return col
    return copying.gather(col, filter_indices(col.validity), bounds_check=False)


def drop_nulls_table(table: Table, keys: Optional[Sequence[str]] = None, how: str = "any") -> Table:
    names = keys if keys is not None else table.names
    masks = [materialize_validity(table[n]) for n in names]
    if how == "any":
        m = masks[0]
        for x in masks[1:]:
            m = m & x
    else:
        m = masks[0]
        for x in masks[1:]:
            m = m | x
    return copying.gather_table(table, filter_indices(m), bounds_check=False)


def _adjacent_neq(cols: Sequence[Column], order: jnp.ndarray) -> jnp.ndarray:
    """bool[n] in sorted order: True where a new distinct run starts."""
    n = order.shape[0]
    neq = jnp.ones((n,), jnp.bool_)
    first = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    acc = None
    for col in cols:
        for k in equality_keys(col):
            s = jnp.take(k, order)
            d = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
            acc = d if acc is None else (acc | d)
    return acc if acc is not None else first


def distinct_indices(
    keys: Sequence[Column], keep: str = "first"
) -> jnp.ndarray:
    """Row indices of distinct rows, preserving original order
    (cudf::distinct; pandas drop_duplicates semantics).

    keep ∈ {'first', 'last', False('none')}.
    """
    keys = list(keys)
    n = keys[0].length
    if n == 0:
        return jnp.zeros((0,), jnp.int64)
    order = lex_sort_indices(keys, stable=True)
    neq = _adjacent_neq(keys, order)
    if keep == "first":
        pick = neq
    elif keep == "last":
        pick = jnp.concatenate([neq[1:], jnp.ones((1,), jnp.bool_)])
    else:  # keep none: only rows whose run length is 1
        is_last = jnp.concatenate([neq[1:], jnp.ones((1,), jnp.bool_)])
        pick = neq & is_last
    chosen_sorted = jnp.take(order, filter_indices(pick))
    # restore original row order
    return jnp.sort(chosen_sorted)


def duplicated_mask(keys: Sequence[Column], keep: str = "first") -> jnp.ndarray:
    """bool[n] True where the row is a duplicate (pandas Series.duplicated)."""
    keys = list(keys)
    n = keys[0].length
    keep_idx = distinct_indices(keys, keep if keep else "none")
    mask = jnp.ones((n,), jnp.bool_).at[keep_idx].set(False)
    return mask


def distinct(table: Table, key_names: Optional[Sequence[str]] = None, keep: str = "first") -> Table:
    names = key_names if key_names is not None else table.names
    idx = distinct_indices([table[n] for n in names], keep)
    return copying.gather_table(table, idx, bounds_check=False)


def unique(col: Column) -> Column:
    """Adjacent dedup (cudf::unique — assumes pre-sorted/grouped input)."""
    if col.length == 0:
        return col
    order = jnp.arange(col.length, dtype=jnp.int64)
    neq = _adjacent_neq([col], order)
    return copying.gather(col, filter_indices(neq), bounds_check=False)


def distinct_count(col: Column, dropna: bool = True) -> int:
    n = col.length
    if n == 0:
        return 0
    order = lex_sort_indices([col], stable=False)
    neq = _adjacent_neq([col], order)
    total = int(jnp.sum(neq))
    if dropna and col.null_count > 0:
        total -= 1
    if dropna and col.dtype.is_float:
        # NaNs form one distinct run; pandas nunique drops them
        has_nan = bool(jnp.any(jnp.isnan(jnp.where(materialize_validity(col), col.data, 0.0))))
        if has_nan:
            total -= 1
    return total


def approx_distinct_count(col: Column, precision: int = 12) -> int:
    """HyperLogLog estimate (reference: libcudf_streaming
    approx_distinct_count.cu).  Vectorized: bucket = high bits of the row
    hash, rank = leading zeros of the rest; one scatter-max pass."""
    import numpy as np

    from cudf_tpu.ops.row_ops import hash_column

    h = hash_column(col)
    m = 1 << precision
    bucket = (h >> jnp.uint64(64 - precision)).astype(jnp.int32)
    rest = (h << jnp.uint64(precision)) | jnp.uint64((1 << precision) - 1)
    # leading zero count via float trick is lossy; do it with a loop over 64 bits
    lz = jnp.zeros_like(h, dtype=jnp.int32)
    found = jnp.zeros_like(h, dtype=jnp.bool_)
    x = rest
    for shift in (32, 16, 8, 4, 2, 1):
        top = x >> jnp.uint64(64 - shift)
        zero_top = top == 0
        lz = lz + jnp.where(~found & zero_top, shift, 0)
        x = jnp.where(zero_top, x << jnp.uint64(shift), x)
    rank = (lz + 1).astype(jnp.int32)
    regs = jnp.zeros((m,), jnp.int32).at[bucket].max(rank)
    regs_np = np.asarray(regs).astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-regs_np))
    if est <= 2.5 * m:
        zeros = int(np.sum(regs_np == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))
