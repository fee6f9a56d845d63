"""Groupby: grouped aggregations, scans, and the group index machinery.

TPU-native equivalent of libcudf groupby
(reference: cpp/src/groupby/ — hash path compute_single_pass_aggs.cu,
sort path sort/group_*.cu, dispatcher groupby.cu:54-69).

Design: ONE fused variadic sort over the row-operator keys produces the
group runs; every aggregation is then a SCATTER-FREE run reduction over
the sorted order — prefix-sum differences for sums/counts, reset-scans
for min/max/any/all — with results gathered at run boundaries (group
count obtained by the two-phase pattern: device count of run starts →
one host sync).  Measured on v5e, XLA scatter runs ~5x slower than the
sort itself, so segment_*/scatter is avoided throughout.  This replaces
both of the reference's paths — the cuco hash table and the sort-groupby.
The Pallas one-hot MXU kernel (kernels/hash_aggregate.py) is the
low-cardinality fast path used by bench.py; wiring it into this eager
dispatcher (with float64-safe accumulation) is planned.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying
from cudf_tpu.ops._utils import materialize_validity
from cudf_tpu.ops.row_ops import equality_keys, lex_sort_indices
from cudf_tpu.ops.stream_compaction import filter_indices


@dataclass
class Grouper:
    """Materialized grouping: dense group ids + group-representative rows.

    Equivalent of libcudf's sort::sort_groupby_helper (group offsets/labels).
    """

    group_ids: jnp.ndarray        # int64[n] dense group id per input row
    num_groups: int               # static
    key_rows: jnp.ndarray         # int64[g] one representative input row per group
    sorted_order: jnp.ndarray     # int64[n] stable sort permutation by keys
    group_offsets: jnp.ndarray    # int64[g+1] run offsets in sorted order
    row_mask: Optional[jnp.ndarray] = None  # rows kept (None = all; dropna)


def make_grouper(keys: Sequence[Column], dropna: bool = True, sort: bool = True) -> Grouper:
    keys = list(keys)
    n = keys[0].length
    row_mask = None
    if dropna and any(k.validity is not None or k.dtype.is_float
                      for k in keys):
        # pandas dropna drops null keys AND float-NaN keys
        row_mask = jnp.ones((n,), jnp.bool_)
        for k in keys:
            row_mask = row_mask & materialize_validity(k)
            if k.dtype.is_float:
                row_mask = row_mask & ~jnp.isnan(k.data)
        if bool(jnp.all(row_mask)):
            row_mask = None
        else:
            keep = filter_indices(row_mask)
            keys = [copying.gather(k, keep, bounds_check=False) for k in keys]
            n = keys[0].length
    if n == 0:
        return Grouper(
            group_ids=jnp.zeros((0,), jnp.int64),
            num_groups=0,
            key_rows=jnp.zeros((0,), jnp.int64),
            sorted_order=jnp.zeros((0,), jnp.int64),
            group_offsets=jnp.zeros((1,), jnp.int64),
            row_mask=row_mask,
        )
    order = lex_sort_indices(keys, stable=True)
    # run starts in sorted order
    neq = None
    for col in keys:
        for k in equality_keys(col):
            s = jnp.take(k, order)
            d = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
            neq = d if neq is None else (neq | d)
    gid_sorted = jnp.cumsum(neq.astype(jnp.int64)) - 1
    num_groups = int(gid_sorted[-1]) + 1
    from cudf_tpu.ops._utils import inverse_permutation

    group_ids = jnp.take(gid_sorted, inverse_permutation(order))
    start_positions = filter_indices(neq)
    key_rows = jnp.take(order, start_positions)
    group_offsets = jnp.concatenate([start_positions, jnp.asarray([n], jnp.int64)])
    return Grouper(
        group_ids=group_ids,
        num_groups=num_groups,
        key_rows=key_rows,
        sorted_order=order,
        group_offsets=group_offsets,
        row_mask=row_mask,
    )


def group_keys_table(keys_table: Table, grouper: Grouper) -> Table:
    """One row per group (the unique key combinations, in sorted key order)."""
    key_rows = grouper.key_rows
    if grouper.row_mask is not None:
        keep = filter_indices(grouper.row_mask)
        key_rows = jnp.take(keep, key_rows)
    return copying.gather_table(keys_table, key_rows, bounds_check=False)


def _apply_row_mask(col: Column, grouper: Grouper) -> Column:
    if grouper.row_mask is None:
        return col
    return copying.gather(col, filter_indices(grouper.row_mask), bounds_check=False)



# ----------------------------------------------------------------------
# scatter-free run reductions over the sorted order
# ----------------------------------------------------------------------
# XLA scatter on TPU is ~5x slower than the sort itself, so segment_* is
# avoided: values are gathered into sorted-by-key order, reduced with
# prefix scans, and group results gathered at run boundaries.

def _sorted_values(col_data, grouper: "Grouper"):
    return jnp.take(col_data, grouper.sorted_order)


def _run_sum(x_sorted: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Per-run sums via prefix-sum differences.  offsets: int64[g+1]."""
    cs = jnp.cumsum(x_sorted)
    hi = jnp.take(cs, jnp.maximum(offsets[1:] - 1, 0))
    lo_idx = offsets[:-1] - 1
    lo = jnp.where(lo_idx >= 0, jnp.take(cs, jnp.maximum(lo_idx, 0)), jnp.zeros((), cs.dtype))
    return hi - lo


def _run_starts_mask(grouper: "Grouper") -> jnp.ndarray:
    n = grouper.sorted_order.shape[0]
    return jnp.zeros((n,), jnp.bool_).at[grouper.group_offsets[:-1]].set(True)


def _run_monoid(x_sorted: jnp.ndarray, grouper: "Grouper", fn) -> jnp.ndarray:
    """Per-run reduction for any monoid via a reset-scan + gather at ends."""
    neq = _run_starts_mask(grouper)

    def combine(a, b):
        aflag, aval = a
        bflag, bval = b
        return aflag | bflag, jnp.where(bflag, bval, fn(aval, bval))

    _, scanned = jax.lax.associative_scan(combine, (neq, x_sorted))
    return jnp.take(scanned, jnp.maximum(grouper.group_offsets[1:] - 1, 0))


# ----------------------------------------------------------------------
# aggregations (the 41-kind agg surface of cpp/include/cudf/aggregation.hpp
# is covered incrementally; this file implements the core set)
# ----------------------------------------------------------------------

def _segment_data(col: Column) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(data, valid) with NaNs treated as nulls (pandas skipna)."""
    v = col.validity
    if col.dtype.is_float:
        notnan = ~jnp.isnan(col.data)
        v = notnan if v is None else (v & notnan)
    return col.data, v


def group_count(col: Column, grouper: Grouper) -> Column:
    data, v = _segment_data(_apply_row_mask(col, grouper))
    if v is None:
        out = grouper.group_offsets[1:] - grouper.group_offsets[:-1]
    else:
        out = _run_sum(_sorted_values(v.astype(jnp.int64), grouper), grouper.group_offsets)
    return Column(dt.INT64, grouper.num_groups, data=out)


def group_size(grouper: Grouper) -> Column:
    out = grouper.group_offsets[1:] - grouper.group_offsets[:-1]
    return Column(dt.INT64, grouper.num_groups, data=out)


def group_sum(col: Column, grouper: Grouper) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    if col.dtype.is_bool or col.dtype.is_integer:
        acc = data.astype(jnp.int64)
        out_dtype = dt.INT64
    else:
        acc = data.astype(jnp.float64)
        out_dtype = dt.FLOAT64 if col.dtype != dt.FLOAT32 else dt.FLOAT32
    if v is not None:
        acc = jnp.where(v, acc, 0)
    out = _run_sum(_sorted_values(acc, grouper), grouper.group_offsets)
    # pandas min_count=0 semantics: all-null / empty groups sum to the
    # identity (0), NOT null (groupby.sum() of a NaN-only group is 0.0)
    return Column(out_dtype, grouper.num_groups, data=out.astype(out_dtype.storage))


def _any_valid(v: Optional[jnp.ndarray], grouper: Grouper) -> Optional[jnp.ndarray]:
    """Groups with zero valid rows yield null (pandas: NaN for all-null groups)."""
    if v is None:
        return None
    cnt = _run_sum(_sorted_values(v.astype(jnp.int64), grouper), grouper.group_offsets)
    validity = cnt > 0
    if bool(jnp.all(validity)):
        return None
    return validity


def group_min(col: Column, grouper: Grouper) -> Column:
    return _group_minmax(col, grouper, "min")


def group_max(col: Column, grouper: Grouper) -> Column:
    return _group_minmax(col, grouper, "max")


def _group_minmax(col: Column, grouper: Grouper, which: str) -> Column:
    col = _apply_row_mask(col, grouper)
    if col.dtype.is_string or col.dtype.is_dictionary:
        # reduce on row indices via segmented argmin over order keys
        idx = _group_arg_extreme_rows(col, grouper, which)
        out = copying.gather(col, idx, bounds_check=True)
        return out
    data, v = _segment_data(col)
    if col.dtype.is_float:
        fill = np.inf if which == "min" else -np.inf
        acc = data.astype(data.dtype)
    elif col.dtype.is_bool:
        fill = True if which == "min" else False
        acc = data
    else:
        info = np.iinfo(np.dtype(col.dtype.storage))
        fill = info.max if which == "min" else info.min
        acc = data
    if v is not None:
        acc = jnp.where(v, acc, jnp.asarray(fill, acc.dtype))
    fn = jnp.minimum if which == "min" else jnp.maximum
    out = _run_monoid(_sorted_values(acc, grouper), grouper, fn)
    validity = _any_valid(v, grouper)
    if validity is not None:
        # park a type-safe value in null slots
        out = jnp.where(validity, out, jnp.zeros_like(out))
    return Column(col.dtype, grouper.num_groups, data=out, validity=validity)


def _group_arg_extreme_rows(col: Column, grouper: Grouper, which: str) -> jnp.ndarray:
    """Per-group row index of the min/max value (null rows excluded)."""
    from cudf_tpu.ops.row_ops import order_keys

    n = col.length
    ops = order_keys(col, ascending=(which == "min"), na_position="last")
    idx = jnp.arange(n, dtype=jnp.int64)
    res = jax.lax.sort(
        [grouper.group_ids, *ops, idx], num_keys=1 + len(ops), is_stable=True
    )
    sorted_idx = res[-1]
    # first row of each group in this value-sorted order
    starts = grouper.group_offsets[:-1]
    first = jnp.take(sorted_idx, starts)
    # exclude all-null groups
    _, v = _segment_data(col)
    if v is not None:
        cnt = _run_sum(_sorted_values(v.astype(jnp.int64), grouper), grouper.group_offsets)
        first = jnp.where(cnt > 0, first, -1)
    return first


def group_mean(col: Column, grouper: Grouper) -> Column:
    s = group_sum(col, grouper)
    c = group_count(col, grouper)
    data = s.data.astype(jnp.float64) / jnp.maximum(c.data, 1)
    validity = c.data > 0
    if bool(jnp.all(validity)):
        validity = None
    return Column(dt.FLOAT64, grouper.num_groups, data=data, validity=validity)


def group_var(col: Column, grouper: Grouper, ddof: int = 1) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    x = data.astype(jnp.float64)
    if v is not None:
        x = jnp.where(v, x, 0.0)
    if v is None:
        cnt = grouper.group_offsets[1:] - grouper.group_offsets[:-1]
    else:
        cnt = _run_sum(_sorted_values(v.astype(jnp.int64), grouper), grouper.group_offsets)
    s = _run_sum(_sorted_values(x, grouper), grouper.group_offsets)
    mean_per_group = s / jnp.maximum(cnt, 1)
    centered = x - jnp.take(mean_per_group, grouper.group_ids)
    if v is not None:
        centered = jnp.where(v, centered, 0.0)
    ss = _run_sum(_sorted_values(centered * centered, grouper), grouper.group_offsets)
    denom = cnt - ddof
    out = jnp.where(denom > 0, ss / jnp.maximum(denom, 1), jnp.nan)
    validity = denom > 0
    if bool(jnp.all(validity)):
        validity = None
    return Column(dt.FLOAT64, grouper.num_groups, data=out, validity=validity)


def group_std(col: Column, grouper: Grouper, ddof: int = 1) -> Column:
    v = group_var(col, grouper, ddof)
    return Column(dt.FLOAT64, grouper.num_groups, data=jnp.sqrt(v.data), validity=v.validity)


def group_prod(col: Column, grouper: Grouper) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    if col.dtype.is_integer or col.dtype.is_bool:
        acc = data.astype(jnp.int64)
        out_dtype = dt.INT64
    else:
        acc = data.astype(jnp.float64)
        out_dtype = dt.FLOAT64
    if v is not None:
        acc = jnp.where(v, acc, jnp.ones_like(acc))
    out = _run_monoid(_sorted_values(acc, grouper), grouper, jnp.multiply)
    # pandas min_count=0: all-null / empty groups yield the identity (1)
    return Column(out_dtype, grouper.num_groups, data=out)


def group_any(col: Column, grouper: Grouper) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    b = data.astype(jnp.bool_)
    if v is not None:
        b = b & v
    out = _run_monoid(_sorted_values(b.astype(jnp.int8), grouper), grouper, jnp.maximum)
    return Column(dt.BOOL8, grouper.num_groups, data=out.astype(jnp.bool_))


def group_all(col: Column, grouper: Grouper) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    b = data.astype(jnp.bool_)
    if v is not None:
        b = b | ~v
    out = _run_monoid(_sorted_values(b.astype(jnp.int8), grouper), grouper, jnp.minimum)
    return Column(dt.BOOL8, grouper.num_groups, data=out.astype(jnp.bool_))


def group_first(col: Column, grouper: Grouper) -> Column:
    return _group_first_last(col, grouper, first=True)


def group_last(col: Column, grouper: Grouper) -> Column:
    return _group_first_last(col, grouper, first=False)


def _group_first_last(col: Column, grouper: Grouper, first: bool) -> Column:
    col = _apply_row_mask(col, grouper)
    n = col.length
    _, v = _segment_data(col)
    pos = jnp.arange(n, dtype=jnp.int64)
    if v is not None:
        pos_sel = jnp.where(v, pos, jnp.int64(n) if first else jnp.int64(-1))
    else:
        pos_sel = pos
    fn = jnp.minimum if first else jnp.maximum
    picked = _run_monoid(_sorted_values(pos_sel, grouper), grouper, fn)
    invalid_sentinel = jnp.int64(n) if first else jnp.int64(-1)
    picked = jnp.where(picked == invalid_sentinel, -1, picked)
    return copying.gather(col, picked, bounds_check=True)


def group_nth(col: Column, grouper: Grouper, n: int) -> Column:
    col = _apply_row_mask(col, grouper)
    starts = grouper.group_offsets[:-1]
    sizes = grouper.group_offsets[1:] - starts
    nn = jnp.where(n >= 0, n, sizes + n)
    pick_pos = starts + nn
    ok = (nn >= 0) & (nn < sizes)
    rows = jnp.where(ok, jnp.take(grouper.sorted_order, jnp.clip(pick_pos, 0, col.length - 1)), -1)
    return copying.gather(col, rows, bounds_check=True)


def group_nunique(col: Column, grouper: Grouper, dropna: bool = True) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    # distinct (gid, value) pairs: sort by gid then equality keys
    ops = [grouper.group_ids, *equality_keys(col)]
    res = jax.lax.sort(ops, num_keys=len(ops), is_stable=False)
    gid_s = res[0]
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), gid_s[1:] != gid_s[:-1]])
    for k in res[1:]:
        d = jnp.concatenate([jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]])
        neq = neq | d
    counts = jax.ops.segment_sum(neq.astype(jnp.int64), gid_s, num_segments=grouper.num_groups)
    if dropna and v is not None:
        # subtract the single null-run per group that has any nulls
        has_null = jax.ops.segment_max(
            (~v).astype(jnp.int8), grouper.group_ids, num_segments=grouper.num_groups
        )
        counts = counts - has_null.astype(jnp.int64)
    return Column(dt.INT64, grouper.num_groups, data=counts)


def group_quantile(col: Column, grouper: Grouper, q: float = 0.5,
                   interpolation: str = "linear") -> Column:
    """Per-group quantile via one segmented value sort (group_quantiles.cu)."""
    col = _apply_row_mask(col, grouper)
    n = col.length
    data, v = _segment_data(col)
    x = data.astype(jnp.float64)
    # sort by (gid, null-last, value)
    nullflag = jnp.zeros((n,), jnp.int8) if v is None else (~v).astype(jnp.int8)
    res = jax.lax.sort([grouper.group_ids, nullflag, x], num_keys=3, is_stable=False)
    xs = res[2]
    starts = grouper.group_offsets[:-1]
    cnt = (
        jax.ops.segment_sum(jnp.ones((n,), jnp.int64) if v is None else v.astype(jnp.int64),
                            grouper.group_ids, num_segments=grouper.num_groups)
    )
    pos = q * jnp.maximum(cnt - 1, 0).astype(jnp.float64)
    lo = jnp.floor(pos).astype(jnp.int64)
    hi = jnp.ceil(pos).astype(jnp.int64)
    safe = lambda i: jnp.clip(starts + i, 0, n - 1)
    dlo = jnp.take(xs, safe(lo))
    dhi = jnp.take(xs, safe(hi))
    if interpolation == "linear":
        out = dlo + (pos - lo) * (dhi - dlo)
    elif interpolation == "lower":
        out = dlo
    elif interpolation == "higher":
        out = dhi
    elif interpolation == "midpoint":
        out = (dlo + dhi) / 2
    else:
        out = jnp.where(pos - lo <= 0.5, dlo, dhi)
    validity = cnt > 0
    if bool(jnp.all(validity)):
        validity = None
    return Column(dt.FLOAT64, grouper.num_groups, data=out, validity=validity)


def group_median(col: Column, grouper: Grouper) -> Column:
    return group_quantile(col, grouper, 0.5)


def group_idxminmax(col: Column, grouper: Grouper, which: str) -> Column:
    rows = _group_arg_extreme_rows(col, grouper, which)
    if grouper.row_mask is not None:
        keep = filter_indices(grouper.row_mask)
        rows = jnp.where(rows >= 0, jnp.take(keep, jnp.clip(rows, 0, None)), -1)
    validity = rows >= 0
    if bool(jnp.all(validity)):
        validity = None
    return Column(dt.INT64, grouper.num_groups, data=jnp.clip(rows, 0, None), validity=validity)


# ----------------------------------------------------------------------
# round-2 agg completion toward the 41-kind enum (aggregation.hpp:78-121):
# COLLECT_LIST/SET (group_collect.cu), TOP_K (group_topk.cu), HISTOGRAM,
# COVARIANCE/CORRELATION (group_correlation.cu), EWMA, SUM_OF_SQUARES,
# M2, BITWISE_AGG
# ----------------------------------------------------------------------

def group_sum_of_squares(col: Column, grouper: Grouper) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    x = data.astype(jnp.float64)
    if v is not None:
        x = jnp.where(v, x, 0.0)
    out = _run_sum(_sorted_values(x * x, grouper), grouper.group_offsets)
    return Column(dt.FLOAT64, grouper.num_groups, data=out,
                  validity=_any_valid(v, grouper))


def group_m2(col: Column, grouper: Grouper) -> Column:
    """Sum of squared deviations from the group mean (M2 — the partial
    that merges across distributed partials via Chan's formula,
    MERGE_M2)."""
    v = group_var(col, grouper, ddof=0)
    c = group_count(col, grouper)
    data = v.data * c.data
    return Column(dt.FLOAT64, grouper.num_groups, data=data, validity=v.validity)


def group_collect_list(col: Column, grouper: Grouper) -> Column:
    """LIST column: group's values in input row order (group_collect.cu)."""
    from cudf_tpu.ops.lists import make_list_column

    col = _apply_row_mask(col, grouper)
    vals = copying.gather(col, grouper.sorted_order, bounds_check=False)
    return make_list_column(grouper.group_offsets, vals)


def _distinct_per_group(col: Column, grouper: Grouper):
    """(rows, run_gid, run_counts): one input row per distinct
    (group, value) pair, ordered by (group, value)."""
    n = col.length
    ops = [grouper.group_ids, *equality_keys(col)]
    idx = jnp.arange(n, dtype=jnp.int64)
    res = jax.lax.sort([*ops, idx], num_keys=len(ops), is_stable=True)
    gid_s, idx_s = res[0], res[-1]
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), gid_s[1:] != gid_s[:-1]])
    for k in res[1:-1]:
        d = jnp.concatenate([jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]])
        neq = neq | d
    starts = filter_indices(neq)
    rows = jnp.take(idx_s, starts)
    run_gid = jnp.take(gid_s, starts)
    run_end = jnp.concatenate([starts[1:], jnp.asarray([n], jnp.int64)])
    run_counts = run_end - starts
    return rows, run_gid, run_counts


def group_collect_set(col: Column, grouper: Grouper) -> Column:
    """LIST column of each group's distinct values, value-ordered
    (group_collect.cu + drop_list_duplicates)."""
    from cudf_tpu.ops.lists import make_list_column

    col = _apply_row_mask(col, grouper)
    rows, run_gid, _ = _distinct_per_group(col, grouper)
    vals = copying.gather(col, rows, bounds_check=False)
    per_group = jax.ops.segment_sum(
        jnp.ones_like(run_gid), run_gid, num_segments=grouper.num_groups)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(per_group)])
    return make_list_column(offsets, vals)


def group_topk(col: Column, grouper: Grouper, k: int,
               largest: bool = True) -> Column:
    """LIST column of each group's k largest/smallest values
    (group_topk.cu)."""
    from cudf_tpu.ops.lists import make_list_column
    from cudf_tpu.ops.row_ops import order_keys

    col = _apply_row_mask(col, grouper)
    n = col.length
    ops = order_keys(col, ascending=not largest, na_position="last")
    idx = jnp.arange(n, dtype=jnp.int64)
    res = jax.lax.sort([grouper.group_ids, *ops, idx],
                       num_keys=1 + len(ops), is_stable=True)
    idx_s = res[-1]
    sizes = grouper.group_offsets[1:] - grouper.group_offsets[:-1]
    _, v = _segment_data(col)
    if v is not None:
        vcnt = _run_sum(_sorted_values(v.astype(jnp.int64), grouper),
                        grouper.group_offsets)
        sizes = jnp.minimum(sizes, vcnt)
    gid_of_pos = jnp.repeat(jnp.arange(grouper.num_groups, dtype=jnp.int64),
                            grouper.group_offsets[1:] - grouper.group_offsets[:-1],
                            total_repeat_length=n)
    within = jnp.arange(n, dtype=jnp.int64) - jnp.take(
        grouper.group_offsets, gid_of_pos)
    keepn = jnp.minimum(sizes, k)
    keep = within < jnp.take(keepn, gid_of_pos)
    rows = jnp.take(idx_s, filter_indices(keep))
    vals = copying.gather(col, rows, bounds_check=False)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(keepn)])
    return make_list_column(offsets, vals)


def group_histogram(col: Column, grouper: Grouper) -> Column:
    """LIST<STRUCT<value, count>> per group (HISTOGRAM agg)."""
    from cudf_tpu.ops.lists import make_list_column

    col = _apply_row_mask(col, grouper)
    rows, run_gid, run_counts = _distinct_per_group(col, grouper)
    vals = copying.gather(col, rows, bounds_check=False)
    cnts = Column(dt.INT64, vals.length, data=run_counts)
    child = Column(
        dt.struct_dtype([("value", vals.dtype), ("count", dt.INT64)]),
        vals.length, children=(vals, cnts))
    per_group = jax.ops.segment_sum(
        jnp.ones_like(run_gid), run_gid, num_segments=grouper.num_groups)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(per_group)])
    return make_list_column(offsets, child)


def group_tdigest(col: Column, grouper: Grouper, delta: int = 100) -> Column:
    """Per-group t-digest sketch: STRUCT<centroids: LIST<STRUCT<mean,
    weight>>, min, max> (TDIGEST agg — quantiles/tdigest/
    tdigest_aggregation.cu; k1 scale, ops/tdigest.py)."""
    from cudf_tpu.ops.lists import make_list_column
    from cudf_tpu.ops.tdigest import _k_scale

    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    n = col.length
    G = grouper.num_groups
    x = data.astype(jnp.float64)
    nullflag = jnp.zeros((n,), jnp.int8) if v is None else (~v).astype(jnp.int8)
    res = jax.lax.sort([grouper.group_ids, nullflag.astype(jnp.int64), x],
                       num_keys=3, is_stable=False)
    gid_s, nf_s, xs = res
    valid_s = nf_s == 0
    w = valid_s.astype(jnp.float64)
    cw = jnp.cumsum(w)
    starts = grouper.group_offsets[:-1]
    base = jnp.take(cw, jnp.clip(starts, 0, max(n - 1, 0))) - \
        jnp.take(w, jnp.clip(starts, 0, max(n - 1, 0)))
    cum_mid = cw - jnp.take(base, gid_s) - w * 0.5
    totals = jax.ops.segment_sum(w, gid_s, num_segments=G)
    q = cum_mid / jnp.maximum(jnp.take(totals, gid_s), 1e-300)
    local_cid = jnp.clip(jnp.floor(_k_scale(q) * delta).astype(jnp.int64),
                         0, delta - 1)
    cid = jnp.where(valid_s, gid_s * delta + local_cid, G * delta)
    wsum = jax.ops.segment_sum(w, cid, num_segments=G * delta + 1)[:-1]
    xsum = jax.ops.segment_sum(jnp.where(valid_s, xs, 0.0) * w, cid,
                               num_segments=G * delta + 1)[:-1]
    keep = wsum > 0
    rows = filter_indices(keep)
    means = jnp.take(xsum, rows) / jnp.maximum(jnp.take(wsum, rows), 1e-300)
    weights = jnp.take(wsum, rows)
    cent_gid = rows // delta
    per_group = jax.ops.segment_sum(jnp.ones_like(cent_gid), cent_gid,
                                    num_segments=G)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(per_group)])
    cent = Column(
        dt.struct_dtype([("mean", dt.FLOAT64), ("weight", dt.FLOAT64)]),
        means.shape[0],
        children=(Column(dt.FLOAT64, means.shape[0], data=means),
                  Column(dt.FLOAT64, weights.shape[0], data=weights)))
    cent_list = make_list_column(offsets, cent)
    mn = group_min(col, grouper)
    mx = group_max(col, grouper)
    return Column(
        dt.struct_dtype([("centroids", cent_list.dtype),
                         ("min", dt.FLOAT64), ("max", dt.FLOAT64)]),
        G,
        children=(cent_list,
                  Column(dt.FLOAT64, G, data=mn.data.astype(jnp.float64),
                         validity=mn.validity),
                  Column(dt.FLOAT64, G, data=mx.data.astype(jnp.float64),
                         validity=mx.validity)))


def group_cov(cx: Column, cy: Column, grouper: Grouper,
              ddof: int = 1) -> Column:
    """Per-group sample covariance of two columns (group_correlation.cu).
    Pairwise-complete rows only (pandas semantics)."""
    cx = _apply_row_mask(cx, grouper)
    cy = _apply_row_mask(cy, grouper)
    dxd, vx = _segment_data(cx)
    dyd, vy = _segment_data(cy)
    v = None
    if vx is not None or vy is not None:
        v = jnp.ones((cx.length,), jnp.bool_)
        if vx is not None:
            v = v & vx
        if vy is not None:
            v = v & vy
    x = dxd.astype(jnp.float64)
    y = dyd.astype(jnp.float64)
    if v is not None:
        x = jnp.where(v, x, 0.0)
        y = jnp.where(v, y, 0.0)
    off = grouper.group_offsets
    if v is None:
        cnt = off[1:] - off[:-1]
    else:
        cnt = _run_sum(_sorted_values(v.astype(jnp.int64), grouper), off)
    sx = _run_sum(_sorted_values(x, grouper), off)
    sy = _run_sum(_sorted_values(y, grouper), off)
    sxy = _run_sum(_sorted_values(x * y, grouper), off)
    cnf = cnt.astype(jnp.float64)
    num = sxy - sx * sy / jnp.maximum(cnf, 1.0)
    denom = cnt - ddof
    out = jnp.where(denom > 0, num / jnp.maximum(denom, 1), jnp.nan)
    validity = denom > 0
    validity = None if bool(jnp.all(validity)) else validity
    return Column(dt.FLOAT64, grouper.num_groups, data=out, validity=validity)


def group_corr(cx: Column, cy: Column, grouper: Grouper) -> Column:
    """Per-group Pearson correlation (CORRELATION agg)."""
    cxm = _apply_row_mask(cx, grouper)
    cym = _apply_row_mask(cy, grouper)
    dxd, vx = _segment_data(cxm)
    dyd, vy = _segment_data(cym)
    v = None
    if vx is not None or vy is not None:
        v = jnp.ones((cxm.length,), jnp.bool_)
        if vx is not None:
            v = v & vx
        if vy is not None:
            v = v & vy
    x = dxd.astype(jnp.float64)
    y = dyd.astype(jnp.float64)
    if v is not None:
        x = jnp.where(v, x, 0.0)
        y = jnp.where(v, y, 0.0)
    off = grouper.group_offsets
    if v is None:
        cnt = off[1:] - off[:-1]
    else:
        cnt = _run_sum(_sorted_values(v.astype(jnp.int64), grouper), off)
    cnf = cnt.astype(jnp.float64)
    sx = _run_sum(_sorted_values(x, grouper), off)
    sy = _run_sum(_sorted_values(y, grouper), off)
    sxx = _run_sum(_sorted_values(x * x, grouper), off)
    syy = _run_sum(_sorted_values(y * y, grouper), off)
    sxy = _run_sum(_sorted_values(x * y, grouper), off)
    cov_n = cnf * sxy - sx * sy
    varx_n = cnf * sxx - sx * sx
    vary_n = cnf * syy - sy * sy
    denom = jnp.sqrt(jnp.maximum(varx_n * vary_n, 0.0))
    out = jnp.where(denom > 0, cov_n / jnp.maximum(denom, 1e-300), jnp.nan)
    validity = cnt > 1
    validity = None if bool(jnp.all(validity)) else validity
    return Column(dt.FLOAT64, grouper.num_groups, data=out, validity=validity)


def group_ewma(col: Column, grouper: Grouper, alpha: float,
               adjust: bool = True, ignore_na: bool = False) -> Column:
    """Per-ROW exponentially-weighted mean within each group (the EWMA
    scan agg).  Output is aligned to the input row order."""
    col = _apply_row_mask(col, grouper)
    n = col.length
    data, v = _segment_data(col)
    x = _sorted_values(data.astype(jnp.float64), grouper)
    valid_s = (jnp.ones((n,), jnp.bool_) if v is None
               else _sorted_values(v, grouper))
    starts = _run_starts_mask(grouper)
    om = 1.0 - alpha
    # uniform-decay num/den linear scans with reset at group starts:
    # num_t = om * num_{t-1} + w_t * x_t ; den_t = om * den_{t-1} + w_t
    # (adjust=True weights w=1; adjust=False folds the denominator in)
    def combine(a, b):
        a_reset, a_decay, a_num, a_den = a
        b_reset, b_decay, b_num, b_den = b
        reset = a_reset | b_reset
        return (reset,
                jnp.where(b_reset, b_decay, a_decay * b_decay),
                jnp.where(b_reset, b_num, b_num + b_decay * a_num),
                jnp.where(b_reset, b_den, b_den + b_decay * a_den))

    w = valid_s.astype(jnp.float64)
    # ignore_na=True: gaps don't decay; ignore_na=False (pandas default):
    # decay counts absolute row distance, nulls included
    decay = jnp.where(valid_s, om, 1.0) if ignore_na \
        else jnp.full((n,), om, jnp.float64)
    xw = jnp.where(valid_s, x, 0.0) * w
    _, _, num, den = jax.lax.associative_scan(
        combine, (starts, decay, xw, w))
    out_sorted = jnp.where(den > 0, num / jnp.maximum(den, 1e-300), jnp.nan)
    if not adjust:
        # unadjusted recurrence with pandas' per-valid-row
        # renormalization: y <- (1-beta) y + beta x, beta = alpha /
        # ((1-alpha)^(g+1) + alpha), g = invalid rows since the last
        # valid one (ops/scan.py ewm_mean, group-reset form)
        pos = jnp.arange(n, dtype=jnp.int64)
        run_start_pos = jax.lax.cummax(jnp.where(starts, pos, jnp.int64(0)))
        inc = jnp.cumsum(valid_s.astype(jnp.int64))
        base = (jnp.take(inc, run_start_pos)
                - jnp.take(valid_s, run_start_pos).astype(jnp.int64))
        seen_before = (inc - valid_s.astype(jnp.int64) - base) > 0

        def reset_max(a, b):
            ra, va = a
            rb, vb = b
            return ra | rb, jnp.where(rb, vb, jnp.maximum(va, vb))

        _, lv = jax.lax.associative_scan(
            reset_max, (starts, jnp.where(valid_s, pos, jnp.int64(-1))))
        prev_valid = jnp.where(
            starts, jnp.int64(-1),
            jnp.concatenate([jnp.full((1,), -1, jnp.int64), lv[:-1]]))
        if ignore_na:
            beta = jnp.full((n,), alpha, jnp.float64)
        else:
            gaps = (pos - 1 - prev_valid).astype(jnp.float64)
            w_old = om ** (gaps + 1.0)
            beta = alpha / (w_old + alpha)
        a2 = jnp.where(valid_s, jnp.where(seen_before, 1.0 - beta, 0.0), 1.0)
        b2 = jnp.where(valid_s,
                       jnp.where(seen_before, beta * jnp.where(valid_s, x, 0.0),
                                 jnp.where(valid_s, x, 0.0)), 0.0)

        def compose(left, right):
            rl, al, bl = left
            rr, ar, br = right
            return (rl | rr,
                    jnp.where(rr, ar, al * ar),
                    jnp.where(rr, br, ar * bl + br))

        # reset the linear recurrence at group starts (state seeds to 0;
        # the first valid row's (a=0, b=x) then seeds y = x)
        _, _, y = jax.lax.associative_scan(compose, (starts, a2, b2))
        out_sorted = jnp.where(seen_before | valid_s, y, jnp.nan)
    # pandas emits the RUNNING mean at NaN positions (carry-forward);
    # only positions before a group's first valid row are NaN (den == 0)
    from cudf_tpu.ops._utils import inverse_permutation

    out = jnp.take(out_sorted, inverse_permutation(grouper.sorted_order))
    return Column(dt.FLOAT64, n, data=out)


def _group_bitwise(col: Column, grouper: Grouper, op: str) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    acc = data.astype(jnp.int64)
    ident = {"and": jnp.int64(-1), "or": jnp.int64(0), "xor": jnp.int64(0)}[op]
    if v is not None:
        acc = jnp.where(v, acc, ident)
    fn = {"and": jnp.bitwise_and, "or": jnp.bitwise_or,
          "xor": jnp.bitwise_xor}[op]
    out = _run_monoid(_sorted_values(acc, grouper), grouper, fn)
    return Column(dt.INT64, grouper.num_groups, data=out,
                  validity=_any_valid(v, grouper))


def group_bitwise_and(col, grouper):
    return _group_bitwise(col, grouper, "and")


def group_bitwise_or(col, grouper):
    return _group_bitwise(col, grouper, "or")


def group_bitwise_xor(col, grouper):
    return _group_bitwise(col, grouper, "xor")


_AGG_DISPATCH = {
    "sum": group_sum,
    "count": group_count,
    "size": lambda col, g: group_size(g),
    "mean": group_mean,
    "min": group_min,
    "max": group_max,
    "var": group_var,
    "std": group_std,
    "prod": group_prod,
    "product": group_prod,
    "any": group_any,
    "all": group_all,
    "first": group_first,
    "last": group_last,
    "nunique": group_nunique,
    "median": group_median,
    "idxmin": lambda col, g: group_idxminmax(col, g, "min"),
    "idxmax": lambda col, g: group_idxminmax(col, g, "max"),
    "collect": group_collect_list,
    "list": group_collect_list,
    "unique": group_collect_set,
    "collect_set": group_collect_set,
    "sum_of_squares": group_sum_of_squares,
    "m2": group_m2,
    "histogram": group_histogram,
    "bitwise_and": group_bitwise_and,
    "bitwise_or": group_bitwise_or,
    "bitwise_xor": group_bitwise_xor,
    "tdigest": group_tdigest,
}


def _try_onehot_fast_path(keys: Table, values, dropna: bool):
    """Single-pass MXU path for low-cardinality int/dictionary keys
    (the hash-groupby arm of the dispatcher, groupby.cu:54-69), and the
    radix-partition tier for large key domains.

    Default-ON (option groupby.onehot_fast_path) above
    groupby.fast_path_min_rows rows.  Exactness contract:
    - integer/bool values: BIT-EXACT int64 sums / counts / means vs
      pandas (signed 8-bit chunk decomposition + double-float f32
      accumulators, kernels/hash_aggregate.py docstring); min/max
      guarded to |v| < 2^24 where f32 is exact.
    - float values: double-float accumulators remove cross-tile
      rounding; residual in-step f32 error ~1e-9 relative (measured),
      documented deviation from pandas' f64 pairwise sums.
    Supports sum/count/mean/min/max/size on numeric values, single key
    column; TPU backend (or interpret mode via groupby.kernel_interpret
    for CPU testing).
    """
    import jax

    from cudf_tpu.utils.config import get_option

    if not get_option("groupby.onehot_fast_path"):
        return None
    interpret = bool(get_option("groupby.kernel_interpret"))
    if jax.default_backend() == "cpu" and not interpret:
        return None
    key = keys.column(0) if keys.num_columns == 1 else None
    if key is None or key.length < int(get_option("groupby.fast_path_min_rows")):
        return None
    if key.dtype.is_dictionary:
        codes = key.data.astype(jnp.int32)
        K = key.children[0].length
        key_values = key.children[0]
    elif key.dtype.is_integer:
        lo = int(jnp.min(key.data)) if key.length else 0
        hi = int(jnp.max(key.data)) if key.length else 0
        K = hi - lo + 1
        if K <= 0 or K > (1 << 27):
            return None
        codes = (key.data - lo).astype(jnp.int32)
        key_values = None
        key_lo = lo
    else:
        return None
    # tier decision (the hash-vs-sort dispatch of groupby.cu:54-69):
    # small K -> single-pass one-hot MXU; large K -> radix partition +
    # windowed aggregation (kernels/radix_partition.py, sum/count only)
    radix_tier = K > 4096
    if K > (1 << 27):
        return None
    supported = {"sum", "count", "mean", "min", "max", "size"}
    if any(a not in supported or not (c.dtype.is_numeric or c.dtype.is_bool)
           for _, c, a in values):
        return None

    # per-column mode + exactness guards (one min/max reduce per column
    # that needs a range check — the same inspection the reference's
    # dispatcher makes of its aggregation request list)
    def column_plan(col, agg):
        if radix_tier and agg in ("min", "max"):
            # high-cardinality extrema ride XLA segment_min/max in the
            # column's NATIVE dtype — exact for every dtype, no chunk
            # range guard needed (compute_single_pass_aggs.cu covers all
            # agg kinds at any cardinality; this is the T1 equivalent)
            return "seg", col.data
        if col.dtype.is_bool:
            return "int", col.data.astype(jnp.int32)
        if col.dtype.is_integer:
            # int32 and narrower signed ints always fit the chunk scheme;
            # min/max additionally need |v| < 2^24 (f32-exact extrema)
            need = (1 << 24) if agg in ("min", "max") else (1 << 31)
            wide = col.dtype.itemsize > 4 or (
                col.dtype.itemsize == 4 and not col.dtype.is_signed_integer)
            if (wide or agg in ("min", "max")) and col.length:
                m = int(jnp.max(jnp.abs(col.data.astype(jnp.int64))))
                if m >= need:
                    return None, None
            return "int", col.data.astype(jnp.int32)
        if col.dtype == dt.FLOAT64 and agg in ("min", "max"):
            return None, None        # f32 kernel would round f64 extrema
        return "float", col.data.astype(jnp.float32)

    plans = []
    for name, col, agg in values:
        mode, data = column_plan(col, agg)
        if mode is None:
            return None
        plans.append((name, col, agg, mode, data))

    from cudf_tpu.kernels.hash_aggregate import onehot_groupby_aggregate
    from cudf_tpu.kernels.radix_partition import (SENTINEL,
                                                  radix_groupby_sum_count)

    valid = key.validity if dropna else None

    def run(mode, data, both, with_minmax, agg=None):
        if radix_tier:
            if mode == "seg":
                import jax as _jax

                kk = codes if both is None else jnp.where(
                    both, codes, jnp.int32(K))
                if jnp.issubdtype(data.dtype, jnp.floating):
                    info = jnp.finfo(data.dtype)
                else:
                    info = jnp.iinfo(data.dtype)
                ident = info.max if agg == "min" else info.min
                filled = data if both is None else jnp.where(
                    both, data, jnp.asarray(ident, data.dtype))
                seg = (_jax.ops.segment_min if agg == "min"
                       else _jax.ops.segment_max)
                red = seg(filled, kk, num_segments=K + 1)[:K]
                ones = jnp.ones(kk.shape, jnp.int32) if both is None                     else both.astype(jnp.int32)
                cnt = _jax.ops.segment_sum(ones, kk,
                                           num_segments=K + 1)[:K]
                return None, cnt, red, red
            k_in = codes if both is None else jnp.where(
                both, codes, jnp.int32(SENTINEL))
            s, c = radix_groupby_sum_count(k_in, data, K,
                                           int_mode=(mode == "int"),
                                           interpret=interpret)
            return s, c, None, None
        return onehot_groupby_aggregate(codes, data, K, valid=both,
                                        with_minmax=with_minmax,
                                        int_mode=(mode == "int"),
                                        interpret=interpret)

    results: Dict[str, Column] = {}
    occupied = None
    need_presence = False
    for name, col, agg, mode, data in plans:
        v = col.validity
        if agg == "size":
            both = valid            # size counts rows, not valid values
        else:
            both = valid if v is None else (v if valid is None else (v & valid))
        if v is not None and agg != "size":
            need_presence = True
        s, c, mn, mx = run(mode, data, both, agg in ("min", "max"),
                           agg=agg)
        occupied = c if occupied is None else jnp.maximum(occupied, c)
        if agg == "sum":
            if mode == "int":
                results[name] = Column(dt.INT64, K, data=s.astype(jnp.int64))
            else:
                results[name] = Column(dt.FLOAT64, K,
                                       data=s.astype(jnp.float64))
        elif agg in ("count", "size"):
            results[name] = Column(dt.INT64, K, data=c.astype(jnp.int64))
        elif agg == "mean":
            results[name] = Column(dt.FLOAT64, K,
                                   data=s.astype(jnp.float64)
                                   / jnp.maximum(c, 1).astype(jnp.float64))
        else:
            out_dt = col.dtype if (mode in ("int", "seg")
                                   or col.dtype == dt.FLOAT32) else dt.FLOAT64
            val = (mn if agg == "min" else mx).astype(out_dt.storage)
            results[name] = Column(out_dt, K, data=val)
    if need_presence:
        # group presence must ignore value nulls (a key whose values are
        # all null still forms a group in pandas)
        ones = jnp.ones((key.length,), jnp.int32)
        _, c, _, _ = run("int", ones, valid, False)
        occupied = c
    # compact to observed groups
    present = filter_indices(occupied > 0)
    out_aggs = Table({n: copying.gather(c, present, bounds_check=False)
                      for n, c in results.items()})
    if key_values is not None:
        key_col = copying.gather(key_values, present, bounds_check=False)
    else:
        key_col = Column(key.dtype, int(present.shape[0]),
                         data=(present + key_lo).astype(key.dtype.storage))
    return Table({keys.names[0]: key_col}), out_aggs


def groupby_agg(
    keys: Table,
    values: Sequence[Tuple[str, Column, str]],
    dropna: bool = True,
) -> Tuple[Table, Table]:
    """values: list of (output_name, column, agg) — returns (group keys, aggs).

    Equivalent of cudf::groupby::groupby::aggregate (groupby.cu) including
    its hash-vs-sort dispatch: the one-hot MXU kernel serves small-K keys
    when enabled (see _try_onehot_fast_path).
    """
    fast = _try_onehot_fast_path(keys, list(values), dropna)
    if fast is not None:
        return fast
    grouper = make_grouper(list(keys.columns), dropna=dropna)
    out_keys = group_keys_table(keys, grouper)
    out_cols = {}
    for name, col, agg in values:
        fn = _AGG_DISPATCH.get(agg)
        if fn is None:
            raise NotImplementedError(f"groupby agg {agg!r}")
        out_cols[name] = fn(col, grouper)
    return out_keys, Table(out_cols)


# ----------------------------------------------------------------------
# grouped scans & transforms (group_rank_scan.cu, group_shift etc.)
# ----------------------------------------------------------------------

def group_cumsum(col: Column, grouper: Grouper) -> Column:
    col = _apply_row_mask(col, grouper)
    data, v = _segment_data(col)
    out_dtype = dt.INT64 if col.dtype.is_integer or col.dtype.is_bool else dt.FLOAT64
    x = data.astype(out_dtype.storage)
    if v is not None:
        x = jnp.where(v, x, 0)
    # scan in sorted-by-group order, reset at group boundaries
    xs = jnp.take(x, grouper.sorted_order)
    gs = jnp.take(grouper.group_ids, grouper.sorted_order)

    def combine(a, b):
        (ga, va) = a
        (gb, vb) = b
        return gb, jnp.where(ga == gb, va + vb, vb)

    _, scanned = jax.lax.associative_scan(combine, (gs, xs))
    from cudf_tpu.ops._utils import inverse_permutation

    out = jnp.take(scanned, inverse_permutation(grouper.sorted_order))
    return Column(out_dtype, col.length, data=out, validity=col.validity)


def group_cumcount(grouper: Grouper) -> Column:
    n = grouper.group_ids.shape[0]
    ones = jnp.ones((n,), jnp.int64)
    gs = jnp.take(grouper.group_ids, grouper.sorted_order)

    def combine(a, b):
        (ga, va) = a
        (gb, vb) = b
        return gb, jnp.where(ga == gb, va + vb, vb)

    _, scanned = jax.lax.associative_scan(combine, (gs, ones))
    from cudf_tpu.ops._utils import inverse_permutation

    out = jnp.take(scanned - 1, inverse_permutation(grouper.sorted_order))
    return Column(dt.INT64, n, data=out)


def group_shift(col: Column, grouper: Grouper, periods: int = 1) -> Column:
    """LEAD/LAG within groups (rolling/detail/lead_lag)."""
    col = _apply_row_mask(col, grouper)
    n = col.length
    order = grouper.sorted_order
    pos = jnp.arange(n, dtype=jnp.int64)
    src_pos = pos - periods
    gid_sorted = jnp.take(grouper.group_ids, order)
    ok = (src_pos >= 0) & (src_pos < n)
    same_group = jnp.take(gid_sorted, jnp.clip(src_pos, 0, n - 1)) == gid_sorted
    src_rows = jnp.where(ok & same_group, jnp.take(order, jnp.clip(src_pos, 0, n - 1)), -1)
    shifted_sorted = copying.gather(col, src_rows, bounds_check=True)
    from cudf_tpu.ops._utils import inverse_permutation

    return copying.gather(shifted_sorted, inverse_permutation(order), bounds_check=False)
