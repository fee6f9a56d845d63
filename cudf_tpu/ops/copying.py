"""Column copying: gather, scatter, slice, concatenate, shift, repeat, …

TPU-native equivalent of libcudf's copying kernels
(reference: cpp/include/cudf/detail/gather.cuh:127,628, cpp/src/copying/).

Fixed-width gathers lower to a single XLA dynamic-gather (one fused HBM
pass).  Variable-width (string) gathers recompute offsets with a prefix sum
then move chars with a flat gather built from ``segment_expand`` — the XLA
analogue of libcudf's parallel string gather.  Output sizes that depend on
data (total chars, filter count) follow the reference's two-phase
count→allocate→retrieve pattern with one host sync.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import bitmask as bm
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.ops._utils import materialize_validity, segment_expand


# ----------------------------------------------------------------------
# gather
# ----------------------------------------------------------------------

def gather(col: Column, gather_map: jnp.ndarray, bounds_check: bool = True) -> Column:
    """out[i] = col[gather_map[i]]; negative or OOB indices produce nulls
    when bounds_check=True (libcudf out_of_bounds_policy::NULLIFY)."""
    # index in the narrowest width that addresses the source: int64
    # lanes are emulated on TPU, and the gather map is the hot operand
    it = jnp.int32 if col.length < 2**31 else jnp.int64
    gather_map = gather_map.astype(it)
    m = gather_map.shape[0]
    if col.length == 0 and m:
        # gathering from an empty column → every row is OOB → all nulls
        # (out_of_bounds_policy::NULLIFY; jnp.take rejects empty axes)
        validity = jnp.zeros((m,), jnp.bool_)
        if col.dtype.is_string:
            return Column(col.dtype, m, data=jnp.zeros((0,), jnp.uint8),
                          offsets=jnp.zeros((m + 1,), jnp.int64),
                          validity=validity)
        if col.dtype.is_dictionary:
            return Column(col.dtype, m, data=jnp.zeros((m,), jnp.int32),
                          validity=validity, children=col.children)
        if col.dtype.id == dt.TypeId.LIST:
            return Column(col.dtype, m,
                          offsets=jnp.zeros((m + 1,), jnp.int64),
                          children=col.children, validity=validity)
        if col.dtype.id == dt.TypeId.STRUCT:
            children = tuple(gather(c, gather_map, bounds_check)
                             for c in col.children)
            return Column(col.dtype, m, validity=validity,
                          children=children)
        return Column(col.dtype, m,
                      data=jnp.zeros((m,), col.dtype.storage),
                      validity=validity)
    if bounds_check:
        valid_idx = (gather_map >= 0) & (gather_map < col.length)
        safe = jnp.where(valid_idx, gather_map, 0)
    else:
        valid_idx = None
        safe = gather_map

    if col.dtype.is_string:
        return _gather_strings(col, safe, valid_idx)
    if col.dtype.id == dt.TypeId.LIST:
        return _gather_lists(col, safe, valid_idx)
    if col.dtype.id == dt.TypeId.STRUCT:
        children = tuple(gather(c, gather_map, bounds_check) for c in col.children)
        validity = _gathered_validity(col, safe, valid_idx)
        return Column(col.dtype, m, validity=validity, children=children)
    if col.dtype.is_dictionary:
        codes = jnp.take(col.data, safe, mode="clip" if col.length else "fill")
        validity = _gathered_validity(col, safe, valid_idx)
        return Column(col.dtype, m, data=codes, validity=validity, children=col.children)

    data = jnp.take(col.data, safe, mode="clip")
    validity = _gathered_validity(col, safe, valid_idx)
    return Column(col.dtype, m, data=data, validity=validity)


def _gathered_validity(col: Column, safe: jnp.ndarray, valid_idx) -> Optional[jnp.ndarray]:
    validity = None
    if col.validity is not None:
        validity = jnp.take(col.validity, safe, mode="clip")
    if valid_idx is not None:
        validity = valid_idx if validity is None else (validity & valid_idx)
        # normalizing an all-true mask to None costs a host sync on the
        # WHOLE pending async graph — only worth it for small columns
        if validity.shape[0] < (1 << 20) and bool(jnp.all(validity)):
            validity = None
    return validity


def _gather_strings(col: Column, safe: jnp.ndarray, valid_idx) -> Column:
    m = safe.shape[0]
    offs, chars = col.offsets, col.data
    starts = jnp.take(offs, safe, mode="clip")
    lengths = jnp.take(offs, safe + 1, mode="clip") - starts
    if valid_idx is not None:
        lengths = jnp.where(valid_idx, lengths, 0)
        starts = jnp.where(valid_idx, starts, 0)
    new_offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lengths)])
    total = int(new_offsets[-1])  # count phase: one host sync
    row = segment_expand(new_offsets, total)
    src = jnp.take(starts, row) + (jnp.arange(total, dtype=jnp.int64) - jnp.take(new_offsets, row))
    new_chars = jnp.take(chars, src, mode="clip") if chars.shape[0] else jnp.zeros((total,), jnp.uint8)
    validity = _gathered_validity(col, safe, valid_idx)
    return Column(col.dtype, m, data=new_chars, offsets=new_offsets, validity=validity)


def _gather_lists(col: Column, safe: jnp.ndarray, valid_idx) -> Column:
    """Gather of list rows: recompute offsets, flat-gather the child."""
    m = safe.shape[0]
    offs = col.offsets
    starts = jnp.take(offs, safe, mode="clip")
    lengths = jnp.take(offs, safe + 1, mode="clip") - starts
    if valid_idx is not None:
        lengths = jnp.where(valid_idx, lengths, 0)
        starts = jnp.where(valid_idx, starts, 0)
    new_offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lengths)])
    total = int(new_offsets[-1])
    row = segment_expand(new_offsets, total)
    src = jnp.take(starts, row) + (jnp.arange(total, dtype=jnp.int64) - jnp.take(new_offsets, row))
    child = gather(col.children[0], src, bounds_check=False)
    validity = _gathered_validity(col, safe, valid_idx)
    return Column(col.dtype, m, offsets=new_offsets, children=(child,), validity=validity)


def gather_table(table: Table, gather_map: jnp.ndarray, bounds_check: bool = True) -> Table:
    return Table.from_pairs(
        table.names, [gather(c, gather_map, bounds_check) for c in table.columns]
    )


# ----------------------------------------------------------------------
# scatter
# ----------------------------------------------------------------------

def scatter(source: Column, scatter_map: jnp.ndarray, target: Column) -> Column:
    """target[scatter_map[i]] = source[i] (libcudf cudf::scatter)."""
    if target.dtype.is_string or source.dtype.is_string:
        # strings: scatter via gather of a combined index (rebuild layout)
        n = target.length
        sel = jnp.full((n,), -1, dtype=jnp.int64).at[scatter_map.astype(jnp.int64)].set(
            jnp.arange(source.length, dtype=jnp.int64)
        )
        take_src = gather(source, jnp.where(sel >= 0, sel, 0), bounds_check=False)
        take_tgt = target
        from cudf_tpu.ops.binaryop import _select_strings

        return _select_strings(sel >= 0, take_src, take_tgt)
    smap = scatter_map.astype(jnp.int64)
    data = target.data.at[smap].set(source.data.astype(target.data.dtype))
    validity = None
    if target.validity is not None or source.validity is not None:
        tv = materialize_validity(target)
        sv = materialize_validity(source)
        validity = tv.at[smap].set(sv)
        if bool(jnp.all(validity)):
            validity = None
    return Column(target.dtype, target.length, data=data, validity=validity,
                  children=target.children)


def scatter_scalar(value, scatter_map: jnp.ndarray, target: Column) -> Column:
    src = Column.full(int(scatter_map.shape[0]), value, dtype=target.dtype)
    return scatter(src, scatter_map, target)


# ----------------------------------------------------------------------
# slice / split / concat
# ----------------------------------------------------------------------

def slice(col: Column, start: int, stop: int) -> Column:  # noqa: A001
    start = max(0, min(start, col.length))
    stop = max(start, min(stop, col.length))
    n = stop - start
    validity = col.validity[start:stop] if col.validity is not None else None
    if col.dtype.is_string:
        offs = col.offsets[start:stop + 1]
        c0, c1 = int(offs[0]), int(offs[-1])
        return Column(dt.STRING, n, data=col.data[c0:c1], offsets=offs - offs[0],
                      validity=validity)
    if col.dtype.id == dt.TypeId.LIST:
        offs = col.offsets[start:stop + 1]
        c0, c1 = int(offs[0]), int(offs[-1])
        child = slice(col.children[0], c0, c1)
        return Column(col.dtype, n, offsets=offs - offs[0], children=(child,),
                      validity=validity)
    if col.dtype.id == dt.TypeId.STRUCT:
        children = tuple(slice(c, start, stop) for c in col.children)
        return Column(col.dtype, n, children=children, validity=validity)
    return Column(col.dtype, n, data=col.data[start:stop], validity=validity,
                  children=col.children)


def split(col: Column, splits: Sequence[int]) -> List[Column]:
    bounds = [0, *splits, col.length]
    return [slice(col, bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def concatenate(cols: Sequence[Column]) -> Column:
    """Vertical concat (cudf::concatenate, cpp/src/copying/concatenate.cu)."""
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column")
    if len(cols) == 1:
        return cols[0]
    dtype = cols[0].dtype
    if any(c.dtype != dtype for c in cols):
        target = dtype
        for c in cols[1:]:
            target = dt.common_dtype(target, c.dtype)
        from cudf_tpu.ops.unary import cast

        cols = [cast(c, target) for c in cols]
        dtype = target
    n = sum(c.length for c in cols)
    any_nulls = any(c.validity is not None for c in cols)
    validity = (
        jnp.concatenate([materialize_validity(c) for c in cols]) if any_nulls else None
    )
    if dtype.is_string:
        chars = jnp.concatenate([c.data for c in cols])
        parts = [cols[0].offsets]
        shift_amt = cols[0].offsets[-1]
        for c in cols[1:]:
            parts.append(c.offsets[1:] + shift_amt)
            shift_amt = shift_amt + c.offsets[-1]
        offsets = jnp.concatenate(parts)
        return Column(dtype, n, data=chars, offsets=offsets, validity=validity)
    if dtype.is_dictionary:
        decoded = [c.decode_dictionary() for c in cols]
        from cudf_tpu.ops.dictionary import encode

        return encode(concatenate(decoded))
    if dtype.id == dt.TypeId.LIST:
        child = concatenate([c.children[0] for c in cols])
        parts = [cols[0].offsets]
        shift_amt = cols[0].offsets[-1]
        for c in cols[1:]:
            parts.append(c.offsets[1:] + shift_amt)
            shift_amt = shift_amt + c.offsets[-1]
        offsets = jnp.concatenate(parts)
        return Column(dtype, n, offsets=offsets, children=(child,), validity=validity)
    if dtype.id == dt.TypeId.STRUCT:
        children = tuple(
            concatenate([c.children[i] for c in cols]) for i in range(len(cols[0].children))
        )
        return Column(dtype, n, children=children, validity=validity)
    data = jnp.concatenate([c.data for c in cols])
    return Column(dtype, n, data=data, validity=validity)


def concatenate_tables(tables: Sequence[Table]) -> Table:
    names = tables[0].names
    return Table.from_pairs(
        names, [concatenate([t[n] for t in tables]) for n in names]
    )


# ----------------------------------------------------------------------
# misc copying ops
# ----------------------------------------------------------------------

def shift(col: Column, periods: int, fill_value=None) -> Column:
    """cudf::shift (cpp/src/copying/shift.cu)."""
    n = col.length
    idx = jnp.arange(n, dtype=jnp.int64) - periods
    out = gather(col, idx, bounds_check=True)
    if fill_value is not None:
        oob = (idx < 0) | (idx >= n)
        from cudf_tpu.ops.replace import replace_where

        out = replace_where(out, oob, fill_value)
    return out


def copy_if_else(mask: jnp.ndarray, lhs: Column, rhs: Column) -> Column:
    """out[i] = mask[i] ? lhs[i] : rhs[i] (cudf::copy_if_else)."""
    if lhs.dtype.is_string or rhs.dtype.is_string:
        from cudf_tpu.ops.binaryop import _select_strings

        return _select_strings(mask, lhs, rhs)
    target = dt.common_dtype(lhs.dtype, rhs.dtype)
    from cudf_tpu.ops.unary import cast

    lhs, rhs = cast(lhs, target), cast(rhs, target)
    data = jnp.where(mask, lhs.data, rhs.data)
    validity = None
    if lhs.validity is not None or rhs.validity is not None:
        validity = jnp.where(mask, materialize_validity(lhs), materialize_validity(rhs))
        if bool(jnp.all(validity)):
            validity = None
    return Column(target, lhs.length, data=data, validity=validity)


def repeat(col: Column, counts) -> Column:
    """Repeat each row counts[i] times (cudf::repeat, cpp/src/filling/repeat.cu)."""
    if isinstance(counts, int):
        idx = jnp.repeat(jnp.arange(col.length, dtype=jnp.int64), counts)
        return gather(col, idx, bounds_check=False)
    counts = jnp.asarray(counts, dtype=jnp.int64)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(counts)])
    total = int(offsets[-1])
    idx = segment_expand(offsets, total)
    return gather(col, idx, bounds_check=False)


def sequence(length: int, start=0, step=1, dtype=dt.INT64) -> Column:
    dtype = dt.dtype(dtype)
    data = start + step * jnp.arange(length, dtype=dtype.storage)
    return Column(dtype, length, data=data.astype(dtype.storage))


def reverse(col: Column) -> Column:
    return gather(col, jnp.arange(col.length - 1, -1, -1, dtype=jnp.int64), bounds_check=False)


def sample(col: Column, n: int, seed: int = 0, replace: bool = False) -> Column:
    key = jax.random.PRNGKey(seed)
    if replace:
        idx = jax.random.randint(key, (n,), 0, col.length, dtype=jnp.int64)
    else:
        idx = jax.random.permutation(key, col.length)[:n].astype(jnp.int64)
    return gather(col, idx, bounds_check=False)


def get_element(col: Column, i: int):
    return col[i]


def interleave_columns(cols: Sequence[Column]) -> Column:
    """Row-major interleave of k same-length columns (cudf::interleave_columns)."""
    k, n = len(cols), cols[0].length
    combined = concatenate(cols)
    # combined is col-major [c0 rows..., c1 rows...]; interleave via gather
    idx = (jnp.arange(n * k, dtype=jnp.int64) % k) * n + (jnp.arange(n * k, dtype=jnp.int64) // k)
    return gather(combined, idx, bounds_check=False)


def tile(col: Column, count: int) -> Column:
    idx = jnp.tile(jnp.arange(col.length, dtype=jnp.int64), count)
    return gather(col, idx, bounds_check=False)
