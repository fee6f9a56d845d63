"""List-column operations.

TPU-native equivalent of libcudf lists (reference: cpp/src/lists/ —
extract.cu, contains.cu, explode.cu, count_elements.cu, sequences.cu,
set_operations, segmented_sort).  Layout: offsets[n+1] + child values
column (Arrow list layout), all flat jnp buffers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops import copying
from cudf_tpu.ops._utils import materialize_validity, segment_expand


def make_list_column(offsets: jnp.ndarray, child: Column,
                     validity: Optional[jnp.ndarray] = None) -> Column:
    n = offsets.shape[0] - 1
    return Column(
        dt.list_dtype(child.dtype), n, offsets=offsets.astype(jnp.int64),
        children=(child,), validity=validity,
    )


def from_pylists(lists, dtype=None) -> Column:
    """Host factory: list of lists (None = null row)."""
    flat = []
    lengths = []
    mask = []
    for l in lists:
        if l is None:
            lengths.append(0)
            mask.append(False)
        else:
            flat.extend(l)
            lengths.append(len(l))
            mask.append(True)
    offsets = np.zeros(len(lists) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    child = Column.from_sequence(flat, dtype=dtype)
    validity = None if all(mask) else jnp.asarray(np.array(mask))
    return make_list_column(jnp.asarray(offsets), child, validity)


def to_pylists(col: Column):
    offs = np.asarray(col.offsets)
    child_vals = col.children[0].to_pylist()
    valid = np.asarray(col.validity) if col.validity is not None else None
    out = []
    for i in range(col.length):
        if valid is not None and not valid[i]:
            out.append(None)
        else:
            out.append(child_vals[offs[i]:offs[i + 1]])
    return out


def count_elements(col: Column) -> Column:
    lens = col.offsets[1:] - col.offsets[:-1]
    return Column(dt.INT64, col.length, data=lens, validity=col.validity)


def extract_list_element(col: Column, index: int) -> Column:
    """list.get(i) with python negative-index semantics (extract.cu)."""
    lens = col.offsets[1:] - col.offsets[:-1]
    idx = jnp.where(index >= 0, jnp.int64(index), lens + index)
    ok = (idx >= 0) & (idx < lens)
    src = jnp.where(ok, col.offsets[:-1] + idx, -1)
    out = copying.gather(col.children[0], src, bounds_check=True)
    if col.validity is not None:
        from cudf_tpu.core import bitmask as bm

        out = out.with_validity(bm.and_masks(out.validity, col.validity))
    return out


def explode(col: Column, outer: bool = False):
    """(exploded child column, source-row map) — the frame layer uses the
    map to repeat other columns/index (explode.cu)."""
    lens = col.offsets[1:] - col.offsets[:-1]
    if outer:
        lens = jnp.maximum(lens, 1)  # empty/null rows emit one null
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lens)])
        total = int(offsets[-1])
        row = segment_expand(offsets, total)
        within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
        real_lens = col.offsets[1:] - col.offsets[:-1]
        has = within < jnp.take(real_lens, row)
        src = jnp.where(has, jnp.take(col.offsets[:-1], row) + within, -1)
        child = copying.gather(col.children[0], src, bounds_check=True)
        return child, row
    total = int(col.offsets[-1])
    row = segment_expand(col.offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(col.offsets, row)
    src = jnp.take(col.offsets[:-1], row) + within
    child = copying.gather(col.children[0], src, bounds_check=False)
    return child, row


def contains(col: Column, value) -> Column:
    """list.contains(scalar) (contains.cu)."""
    from cudf_tpu.ops.binaryop import binary_operation

    child = col.children[0]
    eq = binary_operation(child, value, "eq")
    m = eq.data
    if eq.validity is not None:
        m = m & eq.validity
    n = col.length
    total = child.length
    if total == 0:
        return Column(dt.BOOL8, n, data=jnp.zeros((n,), jnp.bool_), validity=col.validity)
    row = segment_expand(col.offsets, total)
    got = jax.ops.segment_max(m.astype(jnp.int8), row, num_segments=n) > 0
    return Column(dt.BOOL8, n, data=got, validity=col.validity)


def index_of(col: Column, value) -> Column:
    from cudf_tpu.ops.binaryop import binary_operation

    child = col.children[0]
    eq = binary_operation(child, value, "eq")
    m = eq.data
    if eq.validity is not None:
        m = m & eq.validity
    n = col.length
    total = child.length
    row = segment_expand(col.offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(col.offsets, row)
    big = jnp.int64(1 << 60)
    first = jax.ops.segment_min(jnp.where(m, within, big), row, num_segments=n)
    first = jnp.where(first >= big, -1, first)
    return Column(dt.INT64, n, data=first, validity=col.validity)


def concatenate_rows(cols: Sequence[Column]) -> Column:
    """Rowwise list concat (combine/concatenate_rows.cu)."""
    n = cols[0].length
    lens = sum((c.offsets[1:] - c.offsets[:-1]) for c in cols)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lens)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    # pick source column by cumulative per-row lengths
    src_idx = jnp.full((total,), -1, jnp.int64)
    src_col = jnp.zeros((total,), jnp.int32)
    acc = jnp.zeros((n,), jnp.int64)
    for ci, c in enumerate(cols):
        clen = c.offsets[1:] - c.offsets[:-1]
        in_this = (within >= jnp.take(acc, row)) & (within < jnp.take(acc + clen, row))
        local = within - jnp.take(acc, row)
        idx_in_child = jnp.take(c.offsets[:-1], row) + local
        src_idx = jnp.where(in_this, idx_in_child, src_idx)
        src_col = jnp.where(in_this, ci, src_col)
        acc = acc + clen
    combined_child = copying.concatenate([c.children[0] for c in cols])
    child_bases = np.cumsum([0] + [c.children[0].length for c in cols[:-1]])
    base = jnp.take(jnp.asarray(child_bases, jnp.int64), src_col.astype(jnp.int64))
    child = copying.gather(combined_child, base + src_idx, bounds_check=True)
    from cudf_tpu.core import bitmask as bm

    validity = bm.and_masks(*[c.validity for c in cols])
    return make_list_column(offsets, child, validity)


def segmented_sort(col: Column, ascending: bool = True) -> Column:
    """Sort within each list (segmented_sort.cu) — one fused sort with the
    row id as leading key."""
    child = col.children[0]
    total = child.length
    row = segment_expand(col.offsets, total)
    from cudf_tpu.ops.sort import segmented_sort_indices

    order = segmented_sort_indices(row, [child], [ascending])
    sorted_child = copying.gather(child, order, bounds_check=False)
    return make_list_column(col.offsets, sorted_child, col.validity)


def unique_per_row(col: Column) -> Column:
    """Distinct values within each list (stream_compaction on lists)."""
    child = col.children[0]
    total = child.length
    n = col.length
    row = segment_expand(col.offsets, total)
    from cudf_tpu.ops.row_ops import equality_keys
    from cudf_tpu.ops.sort import segmented_sort_indices
    from cudf_tpu.ops.stream_compaction import filter_indices

    order = segmented_sort_indices(row, [child], [True])
    row_s = jnp.take(row, order)
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), row_s[1:] != row_s[:-1]])
    for k in equality_keys(child):
        ks = jnp.take(k, order)
        d = jnp.concatenate([jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
        neq = neq | d
    keep = filter_indices(neq)
    new_child = copying.gather(child, jnp.take(order, keep), bounds_check=False)
    kept_rows = jnp.take(row_s, keep)
    lens = jax.ops.segment_sum(jnp.ones_like(kept_rows), kept_rows, num_segments=n)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lens)])
    return make_list_column(offsets, new_child, col.validity)


def sequences(starts: Column, sizes: Column, steps: Optional[Column] = None) -> Column:
    """Per-row arange lists (sequences.cu)."""
    n = starts.length
    lens = sizes.data.astype(jnp.int64)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lens)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    step = steps.data.astype(starts.data.dtype) if steps is not None else jnp.ones((n,), starts.data.dtype)
    vals = jnp.take(starts.data, row) + within.astype(starts.data.dtype) * jnp.take(step, row)
    child = Column(starts.dtype, total, data=vals)
    return make_list_column(offsets, child)
