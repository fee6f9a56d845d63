"""merge_asof — nearest-key (as-of) joins.

TPU-native: both sides sorted on the 'on' key, so the match is ONE
vectorized searchsorted per direction — no per-row loops
(pandas merge_asof semantics; the reference exposes this through
cudf.merge_asof on sorted columns).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying
from cudf_tpu.frame.index import default_index


def merge_asof(left, right, on: str, by: Optional[str] = None,
               direction: str = "backward", suffixes=("_x", "_y"),
               tolerance=None):
    from cudf_tpu.frame.dataframe import DataFrame

    lcol = left._table[on]
    rcol = right._table[on]
    l_on = lcol.data.astype(jnp.int64) if lcol.dtype.is_temporal else lcol.data
    r_on = rcol.data.astype(jnp.int64) if rcol.dtype.is_temporal else rcol.data

    if by is None:
        ridx = _asof_indices(l_on, r_on, direction)
    else:
        # composite: offset each group into a disjoint numeric range, then
        # one searchsorted over the combined (group, on) key
        from cudf_tpu.ops.dictionary import match_dictionaries, encode
        from cudf_tpu.ops.join import _aligned_keys

        lb = left._table[by]
        rb = right._table[by]
        l_ops, r_ops = _aligned_keys([lb], [rb])
        # dense group codes over the union
        both = jnp.concatenate([l_ops[0].astype(jnp.int64), r_ops[0].astype(jnp.int64)])
        uniq = jnp.unique(both, size=both.shape[0], fill_value=jnp.int64(2**62))
        lg = jnp.searchsorted(uniq, l_ops[0].astype(jnp.int64))
        rg = jnp.searchsorted(uniq, r_ops[0].astype(jnp.int64))
        if len(l_ops) > 1:
            raise NotImplementedError("merge_asof by= supports single-operand keys")
        SHIFT = jnp.int64(1) << jnp.int64(40)
        ridx = _asof_indices(
            lg.astype(jnp.int64) * SHIFT + l_on.astype(jnp.int64),
            rg.astype(jnp.int64) * SHIFT + r_on.astype(jnp.int64),
            direction,
            group_l=lg, group_r=rg,
        )

    if tolerance is not None:
        tol = np.int64(tolerance) if not hasattr(tolerance, "value") else np.int64(tolerance.value)
        matched_on = jnp.take(r_on, jnp.clip(ridx, 0, max(r_on.shape[0] - 1, 0)))
        if direction == "backward":
            ok = (ridx >= 0) & ((l_on - matched_on) <= tol)
        elif direction == "forward":
            ok = (ridx >= 0) & ((matched_on - l_on) <= tol)
        else:
            ok = (ridx >= 0) & (jnp.abs(matched_on - l_on) <= tol)
        ridx = jnp.where(ok, ridx, -1)

    out_cols = {}
    right_names = set(right._table.names)
    for n, c in left._table.items():
        nm = f"{n}{suffixes[0]}" if (n in right_names and n != on) else n
        out_cols[nm] = c
    for n, c in right._table.items():
        if n == on:
            continue
        nm = f"{n}{suffixes[1]}" if n in left._table.names else n
        out_cols[nm] = copying.gather(c, ridx, bounds_check=True)
    return DataFrame._from(Table(out_cols), left._index)


def _asof_indices(l_on, r_on, direction: str, group_l=None, group_r=None):
    nr = r_on.shape[0]
    if direction == "backward":
        pos = jnp.searchsorted(r_on, l_on, side="right") - 1
        idx = jnp.where(pos >= 0, pos, -1)
    elif direction == "forward":
        pos = jnp.searchsorted(r_on, l_on, side="left")
        idx = jnp.where(pos < nr, pos, -1)
    elif direction == "nearest":
        lo = jnp.searchsorted(r_on, l_on, side="right") - 1
        hi = jnp.searchsorted(r_on, l_on, side="left")
        lo_ok = lo >= 0
        hi_ok = hi < nr
        dl = jnp.where(lo_ok, l_on - jnp.take(r_on, jnp.clip(lo, 0, nr - 1)), jnp.int64(2**62))
        dh = jnp.where(hi_ok, jnp.take(r_on, jnp.clip(hi, 0, nr - 1)) - l_on, jnp.int64(2**62))
        idx = jnp.where(dl <= dh, jnp.where(lo_ok, lo, -1), jnp.where(hi_ok, hi, -1))
    else:
        raise ValueError(direction)
    if group_l is not None:
        # invalidate matches that crossed group boundaries
        safe = jnp.clip(idx, 0, nr - 1)
        same = jnp.take(group_r, safe) == group_l
        idx = jnp.where((idx >= 0) & same, idx, -1)
    return idx
