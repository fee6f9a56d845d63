"""DataFrame merge with pandas semantics.

TPU-native equivalent of cudf-python's Merge planner
(reference: python/cudf/cudf/core/join/join.py:36-373 — key dtype casting,
suffix handling, outer-join key coalescing) on top of ops/join gather maps.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying, join as join_ops, sort as sort_ops
from cudf_tpu.frame.index import Index, RangeIndex, default_index
from cudf_tpu.frame.dataframe import DataFrame


def merge(
    left: DataFrame,
    right: DataFrame,
    on=None,
    how: str = "inner",
    left_on=None,
    right_on=None,
    left_index: bool = False,
    right_index: bool = False,
    suffixes: Tuple[str, str] = ("_x", "_y"),
    sort: bool = False,
) -> DataFrame:
    if isinstance(right, dict):
        right = DataFrame(right)
    how = {"outer": "outer", "full": "outer"}.get(how, how)

    # pandas merge key resolution: a key may name an INDEX LEVEL instead
    # of a column (core/join/join.py _match_join_keys role) — materialize
    # the used levels as columns first
    def _materialize_levels(df, keys):
        if not keys:
            return df
        missing = [k for k in keys if k not in df._table.names]
        if not missing:
            return df
        idx_names = [n for n in (df._index.names
                                 if hasattr(df._index, "names")
                                 else [df._index.name]) if n is not None]
        used = [k for k in missing if k in idx_names]
        if not used:
            return df
        return df.reset_index(level=used if len(used) != len(idx_names)
                              else None)

    key_union = [k for k in (
        ([on] if isinstance(on, str) else list(on or []))
        + ([left_on] if isinstance(left_on, str) else list(left_on or []))
        + ([right_on] if isinstance(right_on, str) else list(right_on or []))
    )]
    if key_union and not (left_index and right_index):
        left = _materialize_levels(left, key_union)
        right = _materialize_levels(right, key_union)

    lkeys_names: Sequence
    if how == "cross":
        li, ri = join_ops.cross_join(len(left), len(right))
        out_cols = {}
        right_names = set(right._table.names)
        for n in left._table.names:
            nm = f"{n}{suffixes[0]}" if n in right_names else n
            out_cols[nm] = copying.gather(left._table[n], li, bounds_check=False)
        for n in right._table.names:
            nm = f"{n}{suffixes[1]}" if n in left._table.names else n
            out_cols[nm] = copying.gather(right._table[n], ri, bounds_check=False)
        return DataFrame._from(Table(out_cols), default_index(int(li.shape[0])))
    if left_index and right_index:
        lkey_cols = [left._index._column]
        rkey_cols = [right._index._column]
        lkeys_names = rkeys_names = ["__index__"]
    elif on is not None:
        on = [on] if isinstance(on, str) else list(on)
        lkeys_names = rkeys_names = on
        lkey_cols = [left._table[k] for k in on]
        rkey_cols = [right._table[k] for k in on]
    else:
        left_on = [left_on] if isinstance(left_on, str) else list(left_on or [])
        right_on = [right_on] if isinstance(right_on, str) else list(right_on or [])
        if not left_on and not right_on:
            common = [n for n in left._table.names if n in right._table.names]
            if not common:
                raise ValueError("no common columns to merge on")
            on = common
            lkeys_names = rkeys_names = on
            lkey_cols = [left._table[k] for k in on]
            rkey_cols = [right._table[k] for k in on]
        else:
            lkeys_names, rkeys_names = left_on, right_on
            lkey_cols = [left._table[k] for k in left_on]
            rkey_cols = [right._table[k] for k in right_on]

    if how == "inner":
        li, ri = join_ops.inner_join(lkey_cols, rkey_cols)
    elif how == "left":
        li, ri = join_ops.left_join(lkey_cols, rkey_cols)
    elif how == "right":
        ri, li = join_ops.left_join(rkey_cols, lkey_cols)
    elif how == "outer":
        li, ri = join_ops.full_join(lkey_cols, rkey_cols)
    elif how == "cross":
        li, ri = join_ops.cross_join(len(left), len(right))
        lkeys_names = rkeys_names = []
    elif how in ("leftsemi", "semi"):
        li = join_ops.semi_join(lkey_cols, rkey_cols)
        return left.take(li)
    elif how in ("leftanti", "anti"):
        li = join_ops.anti_join(lkey_cols, rkey_cols)
        return left.take(li)
    else:
        raise ValueError(f"unknown how={how!r}")

    # assemble output columns
    out_cols = {}
    key_set_l = set(lkeys_names) if on is not None or (left_index and right_index) else set()
    key_set_r = set(rkeys_names) if on is not None or (left_index and right_index) else set()
    right_names = set(right._table.names)
    left_names = set(left._table.names)

    for n in left._table.names:
        col = copying.gather(left._table[n], li, bounds_check=True)
        if n in key_set_l and how in ("outer", "right") and n in right._table.names:
            # coalesce keys from both sides for outer joins
            rcol = copying.gather(right._table[n], ri, bounds_check=True)
            from cudf_tpu.ops.replace import replace_nulls_column

            col = replace_nulls_column(col, rcol)
        name = n
        if n in right_names and n not in key_set_l:
            name = f"{n}{suffixes[0]}"
        out_cols[name] = col
    for n in right._table.names:
        if n in key_set_r and n in left_names:
            continue  # already emitted (merge key)
        col = copying.gather(right._table[n], ri, bounds_check=True)
        name = n
        if n in left_names:
            name = f"{n}{suffixes[1]}"
        out_cols[name] = col

    # index semantics
    if left_index and right_index:
        idx_col = copying.gather(left._index._column, li, bounds_check=True)
        from cudf_tpu.ops.replace import replace_nulls_column

        if how in ("outer", "right"):
            rix = copying.gather(right._index._column, ri, bounds_check=True)
            idx_col = replace_nulls_column(idx_col, rix)
        index = Index(column=idx_col, name=left._index.name)
    else:
        index = default_index(int(li.shape[0]))

    out = DataFrame._from(Table(out_cols), index)
    if sort and (lkeys_names or rkeys_names):
        keys = [k for k in (lkeys_names if on is None else on) if k in out._table]
        if keys:
            out = out.sort_values(keys, ignore_index=not (left_index and right_index))
    return out
