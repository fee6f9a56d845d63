"""Sorting: sorted_order, sort_by_key, rank, top_k, is_sorted, segmented sort.

TPU-native equivalent of libcudf sort
(reference: cpp/src/sort/ — cub radix fast path sort_radix.cu:69-111,
comparator path sort.cu, segmented_sort_impl.cuh, rank.cu, top_k.cu).

Design: all orders reduce to ONE variadic ``jax.lax.sort`` over the
row-operator key operands (ops/row_ops.py) — XLA lowers this to its tuned
on-chip sort network; there is no separate radix/comparator split to manage.
Segmented sort = prepend the segment id as the leading key (one fused sort,
no per-segment kernel launches).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying
from cudf_tpu.ops.row_ops import equality_keys, lex_sort_indices, order_keys


def sorted_order(
    keys: Sequence[Column],
    ascending: Optional[Sequence[bool]] = None,
    na_position: str = "last",
    stable: bool = True,
) -> jnp.ndarray:
    """argsort over key columns (cudf::sorted_order / stable_sorted_order)."""
    return lex_sort_indices(list(keys), ascending, na_position, stable)


def sort(col: Column, ascending: bool = True, na_position: str = "last") -> Column:
    order = sorted_order([col], [ascending], na_position)
    return copying.gather(col, order, bounds_check=False)


def sort_by_key(
    values: Table,
    keys: Sequence[Column],
    ascending: Optional[Sequence[bool]] = None,
    na_position: str = "last",
) -> Table:
    order = sorted_order(keys, ascending, na_position)
    return copying.gather_table(values, order, bounds_check=False)


def is_sorted(
    keys: Sequence[Column],
    ascending: Optional[Sequence[bool]] = None,
    na_position: str = "last",
) -> bool:
    keys = list(keys)
    if keys[0].length <= 1:
        return True
    if ascending is None:
        ascending = [True] * len(keys)
    operands: List[jnp.ndarray] = []
    for col, asc in zip(keys, ascending):
        operands.extend(order_keys(col, asc, na_position))
    # lexicographic adjacent compare: row i <= row i+1 iff the first
    # differing operand is strictly less
    m = keys[0].length - 1
    strict_lt = jnp.zeros((m,), jnp.bool_)
    all_eq = jnp.ones((m,), jnp.bool_)
    for op in operands:
        a, b = op[:-1], op[1:]
        strict_lt = strict_lt | (all_eq & (a < b))
        all_eq = all_eq & (a == b)
    return bool(jnp.all(strict_lt | all_eq))


def rank(
    col: Column,
    method: str = "average",
    ascending: bool = True,
    na_option: str = "keep",
    pct: bool = False,
) -> Column:
    """cudf::rank (cpp/src/sort/rank.cu) with pandas semantics."""
    n = col.length
    na_pos = "last" if na_option in ("keep", "bottom") else "top"
    order = sorted_order([col], [ascending], "last" if na_pos != "top" else "first")
    # positions in sorted order (sort-based inverse; scatter is slow on TPU)
    from cudf_tpu.ops._utils import inverse_permutation

    sorted_pos = inverse_permutation(order)
    # group boundaries among equal keys, in sorted order
    eq_ops = equality_keys(col)
    neq = None
    for k in eq_ops:
        s = jnp.take(k, order)
        d = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
        neq = d if neq is None else (neq | d)
    gid = jnp.cumsum(neq.astype(jnp.int64)) - 1  # dense group id per sorted row
    # index of each group's first sorted row, broadcast to every member
    group_first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(neq, jnp.arange(n, dtype=jnp.int64), -1)
    )
    group_sizes = jnp.zeros((n,), jnp.int64).at[gid].add(1)
    if method == "first":
        ranks_sorted = jnp.arange(1, n + 1, dtype=jnp.float64)
    elif method == "min":
        ranks_sorted = (group_first + 1).astype(jnp.float64)
    elif method == "max":
        ranks_sorted = (group_first + jnp.take(group_sizes, gid)).astype(jnp.float64)
    elif method == "dense":
        ranks_sorted = (gid + 1).astype(jnp.float64)
    else:  # average
        lo = (group_first + 1).astype(jnp.float64)
        hi = (group_first + jnp.take(group_sizes, gid)).astype(jnp.float64)
        ranks_sorted = (lo + hi) / 2.0
    ranks = jnp.take(ranks_sorted, sorted_pos)
    validity = col.validity
    if na_option == "keep":
        out_validity = validity
    else:
        out_validity = None
    if pct:
        if method == "dense":
            denom = jnp.max(gid) + 1
        else:
            denom = n if validity is None or na_option != "keep" else jnp.sum(validity)
        ranks = ranks / denom
    return Column(dt.FLOAT64, n, data=ranks, validity=out_validity)


def top_k(col: Column, k: int, largest: bool = True) -> Column:
    """cudf::top_k (cpp/src/sort/top_k.cu).

    Fast path: jax.lax.top_k on the (negated-for-ascending) order key —
    O(n log k) on chip instead of a full sort.
    """
    ops = order_keys(col, ascending=not largest, na_position="last")
    if len(ops) == 1 and col.validity is None and not col.dtype.is_string:
        # ops[0] ascends in the requested output order; top_k selects maxima,
        # so negate (int keys are ~-safe)
        _, idx = jax.lax.top_k(~ops[0] if ops[0].dtype != jnp.int8 else -ops[0].astype(jnp.int32), k)
        return copying.gather(col, idx.astype(jnp.int64), bounds_check=False)
    order = sorted_order([col], [not largest], "last")
    return copying.gather(col, order[:k], bounds_check=False)


def top_k_order(col: Column, k: int, largest: bool = True) -> jnp.ndarray:
    order = sorted_order([col], [not largest], "last")
    return order[:k]


def segmented_sort_indices(
    segment_ids: jnp.ndarray,
    keys: Sequence[Column],
    ascending: Optional[Sequence[bool]] = None,
    na_position: str = "last",
) -> jnp.ndarray:
    """Stable argsort within segments: one fused sort with the segment id
    as leading key (replaces cub::DeviceSegmentedSort,
    segmented_sort_impl.cuh:81-104)."""
    keys = list(keys)
    n = keys[0].length
    if ascending is None:
        ascending = [True] * len(keys)
    operands: List[jnp.ndarray] = [segment_ids.astype(jnp.int64)]
    for col, asc in zip(keys, ascending):
        operands.extend(order_keys(col, asc, na_position))
    idx = jnp.arange(n, dtype=jnp.int64)
    result = jax.lax.sort([*operands, idx], num_keys=len(operands), is_stable=True)
    return result[-1]
