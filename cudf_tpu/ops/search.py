"""Search: lower_bound, upper_bound, contains (isin).

TPU-native equivalent of libcudf search (reference: cpp/src/search/).
``jnp.searchsorted`` lowers to a vectorized branchless binary search on
device.  Multi-column searches use the row-operator order keys.

``contains`` (isin) is sort-based: sort the needle set once, then one
vectorized searchsorted per equality-key operand — replacing the cuco
hash-set probe of the reference.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops.row_ops import equality_keys, lex_sort_indices, order_keys


def _aligned_order_ops(haystack: Column, needles: Column):
    """Order-key operands for both columns with identical operand layout.

    Aligns three sources of shape mismatch: dictionary encoding, a
    null-flag operand present on one side only, and string chunk counts
    that differ because max lengths differ (missing chunks pad with the
    intra-column empty-chunk value, int64 min, keeping byte order exact).
    """
    h, n = haystack, needles
    if h.dtype != n.dtype:
        if h.dtype.is_dictionary:
            h = h.decode_dictionary()
        if n.dtype.is_dictionary:
            n = n.decode_dictionary()
        if h.dtype != n.dtype:
            from cudf_tpu.core import dtypes as dt
            from cudf_tpu.ops.unary import cast

            target = dt.common_dtype(h.dtype, n.dtype)
            h, n = cast(h, target), cast(n, target)
    h_null = h.validity is not None
    n_null = n.validity is not None
    if h_null != n_null:
        if not h_null:
            h = h.with_validity(jnp.ones((h.length,), jnp.bool_))
        else:
            n = n.with_validity(jnp.ones((n.length,), jnp.bool_))
    h_ops = order_keys(h, True, "last")
    n_ops = order_keys(n, True, "last")
    if len(h_ops) != len(n_ops):
        tgt = max(len(h_ops), len(n_ops))
        pad_val = jnp.int64(-(2 ** 63))

        def pad(ops, length):
            head, ln = list(ops[:-1]), ops[-1]
            while len(head) + 1 < tgt:
                head.append(jnp.full((length,), pad_val))
            return [*head, ln]

        h_ops = pad(h_ops, h.length)
        n_ops = pad(n_ops, n.length)
    return h_ops, n_ops


def lower_bound(haystack: Column, needles: Column, side: str = "left") -> jnp.ndarray:
    """Insertion points of needles into sorted haystack (cudf::lower_bound)."""
    h_ops, n_ops = _aligned_order_ops(haystack, needles)
    if len(h_ops) == 1 and len(n_ops) == 1:
        from cudf_tpu.ops._utils import searchsorted_fast

        return searchsorted_fast(h_ops[0], n_ops[0], side).astype(jnp.int64)
    # multi-operand lexicographic binary search: combine into one sortable
    # key when operands fit in 64 bits is not general; fall back to
    # rank-merge: positions via stable sort of concatenated keys.
    return _lex_search(h_ops, n_ops, side)


def upper_bound(haystack: Column, needles: Column) -> jnp.ndarray:
    return lower_bound(haystack, needles, side="right")


def _lex_search(h_ops: List[jnp.ndarray], n_ops: List[jnp.ndarray], side: str) -> jnp.ndarray:
    """Lexicographic searchsorted via merge-by-sort.

    Concatenate haystack and needle key operands, stable-sort with a
    tiebreak that places needles after (left) or before (right) equal
    haystack rows, then each needle's insertion point = its position in
    the merged order minus the number of needles before it.
    """
    nh = h_ops[0].shape[0]
    nn = n_ops[0].shape[0]
    operands = [jnp.concatenate([h, n]) for h, n in zip(h_ops, n_ops)]
    # tiebreak among equal rows: lower_bound places needles before equal
    # haystack rows, upper_bound after
    needle_tie = jnp.int8(0 if side == "left" else 1)
    hay_tie = jnp.int8(1) - needle_tie
    tie = jnp.concatenate([jnp.full((nh,), hay_tie), jnp.full((nn,), needle_tie)])
    tag = jnp.concatenate([jnp.full((nh,), -1, jnp.int64), jnp.arange(nn, dtype=jnp.int64)])
    out = jax.lax.sort([*operands, tie, tag], num_keys=len(operands) + 1, is_stable=True)
    tag_sorted = out[-1]
    pos = jnp.arange(nh + nn, dtype=jnp.int64)
    sel = tag_sorted >= 0
    needles_before = jnp.cumsum(sel.astype(jnp.int64)) - sel.astype(jnp.int64)
    insert = pos - needles_before
    # nn+1-slot scatter: haystack rows park at the sentinel slot
    res = jnp.zeros((nn + 1,), jnp.int64)
    res = res.at[jnp.where(sel, tag_sorted, nn)].set(insert)
    return res[:nn]


def contains(haystack: Column, needles: Column) -> jnp.ndarray:
    """bool[len(needles)]: needle value present in haystack (cudf::contains,
    the kernel under Series.isin).  Null needles match null haystack rows
    (pandas isin treats None/NaN as matching)."""
    n = needles.length
    if haystack.length == 0 or n == 0:
        return jnp.zeros((n,), jnp.bool_)
    # aligned operand lists (validity flag may be absent on one side; string
    # chunk counts may differ)
    h_keys, n_keys = _align_key_ops(haystack, needles)
    order = jnp.argsort(h_keys[0]) if len(h_keys) == 1 else lex_sort_indices_raw(h_keys)
    sorted_ops = [jnp.take(k, order) for k in h_keys]
    lo = _searchsorted_multi(sorted_ops, n_keys, "left")
    hi = _searchsorted_multi(sorted_ops, n_keys, "right")
    return hi > lo


def _align_key_ops(a: Column, b: Column):
    """equality_keys with matched operand structure across two columns."""
    from cudf_tpu.ops import row_ops

    # promote to a common dtype so value equality is bitwise equality
    if a.dtype != b.dtype:
        if a.dtype.is_dictionary:
            a = a.decode_dictionary()
        if b.dtype.is_dictionary:
            b = b.decode_dictionary()
        if a.dtype != b.dtype:
            try:
                target = dt.common_dtype(a.dtype, b.dtype)
            except TypeError:
                target = None
            if target is not None:
                from cudf_tpu.ops.unary import cast

                a, b = cast(a, target), cast(b, target)
    av = a.validity is not None
    bv = b.validity is not None
    ka = equality_keys(a)
    kb = equality_keys(b)
    # validity operand present on one side only → add constant-1 on the other
    if av and not bv:
        kb = [jnp.ones((b.length,), jnp.int8), *kb]
    elif bv and not av:
        ka = [jnp.ones((a.length,), jnp.int8), *ka]
    # string chunk-count mismatch → pad the shorter with zero chunks before
    # the trailing length operand
    if a.dtype.is_string and b.dtype.is_string:
        if len(ka) != len(kb):
            tgt = max(len(ka), len(kb))
            def pad(ops, n):
                head, ln = ops[:-1], ops[-1]
                while len(head) + 1 < tgt:
                    head = [*head, jnp.full((n,), jnp.int64(-(2**63)), jnp.int64)]
                return [*head, ln]
            # account for validity flag offset
            if av or bv:
                ka = [ka[0], *pad(ka[1:], a.length)]
                kb = [kb[0], *pad(kb[1:], b.length)]
            else:
                ka = pad(ka, a.length)
                kb = pad(kb, b.length)
    return ka, kb


def lex_sort_indices_raw(ops: List[jnp.ndarray]) -> jnp.ndarray:
    n = ops[0].shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    return jax.lax.sort([*ops, idx], num_keys=len(ops), is_stable=False)[-1]


def _searchsorted_multi(sorted_ops: List[jnp.ndarray], needle_ops: List[jnp.ndarray], side: str) -> jnp.ndarray:
    if len(sorted_ops) == 1:
        from cudf_tpu.ops._utils import searchsorted_fast

        return searchsorted_fast(sorted_ops[0], needle_ops[0], side).astype(jnp.int64)
    return _lex_search(sorted_ops, needle_ops, side)
