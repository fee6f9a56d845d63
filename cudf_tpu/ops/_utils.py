"""Shared helpers for the ops layer."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core.column import Column


def materialize_validity(col: Column) -> jnp.ndarray:
    """bool[n] validity vector; all-True if the column has no mask."""
    if col.validity is not None:
        return col.validity
    return jnp.ones((col.length,), dtype=jnp.bool_)


def maybe_mask(validity: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Drop an all-valid mask back to None (host sync; eager paths only)."""
    if validity is None:
        return None
    if bool(jnp.all(validity)):
        return None
    return validity


def segment_expand(offsets: jnp.ndarray, total: int) -> jnp.ndarray:
    """Map flat positions [0,total) to their segment index given offsets[n+1].

    The workhorse for variable-length expansion (string gather, repeat,
    join retrieve): out[i] = j such that offsets[j] <= i < offsets[j+1].
    Static output shape (``total`` is a host int), fully vectorized on VPU.
    """
    pos = jnp.arange(total, dtype=offsets.dtype)
    if total >= 4096:
        return jnp.searchsorted(offsets[1:-1], pos, side="right", method="sort").astype(jnp.int64)
    return jnp.searchsorted(offsets[1:-1], pos, side="right").astype(jnp.int64)


def string_payload(col: Column):
    return col.offsets, col.data


def inverse_permutation(order: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a permutation WITHOUT scatter.

    XLA scatter on TPU measures ~5x slower than lax.sort, so the inverse
    comes from sorting (order, iota) pairs instead of
    ``zeros.at[order].set(iota)``.
    """
    import jax

    n = order.shape[0]
    iota = jnp.arange(n, dtype=order.dtype)
    _, inv = jax.lax.sort([order, iota], num_keys=1, is_stable=False)
    return inv


def searchsorted_fast(haystack: jnp.ndarray, needles: jnp.ndarray, side: str = "left") -> jnp.ndarray:
    """searchsorted with a TPU-appropriate lowering.

    XLA's binary-search lowering loops random gathers (~2 Mrows/s on TPU);
    the merge-by-sort lowering runs at sort speed.  Use sort for large
    needle sets, the default scan for small ones.
    """
    if needles.shape[0] >= 4096:
        return jnp.searchsorted(haystack, needles, side=side, method="sort")
    return jnp.searchsorted(haystack, needles, side=side)


def merge_join_ranges(hay_sorted: jnp.ndarray, needles: jnp.ndarray):
    """(lo, hi) match ranges of each needle in a SORTED haystack, computed
    with two lax.sorts and scans — no scatter, no binary search.

    One merged sort of (hay ∪ needles) with hay-first tiebreak gives, per
    needle position: hi = #hay rows at-or-before it, and lo = #hay rows
    before its key run.  A second sort by needle tag restores input order.
    """
    import jax

    nh = hay_sorted.shape[0]
    nn = needles.shape[0]
    key = jnp.concatenate([hay_sorted, needles])
    is_needle = jnp.concatenate([jnp.zeros((nh,), jnp.int8), jnp.ones((nn,), jnp.int8)])
    tag = jnp.concatenate([jnp.full((nh,), nn, jnp.int32), jnp.arange(nn, dtype=jnp.int32)])
    ks, flag_s, tag_s = jax.lax.sort([key, is_needle, tag], num_keys=2, is_stable=False)
    N = nh + nn
    pos = jnp.arange(N, dtype=jnp.int32)
    is_hay = flag_s == 0
    hay_incl = jnp.cumsum(is_hay.astype(jnp.int32))       # hay rows at-or-before
    hi_at = hay_incl                                      # hay sorts before equal needles
    new_key = jnp.concatenate([jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
    run_start = jax.lax.cummax(jnp.where(new_key, pos, jnp.int32(0)))
    hay_excl = hay_incl - is_hay.astype(jnp.int32)
    lo_at = jnp.take(hay_excl, run_start)                 # hay strictly before the run
    # restore needle order: sort (tag, lo, hi); needles occupy the first nn slots
    _, lo_o, hi_o = jax.lax.sort([tag_s, lo_at, hi_at], num_keys=1, is_stable=False)
    return lo_o[:nn].astype(jnp.int64), hi_o[:nn].astype(jnp.int64)


def expand_rows(offsets: jnp.ndarray, total: int) -> jnp.ndarray:
    """Like segment_expand but scatter/search-free: one merged sort of
    (offsets ∪ positions)."""
    import jax

    g = offsets.shape[0] - 1
    pos = jnp.arange(total, dtype=jnp.int64)
    key = jnp.concatenate([offsets[1:], pos])
    is_pos = jnp.concatenate([jnp.zeros((g,), jnp.int8), jnp.ones((total,), jnp.int8)])
    tag = jnp.concatenate([jnp.full((g,), total, jnp.int64), pos])
    ks, flag_s, tag_s = jax.lax.sort([key, is_pos, tag], num_keys=2, is_stable=False)
    bounds_before = jnp.cumsum((flag_s == 0).astype(jnp.int64))
    # row of a position = number of offset-bounds strictly before-or-at... a
    # position p belongs to row r iff offsets[r] <= p < offsets[r+1]; with
    # bounds sorted before equal positions (bound value == p means p >= that
    # row's end), row = #bounds <= p = bounds_before at p's slot
    row_at = bounds_before
    _, row_o = jax.lax.sort([tag_s, row_at], num_keys=1, is_stable=False)
    return row_o[:total]


def unique_key_join(r_sorted: jnp.ndarray, r_order: jnp.ndarray, lk: jnp.ndarray):
    """Inner-join probe against a build side with UNIQUE sorted keys
    (the hash_join build-once/probe-many shape, hash_join.hpp:70).

    ONE merged sort; output is in merge order (inner-join order is
    unspecified): returns (left_row_ids[nl+nr], right_row_ids, valid)
    padded over the merged length with a validity mask.
    """
    import jax

    nr = r_sorted.shape[0]
    nl = lk.shape[0]
    key = jnp.concatenate([r_sorted, lk])
    flag = jnp.concatenate([jnp.zeros((nr,), jnp.int8), jnp.ones((nl,), jnp.int8)])
    tag = jnp.concatenate([jnp.zeros((nr,), jnp.int32), jnp.arange(nl, dtype=jnp.int32)])
    ks, flag_s, tag_s = jax.lax.sort([key, flag, tag], num_keys=2, is_stable=False)
    N = nr + nl
    pos = jnp.arange(N, dtype=jnp.int32)
    is_hay = flag_s == 0
    # nearest hay row at-or-before each slot (hay sorts before equal probes)
    hay_slot = jax.lax.cummax(jnp.where(is_hay, pos, jnp.int32(0)))
    any_hay = jax.lax.cummax(is_hay.astype(jnp.int8)) > 0
    cand_key = jnp.take(ks, hay_slot)
    found = (~is_hay) & any_hay & (cand_key == ks)
    hay_incl = jnp.cumsum(is_hay.astype(jnp.int32))
    r_sorted_idx = jnp.clip(hay_incl - 1, 0, max(nr - 1, 0))
    r_idx = jnp.take(r_order.astype(jnp.int32), r_sorted_idx)
    return tag_s, r_idx, found


def dense_key_table(rk: jnp.ndarray, offset: int, domain: int) -> jnp.ndarray:
    """Direct-address build for UNIQUE integer keys in [offset, offset+domain):
    table[d] = right row id, -1 where absent.

    The TPU replacement for the cuco static-map build (hash_join.hpp:70):
    when the key domain is dense enough to materialize, addressing beats
    hashing — the probe is ONE gather instead of hash+probe chains, and the
    gather wall (latency-bound ~133 M/s/chip measured) is 5-10x above the
    merged-sort probe path.  One scatter to build (~90 M/s, once).
    """
    import jax

    nr = rk.shape[0]
    tbl = jnp.full((domain + 1,), -1, jnp.int32)
    pos = (rk.astype(jnp.int64) - offset)
    safe = jnp.where((pos >= 0) & (pos < domain), pos, domain)
    return tbl.at[safe].set(jnp.arange(nr, dtype=jnp.int32), mode="drop")[:domain]


def dense_probe(tbl: jnp.ndarray, lk: jnp.ndarray, offset: int):
    """(right_row_ids[nl], found[nl]) — one gather per probe row."""
    domain = tbl.shape[0]
    pos = lk.astype(jnp.int64) - offset
    ok = (pos >= 0) & (pos < domain)
    r = jnp.take(tbl, jnp.clip(pos, 0, domain - 1))
    return r, ok & (r >= 0)
