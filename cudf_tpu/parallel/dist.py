"""Distributed relational ops under shard_map: groupby, join.

TPU-native replacement for the cudf-polars streaming executor's
partitioned lowering (reference: streaming/groupby.py partial-agg trees,
streaming/join.py hash-shuffle vs broadcast decision :58-266).

Everything here is jit-compatible end to end (static shapes): shard-local
groupby produces *padded* group tables (size = local row count upper
bound, with a valid-count), the hash shuffle routes partials to their
owner shard, and a second local merge reduces them.  This is exactly the
reference's aggregate→shuffle→merge streaming_groupby decomposition
(cpp/src/groupby/streaming_groupby.cpp), recast as one XLA program whose
collectives ride ICI.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cudf_tpu.parallel.shuffle import (bucketize, exchange, key_hash,
                                       received_mask, shuffle_by_key,
                                       shuffle_by_keys)


# ----------------------------------------------------------------------
# shard-local static-shape groupby (the jit-safe core)
# ----------------------------------------------------------------------

def _idx_dtype(n: int):
    return jnp.int32 if n < 2**31 else jnp.int64


def _searchsorted(a, v, side="left"):
    """Backend-tuned searchsorted: the default binary-search lowering
    ('scan') issues log(n) serialized GATHER rounds — measured 40-50%
    slower end-to-end on TPU joins than the sort-based lowering, which
    rides the same fused variadic sort the rest of the join uses."""
    method = "sort" if jax.default_backend() == "tpu" else "scan"
    return jnp.searchsorted(a, v, side=side, method=method)


def pack_valid(arrays, valid, cap: int):
    """Stable-pack valid rows to the front and truncate to ``cap`` rows.

    The static-shape analogue of cudf's stream compaction between
    pipeline stages (apply_boolean_mask.cu role): group/distinct partials
    are usually FAR smaller than their input rows, so packing them to a
    small static capacity lets every downstream stage (bucketize scatter,
    all_to_all, merge sort, order-by) run at group scale instead of row
    scale.  Returns (packed_arrays, packed_valid, dropped) where
    ``dropped`` counts valid rows beyond cap — callers feed it into the
    engine's overflow-retry ladder, so truncation is never silent.
    """
    n = valid.shape[0]
    if cap >= n:
        return list(arrays), valid, jnp.zeros((), jnp.int64)
    it = _idx_dtype(n)
    inv = (~valid).astype(jnp.int32)
    idx = jnp.arange(n, dtype=it)
    _, order = jax.lax.sort([inv, idx], num_keys=1, is_stable=True)
    order = order[:cap]
    packed = [jnp.take(a, order) for a in arrays]
    pvalid = jnp.take(valid, order)
    dropped = jnp.maximum(
        jnp.sum(valid.astype(jnp.int64)) - jnp.int64(cap), 0)
    return packed, pvalid, dropped


def local_groupby_sum_multi(keys, vals, valid):
    """Shard-local multi-key groupby-sum, static shapes, scatter-free.

    keys: list of int arrays (dictionary codes work as-is — the
    match_dictionaries discipline of join.cu:37 happens at the frame
    layer).  Outputs are position-aligned to run ENDS in the sorted
    order: ([group_keys...], sums[n] per val, counts[n], group_valid[n]).
    XLA scatter on TPU is ~5x slower than the sort, so run sums come
    from prefix-sum differences.
    """
    n = keys[0].shape[0]
    it = _idx_dtype(n)
    inv = (~valid).astype(jnp.int32)  # invalid rows last
    idx = jnp.arange(n, dtype=it)
    # keys sort in their own width — int32 codes stay int32 (the TPU has
    # no native 64-bit lanes; every avoided int64 operand halves the
    # sort's vector work)
    sorted_ = jax.lax.sort(
        [inv, *keys, idx],
        num_keys=1 + len(keys), is_stable=True)
    inv_s, ks_list, order = sorted_[0], sorted_[1:-1], sorted_[-1]
    diff = inv_s[1:] != inv_s[:-1]
    for ks in ks_list:
        diff = diff | (ks[1:] != ks[:-1])
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), diff])
    is_end = jnp.concatenate([neq[1:], jnp.ones((1,), jnp.bool_)])
    valid_s = inv_s == 0
    pos = jnp.arange(n, dtype=it)
    # start of MY run via forward cummax (reverse scans compile poorly)
    run_start = jax.lax.cummax(jnp.where(neq, pos, jnp.zeros((), it)))

    def per_run_sum(x_sorted):
        cs = jnp.cumsum(x_sorted)
        lo = jnp.where(run_start > 0, jnp.take(cs, jnp.maximum(run_start - 1, 0)),
                       jnp.zeros((), cs.dtype))
        return cs - lo  # valid at run-END rows

    sums = []
    for v in vals:
        vs = jnp.take(v, order).astype(
            jnp.float64 if jnp.issubdtype(v.dtype, jnp.floating) else jnp.int64
        )
        vs = jnp.where(valid_s, vs, 0)
        sums.append(jnp.where(is_end, per_run_sum(vs), 0))
    cnt = jnp.where(is_end, per_run_sum(valid_s.astype(jnp.int64)), 0)
    gkeys = [jnp.where(is_end & valid_s, ks, jnp.zeros((), ks.dtype))
             for ks in ks_list]
    gvalid = is_end & valid_s & (cnt > 0)
    return gkeys, sums, cnt, gvalid


def local_groupby_sum(key, vals, valid):
    """Single-key wrapper over local_groupby_sum_multi."""
    gkeys, sums, cnt, gvalid = local_groupby_sum_multi([key], vals, valid)
    return gkeys[0], sums, cnt, gvalid


def local_groupby_agg_multi(keys, vals_ops, valid):
    """Shard-local multi-key groupby with per-value ops, static shapes.

    vals_ops: list of (array, op) with op in {"sum", "min", "max"}.
    Returns ([group_keys...], outs, counts, group_valid) aligned to run
    ENDS of the sorted order (the local_groupby_sum_multi convention).
    min/max use a run-id segment reduce (cpp group_min.cu/group_max.cu
    roles); sums stay on the prefix-diff path.
    """
    n = keys[0].shape[0]
    it = _idx_dtype(n)
    inv = (~valid).astype(jnp.int32)
    idx = jnp.arange(n, dtype=it)
    sorted_ = jax.lax.sort(
        [inv, *keys, idx],
        num_keys=1 + len(keys), is_stable=True)
    inv_s, ks_list, order = sorted_[0], sorted_[1:-1], sorted_[-1]
    diff = inv_s[1:] != inv_s[:-1]
    for ks in ks_list:
        diff = diff | (ks[1:] != ks[:-1])
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), diff])
    is_end = jnp.concatenate([neq[1:], jnp.ones((1,), jnp.bool_)])
    valid_s = inv_s == 0
    pos = jnp.arange(n, dtype=it)
    run_start = jax.lax.cummax(jnp.where(neq, pos, jnp.zeros((), it)))
    run_id = jnp.cumsum(neq.astype(it)) - 1

    def per_run_sum(x_sorted):
        cs = jnp.cumsum(x_sorted)
        lo = jnp.where(run_start > 0,
                       jnp.take(cs, jnp.maximum(run_start - 1, 0)),
                       jnp.zeros((), cs.dtype))
        return cs - lo

    outs = []
    for v, op in vals_ops:
        vs = jnp.take(v, order)
        if op == "sum":
            vs = vs.astype(jnp.float64 if jnp.issubdtype(v.dtype, jnp.floating)
                           else jnp.int64)
            vs = jnp.where(valid_s, vs, 0)
            outs.append(jnp.where(is_end, per_run_sum(vs), 0))
        elif op in ("min", "max"):
            seg = jax.ops.segment_min if op == "min" else jax.ops.segment_max
            ident = (jnp.finfo(vs.dtype).max if jnp.issubdtype(vs.dtype, jnp.floating)
                     else jnp.iinfo(vs.dtype).max)
            if op == "max":
                ident = -ident if jnp.issubdtype(vs.dtype, jnp.floating) \
                    else jnp.iinfo(vs.dtype).min
            vm = jnp.where(valid_s, vs, ident)
            per_run = seg(vm, run_id, num_segments=n)
            red = jnp.take(per_run, run_id)
            outs.append(jnp.where(is_end, red, 0))
        else:
            raise ValueError(op)
    cnt = jnp.where(is_end, per_run_sum(valid_s.astype(jnp.int64)), 0)
    gkeys = [jnp.where(is_end & valid_s, ks, jnp.zeros((), ks.dtype))
             for ks in ks_list]
    gvalid = is_end & valid_s & (cnt > 0)
    return gkeys, outs, cnt, gvalid


def dist_groupby_agg_shard(keys, vals_ops, valid, *, num_parts, capacity,
                           axis):
    """Composable shard-local body: partial agg → shuffle → merge, with
    per-value ops (sum/min/max; counts merge by sum).  Usable inside an
    enclosing shard_map (the engine's SPMD lowering composes several of
    these into ONE program — lower_ir_graph's role)."""
    gkeys, outs, cnt, gvalid = local_groupby_agg_multi(keys, vals_ops, valid)
    # pack partials to the group-cardinality budget BEFORE the shuffle:
    # the scatter/all_to_all/merge stages then run at group scale
    nk = len(gkeys)
    packed, pvalid, pdrop = pack_valid([*gkeys, *outs, cnt], gvalid,
                                       capacity)
    if num_parts == 1:
        # single shard already holds every group — no shuffle, no merge
        return (packed[:nk], packed[nk:-1], packed[-1], pvalid,
                pdrop.reshape(1))
    k_recv, payload_recv, mask, dropped = shuffle_by_keys(
        packed[:nk], packed[nk:], pvalid, num_parts, capacity, axis)
    merge_ops = [(payload_recv[i], op) for i, (_, op) in enumerate(vals_ops)]
    merge_ops.append((payload_recv[-1], "sum"))        # counts merge by sum
    m_keys, m_all, _, m_valid = local_groupby_agg_multi(k_recv, merge_ops,
                                                        mask)
    return (m_keys, m_all[:-1], m_all[-1], m_valid,
            (dropped.astype(jnp.int64) + pdrop).reshape(1))


def _dist_groupby_sum_shard(keys, vals, valid, *, num_parts: int, capacity: int, axis: str):
    """Runs on each shard inside shard_map: pre-agg → shuffle → merge."""
    # local partial aggregation (shrinks shuffle traffic — the 'partial agg
    # tree' optimization of streaming/groupby.py)
    gkeys, sums, cnt, gvalid = local_groupby_sum_multi(keys, vals, valid)
    nk = len(gkeys)
    packed, pvalid, pdrop = pack_valid([*gkeys, *sums, cnt], gvalid,
                                       capacity)
    # shuffle partials to owner shard by key hash
    k_recv, payload_recv, mask, dropped = shuffle_by_keys(
        packed[:nk], packed[nk:], pvalid, num_parts, capacity, axis
    )
    # merge: second local groupby over received partials (counts merge by sum)
    m_keys, m_all, _, m_valid = local_groupby_sum_multi(k_recv, payload_recv, mask)
    return (m_keys, m_all[:-1], m_all[-1], m_valid,
            (dropped.astype(jnp.int64) + pdrop).reshape(1))


def dist_groupby_sum_multi(
    mesh: Mesh,
    keys: Sequence[jnp.ndarray],
    vals: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    capacity_per_bucket: int = 0,
    axis: str = "x",
):
    """Multi-key distributed groupby-sum (+count) over a 1-D mesh.

    Inputs are globally-sharded flat arrays (row-partitioned on ``axis``);
    keys are int columns (dictionary codes for strings).  Output is
    shard-local padded group tables (also sharded on ``axis``):
    ([keys...], [sums...], counts, valid, dropped[P]).  ``dropped`` is a
    per-shard overflow count — nonzero means capacity_per_bucket was too
    small (impossible at the default).  jit-compatible: wrap in jax.jit.
    """
    num_parts = mesh.shape[axis]
    n_total = keys[0].shape[0]
    per_shard = n_total // num_parts
    cap = capacity_per_bucket or per_shard  # safe default: no overflow possible
    fn = partial(
        _dist_groupby_sum_shard, num_parts=num_parts, capacity=cap, axis=axis
    )
    return shard_map(
        lambda ks, vs, m: fn(ks, vs, m),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
    )(list(keys), list(vals), valid)


def dist_groupby_sum(
    mesh: Mesh,
    key: jnp.ndarray,
    vals: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    capacity_per_bucket: int = 0,
    axis: str = "x",
):
    """Single-key distributed groupby-sum (compat wrapper).

    Returns (keys, [sums...], counts, valid) like round 1.
    """
    ks, sums, cnt, gvalid, _ = dist_groupby_sum_multi(
        mesh, [key], vals, valid, capacity_per_bucket, axis)
    return ks[0], sums, cnt, gvalid


# ----------------------------------------------------------------------
# distributed joins
# ----------------------------------------------------------------------

def _pack_join_keys(lkeys, rkeys):
    """Pack ≤2 narrow (≤32-bit) key columns into ONE int64 key pair, or
    None when not packable.  Packed values live in (-2^63, 2^63-1)
    exclusive, so INT64_MAX stays free as an unreachable right-side
    padding value for the searchsorted fast path."""
    if len(lkeys) > 2:
        return None
    if any(k.dtype.itemsize > 4 for k in (*lkeys, *rkeys)):
        return None
    if len(lkeys) == 1:
        return lkeys[0].astype(jnp.int64), rkeys[0].astype(jnp.int64)

    def pack(k1, k2):
        return (k1.astype(jnp.int64) << 32) | (
            k2.astype(jnp.int64) & jnp.int64(0xFFFFFFFF))

    return pack(*lkeys), pack(*rkeys)


def _match_ranges_searchsorted(lk, lvalid, rk, rvalid):
    """Fast match ranges for one packed int64 key (values < INT64_MAX):
    stable-sort ONLY the right side, then two vectorized binary searches
    give every left row its (count, lo) — the left side is never sorted.
    This is the sorted-build + binary probe half of a sort-hash join;
    for broadcast fact×dim joins it removes the O((nl+nr)·log²) combined
    bitonic sort entirely (nl ≫ nr)."""
    nr = rk.shape[0]
    big = jnp.int64(jnp.iinfo(jnp.int64).max)
    rk2 = jnp.where(rvalid, rk, big)     # invalid rights sort last
    sorted_r = jax.lax.sort(
        [rk2, jnp.arange(nr, dtype=_idx_dtype(nr))],
        num_keys=1, is_stable=True)
    rk_sorted, r_order = sorted_r
    lo = _searchsorted(rk_sorted, lk, side="left")
    hi = _searchsorted(rk_sorted, lk, side="right")
    counts = jnp.where(lvalid, (hi - lo).astype(jnp.int64), 0)
    return counts, lo.astype(jnp.int64), r_order


def _match_ranges_multi(lkeys, lvalid, rkeys, rvalid):
    """Per-left-row match ranges against the right side, multi-key.

    Narrow keys (≤2 columns, ≤32-bit each — dictionary codes, int32,
    bool) take the searchsorted fast path (_match_ranges_searchsorted).
    Otherwise ONE combined variadic sort over both sides (rights sort
    before lefts within a key run — the lexicographic row_operator role,
    row_operators.cu) yields for every left row in ORIGINAL order:
    (count, lo) with matching right rows at positions lo..lo+count-1 of
    the right side's stable sorted order, plus (r_sorted_keys, r_order).
    """
    packed = _pack_join_keys(lkeys, rkeys)
    if packed is not None:
        return _match_ranges_searchsorted(packed[0], lvalid,
                                          packed[1], rvalid)
    nl, nr = lkeys[0].shape[0], rkeys[0].shape[0]
    allk = [jnp.concatenate([r.astype(jnp.int64), l.astype(jnp.int64)])
            for r, l in zip(rkeys, lkeys)]
    inv = jnp.concatenate([~rvalid, ~lvalid]).astype(jnp.int64)
    side = jnp.concatenate([jnp.zeros((nr,), jnp.int64),
                            jnp.ones((nl,), jnp.int64)])
    idx = jnp.concatenate([jnp.arange(nr, dtype=jnp.int64),
                           jnp.arange(nl, dtype=jnp.int64)])
    sorted_ = jax.lax.sort([inv, *allk, side, idx],
                           num_keys=2 + len(allk), is_stable=True)
    inv_s, ks_s, side_s, idx_s = (sorted_[0], sorted_[1:-2], sorted_[-2],
                                  sorted_[-1])
    diff = inv_s[1:] != inv_s[:-1]
    for ks in ks_s:
        diff = diff | (ks[1:] != ks[:-1])
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), diff])
    pos = jnp.arange(nl + nr, dtype=jnp.int64)
    run_start = jax.lax.cummax(jnp.where(neq, pos, jnp.int64(0)))
    is_r = (side_s == 0).astype(jnp.int64)
    excl_r = jnp.cumsum(is_r) - is_r          # rights strictly before pos
    lo = jnp.take(excl_r, run_start)          # rights before my run
    count = jnp.where(inv_s == 0, excl_r - lo, 0)  # rights in my run (lefts only)
    # compact the left rows back to original order: sort by (side, idx)
    back = jax.lax.sort([side_s, idx_s, count, lo], num_keys=2, is_stable=True)
    counts_l, lo_l = back[2][nr:], back[3][nr:]
    # right side's own stable sorted order (matches the combined order's
    # relative right-row order — both stable over the same key tuple)
    rsort = jax.lax.sort(
        [jnp.where(rvalid, jnp.int64(0), jnp.int64(1)),
         *[k.astype(jnp.int64) for k in rkeys],
         jnp.arange(nr, dtype=jnp.int64)],
        num_keys=1 + len(rkeys), is_stable=True)
    r_order = rsort[-1]
    return counts_l, lo_l, r_order


def local_join_padded(lkeys, lvalid, rkeys, rvalid, max_out: int,
                      how: str = "inner"):
    """Static-shape shard-local multi-key join (inner/left).

    Two-phase with a static output budget (the inner_join_size.cu →
    inner_join_retrieve.cu shape): match ranges, then expand into a fixed
    [max_out] buffer via cumulative offsets.
    Returns (l_idx, r_idx, out_valid, r_matched, total).  For how="left",
    unmatched left rows emit one output row with r_matched=False.
    """
    nl, nr = lkeys[0].shape[0], rkeys[0].shape[0]
    counts, lo, r_order = _match_ranges_multi(lkeys, lvalid, rkeys, rvalid)
    emit = counts if how == "inner" else jnp.where(
        lvalid, jnp.maximum(counts, 1), 0)
    offsets = jnp.concatenate([jnp.zeros((1,), emit.dtype), jnp.cumsum(emit)])
    total = offsets[-1]
    pos = jnp.arange(max_out, dtype=jnp.int64)
    row = _searchsorted(offsets[1:], pos, side="right")
    row_c = jnp.clip(row, 0, nl - 1)
    within = pos - jnp.take(offsets, row_c)
    out_valid = pos < total
    r_matched = out_valid & (within < jnp.take(counts, row_c))
    r_sorted_pos = jnp.take(lo, row_c) + within
    r_idx = jnp.take(r_order, jnp.clip(r_sorted_pos, 0, jnp.maximum(nr - 1, 0)))
    return (
        jnp.where(out_valid, row_c, 0),
        jnp.where(r_matched, r_idx, 0),
        out_valid,
        r_matched,
        total,
    )


def local_join_full_padded(lkeys, lvalid, rkeys, rvalid, max_out: int):
    """Static-shape shard-local multi-key FULL OUTER join.

    Left-join expansion (every valid left row emits >= 1 output row)
    followed by the right side's unmatched rows appended at the tail —
    the full_join composition of cpp/src/join/join.cu (left join +
    right-anti complement), kept scatter-free: the appended rows come
    from a stable sort that compacts unmatched right rows to the front.

    Returns (l_idx, r_idx, out_valid, l_present, r_present, total).
    """
    nl, nr = lkeys[0].shape[0], rkeys[0].shape[0]
    counts, lo, r_order = _match_ranges_multi(lkeys, lvalid, rkeys, rvalid)
    emit = jnp.where(lvalid, jnp.maximum(counts, 1), 0)
    offsets = jnp.concatenate([jnp.zeros((1,), emit.dtype), jnp.cumsum(emit)])
    total_l = offsets[-1]
    # right rows with no left match, compacted to the front in row order
    r_unmatched = local_semi_mask(rkeys, rvalid, lkeys, lvalid, anti=True)
    n_ru = jnp.sum(r_unmatched.astype(jnp.int64))
    ru_sorted = jax.lax.sort(
        [jnp.where(r_unmatched, jnp.int64(0), jnp.int64(1)),
         jnp.arange(nr, dtype=jnp.int64)],
        num_keys=1, is_stable=True)
    ru_rows = ru_sorted[-1]
    pos = jnp.arange(max_out, dtype=jnp.int64)
    in_left = pos < total_l
    # left-join region (same decode as local_join_padded)
    row = _searchsorted(offsets[1:], pos, side="right")
    row_c = jnp.clip(row, 0, nl - 1)
    within = pos - jnp.take(offsets, row_c)
    r_matched = in_left & (within < jnp.take(counts, row_c))
    r_sorted_pos = jnp.take(lo, row_c) + within
    r_idx_l = jnp.take(r_order,
                       jnp.clip(r_sorted_pos, 0, jnp.maximum(nr - 1, 0)))
    # appended right-only region
    j = pos - total_l
    r_idx_a = jnp.take(ru_rows, jnp.clip(j, 0, jnp.maximum(nr - 1, 0)))
    total = total_l + n_ru
    out_valid = pos < total
    l_present = in_left & out_valid
    r_present = jnp.where(in_left, r_matched, out_valid)
    r_idx = jnp.where(in_left, r_idx_l, r_idx_a)
    return (
        jnp.where(l_present, row_c, 0),
        jnp.where(r_present, r_idx, 0),
        out_valid,
        l_present,
        r_present,
        total,
    )


def local_semi_mask(lkeys, lvalid, rkeys, rvalid, anti: bool = False):
    """bool[nl] mask of left rows with (no) match — semi/anti join
    (the filtered_join/mixed_join_semi role)."""
    counts, _, _ = _match_ranges_multi(lkeys, lvalid, rkeys, rvalid)
    return lvalid & ((counts == 0) if anti else (counts > 0))


def _dist_join_shard(lkeys, lpay, lvalid, rkeys, rpay, rvalid, *, how,
                     num_parts, cap_l, cap_r, max_out, axis):
    import jax

    if num_parts == 1:
        # single-shard: every key pair is already co-located — skip the
        # hash shuffles entirely (they dominate both compile time and
        # runtime of the 1-chip program; q5 SF1's 5-join module took
        # >420 s to compile with them in)
        lk2, lpay2, lmask = list(lkeys), list(lpay), lvalid
        rk2, rpay2, rmask = list(rkeys), list(rpay), rvalid
        dropped = jnp.zeros((1,), jnp.int64)
    else:
        lk2, lpay2, lmask, drop_l = shuffle_by_keys(
            lkeys, list(lpay), lvalid, num_parts, cap_l, axis)
        rkeys = _order_right_after_left(rkeys, drop_l)
        rk2, rpay2, rmask, drop_r = shuffle_by_keys(
            rkeys, list(rpay), rvalid, num_parts, cap_r, axis)
        dropped = (drop_l + drop_r).reshape(1)
    if how in ("semi", "anti"):
        sel = local_semi_mask(lk2, lmask, rk2, rmask, anti=(how == "anti"))
        return lk2, lpay2, [], sel, jnp.ones_like(sel), dropped
    if how == "full":
        li, ri, ovalid, lpres, rpres, total = local_join_full_padded(
            lk2, lmask, rk2, rmask, max_out)
        out_keys = [jnp.where(lpres, jnp.take(lk, li),
                              jnp.where(rpres, jnp.take(rk, ri), 0))
                    for lk, rk in zip(lk2, rk2)]
        out_l = [jnp.where(lpres, jnp.take(p, li), 0) for p in lpay2]
        out_r = [jnp.where(rpres, jnp.take(p, ri), 0) for p in rpay2]
        # expansion past the static budget is DROPPED output — report it
        # (callers re-lower with a bigger budget or fall back; no silent
        # truncation)
        dropped = dropped + jnp.maximum(
            total - max_out, 0).astype(dropped.dtype).reshape(1)
        return out_keys, out_l, out_r, ovalid, lpres, rpres, dropped
    li, ri, ovalid, rmatch, total = local_join_padded(
        lk2, lmask, rk2, rmask, max_out, how)
    out_keys = [jnp.where(ovalid, jnp.take(k, li), 0) for k in lk2]
    out_l = [jnp.where(ovalid, jnp.take(p, li), 0) for p in lpay2]
    out_r = [jnp.where(rmatch, jnp.take(p, ri), 0) for p in rpay2]
    dropped = dropped + jnp.maximum(
        total - max_out, 0).astype(dropped.dtype).reshape(1)
    return out_keys, out_l, out_r, ovalid, rmatch, dropped


def _order_right_after_left(rkeys, drop_l):
    """On the CPU backend, order the right shuffle after the left:
    XLA's CPU thunk executor deadlocks when device threads block at
    DIFFERENT independent collectives (engine/spmd.py _Lowering)."""
    import jax

    if jax.default_backend() == "cpu":
        return [jax.lax.optimization_barrier((rkeys[0], drop_l))[0],
                *rkeys[1:]]
    return rkeys


def dist_join(
    mesh: Mesh,
    left_keys: Sequence[jnp.ndarray],
    left_payload: Sequence[jnp.ndarray],
    left_valid: jnp.ndarray,
    right_keys: Sequence[jnp.ndarray],
    right_payload: Sequence[jnp.ndarray],
    right_valid: jnp.ndarray,
    how: str = "inner",
    max_out_per_shard: int = 0,
    axis: str = "x",
):
    """Distributed hash-shuffle join, multi-key, how ∈ {inner, left,
    full, semi, anti} (streaming/join.py:58-266 shuffle path; the
    reference lowers all of these per-node; full = join.cu's
    full_join composition).

    Returns shard-local padded ([keys...], left payloads, right payloads,
    out_valid, r_matched, dropped[P]).  For how="full" the return is the
    7-tuple ([keys...], left payloads, right payloads, out_valid,
    l_present, r_present, dropped[P]) — keys come from whichever side is
    present.  For semi/anti the "payloads" are the shuffled LEFT rows
    and out_valid is the selection mask (right payloads empty).
    ``dropped`` nonzero on any shard means a shuffle capacity overflowed
    and results are incomplete — callers must check (round-1 review: no
    silent drops).
    """
    num_parts = mesh.shape[axis]
    nl = left_keys[0].shape[0] // num_parts
    nr = right_keys[0].shape[0] // num_parts
    # capacities: whole local shard may hash to one bucket in the worst case
    cap_l, cap_r = nl, nr
    default_out = num_parts * nl * 2
    if how == "full":
        default_out = num_parts * (nl + nr) * 2
    max_out = max_out_per_shard or default_out
    fn = partial(_dist_join_shard, how=how, num_parts=num_parts, cap_l=cap_l,
                 cap_r=cap_r, max_out=max_out, axis=axis)
    n_out = 7 if how == "full" else 6
    return shard_map(
        lambda a, b, c, d, e, f: fn(a, b, c, d, e, f),
        mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=(P(axis),) * n_out,
    )(list(left_keys), list(left_payload), left_valid,
      list(right_keys), list(right_payload), right_valid)


def dist_inner_join(
    mesh: Mesh,
    left_key: jnp.ndarray,
    left_payload: Sequence[jnp.ndarray],
    left_valid: jnp.ndarray,
    right_key: jnp.ndarray,
    right_payload: Sequence[jnp.ndarray],
    right_valid: jnp.ndarray,
    max_out_per_shard: int = 0,
    axis: str = "x",
):
    """Single-key inner-join compat wrapper: returns (key, left payloads,
    right payloads, valid) like round 1."""
    keys, out_l, out_r, ovalid, _, _ = dist_join(
        mesh, [left_key], left_payload, left_valid,
        [right_key], right_payload, right_valid,
        how="inner", max_out_per_shard=max_out_per_shard, axis=axis)
    return keys[0], out_l, out_r, ovalid


def _chain_cpu(x, prev):
    """On the CPU backend, order x's producing collective after prev's
    (independent collectives in one module cross-deadlock the CPU thunk
    executor — see engine/spmd.py _Lowering.__init__)."""
    if prev is None or jax.default_backend() != "cpu":
        return x
    return jax.lax.optimization_barrier((x, prev))[0]


def _bcast_join_shard_multi(lkeys, lpay, lvalid, rkeys, rpay, rvalid, *,
                            how, max_out, axis):
    """Broadcast-join shard body: all_gather the (small) RIGHT side and
    join locally against the left shard — no shuffle of either side, the
    output stays left-sharded.  Multi-key, inner/semi/anti, with the
    same dropped-rows overflow contract as _dist_join_shard.  The
    broadcast half of the reference's broadcast-vs-shuffle decision
    (streaming/join.py:95 _should_bcast_join)."""
    rk_all, prev = [], None
    for k in rkeys:
        g = jax.lax.all_gather(_chain_cpu(k, prev), axis, tiled=True)
        rk_all.append(g)
        prev = g
    rvalid_all = jax.lax.all_gather(_chain_cpu(rvalid, prev), axis,
                                    tiled=True)
    prev = rvalid_all
    if how in ("semi", "anti"):
        sel = local_semi_mask(lkeys, lvalid, rk_all, rvalid_all,
                              anti=(how == "anti"))
        return (lkeys, list(lpay), [], sel, jnp.ones_like(sel),
                jnp.zeros((1,), jnp.int64))
    rpay_all = []
    for p in rpay:
        g = jax.lax.all_gather(_chain_cpu(p, prev), axis, tiled=True)
        rpay_all.append(g)
        prev = g
    li, ri, ovalid, rmatch, total = local_join_padded(
        lkeys, lvalid, rk_all, rvalid_all, max_out, how)
    out_keys = [jnp.where(ovalid, jnp.take(k, li), 0) for k in lkeys]
    out_l = [jnp.where(ovalid, jnp.take(p, li), 0) for p in lpay]
    out_r = [jnp.where(rmatch, jnp.take(p, ri), 0) for p in rpay_all]
    dropped = jnp.maximum(total - max_out, 0).astype(jnp.int64).reshape(1)
    return out_keys, out_l, out_r, ovalid, rmatch, dropped


def _bcast_join_shard(lk, lpay, lvalid, rk, rpay, rvalid, *, max_out, axis):
    # all-gather the (small) right side — the broadcast-join path
    # (_should_bcast_join, streaming/join.py:95)
    rk_all = jax.lax.all_gather(rk, axis, tiled=True)
    rvalid_all = jax.lax.all_gather(rvalid, axis, tiled=True)
    rpay_all = [jax.lax.all_gather(p, axis, tiled=True) for p in rpay]
    li, ri, ovalid, rmatch, total = local_join_padded(
        [lk], lvalid, [rk_all], rvalid_all, max_out, "inner")
    out_key = jnp.where(ovalid, jnp.take(lk, li), 0)
    out_l = [jnp.where(ovalid, jnp.take(p, li), 0) for p in lpay]
    out_r = [jnp.where(ovalid, jnp.take(p, ri), 0) for p in rpay_all]
    return out_key, out_l, out_r, ovalid


def broadcast_inner_join(
    mesh: Mesh,
    left_key, left_payload, left_valid,
    right_key, right_payload, right_valid,
    max_out_per_shard: int = 0,
    axis: str = "x",
):
    num_parts = mesh.shape[axis]
    nl = left_key.shape[0] // num_parts
    max_out = max_out_per_shard or (nl * 4)
    fn = partial(_bcast_join_shard, max_out=max_out, axis=axis)
    return shard_map(
        lambda a, b, c, d, e, f: fn(a, b, c, d, e, f),
        mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    )(left_key, list(left_payload), left_valid, right_key, list(right_payload), right_valid)


# ----------------------------------------------------------------------
# distributed sample-sort and distinct
# ----------------------------------------------------------------------

_SAMPLES_PER_SHARD = 64


def _dist_sort_shard(key, pays, valid, *, num_parts, capacity, descending,
                     axis):
    n = key.shape[0]
    big = jnp.int64(jnp.iinfo(jnp.int64).max)
    k64 = key.astype(jnp.int64)
    if descending:
        k64 = -k64  # caller guarantees keys > INT64_MIN
    if num_parts == 1:
        # single shard: plain local sort, no splitters/exchange
        ks1 = jnp.where(valid, k64, big)
        idx = jnp.arange(n, dtype=_idx_dtype(n))
        s1 = jax.lax.sort([ks1, idx], num_keys=1, is_stable=True)
        k_out, order = s1[0], s1[-1]
        pays_out = [jnp.take(p, order) for p in pays]
        mask_out = jnp.take(valid, order)
        k_out = jnp.where(mask_out, k_out, 0)
        if descending:
            k_out = -k_out
        C = capacity
        if C != n:
            pad = lambda x, v: (x[:C] if C <= n else jnp.concatenate(
                [x, jnp.full((C - n,), v, x.dtype)]))
            dropped = jnp.maximum(
                jnp.sum(valid.astype(jnp.int64)) - jnp.int64(C), 0)
            return (pad(k_out.astype(key.dtype), 0),
                    [pad(p, 0) for p in pays_out],
                    pad(mask_out, False), dropped.reshape(1))
        return (k_out.astype(key.dtype), pays_out, mask_out,
                jnp.zeros((1,), jnp.int64))
    # NOTE: `big` is only a PADDING value, not an in-band sentinel —
    # validity always flows through counts/masks, never inferred from
    # key == big.  A valid row MAY key as big (e.g. spmd._order_encode's
    # descending fold of INT64_MIN); do not add key-based validity checks.
    ks = jnp.where(valid, k64, big)  # invalid rows last everywhere
    # splitter selection: evenly-spaced local samples → all_gather → the
    # P-1 global quantiles (the sample-sort of streaming/sort.py)
    ks_sorted = jax.lax.sort([ks], num_keys=1)[0]
    S = min(_SAMPLES_PER_SHARD, n)
    samples = jnp.take(ks_sorted, (jnp.arange(S, dtype=jnp.int64) * n) // S)
    all_samples = jax.lax.sort(
        [jax.lax.all_gather(samples, axis, tiled=True)], num_keys=1)[0]
    splitters = jnp.take(
        all_samples,
        (jnp.arange(1, num_parts, dtype=jnp.int64) * S * num_parts)
        // num_parts)
    pid = jnp.searchsorted(splitters, ks, side="right").astype(jnp.int32)
    pid = jnp.minimum(pid, num_parts - 1)
    bufs, counts, dropped = bucketize([ks, *pays], valid, pid, num_parts,
                                      capacity)
    out_bufs, out_counts = exchange(bufs, counts, axis)
    mask = received_mask(out_counts, capacity)
    C = capacity
    flat = [b.reshape((num_parts * C,) + b.shape[2:]) for b in out_bufs]
    k_recv = jnp.where(mask, flat[0], big)
    idx = jnp.arange(num_parts * C, dtype=_idx_dtype(num_parts * C))
    sorted2 = jax.lax.sort([k_recv, idx], num_keys=1, is_stable=True)
    k_out, order = sorted2[0], sorted2[-1]
    pays_out = [jnp.take(p, order) for p in flat[1:]]
    mask_out = jnp.take(mask, order)
    k_out = jnp.where(mask_out, k_out, 0)
    if descending:
        k_out = -k_out
    return (k_out.astype(key.dtype), pays_out, mask_out,
            dropped.reshape(1))


def local_over_shard(keys, value, valid, op, vmask=None):
    """Per-row windowed aggregate (SQL ``agg OVER (PARTITION BY k)``)
    for co-located key groups, fully traced (static shapes): stable sort
    by keys → run-id segment reduce → broadcast to rows → unsort.
    The shard-local half of the streaming/over.py role; callers shuffle
    rows by the partition keys first so groups never straddle shards.

    Returns (per_row_value, per_row_mask): mask is False where the
    group had no valid inputs (mean/min/max of nothing → null)."""
    n = keys[0].shape[0]
    it = _idx_dtype(n)
    inv = (~valid).astype(jnp.int32)
    idx = jnp.arange(n, dtype=it)
    sorted_ = jax.lax.sort([inv, *keys, idx], num_keys=1 + len(keys),
                           is_stable=True)
    inv_s, ks_s, order = sorted_[0], sorted_[1:-1], sorted_[-1]
    diff = inv_s[1:] != inv_s[:-1]
    for ks in ks_s:
        diff = diff | (ks[1:] != ks[:-1])
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), diff])
    run_id = jnp.cumsum(neq.astype(it)) - 1
    valid_s = inv_s == 0
    v_s = jnp.take(value, order)
    m_s = valid_s if vmask is None else (valid_s & jnp.take(vmask, order))
    cnt = jax.ops.segment_sum(m_s.astype(jnp.int64), run_id,
                              num_segments=n)
    if op in ("sum", "mean", "count", "size"):
        if op == "size":
            per_run = jax.ops.segment_sum(valid_s.astype(jnp.int64),
                                          run_id, num_segments=n)
        elif op == "count":
            per_run = cnt
        else:
            acc_t = jnp.float64 if jnp.issubdtype(v_s.dtype, jnp.floating) \
                else jnp.int64
            x = jnp.where(m_s, v_s.astype(acc_t), jnp.zeros((), acc_t))
            per_run = jax.ops.segment_sum(x, run_id, num_segments=n)
            if op == "mean":
                per_run = per_run.astype(jnp.float64) \
                    / jnp.maximum(cnt, 1).astype(jnp.float64)
    elif op in ("min", "max"):
        if jnp.issubdtype(v_s.dtype, jnp.floating):
            ident = jnp.array(jnp.inf if op == "min" else -jnp.inf,
                              v_s.dtype)
        else:
            info = jnp.iinfo(v_s.dtype)
            ident = jnp.array(info.max if op == "min" else info.min,
                              v_s.dtype)
        x = jnp.where(m_s, v_s, ident)
        seg = jax.ops.segment_min if op == "min" else jax.ops.segment_max
        per_run = seg(x, run_id, num_segments=n)
    else:
        raise ValueError(op)
    red_s = jnp.take(per_run, run_id)
    ok_s = jnp.take(cnt, run_id) > 0 if op not in ("count", "size") \
        else jnp.ones((n,), jnp.bool_)
    out = jnp.zeros((n,), red_s.dtype).at[order].set(red_s)
    ok = jnp.zeros((n,), jnp.bool_).at[order].set(ok_s)
    return out, ok


def _dist_sort_multi_shard(keys, pays, valid, *, num_parts, capacity, axis):
    """Multi-key sample-sort shard body: lexicographic over a LIST of
    int64 order-encoded keys (descending already folded into each
    encoding by the caller — spmd._order_encode).

    The composite-key analogue of _dist_sort_shard (streaming/sort.py
    role for multi-column sorts on unbounded dtypes, where mixed-radix
    packing into one int64 is impossible).  Routing compares row tuples
    against the P-1 splitter tuples lexicographically — O(P·K) fused
    elementwise compares per row, no tuple searchsorted needed.
    """
    n = keys[0].shape[0]
    K = len(keys)
    big = jnp.int64(jnp.iinfo(jnp.int64).max)
    ks = [jnp.where(valid, k.astype(jnp.int64), big) for k in keys]
    if num_parts == 1:
        idx = jnp.arange(n, dtype=_idx_dtype(n))
        s1 = jax.lax.sort([*ks, idx], num_keys=K, is_stable=True)
        order = s1[-1]
        pays_out = [jnp.take(p, order) for p in pays]
        mask_out = jnp.take(valid, order)
        C = capacity
        if C != n:
            pad = lambda x, v: (x[:C] if C <= n else jnp.concatenate(
                [x, jnp.full((C - n,), v, x.dtype)]))
            dropped = jnp.maximum(
                jnp.sum(valid.astype(jnp.int64)) - jnp.int64(C), 0)
            return ([pad(p, 0) for p in pays_out], pad(mask_out, False),
                    dropped.reshape(1))
        return pays_out, mask_out, jnp.zeros((1,), jnp.int64)
    # local tuple sort → evenly spaced sample tuples
    ks_sorted = jax.lax.sort(ks, num_keys=K)
    S = min(_SAMPLES_PER_SHARD, n)
    sel = (jnp.arange(S, dtype=jnp.int64) * n) // S
    samples = [jnp.take(k, sel) for k in ks_sorted]
    gathered = [jax.lax.all_gather(s, axis, tiled=True) for s in samples]
    all_sorted = jax.lax.sort(gathered, num_keys=K)
    spl_sel = (jnp.arange(1, num_parts, dtype=jnp.int64) * S * num_parts) \
        // num_parts
    splitters = [jnp.take(k, spl_sel) for k in all_sorted]  # [K][P-1]
    # pid = number of splitter tuples <= row tuple (searchsorted-right)
    le = None                       # lex "splitter <= row", built last→first
    for j in range(K - 1, -1, -1):
        s_j = splitters[j][:, None]          # [P-1, 1]
        r_j = ks[j][None, :]                 # [1, n]
        if le is None:
            le = s_j <= r_j
        else:
            le = (s_j < r_j) | ((s_j == r_j) & le)
    pid = jnp.minimum(jnp.sum(le.astype(jnp.int32), axis=0),
                      num_parts - 1)
    bufs, counts, dropped = bucketize([*ks, *pays], valid, pid, num_parts,
                                      capacity)
    out_bufs, out_counts = exchange(bufs, counts, axis)
    mask = received_mask(out_counts, capacity)
    C = capacity
    flat = [b.reshape((num_parts * C,) + b.shape[2:]) for b in out_bufs]
    ks_recv = [jnp.where(mask, flat[j], big) for j in range(K)]
    idx = jnp.arange(num_parts * C, dtype=_idx_dtype(num_parts * C))
    sorted2 = jax.lax.sort([*ks_recv, idx], num_keys=K, is_stable=True)
    order = sorted2[-1]
    pays_out = [jnp.take(p, order) for p in flat[K:]]
    mask_out = jnp.take(mask, order)
    return pays_out, mask_out, dropped.reshape(1)


def dist_sort(
    mesh: Mesh,
    key: jnp.ndarray,
    payloads: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    capacity_factor: float = 2.0,
    descending: bool = False,
    axis: str = "x",
):
    """Distributed sample-sort over a 1-D mesh (streaming/sort.py role —
    NOT the concat-and-resort the round-1 review flagged).

    Each shard samples its sorted keys, all-gathers the samples, routes
    rows to splitter ranges over ICI, and sorts locally.  Output: shard
    g holds the g-th global key range, locally sorted, valid rows first;
    concatenating shards in mesh order yields the total order.  Returns
    (key, payloads, valid, dropped[P]); dropped > 0 on any shard means
    skew beat capacity_factor and the sort is incomplete — resubmit with
    a larger factor (count-then-retry, the reference's two-phase
    discipline).
    """
    num_parts = mesh.shape[axis]
    per_shard = key.shape[0] // num_parts
    capacity = max(int(per_shard * capacity_factor / max(num_parts, 1)), 16)
    fn = partial(_dist_sort_shard, num_parts=num_parts, capacity=capacity,
                 descending=descending, axis=axis)
    return shard_map(
        lambda k, ps, m: fn(k, ps, m),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    )(key, list(payloads), valid)


def _dist_distinct_shard(keys, valid, *, num_parts, capacity, axis):
    # local distinct → shuffle by hash → local distinct (streaming/
    # distinct.py decomposition: duplicates co-locate by key hash)
    gkeys, _, _, gvalid = local_groupby_sum_multi(keys, [], valid)
    packed, pvalid, pdrop = pack_valid(gkeys, gvalid, capacity)
    if num_parts == 1:
        return packed, pvalid, pdrop.reshape(1)
    k2, _, mask, dropped = shuffle_by_keys(packed, [], pvalid, num_parts,
                                           capacity, axis)
    m_keys, _, _, m_valid = local_groupby_sum_multi(k2, [], mask)
    return m_keys, m_valid, (dropped.astype(jnp.int64) + pdrop).reshape(1)


def dist_distinct(
    mesh: Mesh,
    keys: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    capacity_per_bucket: int = 0,
    axis: str = "x",
):
    """Distributed multi-key distinct.  Returns ([keys...], valid,
    dropped[P]) shard-local padded."""
    num_parts = mesh.shape[axis]
    per_shard = keys[0].shape[0] // num_parts
    cap = capacity_per_bucket or per_shard
    fn = partial(_dist_distinct_shard, num_parts=num_parts, capacity=cap,
                 axis=axis)
    return shard_map(
        lambda ks, m: fn(ks, m),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )(list(keys), valid)


# ----------------------------------------------------------------------
# distributed approximate quantiles (tdigest merge across shards)
# ----------------------------------------------------------------------

def _local_tdigest_padded(x, valid, delta: int):
    """Jit-safe shard-local t-digest over padded rows (weight-0 padding).

    Static-shape recast of ops/tdigest.build_tdigest (the TDIGEST groupby
    agg, cpp/src/quantiles/tdigest/tdigest_aggregation.cu): sort, k1
    scale-function cluster assignment, segment sums.  Invalid rows sort
    to the top with weight 0 so they contribute nothing.
    """
    xf = x.astype(jnp.float64)
    v = valid & ~jnp.isnan(xf)
    key = jnp.where(v, xf, jnp.inf)
    xs, w = jax.lax.sort([key, v.astype(jnp.float64)], num_keys=1)
    total = jnp.sum(w)
    cum = jnp.cumsum(w) - w * 0.5
    q = cum / jnp.maximum(total, 1e-300)
    kq = jnp.arcsin(2.0 * jnp.clip(q, 0.0, 1.0) - 1.0) / jnp.pi + 0.5
    cid = jnp.clip(jnp.floor(kq * delta).astype(jnp.int32), 0, delta - 1)
    xs0 = jnp.where(w > 0, xs, 0.0)       # keep inf*0 out of the sums
    wsum = jax.ops.segment_sum(w, cid, num_segments=delta)
    xsum = jax.ops.segment_sum(xs0 * w, cid, num_segments=delta)
    means = jnp.where(wsum > 0, xsum / jnp.maximum(wsum, 1e-300), 0.0)
    mn = jnp.min(jnp.where(v, xf, jnp.inf))
    mx = jnp.max(jnp.where(v, xf, -jnp.inf))
    return means, wsum, mn, mx


def _dist_tdigest_shard(x, valid, *, delta, axis):
    means, wsum, mn, mx = _local_tdigest_padded(x, valid, delta)
    # gather every shard's centroids and re-cluster (MERGE_TDIGEST)
    all_m = jax.lax.all_gather(means, axis, tiled=True)
    all_w = jax.lax.all_gather(wsum, axis, tiled=True)
    key = jnp.where(all_w > 0, all_m, jnp.inf)   # empty centroids last
    ms, ws = jax.lax.sort([key, all_w], num_keys=1)
    total = jnp.sum(ws)
    cum = jnp.cumsum(ws) - ws * 0.5
    q = cum / jnp.maximum(total, 1e-300)
    kq = jnp.arcsin(2.0 * jnp.clip(q, 0.0, 1.0) - 1.0) / jnp.pi + 0.5
    cid = jnp.clip(jnp.floor(kq * delta).astype(jnp.int32), 0, delta - 1)
    ms0 = jnp.where(ws > 0, ms, 0.0)
    wsum2 = jax.ops.segment_sum(ws, cid, num_segments=delta)
    xsum2 = jax.ops.segment_sum(ms0 * ws, cid, num_segments=delta)
    means2 = jnp.where(wsum2 > 0, xsum2 / jnp.maximum(wsum2, 1e-300), 0.0)
    g_mn = jax.lax.pmin(mn, axis)
    g_mx = jax.lax.pmax(mx, axis)
    return means2, wsum2, g_mn.reshape(1), g_mx.reshape(1)


def dist_tdigest(
    mesh: Mesh,
    x: jnp.ndarray,
    valid: jnp.ndarray,
    delta: int = 100,
    axis: str = "x",
):
    """Distributed t-digest sketch over a row-sharded column: shard-local
    build → all_gather centroids → merge-cluster.  Jit-compatible; the
    merged (means[delta], weights[delta], min[1], max[1]) is replicated
    on every shard (the reference's TDIGEST → MERGE_TDIGEST partial-agg
    tree, streaming/groupby.py decomposition)."""
    fn = partial(_dist_tdigest_shard, delta=delta, axis=axis)
    return shard_map(
        lambda a, b: fn(a, b),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        # outputs are replicated by construction (all_gather + identical
        # per-shard merge); JAX's varying-manual-axes inference can't see
        # through the post-gather compute, so skip the check
        check_vma=False,
    )(x, valid)


def dist_quantile(mesh, x, valid, percentiles, delta: int = 100,
                  axis: str = "x"):
    """Eager distributed approximate quantiles (percentile_approx over a
    mesh-merged tdigest).  Returns a numpy array of estimates."""
    import numpy as np

    from cudf_tpu.ops.tdigest import TDigest, percentile_approx

    means, weights, mn, mx = jax.jit(
        lambda a, b: dist_tdigest(mesh, a, b, delta=delta, axis=axis))(
            x, valid)
    digest = TDigest(jnp.asarray(means), jnp.asarray(weights),
                     float(np.asarray(mn)[0]), float(np.asarray(mx)[0]))
    col = percentile_approx(digest, percentiles)
    return np.asarray(col.data)


# ----------------------------------------------------------------------
# eager DataFrame-level wrapper (host sync at the end only)
# ----------------------------------------------------------------------

def distributed_groupby_agg(df, key_name: str, value_names: Sequence[str], mesh: Mesh,
                            aggs: Sequence[str] = ("sum",)):
    """Eager distributed groupby over a DataFrame: partition → jit pipeline
    → collect.  Supports sum/count/mean on numeric columns, int64 keys."""
    import numpy as np

    from cudf_tpu.parallel.mesh import partition_frame
    from cudf_tpu.core.column import Column
    from cudf_tpu.core.table import Table
    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index

    arrays, valid, per = partition_frame(df[[key_name, *value_names]], mesh)
    dictionaries = arrays.pop("__dictionaries__", {})
    key = arrays[key_name]
    vals = [arrays[v] for v in value_names]

    @jax.jit
    def step(key, vals, valid):
        return dist_groupby_sum(mesh, key, vals, valid)

    gkeys, sums, cnts, gvalid = step(key, vals, valid)
    mask = np.asarray(gvalid)
    if key_name in dictionaries:
        # decode dictionary codes back to values (string keys ride the
        # jitted tier as int codes)
        keys_np = np.asarray(gkeys)[mask]
        dict_vals = dictionaries[key_name].to_pylist()
        out = {key_name: Column.from_numpy(
            np.asarray([dict_vals[int(c)] for c in keys_np], dtype=object))}
    else:
        out = {key_name: Column.from_numpy(np.asarray(gkeys)[mask])}
    for name, s in zip(value_names, sums):
        arr = np.asarray(s)[mask]
        if "sum" in aggs:
            out[f"{name}_sum"] = Column.from_numpy(arr)
        if "mean" in aggs:
            out[f"{name}_mean"] = Column.from_numpy(arr / np.asarray(cnts)[mask])
    if "count" in aggs:
        out["count"] = Column.from_numpy(np.asarray(cnts)[mask])
    t = Table(out)
    res = DataFrame._from(t, default_index(t.num_rows))
    return res.sort_values(key_name, ignore_index=True)


# ----------------------------------------------------------------------
# multi-slice (DCN × ICI) distributed groupby
# ----------------------------------------------------------------------

def _dist_groupby_2d_shard(keys, vals, valid, *, n_dcn, n_ici, cap, axis_d,
                           axis_i):
    from cudf_tpu.parallel.shuffle import shuffle_by_keys_2d

    gkeys, sums, cnt, gvalid = local_groupby_sum_multi(keys, vals, valid)
    k_recv, pay_recv, mask, dropped = shuffle_by_keys_2d(
        gkeys, [*sums, cnt], gvalid, n_dcn, n_ici, cap, cap * n_ici,
        axis_d, axis_i)
    m_keys, m_all, _, m_valid = local_groupby_sum_multi(k_recv, pay_recv,
                                                        mask)
    return m_keys, m_all[:-1], m_all[-1], m_valid, dropped.reshape(1)


def dist_groupby_sum_multislice(
    mesh: Mesh,
    keys: Sequence[jnp.ndarray],
    vals: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    capacity_per_bucket: int = 0,
    dcn_axis: str = "dcn",
    ici_axis: str = "x",
):
    """Distributed groupby over a 2-D multi-slice mesh: the partial-agg
    shuffle routes intra-slice traffic over ICI and crosses DCN exactly
    once per row (SURVEY §2.11 DCN row).  Returns like
    dist_groupby_sum_multi."""
    n_dcn = mesh.shape[dcn_axis]
    n_ici = mesh.shape[ici_axis]
    n_total = keys[0].shape[0]
    per_shard = n_total // (n_dcn * n_ici)
    cap = capacity_per_bucket or per_shard
    spec = P((dcn_axis, ici_axis))
    fn = partial(_dist_groupby_2d_shard, n_dcn=n_dcn, n_ici=n_ici, cap=cap,
                 axis_d=dcn_axis, axis_i=ici_axis)
    return shard_map(
        lambda ks, vs, m: fn(ks, vs, m),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec, spec, spec),
    )(list(keys), list(vals), valid)
