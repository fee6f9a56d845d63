"""Joins: inner/left/full/semi/anti/cross — gather-map producing.

TPU-native equivalent of libcudf join
(reference: cpp/src/join/ — hash_join/hash_join.cu:123 cuco multiset
build/probe, join.cu:49 build-smaller-side heuristic, semi/anti
mixed_join_semi.cu, cross_join.cu).

Design: sort-merge expansion instead of a device hash table.  The build
side is sorted once by its row-operator keys (one variadic lax.sort); the
probe side finds its match *range* [lo, hi) with two vectorized
lexicographic binary searches; per-probe match counts = hi - lo.  Output
size follows the reference's own two-phase pattern
(inner_join_size.cu → inner_join_retrieve.cu): device count, one host
sync, then a shaped ``segment_expand`` retrieve that emits
(left_index, right_index) gather maps.  -1 marks a non-match; gathering
with bounds_check nullifies it — exactly libcudf's
out_of_bounds_policy::NULLIFY convention.

On a vector machine this beats scalar hash probing: both phases run at
full HBM bandwidth with zero data-dependent control flow.  A Pallas
VMEM-tiled hash probe is the planned optimization for small build sides.
Null keys match null keys by default (cudf merge passes
null_equality::EQUAL — python/cudf/cudf/core/join/join.py:58 — matching
pandas, where NaN/<NA> merge keys pair up); the query engine passes
``nulls_equal=False`` for the polars ``join_nulls=False`` default.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops._utils import materialize_validity, segment_expand
from cudf_tpu.ops.row_ops import equality_keys
from cudf_tpu.ops.stream_compaction import filter_indices


# ----------------------------------------------------------------------
# key alignment across two tables (validity flags / string chunk counts)
# ----------------------------------------------------------------------

def _aligned_keys(
    left: Sequence[Column], right: Sequence[Column],
    nulls_equal: bool = False,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    l_ops: List[jnp.ndarray] = []
    r_ops: List[jnp.ndarray] = []
    for lc, rc in zip(left, right):
        lo, ro = _align_pair(lc, rc, nulls_equal=nulls_equal)
        l_ops.extend(lo)
        r_ops.extend(ro)
    return l_ops, r_ops


def _dict_code_pair(a: Column, b: Column) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Shared-code-space int32 codes for two dictionary columns, or None.

    The reference recodes BOTH columns onto the union dictionary before a
    join (cpp/src/dictionary/ match_dictionaries, join.cu:37).  On a TPU
    the per-row gather is the expensive move, so the recode lands on the
    SMALLER column only: its dictionary is matched against the larger
    side's (a dictionary-sized sort+search), and its codes gather through
    the resulting remap.  Values absent from the large dictionary become
    -1 — a single sentinel is safe for join equality because the large
    side's codes are all >= 0, and same-side equality is never consumed.
    Returns (a_codes, b_codes) int32; null rows keep their column validity
    (callers mask them as usual).
    """
    if not (a.dtype.is_dictionary and b.dtype.is_dictionary):
        return None
    if (a.dtype.value_type or dt.STRING) != (b.dtype.value_type or dt.STRING):
        return None
    ak, bk = a.children[0], b.children[0]
    acodes = a.data.astype(jnp.int32)
    bcodes = b.data.astype(jnp.int32)
    if ak is bk or (ak.length == bk.length and ak.data is bk.data):
        return acodes, bcodes
    swap = a.length < b.length
    big, small = (b, a) if swap else (a, b)
    big_ops = equality_keys(big.children[0].with_validity(None))
    small_ops = equality_keys(small.children[0].with_validity(None))
    order, lo, hi = _probe_ranges(small_ops, big_ops)
    matched = hi > lo
    remap = jnp.where(
        matched, jnp.take(order, jnp.clip(lo, 0, None)), -1
    ).astype(jnp.int32)
    sc = small.data.astype(jnp.int32)
    small_codes = jnp.take(remap, jnp.clip(sc, 0, remap.shape[0] - 1))
    big_codes = (bcodes if swap else acodes)
    return (small_codes, big_codes) if swap else (big_codes, small_codes)


def _align_pair(
    a: Column, b: Column, nulls_equal: bool = False
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    codes = _dict_code_pair(a, b)
    if codes is not None:
        a = Column(dt.INT32, a.length, data=codes[0], validity=a.validity)
        b = Column(dt.INT32, b.length, data=codes[1], validity=b.validity)
    # promote to common dtype first
    elif a.dtype != b.dtype:
        if a.dtype.is_dictionary:
            a = a.decode_dictionary()
        if b.dtype.is_dictionary:
            b = b.decode_dictionary()
        if a.dtype != b.dtype:
            target = dt.common_dtype(a.dtype, b.dtype)
            from cudf_tpu.ops.unary import cast

            a, b = cast(a, target), cast(b, target)
    if nulls_equal and (a.validity is not None or b.validity is not None):
        # null==null semantics (cudf merge passes null_equality::EQUAL,
        # python/cudf/cudf/core/join/join.py:58): keep validity in the
        # equality operands — equality_keys prepends an is-valid operand
        # and canonicalizes null payloads, so null rows compare equal to
        # each other and unequal to every value.  Both sides must carry
        # the operand for the lists to stay aligned.
        va = a.validity if a.validity is not None else \
            jnp.ones((a.length,), jnp.bool_)
        vb = b.validity if b.validity is not None else \
            jnp.ones((b.length,), jnp.bool_)
        ka = equality_keys(a.with_validity(va))
        kb = equality_keys(b.with_validity(vb))
    else:
        ka = equality_keys(a.with_validity(None))
        kb = equality_keys(b.with_validity(None))
    if a.dtype.is_string or (a.dtype.is_dictionary and (a.dtype.value_type or dt.STRING).is_string):
        # string chunk counts may differ: pad shorter side (zero chunks sort
        # below any content byte), keep trailing length operand aligned
        if len(ka) != len(kb):
            tgt = max(len(ka), len(kb))

            def pad(ops, n):
                head, ln = list(ops[:-1]), ops[-1]
                while len(head) + 1 < tgt:
                    head.append(jnp.full((n,), jnp.int64(-(2**63)), jnp.int64))
                return [*head, ln]

            ka = pad(ka, a.length)
            kb = pad(kb, b.length)
    return ka, kb


def _null_row_mask(cols: Sequence[Column]) -> Optional[jnp.ndarray]:
    """bool[n] True where any key is null (such rows never match)."""
    mask = None
    for c in cols:
        if c.validity is not None:
            nm = ~c.validity
            mask = nm if mask is None else (mask | nm)
    return mask


def _both_sides_have_nulls(lc: Column, rc: Column) -> bool:
    """True when BOTH key columns contain actual nulls (host sync only
    when both carry validity masks — join paths already sync for their
    count-then-allocate phase, so this adds nothing on the fast shapes)."""
    if lc.validity is None or rc.validity is None:
        return False
    return bool(jnp.any(~lc.validity)) and bool(jnp.any(~rc.validity))


# ----------------------------------------------------------------------
# core sort-merge machinery
# ----------------------------------------------------------------------

def _probe_ranges(
    l_ops: List[jnp.ndarray], r_ops: List[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort right ops; return (right_order, lo, hi) match ranges per left row."""
    nr = r_ops[0].shape[0]
    ridx = jnp.arange(nr, dtype=jnp.int64)
    sorted_all = jax.lax.sort([*r_ops, ridx], num_keys=len(r_ops), is_stable=True)
    r_sorted = sorted_all[:-1]
    r_order = sorted_all[-1]
    lo = _lex_searchsorted(r_sorted, l_ops, "left")
    hi = _lex_searchsorted(r_sorted, l_ops, "right")
    return r_order, lo, hi


def _lex_searchsorted(
    sorted_ops: List[jnp.ndarray], needle_ops: List[jnp.ndarray], side: str
) -> jnp.ndarray:
    if len(sorted_ops) == 1:
        from cudf_tpu.ops._utils import searchsorted_fast

        return searchsorted_fast(sorted_ops[0], needle_ops[0], side).astype(jnp.int64)
    nh = sorted_ops[0].shape[0]
    nn = needle_ops[0].shape[0]
    operands = [jnp.concatenate([h, n]) for h, n in zip(sorted_ops, needle_ops)]
    needle_tie = jnp.int8(0 if side == "left" else 1)
    hay_tie = jnp.int8(1) - needle_tie
    tie = jnp.concatenate([jnp.full((nh,), hay_tie), jnp.full((nn,), needle_tie)])
    tag = jnp.concatenate([jnp.full((nh,), -1, jnp.int64), jnp.arange(nn, dtype=jnp.int64)])
    out = jax.lax.sort([*operands, tie, tag], num_keys=len(operands) + 1, is_stable=True)
    tag_sorted = out[-1]
    pos = jnp.arange(nh + nn, dtype=jnp.int64)
    is_needle = tag_sorted >= 0
    needles_before = jnp.cumsum(is_needle.astype(jnp.int64)) - is_needle.astype(jnp.int64)
    insert = pos - needles_before
    # scatter into nn+1 slots so haystack rows park at the sentinel instead
    # of clobbering needle 0
    res = jnp.zeros((nn + 1,), jnp.int64)
    res = res.at[jnp.where(is_needle, tag_sorted, nn)].set(insert)
    return res[:nn]


def _expand_matches(
    counts: jnp.ndarray,
    lo: jnp.ndarray,
    r_order: jnp.ndarray,
    keep_unmatched_left: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """counts[i] matches for left row i starting at sorted-right position
    lo[i] → (left_indices, right_indices)."""
    nl = counts.shape[0]
    emit = jnp.maximum(counts, 1) if keep_unmatched_left else counts
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(emit)])
    total = int(offsets[-1])  # count phase: one host sync
    if total == 0:
        z = jnp.zeros((0,), jnp.int64)
        return z, z
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    matched = jnp.take(counts, row) > 0
    r_sorted_pos = jnp.take(lo, row) + within
    nr = r_order.shape[0]
    right_idx = jnp.where(
        matched, jnp.take(r_order, jnp.clip(r_sorted_pos, 0, max(nr - 1, 0))), -1
    )
    return row, right_idx


# ----------------------------------------------------------------------
# public joins
# ----------------------------------------------------------------------

def inner_join(
    left_keys: Sequence[Column], right_keys: Sequence[Column],
    nulls_equal: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cudf::inner_join → (left gather map, right gather map).

    ``nulls_equal=True`` is the cudf/pandas merge semantic
    (null_equality::EQUAL, python/cudf/cudf/core/join/join.py:58):
    null keys match null keys.  The query engine passes False for the
    polars ``join_nulls=False`` default.
    """
    return _join(left_keys, right_keys, how="inner",
                 nulls_equal=nulls_equal)


def left_join(
    left_keys: Sequence[Column], right_keys: Sequence[Column],
    nulls_equal: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return _join(left_keys, right_keys, how="left", nulls_equal=nulls_equal)


def full_join(
    left_keys: Sequence[Column], right_keys: Sequence[Column],
    nulls_equal: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return _join(left_keys, right_keys, how="outer", nulls_equal=nulls_equal)


def _try_dense_inner(lc: Column, rc: Column) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Direct-address inner join for a single integer key whose build side
    is unique over a dense-enough domain (db-benchmark dim-table shape).

    Replaces the merged-sort probe with ONE gather per probe row — the
    gather wall (~133 M/s/chip) sits 5-10x above the sort+scan path.  The
    cuco static-map analogue (hash_join.hpp:70) with addressing instead of
    hashing.  Returns None (caller falls back) when the key shape doesn't
    qualify; pairs come back in left-row order (pandas inner-merge order).
    """
    from cudf_tpu.ops._utils import dense_key_table, dense_probe
    from cudf_tpu.utils.config import get_option

    if not get_option("join.dense_fast_path"):
        return None
    if not (lc.dtype.is_integer and rc.dtype.is_integer):
        return None
    nl, nr = lc.length, rc.length
    if nr < 2 or nl < 64:
        return None
    rdata = rc.data.astype(jnp.int64)
    if rc.validity is not None:
        anyv = rdata[jnp.argmax(rc.validity)]
        rdata_stat = jnp.where(rc.validity, rdata, anyv)
    else:
        rdata_stat = rdata
    rmin = int(jnp.min(rdata_stat))
    rmax = int(jnp.max(rdata_stat))
    domain = rmax - rmin + 1
    if domain > max(4 * nr, 1 << 16) or domain > (1 << 27):
        return None
    # uniqueness check: one scatter-add over the domain
    pos = rdata - rmin
    if rc.validity is not None:
        pos = jnp.where(rc.validity, pos, domain)
    cnt = jnp.zeros((domain + 1,), jnp.int32).at[
        jnp.clip(pos, 0, domain)].add(1, mode="drop")
    if int(jnp.max(cnt[:domain])) > 1:
        return None
    tbl = dense_key_table(jnp.where(pos < domain, pos, domain).astype(jnp.int64),
                          0, domain)
    r_idx, found = dense_probe(tbl, lc.data.astype(jnp.int64), rmin)
    if lc.validity is not None:
        found = found & lc.validity
    li = filter_indices(found)
    return li, jnp.take(r_idx, li).astype(jnp.int64)


def _try_radix_inner(lc: Column, rc: Column, preserve_order: bool = True
                     ) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Radix-partition + MXU window-probe inner join for a single integer
    key with a unique build side (kernels/radix_partition.py) — the
    default fast tier at scale, mirroring the unconditional hash-join
    dispatch of cpp/src/join/hash_join/hash_join.cu:123-125.

    Emits (left, right) gather maps; with preserve_order the pairs come
    back in left-row order (pandas merge semantics), at the cost of one
    pair sort.  Returns None when the shape doesn't qualify (caller falls
    through to the dense / sort-merge tiers).
    """
    import jax

    from cudf_tpu.utils.config import get_option

    if not get_option("join.radix_fast_path"):
        return None
    interpret = bool(get_option("join.kernel_interpret"))
    if jax.default_backend() == "cpu" and not interpret:
        return None
    if not (lc.dtype.is_integer and rc.dtype.is_integer):
        return None
    nl, nr = lc.length, rc.length
    if nl < int(get_option("join.fast_path_min_rows")) or nr < 2:
        return None
    rdata = rc.data.astype(jnp.int64)
    if rc.validity is not None:
        anyv = rdata[jnp.argmax(rc.validity)]
        rdata_stat = jnp.where(rc.validity, rdata, anyv)
        nrv = jnp.sum(rc.validity)
    else:
        rdata_stat = rdata
        nrv = None
    # ONE host sync for all build-side stats (each eager scalar pull
    # flushes the async pipeline over the tunnel)
    stats = jnp.stack([jnp.min(rdata_stat), jnp.max(rdata_stat),
                       jnp.asarray(nr if nrv is None else nrv, jnp.int64)])
    stats = np.asarray(stats)
    rmin, rmax, n_rvalid = int(stats[0]), int(stats[1]), int(stats[2])
    domain = rmax - rmin + 1
    if domain > (1 << 27):
        return None
    from cudf_tpu.kernels.radix_partition import radix_join_inner_unique

    rcodes = (rdata - rmin).astype(jnp.int32)
    if rc.validity is not None:
        rcodes = jnp.where(rc.validity, rcodes, -1)
    # the probe-side bookkeeping stays in the key's NATIVE width: every
    # eager int64 pass over 1e8 rows is an emulated two-word operation
    # on the TPU (measured: the wrapper cost dwarfed the 0.45 s kernel)
    if lc.dtype.itemsize <= 4 and -(2**31) <= rmin and rmax < 2**31:
        ld = lc.data.astype(jnp.int32)
        out_of_range = (ld < jnp.int32(rmin)) | (ld > jnp.int32(rmax))
        lcodes = jnp.where(out_of_range, jnp.int32(-1),
                           ld - jnp.int32(rmin))
    else:
        ldata64 = lc.data.astype(jnp.int64)
        out_of_range = (ldata64 < rmin) | (ldata64 > rmax)
        lcodes = jnp.where(out_of_range, -1,
                           (ldata64 - rmin).astype(jnp.int32))
    if lc.validity is not None:
        lcodes = jnp.where(lc.validity, lcodes, -1)
    if domain >= n_rvalid:                  # unique build side possible
        _, pvl, bid, unique = radix_join_inner_unique(
            lcodes, jnp.arange(nl, dtype=jnp.int32), rcodes, domain,
            interpret=interpret)
        if unique:
            found = (bid >= 0).reshape(-1)
            keep = filter_indices(found)
            li = jnp.take(pvl.reshape(-1), keep)
            ri = jnp.take(bid.reshape(-1), keep)
            if preserve_order:
                li, ri = jax.lax.sort([li, ri], num_keys=1, is_stable=True)
            return li, ri
    return _radix_inner_multi(lcodes, rcodes, nl, domain, n_rvalid,
                              preserve_order, interpret)


def _radix_inner_multi(lcodes, rcodes, nl: int, domain: int, n_rvalid: int,
                       preserve_order: bool, interpret: bool
                       ) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Bounded-fan-out kernel-tier inner join: stacked ordinal tables +
    count-then-allocate pair expansion (inner_join_size.cu shape —
    one host sync for the pair count, then a static-shape expansion)."""
    import jax

    from cudf_tpu.kernels.radix_partition import radix_join_inner_multi
    from cudf_tpu.utils.config import get_option

    m_max = int(get_option("join.multi_fan_out_max"))
    if m_max < 1:
        return None
    if n_rvalid > m_max * domain:   # pigeonhole: fan-out certainly exceeds
        return None
    _, pvl, bids, mult = radix_join_inner_multi(
        lcodes, jnp.arange(nl, dtype=jnp.int32), rcodes, domain,
        m_max=m_max, interpret=interpret)
    if bids is None:                        # fan-out exceeds the bound
        return None
    flat_bids = [b.reshape(-1) for b in bids]
    cnts = flat_bids[0] * 0
    for b in flat_bids:
        cnts = cnts + (b >= 0).astype(jnp.int32)
    M = int(jnp.sum(cnts))
    z = jnp.zeros((0,), jnp.int64)
    if M == 0:
        return z, z
    pvl_flat = pvl.reshape(-1)
    li = jnp.repeat(pvl_flat, cnts, total_repeat_length=M).astype(jnp.int64)
    csum = jnp.cumsum(cnts) - cnts
    jj = (jnp.arange(M, dtype=jnp.int32)
          - jnp.repeat(csum, cnts, total_repeat_length=M))
    ri = jnp.zeros((M,), jnp.int64)
    for j, b in enumerate(flat_bids):
        rep = jnp.repeat(b, cnts, total_repeat_length=M)
        ri = jnp.where(jj == j, rep.astype(jnp.int64), ri)
    if preserve_order:
        # ordinal j follows build-row order, and pairs for one probe row
        # are emitted j-ascending — a stable sort by li restores pandas
        # (left order, right order within) semantics
        li, ri = jax.lax.sort([li, ri], num_keys=1, is_stable=True)
    return li, ri


def _join(left_keys, right_keys, how: str,
          nulls_equal: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    left_keys, right_keys = list(left_keys), list(right_keys)
    nl, nr = left_keys[0].length, right_keys[0].length
    z = jnp.zeros((0,), jnp.int64)
    if how == "inner" and (nl == 0 or nr == 0):
        return z, z
    if len(left_keys) == 1 and len(right_keys) == 1:
        # dictionary keys join as shared-space int32 codes (the recode
        # lands on the smaller side, see _dict_code_pair) — this also
        # qualifies them for the radix/dense kernel tiers below
        codes = _dict_code_pair(left_keys[0], right_keys[0])
        if codes is not None:
            left_keys = [Column(dt.INT32, nl, data=codes[0],
                                validity=left_keys[0].validity)]
            right_keys = [Column(dt.INT32, nr, data=codes[1],
                                 validity=right_keys[0].validity)]
    if (how == "inner" and len(left_keys) == 1 and len(right_keys) == 1
            and not (nulls_equal
                     and _both_sides_have_nulls(left_keys[0],
                                                right_keys[0]))):
        # the kernel tiers exclude null build/probe rows; that is only
        # correct when at most one side has nulls (nothing to match) —
        # with nulls on BOTH sides and null_equality::EQUAL, null rows
        # must pair up, so the sort-merge path (null-aware equality
        # operands) takes over.
        fast = _try_radix_inner(left_keys[0], right_keys[0])
        if fast is None:
            fast = _try_dense_inner(left_keys[0], right_keys[0])
        if fast is None:
            # swapped orientation: build on the LEFT side when it is the
            # unique one (dim.merge(fact) shapes) — inner join is
            # symmetric, so probe from the right and re-sort to pandas
            # left-row order.  The reference picks its build side the
            # same way (hash_join.cu builds on the smaller table).
            fast = _try_radix_inner(right_keys[0], left_keys[0],
                                    preserve_order=False)
            if fast is None:
                fast = _try_dense_inner(right_keys[0], left_keys[0])
            if fast is not None:
                ri, li = fast
                import jax

                li, ri = jax.lax.sort([li, ri], num_keys=2, is_stable=True)
                return li, ri
        if fast is not None:
            return fast
    if how == "left" and nl == 0:
        return z, z
    if nr == 0:
        if how == "left":
            li = jnp.arange(nl, dtype=jnp.int64)
            return li, jnp.full((nl,), -1, jnp.int64)
        if how == "outer":
            li = jnp.arange(nl, dtype=jnp.int64)
            return li, jnp.full((nl,), -1, jnp.int64)
    if nl == 0 and how == "outer":
        ri = jnp.arange(nr, dtype=jnp.int64)
        return jnp.full((nr,), -1, jnp.int64), ri
    l_ops, r_ops = _aligned_keys(left_keys, right_keys,
                                 nulls_equal=nulls_equal)
    if nulls_equal:
        # null==null handled inside the equality operands (_align_pair)
        l_null = r_null = keep_r = None
        r_ops_m = r_ops
    else:
        l_null = _null_row_mask(left_keys)
        r_null = _null_row_mask(right_keys)
        # exclude null-key rows from matching (polars join_nulls=False)
        if r_null is not None:
            keep_r = filter_indices(~r_null)
            r_ops_m = [jnp.take(k, keep_r) for k in r_ops]
        else:
            keep_r = None
            r_ops_m = r_ops
    r_order, lo, hi = _probe_ranges(l_ops, r_ops_m)
    counts = hi - lo
    if l_null is not None:
        counts = jnp.where(l_null, 0, counts)
    keep_left = how in ("left", "outer")
    left_idx, right_idx = _expand_matches(counts, lo, r_order, keep_left)
    if keep_r is not None:
        right_idx = jnp.where(right_idx >= 0, jnp.take(keep_r, jnp.clip(right_idx, 0, None)), -1)
    if how == "outer":
        # append unmatched right rows (scatter into an nr+1 buffer so
        # non-matches park at the sentinel slot instead of clobbering row 0)
        valid_r = right_idx >= 0
        matched_r = (
            jnp.zeros((nr + 1,), jnp.bool_)
            .at[jnp.where(valid_r, right_idx, nr)]
            .set(True)[:nr]
        )
        unmatched = filter_indices(~matched_r)
        left_idx = jnp.concatenate([left_idx, jnp.full((unmatched.shape[0],), -1, jnp.int64)])
        right_idx = jnp.concatenate([right_idx, unmatched])
    return left_idx, right_idx


def semi_join(left_keys, right_keys, nulls_equal: bool = True) -> jnp.ndarray:
    """Left-semi: indices of left rows with ≥1 match (cudf::left_semi_join)."""
    mask = _match_mask(left_keys, right_keys, nulls_equal=nulls_equal)
    return filter_indices(mask)


def anti_join(left_keys, right_keys, nulls_equal: bool = True) -> jnp.ndarray:
    mask = _match_mask(left_keys, right_keys, nulls_equal=nulls_equal)
    return filter_indices(~mask)


def _match_mask(left_keys, right_keys, nulls_equal: bool = True) -> jnp.ndarray:
    left_keys, right_keys = list(left_keys), list(right_keys)
    l_ops, r_ops = _aligned_keys(left_keys, right_keys,
                                 nulls_equal=nulls_equal)
    if not nulls_equal:
        r_null = _null_row_mask(right_keys)
        if r_null is not None:
            keep_r = filter_indices(~r_null)
            r_ops = [jnp.take(k, keep_r) for k in r_ops]
    _, lo, hi = _probe_ranges(l_ops, r_ops)
    mask = hi > lo
    if not nulls_equal:
        l_null = _null_row_mask(left_keys)
        if l_null is not None:
            mask = mask & ~l_null
    return mask


def cross_join(nl: int, nr: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    left_idx = jnp.repeat(jnp.arange(nl, dtype=jnp.int64), nr)
    right_idx = jnp.tile(jnp.arange(nr, dtype=jnp.int64), nl)
    return left_idx, right_idx


def merge_sorted(key_cols_list: Sequence[Sequence[Column]],
                 ascending=None, na_position="last") -> jnp.ndarray:
    """k-way merge of pre-sorted tables (cudf::merge, cpp/src/merge/merge.cu).

    Concatenate + one fused stable sort: on TPU the full sort at HBM
    bandwidth replaces the reference's device merge-path kernel.
    Returns the gather map into the concatenated table.
    """
    from cudf_tpu.ops import copying
    from cudf_tpu.ops.row_ops import lex_sort_indices

    cols = [copying.concatenate([t[i] for t in key_cols_list])
            for i in range(len(key_cols_list[0]))]
    return lex_sort_indices(cols, ascending=ascending, na_position=na_position)


# ---------------------------------------------------------------------------
# Mixed joins: hash/sort equality join narrowed by an arbitrary predicate
# (reference: cudf::mixed_inner_join family, cpp/src/join/mixed_join.cu).
# The equality keys drive the sort-merge machinery; the conditional part is
# a vectorized predicate over the candidate pairs — no nested loop.
# ---------------------------------------------------------------------------

def _mixed_pairs(left_keys, right_keys, predicate):
    li, ri = inner_join(left_keys, right_keys)
    if li.shape[0] == 0:
        return li, ri, jnp.zeros((0,), jnp.bool_)
    m = predicate(li, ri)
    if isinstance(m, Column):
        mb = m.data.astype(jnp.bool_)
        if m.validity is not None:
            mb = mb & m.validity
        m = mb
    return li, ri, m.astype(jnp.bool_)


def mixed_inner_join(left_keys, right_keys, predicate):
    """(left map, right map) for equality-join pairs where
    ``predicate(li, ri) -> bool[k]`` also holds."""
    from cudf_tpu.ops.stream_compaction import filter_indices

    li, ri, m = _mixed_pairs(left_keys, right_keys, predicate)
    keep = filter_indices(m)
    return jnp.take(li, keep), jnp.take(ri, keep)


def mixed_left_join(left_keys, right_keys, predicate):
    """Left rows with no surviving pair appear once with right map -1."""
    from cudf_tpu.ops.stream_compaction import filter_indices

    nl = left_keys[0].length
    li, ri, m = _mixed_pairs(left_keys, right_keys, predicate)
    matched = jnp.zeros((nl,), jnp.bool_)
    if li.shape[0]:
        matched = matched.at[jnp.where(m, li, nl)].set(True, mode="drop")
    keep = filter_indices(m)
    li_k, ri_k = jnp.take(li, keep), jnp.take(ri, keep)
    unmatched = filter_indices(~matched)
    return (jnp.concatenate([li_k, unmatched]),
            jnp.concatenate([ri_k, jnp.full(unmatched.shape, -1, jnp.int64)]))


def mixed_semi_join(left_keys, right_keys, predicate):
    """Indices of left rows with at least one surviving pair
    (cudf::mixed_left_semi_join)."""
    from cudf_tpu.ops.stream_compaction import filter_indices

    nl = left_keys[0].length
    li, ri, m = _mixed_pairs(left_keys, right_keys, predicate)
    matched = jnp.zeros((nl,), jnp.bool_)
    if li.shape[0]:
        matched = matched.at[jnp.where(m, li, nl)].set(True, mode="drop")
    return filter_indices(matched)


def mixed_anti_join(left_keys, right_keys, predicate):
    """Indices of left rows with no surviving pair (cudf::mixed_left_anti_join)."""
    from cudf_tpu.ops.stream_compaction import filter_indices

    nl = left_keys[0].length
    li, ri, m = _mixed_pairs(left_keys, right_keys, predicate)
    matched = jnp.zeros((nl,), jnp.bool_)
    if li.shape[0]:
        matched = matched.at[jnp.where(m, li, nl)].set(True, mode="drop")
    return filter_indices(~matched)


# ----------------------------------------------------------------------
# reusable join object: build once, probe many
# ----------------------------------------------------------------------

class HashJoin:
    """Build-side state cached across probes (cudf::hash_join,
    cpp/include/cudf/join/hash_join.hpp:70; the cuco multiset build is a
    sorted key representation here — same O(n log n) build, probes are
    searchsorted instead of hash probes).

    >>> hj = HashJoin(right_key_columns)
    >>> li, ri = hj.inner_join(probe_keys)      # repeatable, build reused
    """

    def __init__(self, build_keys: Sequence[Column],
                 nulls_equal: bool = True):
        self._build_keys = list(build_keys)
        self.num_build_rows = self._build_keys[0].length if build_keys else 0
        self._nulls_equal = nulls_equal
        self._null = None if nulls_equal else \
            _null_row_mask(self._build_keys)
        self._cache = {}          # aligned-ops signature → sorted state

    def _state_for(self, probe_keys):
        l_ops, r_ops = _aligned_keys(list(probe_keys), self._build_keys,
                                     nulls_equal=self._nulls_equal)
        sig = tuple((o.dtype, o.shape) for o in r_ops)
        if sig not in self._cache:
            if self._null is not None:
                keep_r = filter_indices(~self._null)
                r_ops_m = [jnp.take(k, keep_r) for k in r_ops]
            else:
                keep_r = None
                r_ops_m = r_ops
            nr = r_ops_m[0].shape[0]
            ridx = jnp.arange(nr, dtype=jnp.int64)
            sorted_all = jax.lax.sort([*r_ops_m, ridx],
                                      num_keys=len(r_ops_m), is_stable=True)
            self._cache[sig] = (sorted_all[:-1], sorted_all[-1], keep_r)
        return l_ops, self._cache[sig]

    def _ranges(self, probe_keys):
        l_ops, (r_sorted, r_order, keep_r) = self._state_for(probe_keys)
        lo = _lex_searchsorted(r_sorted, l_ops, "left")
        hi = _lex_searchsorted(r_sorted, l_ops, "right")
        counts = hi - lo
        if not self._nulls_equal:
            l_null = _null_row_mask(list(probe_keys))
            if l_null is not None:
                counts = jnp.where(l_null, 0, counts)
        return counts, lo, r_order, keep_r

    def _expand(self, probe_keys, keep_unmatched):
        counts, lo, r_order, keep_r = self._ranges(probe_keys)
        li, ri = _expand_matches(counts, lo, r_order, keep_unmatched)
        if keep_r is not None:
            ri = jnp.where(ri >= 0, jnp.take(keep_r, jnp.clip(ri, 0, None)), -1)
        return li, ri

    def inner_join(self, probe_keys):
        return self._expand(probe_keys, keep_unmatched=False)

    def left_join(self, probe_keys):
        return self._expand(probe_keys, keep_unmatched=True)

    def semi_join(self, probe_keys):
        counts, _, _, _ = self._ranges(probe_keys)
        return filter_indices(counts > 0)

    def anti_join(self, probe_keys):
        counts, _, _, _ = self._ranges(probe_keys)
        return filter_indices(counts == 0)


class DistinctHashJoin(HashJoin):
    """Unique-build-key join (cudf::distinct_hash_join): probes emit at
    most one match, so outputs are probe-aligned with no expand phase."""

    def inner_join(self, probe_keys):
        counts, lo, r_order, keep_r = self._ranges(probe_keys)
        found = counts > 0
        keep = filter_indices(found)
        li = keep
        pos = jnp.take(lo, keep)
        nr = r_order.shape[0]
        ri = jnp.take(r_order, jnp.clip(pos, 0, max(nr - 1, 0)))
        if keep_r is not None:
            ri = jnp.take(keep_r, ri)
        return li, ri
