"""Radix partition + bucket-windowed outer-product aggregation — the
TPU-native replacement for the cuco/cub relational core.

Reference roles covered:
- cub radix sort fast path           cpp/src/sort/sort_radix.cu:69-111
- cuco hash groupby single pass      cpp/src/groupby/hash/compute_single_pass_aggs.cu:14-37
- hash_partition shuffle primitive   cpp/src/partitioning/partitioning.cu

Why not a CUDA-shaped design: TPUs have no per-element scatter.  The
pipeline reaches bucket locality using only the machine's fast movements
— VPU-wide bitonic networks inside VMEM tiles and block DMAs at dynamic
row offsets:

  Phase A  histogram kernel: per-tile digit counts via one-hot MXU matmul.
  (host)   row-granular layout: every (tile, bucket) run ships as the
           128-lane ROWS that COVER it, so DMA sources and destinations
           stay row-aligned — no element-level shift exists on this
           machine.  Covering rows carry a few neighbouring-bucket
           elements at the run edges; those keys are OUTSIDE the bucket's
           key window and every consumer masks by window, so the garbage
           is self-identifying and costs ~1 extra row per run.
  Phase B  per-tile bitonic sort (kernels/bitonic.py) into VMEM scratch,
           then per-bucket chunked DMAs of the covering rows to the
           bucket's region.  All DMA sizes are static (chunk_rows x 128);
           the final chunk of a run is clamped back at both ends, giving
           overlapping writes inside the run's own region.
  Phase C  window aggregation WITHOUT a span-wide one-hot (building a
           [128, span] one-hot per row is VPU-bound at ~8 ops/element):
           factor the window-local key as local = hi*128 + lo, then

             sums[hi, lo]   = sum_i v_i * onehot_hi(i) (x) onehot_lo(i)
             counts[hi, lo] = sum_i       onehot_hi(i) (x) onehot_lo(i)

           a sum of outer products = ONE MXU matmul per 128-element row:
           S = [v*onehot_hi ; onehot_hi]^T @ onehot_lo, with the two
           narrow one-hots (64 + 128 compares) on the VPU.  The grid
           walks bucket regions; scalar-prefetched per-step bucket ids
           drive the output BlockSpec index map.

Static-shape discipline: counts are exact (the histogram prepass sizes
every run) so nothing is ever dropped; skew only changes run lengths.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudf_tpu.kernels.bitonic import bitonic_sort

LANES = 128
HI = 64                      # hi channels per window: span = HI * LANES
SPAN = HI * LANES            # 8192 keys per bucket window
SENTINEL = np.int32(-0x80000000)  # pad key: negative digit, outside windows


# ----------------------------------------------------------------------
# Phase A: per-tile digit histogram
# ----------------------------------------------------------------------

def _hist_kernel(nbits, shift, keys_ref, out_ref):
    B = 1 << nbits
    tr = keys_ref.shape[0]
    # classes on the SUBLANE axis: comparing a [1, 128] row against
    # [B, 128] classes broadcasts without any per-row lane->sublane
    # relayout (krow[:, None] transposes and was 25x slower); per-class
    # counts stay lane-resolved in the accumulator and reduce once at
    # the end.
    classes = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 0)

    def body(i, acc):
        r = i * 8
        for k in range(8):  # 8 rows per iteration amortize loop overhead
            digits = (keys_ref[r + k, :] >> shift).astype(jnp.int32)
            d = jnp.where(digits >= 0, digits & (B - 1), -1)
            acc = acc + (classes == d[None, :]).astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, tr // 8, body,
                            jnp.zeros((B, LANES), jnp.float32))
    counts = jnp.sum(acc, axis=1, keepdims=True).astype(jnp.int32)  # [B, 1]
    out_ref[...] = jnp.broadcast_to(counts.T, out_ref.shape)


@partial(jax.jit, static_argnames=("nbits", "shift", "tile_rows", "interpret"))
def digit_histogram(keys2, nbits: int, shift: int, tile_rows: int,
                    interpret: bool = False):
    """hist[NT, B] over row-major keys2[R, 128]; pad rows hold SENTINEL."""
    R = keys2.shape[0]
    nt = R // tile_rows
    B = 1 << nbits
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_hist_kernel, nbits, shift),
            grid=(nt,),
            in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, B), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt * 8, B), jnp.int32),
            interpret=interpret,
        )(keys2)[::8]


# ----------------------------------------------------------------------
# host-side layout (tiny [NT, B] numpy arrays)
# ----------------------------------------------------------------------

def partition_layout(hist: np.ndarray, tile_rows: int, chunk_rows: int,
                     region_align_rows: int):
    """Row-granular output layout.

    Every (tile, bucket) run occupies w >= chunk_rows covering rows (the
    clamped final DMA chunk needs room to back into); bucket regions are
    rounded up to region_align_rows for the aggregation grid.

    Returns (dst_rows[NT,B], local_start_elem[NT,B], run_rows[NT,B],
             bucket_base_rows[B+1], total_rows)
    """
    nt, B = hist.shape
    tile_elems = tile_rows * LANES
    n_sent = tile_elems - hist.sum(axis=1)          # sort-leading pad keys
    local_end = np.cumsum(hist, axis=1) + n_sent[:, None]
    local_start = local_end - hist
    first_row = local_start // LANES
    last_row = (local_end - 1) // LANES + 1          # covering row bound
    w = np.maximum(last_row - first_row, chunk_rows)
    per_bucket = w.sum(axis=0)
    per_bucket_al = -(-per_bucket // region_align_rows) * region_align_rows
    bucket_base = np.concatenate([[0], np.cumsum(per_bucket_al)]).astype(np.int64)
    within = np.cumsum(w, axis=0) - w
    dst = bucket_base[None, :B] + within
    return (dst.astype(np.int32), local_start.astype(np.int32),
            w.astype(np.int32), bucket_base.astype(np.int32),
            int(bucket_base[-1]))


# ----------------------------------------------------------------------
# Phase B: sort tiles + scatter covering rows
# ----------------------------------------------------------------------

def _partition_kernel(B, tile_rows, chunk_rows, mask_bits,
                      tabs_ref,                           # [B, 128] VMEM block
                      keys_ref, vals_ref,                 # VMEM blocks
                      kinit_ref, vinit_ref,               # aliased (unused)
                      kout_ref, vout_ref,                 # HBM outputs
                      ksc_ref, vsc_ref, sems):            # scratch
    keys = keys_ref[...]
    if mask_bits is None:
        ks, vs = bitonic_sort(keys, [vals_ref[...]])
    else:
        # later passes sort by the LOW bits only (the tile sits inside one
        # first-pass region, whose keys share their top bits; run-edge
        # garbage sorts by its own low bits and stays out-of-window)
        sk = jnp.where(keys >= 0, keys & ((1 << mask_bits) - 1),
                       jnp.int32(SENTINEL))
        _, ks, vs = bitonic_sort(sk, [keys, vals_ref[...]])
    ksc_ref[...] = ks
    vsc_ref[...] = vs

    def chunk_copy(b, c, plane):
        src_ref, out_ref = ((ksc_ref, kout_ref), (vsc_ref, vout_ref))[plane]
        w = tabs_ref[b, 2]
        src0 = tabs_ref[b, 1] // LANES
        src = jnp.minimum(src0 + c * chunk_rows, src0 + w - chunk_rows)
        src = jnp.clip(src, 0, tile_rows - chunk_rows)
        dst0 = tabs_ref[b, 0]
        dst = jnp.minimum(dst0 + c * chunk_rows, dst0 + w - chunk_rows)
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(src, chunk_rows), :],
            out_ref.at[pl.ds(dst, chunk_rows), :],
            sems.at[b % sems.shape[0]],
        )

    def per_bucket(start: bool):
        def body(b, _):
            nchunks = (tabs_ref[b, 2] + chunk_rows - 1) // chunk_rows

            def chunk(c, _):
                for plane in (0, 1):
                    cp = chunk_copy(b, c, plane)
                    (cp.start() if start else cp.wait())
                return 0

            jax.lax.fori_loop(0, nchunks, chunk, 0)
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    per_bucket(start=True)
    per_bucket(start=False)


@partial(jax.jit,
         static_argnames=("nbits", "tile_rows", "chunk_rows", "total_rows",
                          "mask_bits", "interpret"))
def radix_scatter(keys2, vals2, tabs, nbits: int,
                  tile_rows: int, chunk_rows: int, total_rows: int,
                  mask_bits=None, interpret: bool = False):
    """Sort tiles and DMA bucket runs to their regions.

    keys2/vals2: row-major [R, 128] int32 (payload bitcast to int32).
    tabs: [NT*B, 128] int32 — row t*B+b lanes 0..2 = (dst_rows,
    local_start, run_rows) for (tile t, bucket b); dynamic per-bucket
    scalar reads must index the SUBLANE dim (Mosaic cannot prove dynamic
    lane offsets aligned).
    Returns (keys_out, vals_out) [total_rows, 128]; region-alignment pad
    rows keep the SENTINEL prefill.
    """
    R = keys2.shape[0]
    nt = R // tile_rows
    B = 1 << nbits
    kinit = jnp.full((total_rows, LANES), SENTINEL, jnp.int32)
    vinit = jnp.zeros((total_rows, LANES), jnp.int32)
    blk = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec((B, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    nsem = min(B, 128)

    kern = partial(_partition_kernel, B, tile_rows, chunk_rows, mask_bits)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=[tabspec, blk, blk, anyspec, anyspec],
            out_specs=[anyspec, anyspec],
            scratch_shapes=[
                pltpu.VMEM((tile_rows, LANES), jnp.int32),
                pltpu.VMEM((tile_rows, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((nsem,)),
            ],
            out_shape=[jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
                       jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32)],
            input_output_aliases={3: 0, 4: 1},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(tabs, keys2, vals2, kinit, vinit)


# ----------------------------------------------------------------------
# Phase C: bucket-windowed outer-product aggregation
# ----------------------------------------------------------------------

def _agg_kernel(shift, agg_rows,
                step_tab_ref,                             # scalar prefetch
                keys_ref, vals_ref, out_ref):
    s = pl.program_id(0)

    @pl.when((step_tab_ref[s] >> 16) == 1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    bucket = step_tab_ref[s] & 0xFFFF
    base = bucket << shift
    # classes on the SUBLANE axis (no per-row lane->sublane relayout)
    hi_classes = jax.lax.broadcasted_iota(jnp.int32, (HI, LANES), 0)
    lo_classes = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    # Exact-f32 sums on the bf16 MXU: split v into three bf16 terms
    # (8-bit mantissas cover f32's 24); multiplying a ONE-HOT by a bf16
    # term is exact, and accumulation is f32.  RB rows batch into ONE
    # [4*HI, RB*128] @ [RB*128, lo] contraction (sum of per-row outer
    # products = concat along the contraction dim) — the K-dim batching
    # that keeps the MXU fed (single-row matmuls measured 2.5x slower).
    RB = 8
    def body(i, acc):
        a_parts, b_parts = [], []
        for k in range(RB):
            r = i * RB + k
            local = keys_ref[r, :] - base                 # window-relative
            hi = local >> 7
            lo = local & 127
            in_win = (local >= 0) & (local < SPAN)
            hi = jnp.where(in_win, hi, -1)
            vrow = jax.lax.bitcast_convert_type(vals_ref[r, :], jnp.float32)
            v1 = vrow.astype(jnp.bfloat16)
            r1 = vrow - v1.astype(jnp.float32)
            v2 = r1.astype(jnp.bfloat16)
            v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
            oh_hi = (hi_classes == hi[None, :]).astype(jnp.bfloat16)
            oh_lo = (lo_classes == lo[None, :]).astype(jnp.bfloat16)
            a_parts.append(jnp.concatenate(
                [oh_hi * v1[None, :], oh_hi * v2[None, :],
                 oh_hi * v3[None, :], oh_hi], axis=0))     # [4*HI, 128]
            b_parts.append(oh_lo)                          # [lo, 128]
        a = jnp.concatenate(a_parts, axis=1)               # [4*HI, RB*128]
        b = jnp.concatenate(b_parts, axis=1)               # [lo, RB*128]
        return acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, agg_rows // RB, body,
                            jnp.zeros((4 * HI, LANES), jnp.float32))
    sums = acc[:HI] + acc[HI:2 * HI] + acc[2 * HI:3 * HI]
    out_ref[0] += jnp.concatenate([sums, acc[3 * HI:]], axis=0)


@partial(jax.jit, static_argnames=("num_windows", "shift", "agg_rows",
                                   "interpret"))
def bucket_aggregate(pkeys, pvals, step_tab, num_windows: int, shift: int,
                     agg_rows: int, interpret: bool = False):
    """sum/count per key over partitioned rows.

    pkeys/pvals: [total_rows, 128] from radix_scatter (vals = f32 bits).
    step_tab: [S] int32 per-grid-step (first_flag << 16) | window_id.
    Returns acc[G, 2*HI, 128]: acc[g, :HI] = sums, acc[g, HI:] = counts,
    laid out so key = (g << shift) + hi * 128 + lo.
    """
    total_rows = pkeys.shape[0]
    S = total_rows // agg_rows
    B = num_windows
    blk = pl.BlockSpec((agg_rows, LANES), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)

    def out_map(i, step_tab_ref):
        return (step_tab_ref[i] & 0xFFFF, 0, 0)

    ospec = pl.BlockSpec((1, 2 * HI, LANES), out_map, memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_agg_kernel, shift, agg_rows),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S,),
                in_specs=[blk, blk],
                out_specs=ospec,
            ),
            out_shape=jax.ShapeDtypeStruct((B, 2 * HI, LANES), jnp.float32),
            interpret=interpret,
        )(step_tab, pkeys, pvals)


# ----------------------------------------------------------------------
# device-side layout: avoids shipping [NT, B] tables over the host link.
# The only host sync in the pipeline is the total_rows scalar — the same
# single count-then-allocate sync the reference's two-phase joins make
# (inner_join_size.cu).
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_regions", "tile_rows", "chunk_rows",
                                   "region_align_rows"))
def layout_device(hist, region_of_tile, n_regions: int, tile_rows: int,
                  chunk_rows: int, region_align_rows: int):
    """jnp layout: (tabs[NT*B,128], bucket_base[n_regions*B+1]).

    region_of_tile[NT] assigns each tile to a first-pass region; the
    global window id of (tile t, digit b) is region(t)*B + b.  Pass 1
    uses region_of_tile = zeros (one region).
    """
    nt, B = hist.shape
    tile_elems = tile_rows * LANES
    n_sent = tile_elems - hist.sum(axis=1)
    local_end = jnp.cumsum(hist, axis=1) + n_sent[:, None]
    local_start = local_end - hist
    first_row = local_start // LANES
    last_row = (local_end - 1) // LANES + 1
    # empty runs ship nothing; nonempty runs need >= chunk_rows of room
    # for the clamped final DMA chunk to back into
    w = jnp.where(hist > 0,
                  jnp.maximum(last_row - first_row, chunk_rows), 0)
    totals = jax.ops.segment_sum(w, region_of_tile,
                                 num_segments=n_regions)        # [R, B]
    flat = totals.reshape(n_regions * B)
    aligned = (-(-flat // region_align_rows)) * region_align_rows
    bucket_base = jnp.concatenate(
        [jnp.zeros((1,), aligned.dtype), jnp.cumsum(aligned)])
    cs = jnp.cumsum(w, axis=0) - w                  # exclusive over tiles
    first_tile = jnp.searchsorted(region_of_tile,
                                  jnp.arange(n_regions), side="left")
    corr = cs[first_tile[region_of_tile], :]        # prefix at region start
    g = region_of_tile[:, None] * B + jnp.arange(B)[None, :]
    dst = bucket_base[g] + (cs - corr)
    tabs = jnp.zeros((nt, B, 128), jnp.int32)
    tabs = tabs.at[:, :, 0].set(dst.astype(jnp.int32))
    tabs = tabs.at[:, :, 1].set(local_start.astype(jnp.int32))
    tabs = tabs.at[:, :, 2].set(w.astype(jnp.int32))
    return tabs.reshape(nt * B, 128), bucket_base.astype(jnp.int32)


@partial(jax.jit, static_argnames=("total_rows", "agg_rows"))
def step_table_device(bucket_base, total_rows: int, agg_rows: int):
    """[S] int32 (first_flag << 16) | bucket_id for the aggregation grid."""
    S = total_rows // agg_rows
    starts = bucket_base[:-1] // agg_rows
    s = jnp.arange(S, dtype=jnp.int32)
    bucket = jnp.searchsorted(bucket_base[1:] // agg_rows, s,
                              side="right").astype(jnp.int32)
    first = (s == starts[jnp.clip(bucket, 0, bucket_base.shape[0] - 2)])
    return (first.astype(jnp.int32) << 16) | bucket


# ----------------------------------------------------------------------
# multi-pass partition driver
# ----------------------------------------------------------------------

WINDOW_BITS = 13  # SPAN = 1 << WINDOW_BITS


def _prep_rows(keys, vals, tile_rows):
    n = keys.shape[0]
    tile_elems = tile_rows * LANES
    nt = -(-n // tile_elems)
    pad = nt * tile_elems - n
    keys = keys.astype(jnp.int32)
    vbits = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.int32) \
        if vals.dtype != jnp.int32 else vals
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), SENTINEL, jnp.int32)])
        vbits = jnp.concatenate([vbits, jnp.zeros((pad,), jnp.int32)])
    return (keys.reshape(nt * tile_rows, LANES),
            vbits.reshape(nt * tile_rows, LANES), nt)


def radix_partition(keys, vals, domain_bits: int, tile_rows: int = 512,
                    chunk_rows: int = 4, align_rows: int = 128,
                    interpret: bool = False):
    """Partition rows into SPAN-sized key windows: one pass for domains up
    to 20 bits, two for up to 27 (cub runs one pass per digit the same
    way, sort_radix.cu).  Returns (pkeys[R,128], pvals[R,128],
    window_base_rows[G+1], G) with G = ceil(domain / SPAN) windows; rows
    between runs hold out-of-window keys (run-edge garbage or SENTINEL).
    """
    assert domain_bits <= 2 * 7 + WINDOW_BITS, domain_bits
    keys2, vbits2, nt = _prep_rows(keys, vals, tile_rows)
    zeros = jnp.zeros((nt,), jnp.int32)
    if domain_bits <= WINDOW_BITS + 7:
        nbits = max(domain_bits - WINDOW_BITS, 1)
        hist = digit_histogram(keys2, nbits, WINDOW_BITS, tile_rows,
                               interpret=interpret)
        tabs, base = layout_device(hist, zeros, 1, tile_rows, chunk_rows,
                                   align_rows)
        total_rows = int(base[-1])           # the single host sync
        pk, pv = radix_scatter(keys2, vbits2, tabs, nbits, tile_rows,
                               chunk_rows, total_rows, interpret=interpret)
        return pk, pv, base, 1 << nbits
    # two passes
    nbits1 = domain_bits - WINDOW_BITS - 7
    hist1 = digit_histogram(keys2, nbits1, WINDOW_BITS + 7, tile_rows,
                            interpret=interpret)
    tabs1, base1 = layout_device(hist1, zeros, 1, tile_rows, chunk_rows,
                                 tile_rows)   # regions tile-aligned
    rows1 = int(base1[-1])
    pk1, pv1 = radix_scatter(keys2, vbits2, tabs1, nbits1, tile_rows,
                             chunk_rows, rows1, interpret=interpret)
    nt2 = rows1 // tile_rows
    region_of_tile = (jnp.searchsorted(
        base1[1:], jnp.arange(nt2) * tile_rows, side="right")
        .astype(jnp.int32))
    hist2 = digit_histogram(pk1, 7, WINDOW_BITS, tile_rows,
                            interpret=interpret)
    tabs2, base2 = layout_device(hist2, region_of_tile, 1 << nbits1,
                                 tile_rows, chunk_rows, align_rows)
    rows2 = int(base2[-1])
    pk, pv = radix_scatter(pk1, pv1, tabs2, 7, tile_rows, chunk_rows,
                           rows2, mask_bits=WINDOW_BITS + 7,
                           interpret=interpret)
    return pk, pv, base2, 1 << (nbits1 + 7)


# ----------------------------------------------------------------------
# end-to-end dense-key groupby
# ----------------------------------------------------------------------

def radix_groupby_sum_count(keys, vals, num_keys: int,
                            tile_rows: int = 512,
                            chunk_rows: int = 4, agg_rows: int = 128,
                            interpret: bool = False):
    """sums[num_keys] f32, counts[num_keys] int32 for dense int32 keys.

    keys in [0, num_keys), num_keys <= 2**27.  Domains within one window
    (8192) aggregate directly with no partition pass; one partition pass
    to 2**20; two beyond.  One host sync per pass (the count-then-
    allocate shape of the reference, inner_join_size.cu).
    """
    n = keys.shape[0]
    domain_bits = max(int(np.ceil(np.log2(max(num_keys, 2)))), 1)
    if domain_bits <= WINDOW_BITS:
        # single window: aggregate the raw stream (pad rows to the grid)
        keys2, vbits2, nt = _prep_rows(keys, vals, agg_rows)
        S = keys2.shape[0] // agg_rows
        step_tab = (jnp.arange(S, dtype=jnp.int32) == 0).astype(jnp.int32) << 16
        acc = bucket_aggregate(keys2, vbits2, step_tab, 1, WINDOW_BITS,
                               agg_rows, interpret=interpret)
        G = 1
    else:
        pk, pv, base, G = radix_partition(keys, vals, domain_bits,
                                          tile_rows, chunk_rows, agg_rows,
                                          interpret=interpret)
        total_rows = int(base[-1])
        step_tab = step_table_device(base, total_rows, agg_rows)
        acc = bucket_aggregate(pk, pv, step_tab, G, WINDOW_BITS,
                               agg_rows, interpret=interpret)
    sums = acc[:, :HI, :].reshape(G << WINDOW_BITS)[:num_keys]
    cnts = (acc[:, HI:, :].reshape(G << WINDOW_BITS)[:num_keys]
            .astype(jnp.int32))
    return sums, cnts


# ----------------------------------------------------------------------
# Join probe: window tables + matmul lookup
# ----------------------------------------------------------------------

def _probe_kernel(shift, agg_rows,
                  step_tab_ref,                            # scalar prefetch
                  keys_ref, vals_ref, tab_ref,             # VMEM blocks
                  oval_ref, ofnd_ref):
    bucket = step_tab_ref[pl.program_id(0)] & 0xFFFF
    base = bucket << shift
    hi_classes = jax.lax.broadcasted_iota(jnp.int32, (HI, LANES), 0)
    lo_classes = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    # the window table, split into exact bf16 terms once per step
    t_val = tab_ref[0, :HI, :]
    t_cnt = tab_ref[0, HI:, :]
    tv1 = t_val.astype(jnp.bfloat16)
    r1 = t_val - tv1.astype(jnp.float32)
    tv2 = r1.astype(jnp.bfloat16)
    tv3 = (r1 - tv2.astype(jnp.float32)).astype(jnp.bfloat16)
    tc1 = t_cnt.astype(jnp.bfloat16)  # counts < 2^8 exact; larger only
    # feed the >0 test so bf16 rounding is harmless

    def body(r, _):
        local = keys_ref[r, :] - base
        hi = local >> 7
        lo = local & 127
        in_win = (local >= 0) & (local < SPAN)
        hi = jnp.where(in_win, hi, -1)
        oh_hi = (hi_classes == hi[None, :]).astype(jnp.bfloat16)  # [HI, p]
        oh_lo = (lo_classes == lo[None, :]).astype(jnp.bfloat16)  # [lo, p]
        # u[lo, p] = sum_hi T[hi, lo] * oh_hi[hi, p]  (matmul lookup)
        def tmm(t):
            return jax.lax.dot_general(
                t, oh_hi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        u_val = tmm(tv1) + tmm(tv2) + tmm(tv3)
        u_cnt = tmm(tc1)
        val = jnp.sum(oh_lo.astype(jnp.float32) * u_val, axis=0)
        cnt = jnp.sum(oh_lo.astype(jnp.float32) * u_cnt, axis=0)
        found = (cnt > 0) & in_win
        oval_ref[r, :] = jnp.where(found, val, 0.0)
        ofnd_ref[r, :] = found.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, agg_rows, body, 0)


@partial(jax.jit, static_argnames=("shift", "agg_rows", "interpret"))
def window_probe(pkeys, pvals, tables, step_tab, shift: int, agg_rows: int,
                 interpret: bool = False):
    """Probe partitioned rows against per-window build tables.

    pkeys/pvals: probe side from radix_partition; tables: [G, 2*HI, 128]
    from bucket_aggregate over the build side (unique build keys: sums
    ARE the payload, counts the membership).  Returns (matched_val f32,
    found int32) aligned with the probe rows — the cuco probe of
    hash_join.cu:123-125 as MXU lookups.
    """
    total_rows = pkeys.shape[0]
    S = total_rows // agg_rows
    blk = pl.BlockSpec((agg_rows, LANES), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)

    def tab_map(i, step_tab_ref):
        return (step_tab_ref[i] & 0xFFFF, 0, 0)

    tabspec = pl.BlockSpec((1, 2 * HI, LANES), tab_map,
                           memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_probe_kernel, shift, agg_rows),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S,),
                in_specs=[blk, blk, tabspec],
                out_specs=[blk, blk],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(step_tab, pkeys, pvals, tables)


def radix_join_inner_unique(lk, lv, rk, rv, key_domain: int,
                            tile_rows: int = 512, chunk_rows: int = 4,
                            agg_rows: int = 128, interpret: bool = False):
    """Inner join with a unique-key build side (db-benchmark J1 shape).

    Partitions both sides into SPAN windows, builds per-window dense
    tables from the build side (one outer-product aggregation), then
    probes with MXU matmul lookups.  Returns (probe_keys, probe_vals,
    matched_build_vals, found) in partitioned row order ([R, 128] planes;
    out-of-window rows have found = 0).
    """
    domain_bits = max(int(np.ceil(np.log2(max(key_domain, 2)))), 1)
    if domain_bits <= WINDOW_BITS:
        # single window (db-benchmark small/medium dim tables): neither
        # side needs a partition pass — build one dense table, stream the
        # probe rows straight through the MXU lookup
        rk2, rv2, _ = _prep_rows(rk, rv, agg_rows)
        S_r = rk2.shape[0] // agg_rows
        step_r = (jnp.arange(S_r, dtype=jnp.int32) == 0).astype(jnp.int32) << 16
        tables = bucket_aggregate(rk2, rv2, step_r, 1, WINDOW_BITS,
                                  agg_rows, interpret=interpret)
        lk2, lv2, _ = _prep_rows(lk, lv, agg_rows)
        S_l = lk2.shape[0] // agg_rows
        step_l = jnp.zeros((S_l,), jnp.int32)
        mval, found = window_probe(lk2, lv2, tables, step_l, WINDOW_BITS,
                                   agg_rows, interpret=interpret)
        return lk2, lv2, mval, found
    pkr, pvr, base_r, G = radix_partition(rk, rv, domain_bits, tile_rows,
                                          chunk_rows, agg_rows,
                                          interpret=interpret)
    rows_r = int(base_r[-1])
    step_r = step_table_device(base_r, rows_r, agg_rows)
    tables = bucket_aggregate(pkr, pvr, step_r, G, WINDOW_BITS, agg_rows,
                              interpret=interpret)
    pkl, pvl, base_l, G2 = radix_partition(lk, lv, domain_bits, tile_rows,
                                           chunk_rows, agg_rows,
                                           interpret=interpret)
    assert G2 == G
    rows_l = int(base_l[-1])
    step_l = step_table_device(base_l, rows_l, agg_rows)
    mval, found = window_probe(pkl, pvl, tables, step_l, WINDOW_BITS,
                               agg_rows, interpret=interpret)
    return pkl, pvl, mval, found
