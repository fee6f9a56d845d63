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
    classes = jax.lax.broadcasted_iota(jnp.int32, (LANES, B), 1)
    ones = jnp.ones((1, LANES), jnp.float32)

    # rolled loop (an unrolled one keeps every iteration's one-hot live in
    # scoped VMEM and blows the 16M limit); dynamic sublane row reads
    def body(r, acc):
        digits = (keys_ref[r, :] >> shift).astype(jnp.int32)
        onehot = (classes == digits[:, None]).astype(jnp.float32)
        return acc + jnp.dot(ones, onehot, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, tr, body, jnp.zeros((1, B), jnp.float32))
    # Mosaic block constraint: sublane dim of a block must be a multiple
    # of 8 — emit the row replicated across an 8-row block
    out_ref[...] = jnp.broadcast_to(acc.astype(jnp.int32), out_ref.shape)


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

def _partition_kernel(B, tile_rows, chunk_rows,
                      tabs_ref,                           # [B, 128] VMEM block
                      keys_ref, vals_ref,                 # VMEM blocks
                      kinit_ref, vinit_ref,               # aliased (unused)
                      kout_ref, vout_ref,                 # HBM outputs
                      ksc_ref, vsc_ref, sems):            # scratch
    ks, vs = bitonic_sort(keys_ref[...], [vals_ref[...]])
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
                          "interpret"))
def radix_scatter(keys2, vals2, tabs, nbits: int,
                  tile_rows: int, chunk_rows: int, total_rows: int,
                  interpret: bool = False):
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

    kern = partial(_partition_kernel, B, tile_rows, chunk_rows)

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
    hi_classes = jax.lax.broadcasted_iota(jnp.int32, (LANES, HI), 1)
    lo_classes = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)

    # rolled loop with per-row REF reads (dynamic slicing of computed
    # values is not lowerable; dynamic sublane ref reads are)
    def body(r, acc):
        local = keys_ref[r, :] - base                     # window-relative
        hi = local >> 7
        lo = local & 127
        in_win = (local >= 0) & (local < SPAN)
        hi = jnp.where(in_win, hi, -1)
        vrow = jax.lax.bitcast_convert_type(vals_ref[r, :], jnp.float32)
        oh_hi = (hi_classes == hi[:, None]).astype(jnp.float32)
        oh_lo = (lo_classes == lo[:, None]).astype(jnp.float32)
        a = jnp.concatenate([oh_hi * vrow[:, None], oh_hi], axis=1)
        # HIGHEST: TPU f32 matmul otherwise runs a bf16-passes scheme and
        # loses value-sum precision
        return acc + jax.lax.dot_general(
            a, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    acc = jax.lax.fori_loop(0, agg_rows, body,
                            jnp.zeros((2 * HI, LANES), jnp.float32))
    out_ref[0] += acc


@partial(jax.jit, static_argnames=("nbits", "shift", "agg_rows", "interpret"))
def bucket_aggregate(pkeys, pvals, step_tab, nbits: int, shift: int,
                     agg_rows: int, interpret: bool = False):
    """sum/count per key over partitioned rows.

    pkeys/pvals: [total_rows, 128] from radix_scatter (vals = f32 bits).
    step_tab: [S] int32 per-grid-step (first_flag << 16) | bucket_id.
    Returns acc[B, 2*HI, 128]: acc[b, :HI] = sums, acc[b, HI:] = counts,
    laid out so key = (b << shift) + hi * 128 + lo.
    """
    total_rows = pkeys.shape[0]
    S = total_rows // agg_rows
    B = 1 << nbits
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
# end-to-end dense-key groupby
# ----------------------------------------------------------------------

def radix_groupby_sum_count(keys, vals, num_keys: int,
                            tile_rows: int = 512, nbits: int = 7,
                            chunk_rows: int = 4, agg_rows: int = 128,
                            interpret: bool = False):
    """sums[num_keys] f32, counts[num_keys] int32 for dense int32 keys.

    keys in [0, num_keys), num_keys <= (1 << nbits) * SPAN (one pass =
    2^20 at nbits=7); larger domains need a second partition pass
    (planned).  Histogram/layout sync once per call (the two-phase
    count-then-retrieve shape of the reference, inner_join_size.cu).
    """
    n = keys.shape[0]
    B = 1 << nbits
    shift = 13  # SPAN window
    assert num_keys <= B << shift, (num_keys, B << shift)
    tile_elems = tile_rows * LANES
    nt = -(-n // tile_elems)
    pad = nt * tile_elems - n
    keys = keys.astype(jnp.int32)
    vbits = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.int32)
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), SENTINEL, jnp.int32)])
        vbits = jnp.concatenate([vbits, jnp.zeros((pad,), jnp.int32)])
    keys2 = keys.reshape(nt * tile_rows, LANES)
    vbits2 = vbits.reshape(nt * tile_rows, LANES)

    hist = np.asarray(digit_histogram(keys2, nbits, shift, tile_rows,
                                      interpret=interpret))
    dst, lstart, wrows, bucket_base, total_rows = partition_layout(
        hist, tile_rows, chunk_rows, agg_rows)
    tabs_np = np.zeros((nt, B, 128), np.int32)
    tabs_np[:, :, 0], tabs_np[:, :, 1], tabs_np[:, :, 2] = dst, lstart, wrows
    tabs = jnp.asarray(tabs_np.reshape(nt * B, 128))
    pk, pv = radix_scatter(keys2, vbits2, tabs, nbits, tile_rows,
                           chunk_rows, total_rows, interpret=interpret)
    steps_per_bucket = (bucket_base[1:].astype(np.int64)
                        - bucket_base[:-1]) // agg_rows
    bucket_of = np.repeat(np.arange(B, dtype=np.int32), steps_per_bucket)
    first = np.zeros_like(bucket_of)
    starts = np.concatenate([[0], np.cumsum(steps_per_bucket)[:-1]])
    first[starts[steps_per_bucket > 0]] = 1
    step_tab = jnp.asarray(((first << 16) | bucket_of).astype(np.int32))
    acc = bucket_aggregate(pk, pv, step_tab, nbits, shift, agg_rows,
                           interpret=interpret)
    sums = acc[:, :HI, :].reshape(B << shift)[:num_keys]
    cnts = acc[:, HI:, :].reshape(B << shift)[:num_keys].astype(jnp.int32)
    return sums, cnts
