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

from cudf_tpu.kernels.bitonic import (bitonic_merge, bitonic_sort,
                                      tile_sort_data)

LANES = 128
HI = 64                      # hi channels per window: span = HI * LANES
SPAN = HI * LANES            # 8192 keys per bucket window
SENTINEL = np.int32(-0x80000000)  # pad key: negative digit, outside windows


# ----------------------------------------------------------------------
# Phase A: per-tile digit histogram
# ----------------------------------------------------------------------

def _hist_kernel(nbits, shift, keys_ref, out_ref):
    B = 1 << nbits
    tr = keys_ref.shape[1]
    # classes on the SUBLANE axis: comparing a [1, 128] row against
    # [B, 128] classes broadcasts without any per-row lane->sublane
    # relayout (krow[:, None] transposes and was 25x slower); per-class
    # counts stay lane-resolved in the accumulator and reduce once at
    # the end.
    classes = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 0)

    def body(i, acc):
        r = i * 8
        for k in range(8):  # 8 rows per iteration amortize loop overhead
            digits = (keys_ref[0, r + k, :] >> shift).astype(jnp.int32)
            d = jnp.where(digits >= 0, digits & (B - 1), -1)
            acc = acc + (classes == d[None, :]).astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, tr // 8, body,
                            jnp.zeros((B, LANES), jnp.float32))
    counts = jnp.sum(acc, axis=1, keepdims=True).astype(jnp.int32)  # [B, 1]
    out_ref[...] = jnp.broadcast_to(counts.T, out_ref.shape)


@partial(jax.jit, static_argnames=("nbits", "shift", "tile_rows", "interpret"))
def digit_histogram(data, nbits: int, shift: int, tile_rows: int,
                    interpret: bool = False):
    """hist[NT, B] over plane-interleaved rows data[P, R, 128] (keys at
    plane 0; only key blocks are read); pad rows hold SENTINEL."""
    R = data.shape[1]
    nt = R // tile_rows
    B = 1 << nbits
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_hist_kernel, nbits, shift),
            grid=(nt,),
            in_specs=[pl.BlockSpec((1, tile_rows, LANES),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, B), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt * 8, B), jnp.int32),
            interpret=interpret,
        )(data)[::8]


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

def _scatter_runs(tabs_ref, sc_ref, out_ref, sems, B, tile_rows,
                  chunk_rows):
    """Issue+wait the per-bucket run DMAs from the sorted scratch.

    sc_ref/out_ref are plane-interleaved [P, rows, 128]: ONE DMA
    descriptor per chunk moves every plane (keys + payloads) — the
    descriptor-issue count, which dominates the scatter phase, no longer
    scales with the payload width."""
    def chunk_copy(b, c, rows):
        w = tabs_ref[b, 2]
        src0 = tabs_ref[b, 1] // LANES
        off = jnp.minimum(c * rows, w - rows)
        src = jnp.clip(src0 + off, 0, tile_rows - rows)
        dst = tabs_ref[b, 0] + off
        return pltpu.make_async_copy(
            sc_ref.at[:, pl.ds(src, rows), :],
            out_ref.at[:, pl.ds(dst, rows), :],
            sems.at[b % sems.shape[0]],
        )

    # three-tier chunk cascade: runs pick the largest chunk size that
    # fits (4x / 2x / 1x chunk_rows) and ship ceil(w/size) DMAs, the last
    # one clamped back into the run.  The modal run width is
    # supertile_elems / B ≈ 16 rows (tightly concentrated — binomial),
    # so the 4x tier covers it in ONE descriptor where the old two-tier
    # cascade needed two: descriptor-issue count, not bandwidth, is what
    # dominates the scatter phase.  Clamped chunks overlap inside the
    # run's own region; src and dst shift together so overlapping writes
    # carry identical rows.
    big = 2 * chunk_rows
    huge = 4 * chunk_rows

    def per_bucket(start: bool):
        def body(b, _):
            w = tabs_ref[b, 2]
            n_huge = jnp.where(
                w >= huge,
                w // huge + ((w % huge) != 0).astype(jnp.int32), 0)
            n_big = jnp.where(
                (w >= big) & (w < huge),
                w // big + ((w % big) != 0).astype(jnp.int32), 0)
            n_small = jnp.where(
                (w > 0) & (w < big),
                1 + (w > chunk_rows).astype(jnp.int32), 0)

            def chunk_h(c, _):
                cp = chunk_copy(b, c, huge)
                (cp.start() if start else cp.wait())
                return 0

            def chunk_b(c, _):
                cp = chunk_copy(b, c, big)
                (cp.start() if start else cp.wait())
                return 0

            def chunk_s(c, _):
                cp = chunk_copy(b, c, chunk_rows)
                (cp.start() if start else cp.wait())
                return 0

            jax.lax.fori_loop(0, n_huge, chunk_h, 0)
            jax.lax.fori_loop(0, n_big, chunk_b, 0)
            jax.lax.fori_loop(0, n_small, chunk_s, 0)
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    per_bucket(start=True)
    per_bucket(start=False)


def _partition_kernel(B, tile_rows, chunk_rows, mask_bits, P,
                      tabs_ref, data_ref, init_ref, out_ref, sc_ref, sems):
    keys = data_ref[0]
    vals = [data_ref[j] for j in range(1, P)]
    if mask_bits is None:
        res = bitonic_sort(keys, vals)
    else:
        # later passes sort by the LOW bits only (the tile sits inside one
        # first-pass region, whose keys share their top bits; run-edge
        # garbage sorts by its own low bits and stays out-of-window)
        sk = jnp.where(keys >= 0, keys & ((1 << mask_bits) - 1),
                       jnp.int32(SENTINEL))
        res = bitonic_sort(sk, [keys] + vals)[1:]
    for j in range(P):
        sc_ref[j] = res[j]
    _scatter_runs(tabs_ref, sc_ref, out_ref, sems, B, tile_rows,
                  chunk_rows)


def _merge_partition_kernel(B, super_rows, tile_rows, chunk_rows,
                            mask_bits, P,
                            tabs_ref, data_ref, init_ref, out_ref,
                            sc_ref, sems):
    """Merge direction-alternated sorted tiles into one sorted supertile
    (log n bitonic-merge stages per level — the full supertile sort
    exceeds Mosaic's compilable program size) and scatter its runs.
    Wider supertiles mean proportionally fewer, longer runs: the DMA
    descriptor-issue cost that dominates the scatter phase drops by the
    merge factor."""
    keys = data_ref[0]
    vals = [data_ref[j] for j in range(1, P)]
    if mask_bits is None:
        arrays = [keys] + vals
        drop_sk = False
    else:
        sk = jnp.where(keys >= 0, keys & ((1 << mask_bits) - 1),
                       jnp.int32(SENTINEL))
        arrays = [sk, keys] + vals
        drop_sk = True
    M = super_rows // tile_rows
    logm = M.bit_length() - 1
    for level in range(1, logm + 1):
        seg = (1 << level) * tile_rows
        nseg = M >> level
        outs = []
        for s in range(nseg):
            segs = [a[s * seg:(s + 1) * seg] for a in arrays]
            asc = True if level == logm else (s % 2 == 0)
            outs.append(bitonic_merge(segs[0], segs[1:], ascending=asc))
        arrays = [jnp.concatenate([o[i] for o in outs], axis=0)
                  for i in range(len(arrays))]
    res = arrays[1:] if drop_sk else arrays
    for j in range(P):
        sc_ref[j] = res[j]
    _scatter_runs(tabs_ref, sc_ref, out_ref, sems, B, super_rows,
                  chunk_rows)


def _scatter_init(P, total_rows):
    """Plane-interleaved output prefill: SENTINEL keys (self-identifying
    out-of-window garbage for every consumer), zero payloads."""
    return jnp.concatenate(
        [jnp.full((1, total_rows, LANES), SENTINEL, jnp.int32),
         jnp.zeros((P - 1, total_rows, LANES), jnp.int32)], axis=0)


@partial(jax.jit,
         static_argnames=("nbits", "super_rows", "tile_rows", "chunk_rows",
                          "total_rows", "mask_bits", "interpret"))
def merge_scatter(data, tabs, nbits: int, super_rows: int,
                  tile_rows: int, chunk_rows: int, total_rows: int,
                  mask_bits=None, interpret: bool = False):
    """Scatter from supertiles of pre-sorted, direction-alternated tiles
    (tile_sort_data(alternate=True)).  Same contract as radix_scatter
    with layout tables computed at super_rows granularity."""
    P, R, _ = data.shape
    nt = R // super_rows
    B = 1 << nbits
    blk = pl.BlockSpec((P, super_rows, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec((B, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    nsem = min(B, 128)
    kern = partial(_merge_partition_kernel, B, super_rows, tile_rows,
                   chunk_rows, mask_bits, P)
    # merge factor >= 4 materializes full-supertile merge intermediates on
    # the Mosaic stack and blows the default 16MiB scoped-vmem cap
    # (measured: 27.9MiB at [2048, 128]); v5e cores carry 128MiB VMEM, so
    # raise the cap for wide supertiles only.
    vmem_cap = (96 * 1024 * 1024
                if super_rows // tile_rows >= 4 else None)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=[tabspec, blk, anyspec],
            out_specs=anyspec,
            scratch_shapes=[
                pltpu.VMEM((P, super_rows, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((nsem,)),
            ],
            out_shape=jax.ShapeDtypeStruct((P, total_rows, LANES),
                                           jnp.int32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=vmem_cap),
            interpret=interpret,
        )(tabs, data, _scatter_init(P, total_rows))


@partial(jax.jit,
         static_argnames=("nbits", "tile_rows", "chunk_rows", "total_rows",
                          "mask_bits", "interpret"))
def radix_scatter(data, tabs, nbits: int,
                  tile_rows: int, chunk_rows: int, total_rows: int,
                  mask_bits=None, interpret: bool = False):
    """Sort tiles and DMA bucket runs to their regions.

    data: plane-interleaved [P, R, 128] int32 — keys at plane 0, payload
    planes (bitcast to int32) following; the whole plane stack travels
    through the tile sort and ships in the run DMAs (one descriptor per
    chunk covers every plane).
    tabs: [NT*B, 128] int32 — row t*B+b lanes 0..2 = (dst_rows,
    local_start, run_rows) for (tile t, bucket b); dynamic per-bucket
    scalar reads must index the SUBLANE dim (Mosaic cannot prove dynamic
    lane offsets aligned).
    Returns data_out [P, total_rows, 128]; region-alignment pad rows keep
    the SENTINEL prefill on the key plane.
    """
    P, R, _ = data.shape
    nt = R // tile_rows
    B = 1 << nbits
    blk = pl.BlockSpec((P, tile_rows, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec((B, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    nsem = min(B, 128)

    kern = partial(_partition_kernel, B, tile_rows, chunk_rows, mask_bits, P)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=[tabspec, blk, anyspec],
            out_specs=anyspec,
            scratch_shapes=[
                pltpu.VMEM((P, tile_rows, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((nsem,)),
            ],
            out_shape=jax.ShapeDtypeStruct((P, total_rows, LANES),
                                           jnp.int32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(tabs, data, _scatter_init(P, total_rows))


# ----------------------------------------------------------------------
# Phase C: bucket-windowed outer-product aggregation
# ----------------------------------------------------------------------

def _dd_block_update(out_ref, x, PH):
    """out_ref[0, :PH] (hi) / out_ref[0, PH:] (lo) += x as double-float
    pairs: branch-free TwoSum then Fast2Sum renormalisation so |lo| stays
    <= ulp(hi)/2.  With integer inputs within range every operation is
    exact (see kernels/hash_aggregate.py for the argument)."""
    hi = out_ref[0, :PH, :]
    lo = out_ref[0, PH:, :]
    s = hi + x
    t = s - hi
    e = (hi - (s - t)) + (x - t)
    u = lo + e
    hi2 = s + u
    out_ref[0, :PH, :] = hi2
    out_ref[0, PH:, :] = u - (hi2 - s)


_MODE_PLANES = {"float": 4, "int": 5, "id": 5, "idpay": 8}


def _agg_kernel(shift, agg_rows, mode,
                step_tab_ref,                             # scalar prefetch
                data_ref, out_ref):
    # data_ref: plane-interleaved block [planes, agg_rows, 128] — keys at
    # plane 0, values at 1, idpay payload at 2
    keys_ref = data_ref.at[0]
    vals_ref = data_ref.at[1]
    pay_ref = data_ref.at[2] if mode == "idpay" else None
    s = pl.program_id(0)
    P = _MODE_PLANES[mode]

    @pl.when((step_tab_ref[s] >> 16) == 1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    bucket = step_tab_ref[s] & 0xFFFF
    base = bucket << shift
    # classes on the SUBLANE axis (no per-row lane->sublane relayout)
    hi_classes = jax.lax.broadcasted_iota(jnp.int32, (HI, LANES), 0)
    lo_classes = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    # Exact sums on the bf16 MXU (the TPU's default f32 matmul truncates
    # operands to bf16 — measured on hardware — so EVERY matmul plane is
    # constructed to be exact in bf16).  float mode: split v into three
    # bf16 terms (8-bit mantissas cover f32's 24); one-hot products are
    # exact and accumulation is f32.  int mode: four signed 8-bit
    # magnitude chunks; per-step f32 accumulation stays below 2^24
    # (16K rows x 255), so the step result is an exact integer.  id mode
    # (join builds): vals hold build_row_id+1 <= 2^27 as four unsigned
    # 8-bit chunk planes — cells receive at most one contribution when
    # the build is unique, so plain f32 accumulation is exact and no
    # double-float pair is kept; idpay adds a 3-term bf16 split of a
    # build payload.  RB rows batch into ONE [P*HI, RB*128] @ [RB*128,
    # lo] contraction (sum of per-row outer products = concat along the
    # contraction dim) — the K-dim batching that keeps the MXU fed
    # (single-row matmuls measured 2.5x slower).
    RB = 8
    el = jnp.bfloat16

    def body(i, acc):
        a_parts, b_parts = [], []
        for k in range(RB):
            r = i * RB + k
            local = keys_ref[r, :] - base                 # window-relative
            hi = local >> 7
            lo = local & 127
            in_win = (local >= 0) & (local < SPAN)
            hi = jnp.where(in_win, hi, -1)
            oh_hi = (hi_classes == hi[None, :]).astype(el)
            oh_lo = (lo_classes == lo[None, :]).astype(el)
            if mode == "int":
                vraw = vals_ref[r, :]                     # int32 values
                av = jnp.abs(vraw)
                planes = []
                for j in range(4):
                    c = (av >> (8 * j)) & 255
                    sc = jnp.where(vraw < 0, -c, c).astype(jnp.float32)
                    planes.append(oh_hi * sc.astype(jnp.bfloat16)[None, :])
                planes.append(oh_hi)
                a_parts.append(jnp.concatenate(planes, axis=0))  # [5*HI, 128]
            elif mode in ("id", "idpay"):
                vraw = vals_ref[r, :]                     # int32 id+1
                planes = []
                for j in range(4):
                    c = ((vraw >> (8 * j)) & 255).astype(jnp.float32)
                    planes.append(oh_hi * c.astype(jnp.bfloat16)[None, :])
                if mode == "idpay":                       # payload planes:
                    pay = jax.lax.bitcast_convert_type(   # 3 exact bf16
                        pay_ref[r, :], jnp.float32)       # terms
                    p1 = pay.astype(jnp.bfloat16)
                    q1 = pay - p1.astype(jnp.float32)
                    p2 = q1.astype(jnp.bfloat16)
                    p3 = (q1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
                    planes += [oh_hi * p1[None, :], oh_hi * p2[None, :],
                               oh_hi * p3[None, :]]
                planes.append(oh_hi)
                a_parts.append(jnp.concatenate(planes, axis=0))
            else:
                vrow = jax.lax.bitcast_convert_type(vals_ref[r, :],
                                                    jnp.float32)
                v1 = vrow.astype(jnp.bfloat16)
                r1 = vrow - v1.astype(jnp.float32)
                v2 = r1.astype(jnp.bfloat16)
                v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
                a_parts.append(jnp.concatenate(
                    [oh_hi * v1[None, :], oh_hi * v2[None, :],
                     oh_hi * v3[None, :], oh_hi], axis=0))     # [4*HI, 128]
            b_parts.append(oh_lo)                          # [lo, 128]
        a = jnp.concatenate(a_parts, axis=1)               # [P*HI, RB*128]
        b = jnp.concatenate(b_parts, axis=1)               # [lo, RB*128]
        return acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, agg_rows // RB, body,
                            jnp.zeros((P * HI, LANES), jnp.float32))
    if mode in ("id", "idpay"):
        out_ref[0] += acc
    else:
        _dd_block_update(out_ref, acc, P * HI)


@partial(jax.jit, static_argnames=("num_windows", "shift", "agg_rows",
                                   "interpret", "mode"))
def bucket_aggregate(pdata, step_tab, num_windows: int, shift: int,
                     agg_rows: int, interpret: bool = False,
                     mode: str = "float"):
    """sum/count per key over partitioned rows, with double-float
    cross-step accumulators (bit-exact for int values, see _agg_kernel).

    pdata: plane-interleaved [planes, total_rows, 128] from radix_scatter
    — keys at plane 0, values at plane 1 (float mode: f32 bits; int mode:
    raw int32 values, |v| < 2^31; id mode: int32 build_row_id+1 values
    < 2^27; idpay mode: plane 2 carries a payload as f32 bits — it
    becomes a table plane so the probe's lookup doubles as the build-side
    gather).
    step_tab: [S] int32 per-grid-step (first_flag << 16) | window_id.
    Returns acc[G, D, 128] laid out so key = (g << shift) + hi*128 + lo:
    - float: P=4 planes (3 value terms + count), D = 2*P*HI (hi planes
      then matching lo compensation planes);
    - int:   P=5 planes (4 magnitude chunks + count), D = 2*P*HI;
    - id:    P=5 planes (4 unsigned 8-bit chunks of id+1, count),
      D = P*HI, no compensation (exact when cells are unique);
    - idpay: P=8 planes (4 id chunks, 3 payload bf16-term planes, count),
      D = P*HI, no compensation.
    Use combine_acc() to recover (sums, counts) for float/int.
    """
    planes, total_rows, _ = pdata.shape
    S = total_rows // agg_rows
    B = num_windows
    P = _MODE_PLANES[mode]
    D = (P if mode in ("id", "idpay") else 2 * P) * HI
    blk = pl.BlockSpec((planes, agg_rows, LANES), lambda i, *_: (0, i, 0),
                       memory_space=pltpu.VMEM)

    def out_map(i, step_tab_ref):
        return (step_tab_ref[i] & 0xFFFF, 0, 0)

    ospec = pl.BlockSpec((1, D, LANES), out_map, memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_agg_kernel, shift, agg_rows, mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S,),
                in_specs=[blk],
                out_specs=ospec,
            ),
            out_shape=jax.ShapeDtypeStruct((B, D, LANES), jnp.float32),
            interpret=interpret,
        )(step_tab, pdata)


def zero_empty_windows(acc, bucket_base):
    """Zero acc blocks of windows whose region is empty: such windows get
    NO grid step, so their revisited-output blocks are never initialized
    (uninitialized HBM — NaN/garbage).  One elementwise pass."""
    empty = (bucket_base[1:] - bucket_base[:-1]) == 0
    return jnp.where(empty[:, None, None], 0.0, acc)


def combine_acc(acc, int_mode: bool):
    """(sums, counts) flat over G*SPAN keys from a bucket_aggregate acc.

    int mode: sums int64 (exact chunk recombination), counts int64.
    float mode: sums f64 = hi + lo of the three recombined value terms,
    counts int64.
    """
    G = acc.shape[0]
    P = 5 if int_mode else 4

    def plane(j, half):
        off = half * P * HI
        return acc[:, off + j * HI:off + (j + 1) * HI, :].reshape(
            G << WINDOW_BITS)

    cnt = plane(P - 1, 0).astype(jnp.int64) + plane(P - 1, 1).astype(jnp.int64)
    if int_mode:
        sums = jnp.zeros((G << WINDOW_BITS,), jnp.int64)
        for j in range(4):
            tot = plane(j, 0).astype(jnp.int64) + plane(j, 1).astype(jnp.int64)
            sums = sums + (tot << (8 * j))
    else:
        sums = jnp.zeros((G << WINDOW_BITS,), jnp.float64)
        for j in range(3):
            sums = sums + plane(j, 0).astype(jnp.float64) \
                + plane(j, 1).astype(jnp.float64)
    return sums, cnt


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


def _prep_plane(vals, pad):
    vbits = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.int32) \
        if vals.dtype != jnp.int32 else vals
    if pad:
        vbits = jnp.concatenate([vbits, jnp.zeros((pad,), jnp.int32)])
    return vbits


def _prep_data(keys, vals, tile_rows):
    """Pad + stack keys and payload planes into ONE plane-interleaved
    [P, R, 128] int32 array (keys at plane 0) so every scatter run ships
    as a single multi-plane DMA descriptor.  vals may be one array or a
    list."""
    vlist = [vals] if not isinstance(vals, (tuple, list)) else list(vals)
    n = keys.shape[0]
    tile_elems = tile_rows * LANES
    nt = -(-n // tile_elems)
    pad = nt * tile_elems - n
    keys = keys.astype(jnp.int32)
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), SENTINEL, jnp.int32)])
    planes = [keys.reshape(nt * tile_rows, LANES)]
    planes += [_prep_plane(v, pad).reshape(nt * tile_rows, LANES)
               for v in vlist]
    return jnp.stack(planes, axis=0), nt


def _sorted_scatter(data, tabs, nbits, tile_rows, merge_tiles,
                    chunk_rows, total_rows, mask_bits=None,
                    interpret=False):
    """One partition pass over plane-interleaved data [P, R, 128]: direct
    sort+scatter (merge_tiles=1) or the split tile-sort → merge+scatter
    pipeline (supertile runs are merge_tiles× longer, cutting DMA
    descriptor issues ~merge_tiles×)."""
    if merge_tiles == 1:
        return radix_scatter(data, tabs, nbits, tile_rows,
                             chunk_rows, total_rows, mask_bits=mask_bits,
                             interpret=interpret)
    srt = tile_sort_data(data, tile_rows=tile_rows, alternate=True,
                         mask_bits=mask_bits, interpret=interpret)
    return merge_scatter(srt, tabs, nbits,
                         merge_tiles * tile_rows, tile_rows, chunk_rows,
                         total_rows, mask_bits=mask_bits,
                         interpret=interpret)


def radix_partition(keys, vals, domain_bits: int, tile_rows: int = 512,
                    chunk_rows: int = 4, align_rows: int = 128,
                    merge_tiles: int = 4, interpret: bool = False):
    """Partition rows into SPAN-sized key windows: one pass for domains up
    to 20 bits, two for up to 27 (cub runs one pass per digit the same
    way, sort_radix.cu).  vals: one payload array or a list of payloads
    that travel with the keys.  Returns (pdata[1+V, R, 128] — keys at
    plane 0, payloads following — window_base_rows[G+1], G) with
    G = ceil(domain / SPAN) windows; rows between runs hold
    out-of-window keys (run-edge garbage or SENTINEL).  merge_tiles:
    tiles per scatter supertile (see _sorted_scatter).
    """
    assert domain_bits <= 2 * 7 + WINDOW_BITS, domain_bits
    st = merge_tiles * tile_rows
    data, nst = _prep_data(keys, vals, st)
    zeros = jnp.zeros((nst,), jnp.int32)
    if domain_bits <= WINDOW_BITS + 7:
        nbits = max(domain_bits - WINDOW_BITS, 1)
        hist = digit_histogram(data, nbits, WINDOW_BITS, st,
                               interpret=interpret)
        tabs, base = layout_device(hist, zeros, 1, st, chunk_rows,
                                   align_rows)
        total_rows = int(base[-1])           # the single host sync
        pdata = _sorted_scatter(data, tabs, nbits, tile_rows,
                                merge_tiles, chunk_rows, total_rows,
                                interpret=interpret)
        return pdata, base, 1 << nbits
    # two passes
    nbits1 = domain_bits - WINDOW_BITS - 7
    hist1 = digit_histogram(data, nbits1, WINDOW_BITS + 7, st,
                            interpret=interpret)
    tabs1, base1 = layout_device(hist1, zeros, 1, st, chunk_rows,
                                 st)          # regions supertile-aligned
    rows1 = int(base1[-1])
    data1 = _sorted_scatter(data, tabs1, nbits1, tile_rows,
                            merge_tiles, chunk_rows, rows1,
                            interpret=interpret)
    nt2 = rows1 // st
    region_of_tile = (jnp.searchsorted(
        base1[1:], jnp.arange(nt2) * st, side="right")
        .astype(jnp.int32))
    hist2 = digit_histogram(data1, 7, WINDOW_BITS, st,
                            interpret=interpret)
    tabs2, base2 = layout_device(hist2, region_of_tile, 1 << nbits1,
                                 st, chunk_rows, align_rows)
    rows2 = int(base2[-1])
    pdata = _sorted_scatter(data1, tabs2, 7, tile_rows, merge_tiles,
                            chunk_rows, rows2, mask_bits=WINDOW_BITS + 7,
                            interpret=interpret)
    return pdata, base2, 1 << (nbits1 + 7)


# ----------------------------------------------------------------------
# end-to-end dense-key groupby
# ----------------------------------------------------------------------

def radix_groupby_sum_count(keys, vals, num_keys: int,
                            tile_rows: int = 512,
                            chunk_rows: int = 4, agg_rows: int = 128,
                            interpret: bool = False,
                            int_mode: bool = False):
    """sums[num_keys], counts[num_keys] int64 for dense int32 keys.

    int_mode: vals int32 -> exact int64 sums (pandas-bit-exact);
    float mode: vals f32 -> f64 sums from the double-float accumulators.

    keys in [0, num_keys), num_keys <= 2**27.  Domains within one window
    (8192) aggregate directly with no partition pass; one partition pass
    to 2**20; two beyond.  One host sync per pass (the count-then-
    allocate shape of the reference, inner_join_size.cu).
    """
    n = keys.shape[0]
    domain_bits = max(int(np.ceil(np.log2(max(num_keys, 2)))), 1)
    if int_mode:
        vals = vals.astype(jnp.int32)
    if domain_bits <= WINDOW_BITS:
        # single window: aggregate the raw stream (pad rows to the grid)
        data, nt = _prep_data(keys, vals, agg_rows)
        S = data.shape[1] // agg_rows
        step_tab = (jnp.arange(S, dtype=jnp.int32) == 0).astype(jnp.int32) << 16
        acc = bucket_aggregate(data, step_tab, 1, WINDOW_BITS,
                               agg_rows, interpret=interpret,
                               mode="int" if int_mode else "float")
        G = 1
    else:
        pdata, base, G = radix_partition(keys, vals, domain_bits,
                                         tile_rows, chunk_rows, agg_rows,
                                         interpret=interpret)
        total_rows = int(base[-1])
        step_tab = step_table_device(base, total_rows, agg_rows)
        acc = bucket_aggregate(pdata, step_tab, G, WINDOW_BITS,
                               agg_rows, interpret=interpret,
                               mode="int" if int_mode else "float")
        acc = zero_empty_windows(acc, base)
    sums, cnts = combine_acc(acc, int_mode)
    return sums[:num_keys], cnts[:num_keys]


# ----------------------------------------------------------------------
# Join probe: window tables + matmul lookup
# ----------------------------------------------------------------------

def _probe_kernel(shift, agg_rows, with_pay, m, check_occ,
                  step_tab_ref,                            # scalar prefetch
                  keys_ref, tab_ref,                       # VMEM blocks
                  *out_refs):
    step = step_tab_ref[pl.program_id(0)]
    bucket = step & 0xFFFF
    base = bucket << shift
    # occupancy bit (17): the build side left this window EMPTY, so its
    # acc block is uninitialized HBM (possibly NaN) — matches masked off
    occ_ok = ((step >> 17) & 1) != 0 if check_occ else True
    hi_classes = jax.lax.broadcasted_iota(jnp.int32, (HI, LANES), 0)
    # Window tables hold (id+1) of the unique build row as four unsigned
    # 8-bit chunk planes (values <= 255 are EXACT in bf16, so the one-hot
    # matmul lookup is exact on the bf16 MXU); empty cells are 0, so
    # occupancy is (sum of chunk lookups > 0) — no separate count plane.
    # Optional payload planes carry a build payload as three exact bf16
    # terms, making the lookup double as the build-side gather
    # (gather-free retrieve of inner_join_retrieve.cu).
    # m > 1 stacks one table per duplicate ordinal (bounded-fan-out
    # joins): the expensive one-hot construction is shared, each extra
    # table costs only its MXU lookups + extraction.
    t_id = [[tab_ref[0, (4 * t + j) * HI:(4 * t + j + 1) * HI, :]
             .astype(jnp.bfloat16) for j in range(4)] for t in range(m)]
    t_pay = [tab_ref[0, (4 + j) * HI:(5 + j) * HI, :].astype(jnp.bfloat16)
             for j in range(3)] if with_pay else None

    # RB rows batch into ONE [HI, RB*128] one-hot operand per plane (the
    # same K-dim batching as the aggregation kernel: per-row matmuls
    # measured 2.5x slower).  Extraction of the lo-indexed cell uses the
    # shared lo one-hot multiply + sublane reduce (gathers and 1-D
    # concatenations both hit Mosaic walls); chunk planes recombine into
    # two <=2^16 f32 planes BEFORE extraction, halving the VPU cost.
    RB = 8
    lo_classes = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    def body(i, _):
        oh_parts, lob_parts, win_parts = [], [], []
        for k in range(RB):
            r = i * RB + k
            local = keys_ref[0, r, :] - base              # window-relative
            hi = local >> 7
            lo = local & 127
            in_win = (local >= 0) & (local < SPAN)
            hi = jnp.where(in_win, hi, -1)
            oh_parts.append((hi_classes == hi[None, :]).astype(jnp.bfloat16))
            lob_parts.append((lo_classes == lo[None, :]).astype(jnp.float32))
            win_parts.append(in_win)
        oh = jnp.concatenate(oh_parts, axis=1)            # [HI, RB*128]
        B = jnp.concatenate(lob_parts, axis=1)            # [128, RB*128]

        def table_mm(t):                                  # [128, RB*128]
            return jax.lax.dot_general(t, oh, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def extract(u):                                   # [RB*128] lanes
            return jnp.sum(u * B, axis=0)

        founds, bids = [], []
        for t in range(m):
            u_lo = table_mm(t_id[t][0]) + 256.0 * table_mm(t_id[t][1])
            u_hi = table_mm(t_id[t][2]) + 256.0 * table_mm(t_id[t][3])
            c_lo = extract(u_lo)                          # <= 2^16, exact
            c_hi = extract(u_hi)
            founds.append(c_lo + c_hi)                    # > 0 iff occupied
            bids.append((c_lo.astype(jnp.int32)
                         + (c_hi.astype(jnp.int32) << 16)) - 1)
        if with_pay:
            pay_f = extract(table_mm(t_pay[0]) + table_mm(t_pay[1])
                            + table_mm(t_pay[2]))
        for k in range(RB):
            sl = slice(k * LANES, (k + 1) * LANES)
            for t in range(m):
                found = (founds[t][sl] > 0) & win_parts[k] & occ_ok
                row = jnp.where(found, bids[t][sl], -1)
                out_refs[t][pl.ds(i * RB + k, 1), :] = row[None, :]
            if with_pay:
                found = (founds[0][sl] > 0) & win_parts[k] & occ_ok
                prow = jnp.where(found, pay_f[sl], 0.0)
                out_refs[1][pl.ds(i * RB + k, 1), :] = prow[None, :]
        return 0

    jax.lax.fori_loop(0, agg_rows // RB, body, 0)


@partial(jax.jit, static_argnames=("shift", "agg_rows", "acc_planes",
                                   "interpret"))
def window_probe(pdata, tables, step_tab, shift: int, agg_rows: int,
                 acc_planes: bool = False, interpret: bool = False):
    """Probe partitioned rows against per-window build-row-id tables.

    pdata: plane-interleaved rows from radix_partition (only the key
    plane is read — the BlockSpec pulls plane-0 blocks, so payload
    planes cost no bandwidth here); tables: [G, 4*HI, 128] f32 —
    four 8-bit chunk planes of (build_row_id+1) — or [G, 7*HI, 128] with
    three payload-term planes (see probe_tables), or [G, m*4*HI, 128]
    with one table per duplicate ordinal (bounded-fan-out joins; the
    one-hot construction is shared across the m lookups).  Returns
    bid int32 [total_rows, 128]: the matched build row id, or -1 (no
    match / out-of-window garbage) — plus the matched payload f32 plane
    when present, or a list of m bid planes — the cuco probe +
    gather-map retrieve of hash_join.cu:123-125, inner_join_retrieve.cu
    as MXU lookups.
    """
    total_rows = pdata.shape[1]
    S = total_rows // agg_rows
    if acc_planes:
        # tables IS the raw bucket_aggregate acc (id: 5*HI rows, idpay:
        # 8*HI) — the BlockSpec carves the leading id/payload planes and
        # skips the count plane, so no sliced copy of the (multi-GB) acc
        # is ever materialized.  step_tab bit 17 must carry build-side
        # window occupancy (see _probe_kernel).
        with_pay = tables.shape[1] == 8 * HI
        assert with_pay or tables.shape[1] == 5 * HI, tables.shape
        m = 1
        tab_d = 7 * HI if with_pay else 4 * HI
    else:
        with_pay = tables.shape[1] == 7 * HI
        m = 1 if with_pay else tables.shape[1] // (4 * HI)
        assert with_pay or tables.shape[1] == m * 4 * HI
        tab_d = tables.shape[1]
    kblk = pl.BlockSpec((1, agg_rows, LANES), lambda i, *_: (0, i, 0),
                        memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((agg_rows, LANES), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)

    def tab_map(i, step_tab_ref):
        return (step_tab_ref[i] & 0xFFFF, 0, 0)

    tabspec = pl.BlockSpec((1, tab_d, LANES), tab_map,
                           memory_space=pltpu.VMEM)
    nbid = 2 if with_pay else m
    out_specs = [blk] * nbid
    out_shape = [jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32)
                 for _ in range(m)]
    if with_pay:
        out_shape.append(jax.ShapeDtypeStruct((total_rows, LANES),
                                              jnp.float32))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_probe_kernel, shift, agg_rows, with_pay, m,
                    acc_planes),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S,),
                in_specs=[kblk, tabspec],
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(step_tab, pdata, tables)
    if with_pay:
        return tuple(out)
    return out[0] if m == 1 else list(out)


def probe_tables(acc):
    """window_probe tables from an id/idpay-mode bucket_aggregate acc
    over (build key, build_row_id + 1[, payload]), plus is_unique (python
    bool — one host sync, the same build-side inspection hash_join.cu
    makes).  The id (and payload) planes are the acc's leading planes
    verbatim; they are only meaningful when the build side is unique
    (counts all <= 1)."""
    npl = acc.shape[1] // HI - 1          # 2 (id) or 3 (idpay)
    unique = bool(int(jnp.max(acc[:, npl * HI:(npl + 1) * HI, :])) <= 1)
    return acc[:, :npl * HI, :], unique


def probe_tables_raw(acc, bucket_base=None):
    """is_unique + per-window occupancy for probing the RAW acc with
    ``window_probe(..., acc_planes=True)``: no zero_empty_windows pass
    and no sliced table copy — the unique check reads ONLY the count
    plane, with empty (uninitialized, possibly-NaN) windows masked out;
    the probe masks them via the occupancy bit instead."""
    npl = acc.shape[1] // HI - 1
    cnt = acc[:, npl * HI:(npl + 1) * HI, :]
    if bucket_base is None:
        occ = jnp.ones((acc.shape[0],), jnp.bool_)
    else:
        occ = (bucket_base[1:] - bucket_base[:-1]) > 0
        cnt = jnp.where(occ[:, None, None], cnt, 0.0)
    unique = bool(int(jnp.max(cnt)) <= 1)
    return unique, occ


def occupancy_step_tab(step_tab, occ):
    """OR build-side window occupancy into bit 17 of a probe-side step
    table (window ids stay in the low 16 bits)."""
    return step_tab | (jnp.take(occ.astype(jnp.int32),
                                step_tab & 0xFFFF) << 17)


def build_join_tables(rk, key_domain: int, rv=None, tile_rows: int = 512,
                      chunk_rows: int = 4, agg_rows: int = 128,
                      raw_acc: bool = False, interpret: bool = False):
    """Build per-window probe tables from the build side: partition (for
    multi-window domains), aggregate (build_row_id+1[, payload]) into
    dense window tables, and report uniqueness.  The build-once half of
    the reusable hash_join object (cpp/include/cudf/join/hash_join.hpp:70).
    Returns (tables, unique, G); with raw_acc=True returns
    (acc, occ, unique, G) — the un-sliced, un-zeroed acc for
    ``window_probe(..., acc_planes=True)`` plus the per-window occupancy
    mask (skips one full read+write pass and one multi-GB slice copy)."""
    rid1 = jnp.arange(1, rk.shape[0] + 1, dtype=jnp.int32)
    vals = rid1 if rv is None else [rid1, rv]
    mode = "id" if rv is None else "idpay"
    domain_bits = max(int(np.ceil(np.log2(max(key_domain, 2)))), 1)
    if domain_bits <= WINDOW_BITS:
        rdata, _ = _prep_data(rk, vals, agg_rows)
        S_r = rdata.shape[1] // agg_rows
        step_r = (jnp.arange(S_r, dtype=jnp.int32) == 0).astype(jnp.int32) << 16
        acc = bucket_aggregate(rdata, step_r, 1, WINDOW_BITS,
                               agg_rows, interpret=interpret, mode=mode)
        if raw_acc:
            unique, occ = probe_tables_raw(acc)
            return acc, occ, unique, 1
        tables, unique = probe_tables(acc)
        return tables, unique, 1
    pdata_r, base_r, G = radix_partition(rk, vals, domain_bits, tile_rows,
                                         chunk_rows, agg_rows,
                                         interpret=interpret)
    rows_r = int(base_r[-1])
    step_r = step_table_device(base_r, rows_r, agg_rows)
    acc = bucket_aggregate(pdata_r, step_r, G, WINDOW_BITS, agg_rows,
                           interpret=interpret, mode=mode)
    if raw_acc:
        unique, occ = probe_tables_raw(acc, base_r)
        return acc, occ, unique, G
    acc = zero_empty_windows(acc, base_r)
    tables, unique = probe_tables(acc)
    return tables, unique, G


def radix_join_inner_multi(lk, lv, rk, key_domain: int, m_max: int = 4,
                           tile_rows: int = 512, chunk_rows: int = 4,
                           agg_rows: int = 128, interpret: bool = False):
    """Inner join with a BOUNDED-multiplicity build side (fan-out <= m_max).

    The reference's multiset probe retrieves arbitrary multiplicity
    (inner_join_retrieve.cu); a dense window table can hold one id per
    key, so bounded fan-out stacks one table per duplicate ordinal:
    build rows get an ordinal among equal keys (one stable build-side
    sort), table j indexes the j-th duplicate, and the probe looks up
    all j.  The caller expands (probe row, [bid_0..bid_{c-1}]) into
    gather-map pairs with the count-then-allocate shape of
    inner_join_size.cu.  Returns None-equivalent (max multiplicity) via
    ``mult`` so callers can fall back when mult > m_max; otherwise
    (probe_keys, probe_vals, [bid_j planes], mult).
    """
    n_r = rk.shape[0]
    rid = jnp.arange(n_r, dtype=jnp.int32)
    sk, sperm = jax.lax.sort([rk.astype(jnp.int32), rid], num_keys=1,
                             is_stable=True)
    first = jnp.searchsorted(sk, sk, side="left").astype(jnp.int32)
    ord_sorted = jnp.arange(n_r, dtype=jnp.int32) - first
    # nulls/masked keys (< 0) never match; exclude them from the fan-out
    mult = int(jnp.max(jnp.where(sk >= 0, ord_sorted, 0))) + 1 if n_r else 1
    if mult > m_max:
        return None, None, None, mult
    ordinal = jnp.zeros((n_r,), jnp.int32).at[sperm].set(ord_sorted)

    tables = []
    G = 1
    for j in range(mult):
        rk_j = jnp.where((ordinal == j) & (rk >= 0), rk, -1)
        t_j, uniq, G = build_join_tables(
            rk_j, key_domain, tile_rows=tile_rows, chunk_rows=chunk_rows,
            agg_rows=agg_rows, interpret=interpret)
        assert uniq          # each ordinal slice is unique by construction
        tables.append(t_j)
    stacked = jnp.concatenate(tables, axis=1)   # [G, mult*4*HI, 128]

    domain_bits = max(int(np.ceil(np.log2(max(key_domain, 2)))), 1)
    if domain_bits <= WINDOW_BITS:
        ldata, _ = _prep_data(lk, lv, agg_rows)
        S_l = ldata.shape[1] // agg_rows
        step_l = jnp.zeros((S_l,), jnp.int32)
    else:
        ldata, base_l, G2 = radix_partition(lk, lv, domain_bits,
                                            tile_rows, chunk_rows,
                                            agg_rows, interpret=interpret)
        assert G2 == G
        rows_l = int(base_l[-1])
        step_l = step_table_device(base_l, rows_l, agg_rows)
    bids = window_probe(ldata, stacked, step_l, WINDOW_BITS, agg_rows,
                        interpret=interpret)
    if mult == 1:
        bids = [bids]
    return ldata[0], ldata[1], bids, mult


def radix_join_inner_unique(lk, lv, rk, key_domain: int, rv=None,
                            tile_rows: int = 512, chunk_rows: int = 4,
                            agg_rows: int = 128, interpret: bool = False):
    """Inner join with a unique-key build side (db-benchmark J1 shape).

    Partitions both sides into SPAN windows, builds per-window dense
    row-id tables from the build side (one outer-product aggregation),
    then probes with MXU matmul lookups.  lv is the probe payload plane
    (typically the probe row ids, for gather-map joins); rv, if given, is
    a build payload retrieved THROUGH the tables (gather-free).  Returns
    (probe_keys, probe_vals, build_row_ids[, matched_payload], unique) in
    partitioned row order ([R, 128] planes; build_row_ids == -1 marks
    no-match rows and out-of-window garbage).  If the build side turns
    out non-unique (unique=False) the ids are meaningless and the caller
    must fall back (the reference handles multiplicity in its multiset
    probe, inner_join_retrieve.cu; here general multiplicity takes the
    sort-merge tier).
    """
    acc, occ, unique, G = build_join_tables(
        rk, key_domain, rv=rv, tile_rows=tile_rows, chunk_rows=chunk_rows,
        agg_rows=agg_rows, raw_acc=True, interpret=interpret)
    domain_bits = max(int(np.ceil(np.log2(max(key_domain, 2)))), 1)
    if domain_bits <= WINDOW_BITS:
        ldata, _ = _prep_data(lk, lv, agg_rows)
        S_l = ldata.shape[1] // agg_rows
        step_l = jnp.zeros((S_l,), jnp.int32)
    else:
        ldata, base_l, G2 = radix_partition(lk, lv, domain_bits,
                                            tile_rows, chunk_rows,
                                            agg_rows, interpret=interpret)
        assert G2 == G
        rows_l = int(base_l[-1])
        step_l = step_table_device(base_l, rows_l, agg_rows)
    probed = window_probe(ldata, acc, occupancy_step_tab(step_l, occ),
                          WINDOW_BITS, agg_rows, acc_planes=True,
                          interpret=interpret)
    if rv is None:
        return ldata[0], ldata[1], probed, unique
    bid, pay = probed
    return ldata[0], ldata[1], bid, pay, unique
