"""Single-pass low-cardinality groupby on the MXU.

TPU-native replacement for libcudf's shared-memory hash aggregation
(reference: cpp/src/groupby/hash/compute_single_pass_aggs.cu:14-37,
compute_shared_memory_aggs.cu — VMEM accumulators per block, global merge).

Key idea (TPU-first, no CUDA analogue): when the key cardinality K is
small, groupby-sum IS a dense matmul —

    sums[K]  = vals[1,T] @ onehot(keys)[T,K]
    counts[K] = ones[1,T] @ onehot(keys)[T,K]

The one-hot tile never leaves VMEM (built from a broadcasted iota compare)
and the contraction runs on the 128x128 systolic array, so the kernel is
MXU-bound instead of scatter-bound.  The grid walks row tiles sequentially
and accumulates into the same output block — the canonical Pallas
revisiting-output reduction pattern.

Exactness (the bit-exactness contract of BASELINE.md):
- Integer values are decomposed into four signed 8-bit chunks.  Chunk
  products with a one-hot are exact, per-grid-step chunk sums stay below
  2^24 (so the f32 matmul accumulation is exact), and cross-step
  accumulation uses Neumaier-compensated (hi, lo) f32 pairs — every
  quantity remains an exactly-represented integer, and the final int64
  recombination sum = sum_j chunk_j * 2^(8j) is bit-exact, matching
  pandas' int64 group sums.
- Float values keep one f32 product plane but gain the same compensated
  cross-step pairs, which removes the dominant (cross-tile) rounding;
  the residual error is the in-step f32 accumulation only.

Handles: sum / count / min / max (min/max via masked VPU reduce over the
tile, K-wide).  Used by ops/groupby's dispatcher for dictionary codes and
small-range int keys (the hash-vs-sort decision of groupby.cu:54-69).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Each grid step processes a (_ROWS x _LANES) block = _TILE rows; the
# one-hot tile in VMEM is _TILE*Kp*4 bytes (Kp<=1024 -> 4 MB).
_ROWS = 8
_LANES = 128
_TILE = _ROWS * _LANES

# accumulator planes: int mode = 4 value chunks + count; float mode =
# 1 value plane + count
_P_INT = 5
_P_FLOAT = 2


def _dd_update(acc_ref, x, P):
    """acc_ref[:P] (hi) / acc_ref[P:] (lo) += x as a double-float pair.

    Branch-free TwoSum for the addition error, then a Fast2Sum
    renormalisation so |lo| stays <= ulp(hi)/2 (a plain Neumaier
    compensation term would itself outgrow f32 exactness over millions
    of steps).  With integer inputs within range every operation is
    exact, so hi+lo is the exact running sum up to |sum| < 2^47.
    """
    hi = acc_ref[:P, :]
    lo = acc_ref[P:, :]
    s = hi + x
    t = s - hi
    e = (hi - (s - t)) + (x - t)   # exact error of hi + x
    u = lo + e
    hi2 = s + u
    acc_ref[:P, :] = hi2
    acc_ref[P:, :] = u - (hi2 - s)  # Fast2Sum renormalisation


def _kernel(int_mode, with_minmax, keys_ref, vals_ref, acc_ref, mm_ref):
    i = pl.program_id(0)
    P = _P_INT if int_mode else _P_FLOAT

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        mm_ref[0:1, :] = jnp.full_like(mm_ref[0:1, :], jnp.inf)
        mm_ref[1:2, :] = jnp.full_like(mm_ref[1:2, :], -jnp.inf)

    K = acc_ref.shape[1]
    # classes on the SUBLANE axis: [K, L] one-hots broadcast against a
    # [1, L] key row with no lane->sublane relayout, and the _ROWS rows
    # batch into ONE [P, R*L] @ [K, R*L]^T contraction (K-dim batching;
    # M=1-per-row matmuls measured far below MXU peak)
    classes = jax.lax.broadcasted_iota(jnp.int32, (K, _LANES), 0)   # [K, L]
    oh_parts, a_parts = [], []
    mins = jnp.full((1, K), jnp.inf, jnp.float32)
    maxs = jnp.full((1, K), -jnp.inf, jnp.float32)
    for r in range(_ROWS):
        krow = keys_ref[r, :]
        vrow = vals_ref[r, :]
        # bf16 one-hot: the TPU MXU's default f32 matmul truncates
        # operands to bf16 (measured 3.6e-5 rel err) — instead every
        # matmul plane is constructed to be EXACT in bf16: one-hots and
        # ones are 0/1, int chunks are <= 255, and the float value is
        # split into three bf16 terms whose per-term sums recombine
        # after the contraction.
        onehot = (classes == krow[None, :]).astype(jnp.bfloat16)     # [K, L]
        oh_parts.append(onehot)
        ones = jnp.ones((_LANES,), jnp.bfloat16)
        if int_mode:
            sgn = jnp.where(vrow < 0, -1.0, 1.0).astype(jnp.float32)
            av = jnp.abs(vrow)
            chunks = [(((av >> (8 * j)) & 255).astype(jnp.float32) * sgn)
                      .astype(jnp.bfloat16) for j in range(4)]
            a_parts.append(jnp.stack(chunks + [ones]))               # [5, L]
            fvrow = vrow.astype(jnp.float32)
        else:
            fvrow = vrow
            v1 = vrow.astype(jnp.bfloat16)
            r1 = vrow - v1.astype(jnp.float32)
            v2 = r1.astype(jnp.bfloat16)
            v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
            a_parts.append(jnp.stack([v1, v2, v3, ones]))            # [4, L]
        if with_minmax:
            ohf = onehot.astype(jnp.float32)
            vmat = jnp.where(ohf > 0, fvrow[None, :], jnp.inf)
            mins = jnp.minimum(mins, jnp.min(vmat, axis=1)[None, :])
            vmat2 = jnp.where(ohf > 0, fvrow[None, :], -jnp.inf)
            maxs = jnp.maximum(maxs, jnp.max(vmat2, axis=1)[None, :])
    a = jnp.concatenate(a_parts, axis=1)                # [Pm, R*L]
    oh = jnp.concatenate(oh_parts, axis=1)              # [K, R*L]
    sc = jax.lax.dot_general(a, oh, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [Pm, K]
    if not int_mode:
        # recombine the three exact value-term sums into one plane
        sc = jnp.concatenate([sc[0:1] + sc[1:2] + sc[2:3], sc[3:4]], axis=0)
    _dd_update(acc_ref, sc, P)
    if with_minmax:
        mm_ref[0:1, :] = jnp.minimum(mm_ref[0:1, :], mins)
        mm_ref[1:2, :] = jnp.maximum(mm_ref[1:2, :], maxs)


@partial(jax.jit, static_argnames=("num_groups", "interpret", "with_minmax",
                                   "int_mode"))
def onehot_groupby_aggregate(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    num_groups: int,
    valid: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    with_minmax: bool = True,
    int_mode: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sums[K], counts[K], mins[K], maxs[K]) for keys in [0, num_groups).

    Rows with valid=False (or out-of-range keys) are excluded.  Pass
    with_minmax=False when only sum/count/mean are consumed — the
    min/max masked reduces are the kernel's main VPU cost.

    int_mode=True: vals must be int32 (|v| < 2^31); sums return as EXACT
    int64 (see module docstring), counts exact int64.  min/max are f32
    (monotone rounding — the dispatcher guards |v| < 2^24 when min/max
    exactness is required).
    int_mode=False: vals f32; sums return f64 = hi+lo of the compensated
    accumulator.
    """
    n = keys.shape[0]
    K = int(num_groups)
    Kp = max(128, -(-K // 128) * 128)  # lane-align the group axis
    keys = keys.astype(jnp.int32)
    if int_mode:
        vals = vals.astype(jnp.int32)
    else:
        vals = vals.astype(jnp.float32)
    ok = (keys >= 0) & (keys < K)
    if valid is not None:
        ok = ok & valid
    keys = jnp.where(ok, keys, -1)
    vals = jnp.where(ok, vals, vals.dtype.type(0))
    # pad rows to a multiple of the tile
    nt = -(-n // _TILE)
    pad = nt * _TILE - n
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), -1, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
    keys2 = keys.reshape(nt * _ROWS, _LANES)
    vals2 = vals.reshape(nt * _ROWS, _LANES)

    P = _P_INT if int_mode else _P_FLOAT
    # Mosaic rejects i64 index-map scalars; the package enables x64
    # globally, so trace the kernel with x64 off (all operands are 32-bit)
    with jax.enable_x64(False):
        acc, mm = _call_kernel(keys2, vals2, nt, Kp, P, interpret,
                               with_minmax, int_mode)
    hi, lo = acc[:P, :K], acc[P:, :K]
    cnts = hi[P - 1].astype(jnp.int64) + lo[P - 1].astype(jnp.int64)
    if int_mode:
        sums = jnp.zeros((K,), jnp.int64)
        for j in range(4):
            tot = hi[j].astype(jnp.int64) + lo[j].astype(jnp.int64)
            sums = sums + (tot << (8 * j))
    else:
        sums = hi[0].astype(jnp.float64) + lo[0].astype(jnp.float64)
    return sums, cnts, mm[0, :K], mm[1, :K]


def _call_kernel(keys2, vals2, nt, Kp, P, interpret, with_minmax, int_mode):
    return pl.pallas_call(
        partial(_kernel, int_mode, with_minmax),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * P, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * P, Kp), jnp.float32),
            jax.ShapeDtypeStruct((2, Kp), jnp.float32),
        ],
        interpret=interpret,
    )(keys2, vals2)


def reference_groupby_aggregate(keys, vals, num_groups, valid=None):
    """jnp reference for interpreter-mode validation."""
    ok = (keys >= 0) & (keys < num_groups)
    if valid is not None:
        ok = ok & valid
    k = jnp.where(ok, keys, num_groups)
    v = jnp.where(ok, vals.astype(jnp.float32), 0.0)
    sums = jax.ops.segment_sum(v, k, num_segments=num_groups + 1)[:num_groups]
    cnts = jax.ops.segment_sum(ok.astype(jnp.int64), k, num_segments=num_groups + 1)[:num_groups]
    vmin = jnp.where(ok, vals.astype(jnp.float32), jnp.inf)
    vmax = jnp.where(ok, vals.astype(jnp.float32), -jnp.inf)
    mins = jax.ops.segment_min(vmin, k, num_segments=num_groups + 1)[:num_groups]
    maxs = jax.ops.segment_max(vmax, k, num_segments=num_groups + 1)[:num_groups]
    return sums, cnts, mins, maxs
