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


def _kernel(with_minmax, keys_ref, vals_ref, sums_ref, cnts_ref,
            mins_ref, maxs_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        cnts_ref[...] = jnp.zeros_like(cnts_ref)
        mins_ref[...] = jnp.full_like(mins_ref, jnp.inf)
        maxs_ref[...] = jnp.full_like(maxs_ref, -jnp.inf)

    K = sums_ref.shape[1]
    # classes on the SUBLANE axis: [K, L] one-hots broadcast against a
    # [1, L] key row with no lane->sublane relayout, and the _ROWS rows
    # batch into ONE [2, R*L] @ [K, R*L]^T contraction (K-dim batching;
    # M=1-per-row matmuls measured far below MXU peak)
    classes = jax.lax.broadcasted_iota(jnp.int32, (K, _LANES), 0)   # [K, L]
    oh_parts, a_parts = [], []
    mins = jnp.full((1, K), jnp.inf, jnp.float32)
    maxs = jnp.full((1, K), -jnp.inf, jnp.float32)
    for r in range(_ROWS):
        krow = keys_ref[r, :]
        vrow = vals_ref[r, :]
        onehot = (classes == krow[None, :]).astype(jnp.float32)      # [K, L]
        oh_parts.append(onehot)
        a_parts.append(jnp.stack([vrow, jnp.ones((_LANES,), jnp.float32)]))
        if with_minmax:
            vmat = jnp.where(onehot > 0, vrow[None, :], jnp.inf)
            mins = jnp.minimum(mins, jnp.min(vmat, axis=1)[None, :])
            vmat2 = jnp.where(onehot > 0, vrow[None, :], -jnp.inf)
            maxs = jnp.maximum(maxs, jnp.max(vmat2, axis=1)[None, :])
    a = jnp.concatenate(a_parts, axis=1)                # [2, R*L]
    oh = jnp.concatenate(oh_parts, axis=1)              # [K, R*L]
    sc = jax.lax.dot_general(a, oh, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [2, K]
    sums_ref[...] += sc[0:1]
    cnts_ref[...] += sc[1:2]
    if with_minmax:
        mins_ref[...] = jnp.minimum(mins_ref[...], mins)
        maxs_ref[...] = jnp.maximum(maxs_ref[...], maxs)


@partial(jax.jit, static_argnames=("num_groups", "interpret", "with_minmax"))
def onehot_groupby_aggregate(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    num_groups: int,
    valid: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    with_minmax: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sums[K], counts[K], mins[K], maxs[K]) for keys in [0, num_groups).

    Rows with valid=False (or out-of-range keys) are excluded.  Pass
    with_minmax=False when only sum/count/mean are consumed — the
    min/max masked reduces are the kernel's main VPU cost.
    """
    n = keys.shape[0]
    K = int(num_groups)
    Kp = max(128, -(-K // 128) * 128)  # lane-align the group axis
    keys = keys.astype(jnp.int32)
    vals = vals.astype(jnp.float32)
    ok = (keys >= 0) & (keys < K)
    if valid is not None:
        ok = ok & valid
    keys = jnp.where(ok, keys, -1)
    vals = jnp.where(ok, vals, 0.0)
    # pad rows to a multiple of the tile
    nt = -(-n // _TILE)
    pad = nt * _TILE - n
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), -1, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), jnp.float32)])
    keys2 = keys.reshape(nt * _ROWS, _LANES)
    vals2 = vals.reshape(nt * _ROWS, _LANES)

    # Mosaic rejects i64 index-map scalars; the package enables x64
    # globally, so trace the kernel with x64 off (all operands are 32-bit)
    with jax.enable_x64(False):
        sums, cnts, mins, maxs = _call_kernel(keys2, vals2, nt, Kp, interpret,
                                              with_minmax)
    return sums[0, :K], cnts[0, :K].astype(jnp.int64), mins[0, :K], maxs[0, :K]


def _call_kernel(keys2, vals2, nt, Kp, interpret, with_minmax=True):
    return pl.pallas_call(
        partial(_kernel, with_minmax),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, Kp), jnp.float32),
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
