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


def _kernel(keys_ref, vals_ref, sums_ref, cnts_ref, mins_ref, maxs_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        cnts_ref[...] = jnp.zeros_like(cnts_ref)
        mins_ref[...] = jnp.full_like(mins_ref, jnp.inf)
        maxs_ref[...] = jnp.full_like(maxs_ref, -jnp.inf)

    K = sums_ref.shape[1]
    classes = jax.lax.broadcasted_iota(jnp.int32, (_LANES, K), 1)  # [L, K]
    ones = jnp.ones((1, _LANES), jnp.float32)
    sums = jnp.zeros((1, K), jnp.float32)
    cnts = jnp.zeros((1, K), jnp.float32)
    mins = jnp.full((1, K), jnp.inf, jnp.float32)
    maxs = jnp.full((1, K), -jnp.inf, jnp.float32)
    # unrolled over the 8 sublane rows: each is a [1,L]x[L,K] MXU matmul
    # with the one-hot tile living only in VMEM
    for r in range(_ROWS):
        krow = keys_ref[r, :]
        vrow = vals_ref[r, :]
        onehot = (classes == krow[:, None]).astype(jnp.float32)  # [L, K]
        sums += jnp.dot(vrow[None, :], onehot, preferred_element_type=jnp.float32)
        cnts += jnp.dot(ones, onehot, preferred_element_type=jnp.float32)
        vmat = jnp.where(onehot > 0, vrow[:, None], jnp.inf)
        mins = jnp.minimum(mins, jnp.min(vmat, axis=0, keepdims=True))
        vmat2 = jnp.where(onehot > 0, vrow[:, None], -jnp.inf)
        maxs = jnp.maximum(maxs, jnp.max(vmat2, axis=0, keepdims=True))
    sums_ref[...] += sums
    cnts_ref[...] += cnts
    mins_ref[...] = jnp.minimum(mins_ref[...], mins)
    maxs_ref[...] = jnp.maximum(maxs_ref[...], maxs)


@partial(jax.jit, static_argnames=("num_groups", "interpret"))
def onehot_groupby_aggregate(
    keys: jnp.ndarray,
    vals: jnp.ndarray,
    num_groups: int,
    valid: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sums[K], counts[K], mins[K], maxs[K]) for keys in [0, num_groups).

    Rows with valid=False (or out-of-range keys) are excluded.
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
        sums, cnts, mins, maxs = _call_kernel(keys2, vals2, nt, Kp, interpret)
    return sums[0, :K], cnts[0, :K].astype(jnp.int64), mins[0, :K], maxs[0, :K]


def _call_kernel(keys2, vals2, nt, Kp, interpret):
    return pl.pallas_call(
        _kernel,
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
