"""In-VMEM bitonic sort over row-major [R, 128] tiles.

TPU-native building block for the radix-partition kernel family
(reference roles: cub::DeviceRadixSort in cpp/src/sort/sort_radix.cu:69-111
and the block-level sorts inside cuco-based hash builds).  There is no
scatter/gather-to-arbitrary-address primitive on the TPU vector core, so
data-dependent reordering is expressed as a bitonic compare-exchange
network built from the three movements Mosaic executes at vector speed:

- lane-XOR partner (distance < 128): one static ``take_along_axis`` gather
  along the 128-lane axis (tpu.DynamicGather with a constant index map);
- sublane-XOR partner (distance >= 128): two ``pltpu.roll`` along the
  sublane axis plus a select;
- direction masks: compile-time constant [R, 128] boolean arrays.

Cost is O(T log^2 T) compare-exchanges fully vectorized over 8x128 VPU
lanes — the classic depth/width trade that fits a vector machine, where
a counting-sort permutation (the CUDA choice) would serialize.

Elements are ordered by a single int32 key; an arbitrary number of int32
rider arrays move with it.  Ties are broken arbitrarily (unstable), which
is all the radix partition needs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _partner_lane(x, d):
    """x[p ^ d] for lane distance d (< 128): static lane gather."""
    r = x.shape[0]
    c = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    return jnp.take_along_axis(x, c ^ d, axis=-1)


def _partner_sublane(x, m):
    """x[(r ^ m), c] for sublane distance m: two rolls + select."""
    r = x.shape[0]
    down = pltpu.roll(x, r - m, axis=0)  # brings row r+m to row r
    up = pltpu.roll(x, m, axis=0)        # brings row r-m to row r
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    take_down = (rows & m) == 0          # lower half of block pairs with +m
    return jnp.where(take_down, down, up)


def _cmpx(arrays, up, d, pos):
    """One compare-exchange step at distance d with direction mask up."""
    if d < LANES:
        partners = [_partner_lane(a, d) for a in arrays]
    else:
        partners = [_partner_sublane(a, d // LANES) for a in arrays]
    is_low = (pos & d) == 0
    pk = partners[0]
    kk = arrays[0]
    # keep the smaller at the low slot when ascending.  Expressed in
    # i1 arithmetic (Mosaic crashes on selects with boolean
    # operands): the high slot inverts the decision unless keys
    # tie, in which case both slots act identically (consistent
    # pairing keeps riders attached to their keys).
    a_dec = (kk <= pk) == up
    take_self = a_dec ^ ((~is_low) & (kk != pk))
    return [jnp.where(take_self, a, p) for a, p in zip(arrays, partners)]


def bitonic_sort(key, riders=(), ascending=True):
    """Sort a row-major [R, 128] int32 tile by ``key``; riders follow.

    R must be a power of two.  Returns (key_sorted, riders_sorted...).
    Runs inside a Pallas kernel (pure jnp/pltpu ops on values).
    ascending may be a traced bool scalar (per-grid-step direction).
    """
    r, l = key.shape
    assert l == LANES and (r & (r - 1)) == 0, key.shape
    n = r * LANES
    logn = n.bit_length() - 1
    arrays = [key, *riders]

    rows = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    pos = rows * LANES + cols
    flip = None
    if not isinstance(ascending, bool):
        flip = jnp.logical_not(ascending)        # traced direction

    for k in range(1, logn + 1):
        # ascending iff bit k of position is 0 (standard bitonic schedule)
        if k == logn:
            if flip is None:
                up = jnp.full((r, LANES), ascending, jnp.bool_)
            else:
                up = jnp.broadcast_to(jnp.logical_not(flip), (r, LANES))
        else:
            up = (pos & (1 << k)) == 0
            if flip is None:
                if not ascending:
                    up = ~up
            else:
                up = up ^ flip
        for j in range(k - 1, -1, -1):
            arrays = _cmpx(arrays, up, 1 << j, pos)
    return tuple(arrays)


def bitonic_merge(key, riders=(), ascending: bool = True):
    """Merge a BITONIC row-major [R, 128] sequence (asc half ++ desc
    half, or the reverse) into sorted order — the final stage of the
    bitonic network alone (log n steps instead of the full sort's
    log² n / 2), letting supertiles twice the max-compilable sort size
    come from two direction-alternated tile sorts."""
    r, l = key.shape
    assert l == LANES and (r & (r - 1)) == 0, key.shape
    n = r * LANES
    logn = n.bit_length() - 1
    arrays = [key, *riders]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    pos = rows * LANES + cols
    up = jnp.full((r, LANES), ascending, jnp.bool_)
    for j in range(logn - 1, -1, -1):
        arrays = _cmpx(arrays, up, 1 << j, pos)
    return tuple(arrays)


def _sort_kernel(n_riders, alternate, mask_bits, key_ref, *rest):
    rider_refs = rest[:n_riders]
    out_refs = rest[n_riders:]
    asc = True if not alternate else (pl.program_id(0) % 2) == 0
    keys = key_ref[...]
    if mask_bits is None:
        res = bitonic_sort(keys, [rr[...] for rr in rider_refs],
                           ascending=asc)
        for o, v in zip(out_refs, res):
            o[...] = v
    else:
        # sort by the LOW bits only, carrying the original key as the
        # first rider (the radix pass-2 discipline; SENTINEL stays
        # extremal so pad rows keep to the tile edge)
        from cudf_tpu.kernels.radix_partition import SENTINEL

        sk = jnp.where(keys >= 0, keys & ((1 << mask_bits) - 1),
                       jnp.int32(SENTINEL))
        res = bitonic_sort(sk, [keys] + [rr[...] for rr in rider_refs],
                           ascending=asc)
        for o, v in zip(out_refs, res[1:]):
            o[...] = v


def _sort_kernel_data(n_planes, alternate, mask_bits, data_ref, out_ref):
    asc = True if not alternate else (pl.program_id(0) % 2) == 0
    keys = data_ref[0]
    riders = [data_ref[j] for j in range(1, n_planes)]
    if mask_bits is None:
        res = bitonic_sort(keys, riders, ascending=asc)
    else:
        from cudf_tpu.kernels.radix_partition import SENTINEL

        sk = jnp.where(keys >= 0, keys & ((1 << mask_bits) - 1),
                       jnp.int32(SENTINEL))
        res = bitonic_sort(sk, [keys] + riders, ascending=asc)[1:]
    for j in range(n_planes):
        out_ref[j] = res[j]


@partial(jax.jit, static_argnames=("tile_rows", "alternate", "mask_bits",
                                   "interpret"))
def tile_sort_data(data, tile_rows: int = 512, alternate: bool = False,
                   mask_bits=None, interpret: bool = False):
    """tile_sort over plane-interleaved rows: data [P, R, 128] int32 with
    keys at plane 0 and riders following, sorted per [tile_rows] tile.
    Keeping the planes in ONE array lets the downstream scatter ship each
    bucket run as a single multi-plane DMA descriptor."""
    P, r, l = data.shape
    assert r % tile_rows == 0 and l == LANES
    spec = pl.BlockSpec((P, tile_rows, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_sort_kernel_data, P, alternate, mask_bits),
            grid=(r // tile_rows,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((P, r, LANES), jnp.int32),
            interpret=interpret,
        )(data)


@partial(jax.jit, static_argnames=("tile_rows", "alternate", "mask_bits",
                                   "interpret"))
def tile_sort(key, *riders, tile_rows: int = 512, alternate: bool = False,
              mask_bits=None, interpret: bool = False):
    """Sort each [tile_rows, 128] tile of row-major inputs independently.

    key/riders: int32 arrays of shape [R, 128] with R % tile_rows == 0.
    alternate: odd tiles sort DESCENDING so adjacent tile pairs form
    bitonic sequences for a merge+scatter kernel.  mask_bits: order by
    key & mask (radix pass 2), outputs keep the full key.
    """
    r, l = key.shape
    assert r % tile_rows == 0 and l == LANES
    grid = (r // tile_rows,)
    spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    n_r = len(riders)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_sort_kernel, n_r, alternate, mask_bits),
            grid=grid,
            in_specs=[spec] * (1 + n_r),
            out_specs=[spec] * (1 + n_r),
            out_shape=[jax.ShapeDtypeStruct((r, LANES), jnp.int32)] * (1 + n_r),
            interpret=interpret,
        )(key, *riders)
    return tuple(out)
