"""Validity mask utilities.

TPU-native replacement for libcudf's bitmask kernels
(reference: cpp/include/cudf/null_mask.hpp:83-353, cpp/src/bitmask/).

Design note: libcudf stores validity as 32-bit words because CUDA warps
ballot into words.  On TPU the VPU is an 8x128 vector unit with no ballot;
byte-wide ``bool`` vectors fuse directly into every elementwise op and cost
one lane each, so cudf_tpu keeps validity as ``bool[n]`` in HBM and only
packs to Arrow's little-endian bitmask at the interop boundary.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pack_bools(validity: jnp.ndarray) -> jnp.ndarray:
    """bool[n] -> uint8[ceil(n/8)] little-endian Arrow bitmask."""
    n = validity.shape[0]
    nbytes = -(-n // 8)
    padded = jnp.zeros((nbytes * 8,), dtype=jnp.uint8).at[:n].set(validity.astype(jnp.uint8))
    bits = padded.reshape(nbytes, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (bits * weights).sum(axis=1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("n",))
def unpack_bools(bitmask: jnp.ndarray, n: int) -> jnp.ndarray:
    """uint8 little-endian Arrow bitmask -> bool[n]."""
    bits = (bitmask[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    return bits.reshape(-1)[:n].astype(jnp.bool_)


def and_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """AND of validity vectors; None means all-valid (identity).

    Equivalent of cudf::bitmask_and (null_mask.hpp:203).
    """
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else (out & m)
    return out


def or_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    present = [m for m in masks if m is not None]
    if len(present) < len(masks):
        return None  # any all-valid operand makes the OR all-valid
    out = present[0]
    for m in present[1:]:
        out = out | m
    return out


def valid_count(validity: Optional[jnp.ndarray], n: int) -> int:
    if validity is None:
        return n
    return int(jnp.sum(validity))


def null_count(validity: Optional[jnp.ndarray], n: int) -> int:
    return n - valid_count(validity, n)


def from_numpy_mask(mask) -> Optional[jnp.ndarray]:
    """numpy bool array (True=valid) -> device validity, or None if all valid."""
    if mask is None:
        return None
    mask = np.asarray(mask, dtype=bool)
    if mask.all():
        return None
    return jnp.asarray(mask)
