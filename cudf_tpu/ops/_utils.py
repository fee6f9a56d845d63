"""Shared helpers for the ops layer."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core.column import Column


def materialize_validity(col: Column) -> jnp.ndarray:
    """bool[n] validity vector; all-True if the column has no mask."""
    if col.validity is not None:
        return col.validity
    return jnp.ones((col.length,), dtype=jnp.bool_)


def maybe_mask(validity: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Drop an all-valid mask back to None (host sync; eager paths only)."""
    if validity is None:
        return None
    if bool(jnp.all(validity)):
        return None
    return validity


def segment_expand(offsets: jnp.ndarray, total: int) -> jnp.ndarray:
    """Map flat positions [0,total) to their segment index given offsets[n+1].

    The workhorse for variable-length expansion (string gather, repeat,
    join retrieve): out[i] = j such that offsets[j] <= i < offsets[j+1].
    Static output shape (``total`` is a host int), fully vectorized on VPU.
    """
    pos = jnp.arange(total, dtype=offsets.dtype)
    return jnp.searchsorted(offsets[1:-1], pos, side="right").astype(jnp.int64)


def string_payload(col: Column):
    return col.offsets, col.data


def inverse_permutation(order: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a permutation WITHOUT scatter.

    XLA scatter on TPU measures ~5x slower than lax.sort, so the inverse
    comes from sorting (order, iota) pairs instead of
    ``zeros.at[order].set(iota)``.
    """
    import jax

    n = order.shape[0]
    iota = jnp.arange(n, dtype=order.dtype)
    _, inv = jax.lax.sort([order, iota], num_keys=1, is_stable=False)
    return inv
