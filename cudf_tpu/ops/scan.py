"""Inclusive/exclusive scans with null-skipping semantics.

TPU-native equivalent of libcudf scans
(reference: cpp/src/reductions/scan/scan_inclusive.cu:82-137).  XLA lowers
``jnp.cumsum``/``lax.associative_scan`` to a work-efficient parallel prefix
tree on the VPU — the same shape as thrust::inclusive_scan on GPU.

Null semantics (pandas/cudf): a null row stays null in the output, and the
running accumulation skips it (identity element substituted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column

_IDENTITY = {
    "cumsum": 0,
    "cumprod": 1,
    "cummin": None,  # dtype max
    "cummax": None,  # dtype min
}


def _identity_for(op: str, storage: np.dtype):
    if op == "cumsum":
        return np.asarray(0, storage)
    if op == "cumprod":
        return np.asarray(1, storage)
    if storage.kind == "f":
        return np.asarray(np.inf if op == "cummin" else -np.inf, storage)
    if storage.kind == "b":
        return np.asarray(True if op == "cummin" else False, storage)
    info = np.iinfo(storage)
    return np.asarray(info.max if op == "cummin" else info.min, storage)


def scan(col: Column, op: str) -> Column:
    """op in {cumsum, cumprod, cummin, cummax}."""
    out_dtype = col.dtype
    if op == "cumsum" and (col.dtype.is_bool or (col.dtype.is_integer and col.dtype.itemsize < 8)):
        out_dtype = dt.INT64
    if op == "cumprod" and col.dtype.is_bool:
        out_dtype = dt.INT64
    data = col.data.astype(out_dtype.storage)
    if col.validity is not None:
        data = jnp.where(col.validity, data, _identity_for(op, out_dtype.storage))
    if op == "cumsum":
        out = jnp.cumsum(data)
    elif op == "cumprod":
        out = jnp.cumprod(data)
    elif op == "cummin":
        out = jax.lax.associative_scan(jnp.minimum, data)
    elif op == "cummax":
        out = jax.lax.associative_scan(jnp.maximum, data)
    else:
        raise ValueError(op)
    return Column(out_dtype, col.length, data=out.astype(out_dtype.storage), validity=col.validity)


def cumsum(col: Column) -> Column:
    return scan(col, "cumsum")


def cumprod(col: Column) -> Column:
    return scan(col, "cumprod")


def cummin(col: Column) -> Column:
    return scan(col, "cummin")


def cummax(col: Column) -> Column:
    return scan(col, "cummax")


def cumcount(col: Column) -> Column:
    """Running count of valid rows."""
    v = col.validity
    ones = jnp.ones((col.length,), jnp.int64) if v is None else v.astype(jnp.int64)
    return Column(dt.INT64, col.length, data=jnp.cumsum(ones))


def ewm_mean(col: Column, alpha: float, adjust: bool = True) -> Column:
    """Exponentially weighted mean (reference: reductions/scan/ewm.cu).

    Expressed as an associative scan over (weighted_sum, weight) pairs —
    the classic linear-recurrence-as-scan trick, TPU-parallel.
    """
    x = col.data.astype(jnp.float64)
    valid = col.validity
    if valid is None:
        valid = jnp.ones((col.length,), jnp.bool_)
        had_mask = False
    else:
        had_mask = True
    one_m = 1.0 - alpha
    # pairs (a, b): state s -> a*s + b ; compose: (a2,b2)∘(a1,b1) = (a1*a2, a2*b1+b2)
    a = jnp.where(valid, one_m, 1.0)
    num_b = jnp.where(valid, x, 0.0)
    den_b = jnp.where(valid, 1.0, 0.0)

    def compose(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, num = jax.lax.associative_scan(compose, (a, num_b))
    _, den = jax.lax.associative_scan(compose, (a, den_b))
    out = num / den
    validity = valid if had_mask else None
    return Column(dt.FLOAT64, col.length, data=out, validity=validity)
