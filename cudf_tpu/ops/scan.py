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


def ewm_mean(col: Column, alpha: float, adjust: bool = True,
             ignore_na: bool = False) -> Column:
    """Exponentially weighted mean (reference: reductions/scan/ewm.cu).

    Expressed as an associative scan over (weighted_sum, weight) pairs —
    the classic linear-recurrence-as-scan trick, TPU-parallel.

    Both ``adjust`` modes share one linear form: the output is a ratio
    num/den where every row scales both by the decay and valid rows add a
    weight.  For ``adjust=True`` the added weight is 1; for
    ``adjust=False`` it is ``alpha`` — except the first valid row, whose
    weight is 1 (pandas' ``old_wt = 1`` initialization).  Uniform per-row
    scaling cancels in the ratio, so pandas' per-step renormalization is
    unnecessary.  ``ignore_na=False`` decays on every row (absolute
    positions); ``ignore_na=True`` decays only on valid rows.
    """
    x = col.data.astype(jnp.float64)
    valid = col.validity
    if valid is None:
        valid = jnp.ones((col.length,), jnp.bool_)
        had_mask = False
    else:
        had_mask = True
    one_m = 1.0 - alpha
    n = col.length
    seen_before = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), jnp.cumsum(valid.astype(jnp.int32))[:-1] > 0])
    xv = jnp.where(valid, x, 0.0)

    # pairs (a, b): state s -> a*s + b ; compose: (a2,b2)∘(a1,b1) = (a1*a2, a2*b1+b2)
    def compose(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    if adjust:
        # ratio of two linear scans: weights decay by (1-alpha) per row
        # (per valid row for ignore_na=True); each valid row adds weight 1
        if ignore_na:
            a = jnp.where(valid, one_m, 1.0)
        else:
            a = jnp.full((n,), one_m, jnp.float64)
        w = jnp.where(valid, 1.0, 0.0)
        _, num = jax.lax.associative_scan(compose, (a, w * xv))
        _, den = jax.lax.associative_scan(compose, (a, w))
        out = num / den
    else:
        # adjust=False is the recurrence y <- (1-beta)y + beta*x at each
        # valid row, where beta = alpha/((1-alpha)^(g+1) + alpha) and g is
        # the number of invalid rows since the last valid one (pandas'
        # old_wt decays through gaps for ignore_na=False, then renormalizes
        # to 1).  Per-row normalization keeps the scan numerically stable —
        # no denominator needed.  For ignore_na=True, g is always 0 and
        # beta = alpha.  The first valid row maps to (a=0, b=x).
        if ignore_na:
            beta = jnp.full((n,), alpha, jnp.float64)
        else:
            pos = jnp.arange(n, dtype=jnp.int64)
            last_valid = jax.lax.cummax(jnp.where(valid, pos, jnp.int64(-1)))
            prev_valid = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int64), last_valid[:-1]])
            g = (pos - 1 - prev_valid).astype(jnp.float64)
            w_old = one_m ** (g + 1.0)
            beta = alpha / (w_old + alpha)
        a = jnp.where(valid, jnp.where(seen_before, 1.0 - beta, 0.0), 1.0)
        b = jnp.where(valid, jnp.where(seen_before, beta * xv, xv), 0.0)
        _, out = jax.lax.associative_scan(compose, (a, b))
    # pandas carries the running mean through NaN rows; only rows before
    # the first valid observation are null.
    validity = (seen_before | valid) if had_mask else None
    return Column(dt.FLOAT64, col.length, data=out, validity=validity)
