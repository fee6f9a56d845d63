"""t-digest sketches for approximate quantiles.

TPU-native equivalent of cudf's tdigest aggregations
(reference: cpp/src/quantiles/tdigest/tdigest_aggregation.cu —
TDIGEST / MERGE_TDIGEST groupby aggs + percentile_approx).  The GPU
version builds digests with per-group scans; here the whole build is
three device passes: sort, scale-function cluster assignment, segment
mean/weight — all existing TPU-friendly primitives.  Merging re-runs the
same clustering over concatenated centroids, which is exactly the
MergingDigest formulation (Dunning & Ertl) and is what makes the sketch
distributable across partitions/chips.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column

__all__ = ["TDigest", "build_tdigest", "merge_tdigests", "percentile_approx"]


class TDigest(NamedTuple):
    means: jnp.ndarray    # float64[k]
    weights: jnp.ndarray  # float64[k]
    min: float
    max: float


def _k_scale(q: jnp.ndarray) -> jnp.ndarray:
    """k1 scale function: concentrates resolution at the tails."""
    return jnp.arcsin(2.0 * jnp.clip(q, 0.0, 1.0) - 1.0) / jnp.pi + 0.5


def _cluster(sorted_x: jnp.ndarray, w: jnp.ndarray, delta: int) -> TDigest:
    """Cluster sorted (value, weight) pairs into <= delta centroids."""
    total = jnp.sum(w)
    cum = jnp.cumsum(w) - w * 0.5
    q = cum / jnp.maximum(total, 1e-300)
    cid = jnp.floor(_k_scale(q) * delta).astype(jnp.int32)
    cid = jnp.clip(cid, 0, delta - 1)
    wsum = jax.ops.segment_sum(w, cid, num_segments=delta)
    xsum = jax.ops.segment_sum(sorted_x * w, cid, num_segments=delta)
    means = jnp.where(wsum > 0, xsum / jnp.maximum(wsum, 1e-300), 0.0)
    return TDigest(means, wsum,
                   float(sorted_x[0]) if sorted_x.shape[0] else float("nan"),
                   float(sorted_x[-1]) if sorted_x.shape[0] else float("nan"))


def build_tdigest(col: Column, delta: int = 100) -> TDigest:
    """Sketch one column (nulls/NaNs excluded), <= delta centroids."""
    x = col.data.astype(jnp.float64)
    valid = jnp.ones(x.shape, jnp.bool_) if col.validity is None else col.validity
    valid = valid & ~jnp.isnan(x)
    big = jnp.inf
    xs = jnp.sort(jnp.where(valid, x, big))  # invalid rows park at the top
    n_valid = int(jnp.sum(valid))
    xs = xs[:n_valid]
    w = jnp.ones((n_valid,), jnp.float64)
    return _cluster(xs, w, delta)


def merge_tdigests(digests: Sequence[TDigest], delta: int = 100) -> TDigest:
    """Combine partition/chip-local sketches (MERGE_TDIGEST)."""
    means = jnp.concatenate([d.means for d in digests])
    weights = jnp.concatenate([d.weights for d in digests])
    order = jnp.argsort(means)
    out = _cluster(jnp.take(means, order), jnp.take(weights, order), delta)
    mn = np.nanmin([d.min for d in digests])
    mx = np.nanmax([d.max for d in digests])
    return TDigest(out.means, out.weights, float(mn), float(mx))


def percentile_approx(digest: TDigest, percentiles) -> Column:
    """Interpolated quantile estimates (cudf::percentile_approx)."""
    ps = jnp.asarray(np.atleast_1d(np.asarray(percentiles, np.float64)))
    w = digest.weights
    nonempty = w > 0
    total = jnp.sum(w)
    # centroid midpoints in cumulative-weight space
    cum = jnp.cumsum(w) - w * 0.5
    target = ps * total
    # interpolate between adjacent non-empty centroids
    means = jnp.where(nonempty, digest.means, jnp.nan)
    valid_idx = jnp.nonzero(nonempty, size=w.shape[0], fill_value=w.shape[0] - 1)[0]
    vm = jnp.take(means, valid_idx)
    vc = jnp.take(cum, valid_idx)
    k = int(jnp.sum(nonempty))
    vm, vc = vm[:k], vc[:k]
    # anchor the tails to the digest's exact min/max: interpolation nodes
    # are [min @ cum=0] + centroid midpoints + [max @ cum=total]
    vm = jnp.concatenate([jnp.full((1,), digest.min), vm,
                          jnp.full((1,), digest.max)])
    vc = jnp.concatenate([jnp.zeros((1,)), vc,
                          jnp.full((1,), jnp.asarray(total, jnp.float64))])
    k = k + 2
    hi = jnp.clip(jnp.searchsorted(vc, target, side="left"), 0, k - 1)
    lo = jnp.clip(hi - 1, 0, k - 1)
    c_lo, c_hi = jnp.take(vc, lo), jnp.take(vc, hi)
    m_lo, m_hi = jnp.take(vm, lo), jnp.take(vm, hi)
    frac = jnp.where(c_hi > c_lo, (target - c_lo) / jnp.maximum(c_hi - c_lo, 1e-300), 0.0)
    est = m_lo + frac * (m_hi - m_lo)
    est = jnp.clip(est, digest.min, digest.max)
    return Column(dt.FLOAT64, est.shape[0], data=est)
