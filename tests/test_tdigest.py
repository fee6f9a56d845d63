"""t-digest approximate quantiles vs exact (reference:
cpp/src/quantiles/tdigest/tdigest_aggregation.cu)."""

import numpy as np
import pytest

from cudf_tpu.core.column import Column
from cudf_tpu.ops.tdigest import build_tdigest, merge_tdigests, percentile_approx


def test_tdigest_accuracy(rng):
    x = rng.normal(size=50_000)
    d = build_tdigest(Column.from_numpy(x), delta=200)
    ps = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = np.asarray(percentile_approx(d, ps).data)
    expect = np.quantile(x, ps)
    span = x.max() - x.min()
    assert np.abs(got - expect).max() / span < 0.01


def test_tdigest_merge_matches_global(rng):
    x = rng.exponential(size=30_000)
    parts = np.array_split(x, 4)
    merged = merge_tdigests([build_tdigest(Column.from_numpy(p), 200) for p in parts],
                            delta=200)
    got = np.asarray(percentile_approx(merged, [0.5, 0.9, 0.99]).data)
    expect = np.quantile(x, [0.5, 0.9, 0.99])
    span = x.max() - x.min()
    assert np.abs(got - expect).max() / span < 0.02


def test_tdigest_nulls_and_bounds():
    c = Column.from_sequence([1.0, None, 3.0, 2.0, None])
    d = build_tdigest(c)
    got = np.asarray(percentile_approx(d, [0.0, 1.0]).data)
    assert got[0] >= 1.0 and got[1] <= 3.0
