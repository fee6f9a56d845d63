import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


@pytest.mark.parametrize("agg", ["sum", "mean", "min", "max", "var", "std",
                                 "median", "prod", "count", "nunique",
                                 "skew", "kurtosis"])
def test_reduction_vs_pandas(agg, rng):
    a = pd.Series(rng.normal(size=300))
    a[::7] = np.nan
    g = ct.Series(a)
    assert_eq(getattr(g, agg)(), getattr(a, agg)(), rtol=1e-9)


@pytest.mark.parametrize("agg", ["sum", "mean", "min", "max"])
def test_int_reduction(agg, rng):
    a = pd.Series(rng.integers(-1000, 1000, 500))
    assert_eq(getattr(ct.Series(a), agg)(), getattr(a, agg)())


def test_bit_exact_int_sum(rng):
    a = rng.integers(-(2**40), 2**40, 1000)
    assert ct.Series(a).sum() == int(a.sum())


def test_quantile(rng):
    a = pd.Series(rng.normal(size=500))
    g = ct.Series(a)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        assert_eq(g.quantile(q), a.quantile(q), rtol=1e-12)


def test_any_all():
    assert ct.Series([True, False]).any()
    assert not ct.Series([True, False]).all()
    assert ct.Series([True, None]).all()  # null skipped


def test_idx_minmax():
    s = ct.Series([3.0, 1.0, None, 2.0])
    assert s.idxmin() == 1
    assert s.idxmax() == 0


def test_empty_and_allnull():
    assert ct.Series([], dtype="float64").sum() == 0
    assert np.isnan(ct.Series([None, None], dtype="float64").mean())
    # pandas: min of all-NaN float64 is nan (was None in our early API)
    assert np.isnan(ct.Series([None, None], dtype="float64").min())


def test_cumsum_vs_pandas(rng):
    a = pd.Series(rng.integers(0, 100, 200).astype("int64"))
    a[::5] = None
    assert_eq(ct.Series(a).cumsum(), a.cumsum(), check_dtype=False)


@pytest.mark.parametrize("op", ["cummin", "cummax", "cumprod"])
def test_scans_vs_pandas(op, rng):
    a = pd.Series(rng.normal(size=50))
    assert_eq(getattr(ct.Series(a), op)(), getattr(a, op)(), rtol=1e-9)
