import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


@pytest.mark.parametrize("agg", ["sum", "mean", "min", "max", "count", "var",
                                 "std", "median", "prod", "first", "last", "nunique"])
def test_groupby_agg_vs_pandas(agg, rng):
    pdf = pd.DataFrame({
        "k": rng.integers(0, 20, 500),
        "v": rng.normal(size=500),
    })
    pdf.loc[::11, "v"] = np.nan
    gdf = ct.DataFrame.from_pandas(pdf)
    got = getattr(gdf.groupby("k"), agg)()
    expect = getattr(pdf.groupby("k"), agg)() if agg != "nunique" else pdf.groupby("k").nunique()
    assert_eq(got, expect, check_dtype=False, rtol=1e-9)


def test_groupby_multi_key(rng):
    pdf = pd.DataFrame({
        "a": rng.integers(0, 5, 300),
        "b": rng.integers(0, 4, 300),
        "v": rng.normal(size=300),
    })
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby(["a", "b"]).sum(), pdf.groupby(["a", "b"]).sum(), rtol=1e-9)


def test_groupby_string_keys(rng):
    pdf = pd.DataFrame({
        "k": rng.choice(["x", "y", "zz", "w"], 200),
        "v": rng.integers(0, 100, 200),
    })
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k").sum(), pdf.groupby("k").sum(), check_dtype=False)


def test_groupby_null_keys():
    pdf = pd.DataFrame({"k": [1.0, None, 1.0, 2.0, None], "v": [1, 2, 3, 4, 5]})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k").sum(), pdf.groupby("k").sum(), check_dtype=False)


def test_groupby_agg_dict(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 5, 100), "v": rng.normal(size=100),
                        "w": rng.integers(0, 50, 100)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").agg({"v": "sum", "w": "max"})
    expect = pdf.groupby("k").agg({"v": "sum", "w": "max"})
    assert_eq(got, expect, check_dtype=False, rtol=1e-9)


def test_groupby_size(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 7, 200), "v": rng.normal(size=200)})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k").size(), pdf.groupby("k").size(), check_dtype=False)


def test_groupby_cumsum_shift(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 5, 100),
                        "v": rng.integers(0, 100, 100).astype("int64")})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k").cumsum(), pdf.groupby("k").cumsum(), check_dtype=False)
    assert_eq(gdf.groupby("k").shift(1), pdf.groupby("k").shift(1), check_dtype=False)


def test_groupby_cumcount(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 5, 100), "v": rng.normal(size=100)})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k").cumcount(), pdf.groupby("k").cumcount(), check_dtype=False)


def test_series_groupby(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 5, 100), "v": rng.normal(size=100)})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k")["v"].mean(), pdf.groupby("k")["v"].mean(), rtol=1e-9)


def test_groupby_idxminmax(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 5, 100), "v": rng.normal(size=100)})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k").idxmin(), pdf.groupby("k").idxmin(), check_dtype=False)
    assert_eq(gdf.groupby("k").idxmax(), pdf.groupby("k").idxmax(), check_dtype=False)


def test_groupby_quantile(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 5, 200), "v": rng.normal(size=200)})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k")["v"].quantile(0.5),
              pdf.groupby("k")["v"].quantile(0.5), rtol=1e-9)


def test_value_counts(rng):
    a = pd.Series(rng.integers(0, 10, 300))
    got = ct.Series(a).value_counts().to_pandas().sort_index()
    expect = a.value_counts().sort_index()
    expect.index.name = None
    got.index.name = None
    pd.testing.assert_series_equal(got, expect, check_names=False, check_dtype=False)
