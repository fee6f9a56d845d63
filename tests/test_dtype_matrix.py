"""Typed test matrices over the dtype lattice
(reference: cpp/include/cudf_test/type_lists.hpp — every kernel domain is
tested across all dtypes)."""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq

NUMERIC_DTYPES = ["int8", "int16", "int32", "int64", "uint8", "uint16",
                  "uint32", "uint64", "float32", "float64"]
ALL_DTYPES = NUMERIC_DTYPES + ["bool", "datetime64[ns]", "str"]


def _make(dtype, rng, n=120):
    if dtype == "str":
        vals = rng.choice(["aa", "b", "cc", "dd", "e"], n)
        return pd.Series(vals)
    if dtype == "bool":
        return pd.Series(rng.integers(0, 2, n).astype(bool))
    if dtype == "datetime64[ns]":
        base = pd.Timestamp("2015-01-01").value
        return pd.Series((base + rng.integers(0, 10**17, n)).astype("datetime64[ns]"))
    if dtype.startswith("float"):
        return pd.Series(rng.normal(size=n).astype(dtype))
    if dtype.startswith("u"):
        return pd.Series(rng.integers(0, 100, n).astype(dtype))
    return pd.Series(rng.integers(-50, 50, n).astype(dtype))


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_roundtrip(dtype, rng):
    ps = _make(dtype, rng)
    assert_eq(ct.Series(ps), ps, check_dtype=False)


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_sort_all_dtypes(dtype, rng):
    ps = _make(dtype, rng)
    assert_eq(ct.Series(ps).sort_values(ignore_index=True),
              ps.sort_values(ignore_index=True), check_dtype=False)


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_distinct_all_dtypes(dtype, rng):
    ps = _make(dtype, rng)
    assert_eq(ct.Series(ps).drop_duplicates(ignore_index=True),
              ps.drop_duplicates(ignore_index=True), check_dtype=False)


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_groupby_key_all_dtypes(dtype, rng):
    keys = _make(dtype, rng)
    pdf = pd.DataFrame({"k": keys, "v": rng.normal(size=len(keys))})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.groupby("k").sum(), pdf.groupby("k").sum(),
              check_dtype=False, rtol=1e-9)


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_join_key_all_dtypes(dtype, rng):
    keys = _make(dtype, rng)
    pl = pd.DataFrame({"k": keys, "x": np.arange(len(keys))})
    pr = pd.DataFrame({"k": _make(dtype, rng, 40), "y": np.arange(40)})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = ct.merge(gl, gr, on="k").to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    expect = pd.merge(pl, pr, on="k").sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], expect[sorted(expect.columns)],
                                  check_dtype=False)


@pytest.mark.parametrize("dtype", NUMERIC_DTYPES)
def test_arith_all_numeric(dtype, rng):
    a = _make(dtype, rng)
    b = _make(dtype, rng)
    if dtype.startswith("u"):
        got = ct.Series(a) + ct.Series(b)
        assert_eq(got, a + b, check_dtype=False)
    else:
        assert_eq(ct.Series(a) - ct.Series(b), a - b, check_dtype=False)
    assert_eq(ct.Series(a) * 2, a * 2, check_dtype=False)


@pytest.mark.parametrize("dtype", NUMERIC_DTYPES)
def test_reductions_all_numeric(dtype, rng):
    ps = _make(dtype, rng)
    g = ct.Series(ps)
    assert_eq(g.sum(), ps.sum(), rtol=1e-5)
    assert_eq(g.min(), ps.min())
    assert_eq(g.max(), ps.max())


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_isin_all_dtypes(dtype, rng):
    ps = _make(dtype, rng)
    needles = ps.iloc[:5].tolist()
    assert_eq(ct.Series(ps).isin(needles), ps.isin(needles), check_dtype=False)


@pytest.mark.parametrize("dtype", ALL_DTYPES)
def test_nulls_all_dtypes(dtype, rng):
    ps = _make(dtype, rng).astype(object)
    ps[::7] = None
    g = ct.Series(pd.Series(ps.tolist()))
    assert g._column.null_count == (len(ps) + 6) // 7
    out = g.dropna()
    assert len(out) == len(ps) - g._column.null_count


def test_categorical_groupby(rng):
    cats = pd.Series(pd.Categorical(rng.choice(["x", "y", "z"], 100)))
    pdf = pd.DataFrame({"k": cats, "v": rng.normal(size=100)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").sum().to_pandas()
    expect = pdf.groupby("k", observed=True).sum()
    np.testing.assert_allclose(
        got["v"].sort_index().to_numpy(), expect["v"].sort_index().to_numpy(), rtol=1e-9
    )
