import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


def test_construction_and_roundtrip(frames):
    gdf, pdf = frames
    assert_eq(gdf, pdf, check_dtype=False)


def test_getitem_setitem(frames):
    gdf, pdf = frames
    gdf = gdf.copy()
    pdf = pdf.copy()
    gdf["new"] = gdf["i64"] * 2
    pdf["new"] = pdf["i64"] * 2
    assert_eq(gdf, pdf, check_dtype=False)
    gdf["const"] = 7
    pdf["const"] = 7
    assert_eq(gdf, pdf, check_dtype=False)


def test_boolean_filter(frames):
    gdf, pdf = frames
    assert_eq(gdf[gdf["i64"] > 0], pdf[pdf["i64"] > 0], check_dtype=False)


def test_query(frames):
    gdf, pdf = frames
    assert_eq(gdf.query("i64 > 0 & k < 5"), pdf.query("i64 > 0 & k < 5"), check_dtype=False)
    assert_eq(gdf.query("i64 > 100 | b"), pdf.query("i64 > 100 | b"), check_dtype=False)


def test_head_tail_iloc(frames):
    gdf, pdf = frames
    assert_eq(gdf.head(7), pdf.head(7), check_dtype=False)
    assert_eq(gdf.tail(3), pdf.tail(3), check_dtype=False)
    assert_eq(gdf.iloc[10:20], pdf.iloc[10:20], check_dtype=False)
    assert_eq(gdf.iloc[::7], pdf.iloc[::7], check_dtype=False)


def test_drop_rename(frames):
    gdf, pdf = frames
    assert_eq(gdf.drop(columns=["f32"]), pdf.drop(columns=["f32"]), check_dtype=False)
    assert_eq(gdf.rename(columns={"i64": "z"}), pdf.rename(columns={"i64": "z"}), check_dtype=False)


def test_set_reset_index(frames):
    gdf, pdf = frames
    assert_eq(gdf.set_index("k").reset_index(), pdf.set_index("k").reset_index()[
        list(gdf.set_index("k").reset_index().columns)], check_dtype=False)


def test_drop_duplicates(rng):
    pdf = pd.DataFrame({"a": rng.integers(0, 5, 100), "b": rng.integers(0, 3, 100)})
    gdf = ct.DataFrame.from_pandas(pdf)
    for keep in ("first", "last", False):
        assert_eq(gdf.drop_duplicates(keep=keep), pdf.drop_duplicates(keep=keep),
                  check_dtype=False)


def test_duplicated(rng):
    pdf = pd.DataFrame({"a": rng.integers(0, 5, 50)})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.duplicated(), pdf.duplicated(), check_dtype=False)


def test_concat_frames(frames):
    gdf, pdf = frames
    got = ct.concat([gdf.head(10), gdf.tail(10)], ignore_index=True)
    expect = pd.concat([pdf.head(10), pdf.tail(10)], ignore_index=True)
    assert_eq(got, expect, check_dtype=False)


def test_concat_axis1(frames):
    gdf, pdf = frames
    got = ct.concat([gdf[["i64"]], gdf[["f64"]]], axis=1)
    expect = pd.concat([pdf[["i64"]], pdf[["f64"]]], axis=1)
    assert_eq(got, expect, check_dtype=False)


def test_reductions_axis0(frames):
    gdf, pdf = frames
    num_g = gdf[["i64", "i32", "f64"]]
    num_p = pdf[["i64", "i32", "f64"]]
    assert_eq(num_g.sum(), num_p.sum(), check_dtype=False, rtol=1e-9)
    assert_eq(num_g.mean(), num_p.mean(), check_dtype=False, rtol=1e-9)


def test_isna_fillna_dropna(frames):
    gdf, pdf = frames
    assert_eq(gdf.isna(), pdf.isna(), check_dtype=False)
    assert_eq(gdf["f64"].fillna(-1.0), pdf["f64"].fillna(-1.0))
    assert_eq(gdf.dropna(), pdf.dropna(), check_dtype=False)


def test_astype_dict(frames):
    gdf, pdf = frames
    assert_eq(gdf.astype({"i64": "float64"}), pdf.astype({"i64": "float64"}),
              check_dtype=False)


def test_melt_get_dummies(rng):
    pdf = pd.DataFrame({"id": [1, 2], "a": [10, 20], "b": [30, 40]})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(ct.melt(gdf, id_vars=["id"]), pd.melt(pdf, id_vars=["id"]),
              check_dtype=False, sort_rows=False, check_index=False)
    pdf2 = pd.DataFrame({"c": ["x", "y", "x"]})
    gdf2 = ct.DataFrame.from_pandas(pdf2)
    assert_eq(ct.get_dummies(gdf2), pd.get_dummies(pdf2), check_dtype=False)


def test_select_dtypes(frames):
    gdf, pdf = frames
    assert list(gdf.select_dtypes(include="number").columns) == \
        list(pdf.select_dtypes(include="number").columns)


def test_where_mask(frames):
    gdf, pdf = frames
    assert_eq(gdf["i64"].where(gdf["i64"] > 0, 0), pdf["i64"].where(pdf["i64"] > 0, 0),
              check_dtype=False)


def test_clip_round(frames):
    gdf, pdf = frames
    assert_eq(gdf["f64"].clip(-1, 1), pdf["f64"].clip(-1, 1))
    assert_eq(gdf["f64"].round(2), pdf["f64"].round(2))


def test_shift_diff(frames):
    gdf, pdf = frames
    assert_eq(gdf["i64"].shift(2), pdf["i64"].shift(2), check_dtype=False)
    assert_eq(gdf["f64"].diff(), pdf["f64"].diff(), check_dtype=False)


def test_loc_label():
    pdf = pd.DataFrame({"a": [1, 2, 3]}, index=["x", "y", "z"])
    gdf = ct.DataFrame.from_pandas(pdf)
    assert gdf.loc["y"]["a"] == 2
    assert_eq(gdf.loc[["x", "z"]], pdf.loc[["x", "z"]], check_dtype=False)


def test_eval_arith(frames):
    gdf, pdf = frames
    assert_eq(gdf.eval("i64 + f64 * 2"), pdf.eval("i64 + f64 * 2"), check_dtype=False)


def test_describe(frames):
    gdf, pdf = frames
    got = gdf[["i64", "f64"]].describe().to_pandas()
    expect = pdf[["i64", "f64"]].describe()
    np.testing.assert_allclose(got.values.astype(float), expect.values, rtol=1e-9)


def test_rolling_vs_pandas(rng):
    a = pd.Series(rng.normal(size=100))
    a[::13] = np.nan
    g = ct.Series(a)
    for fn in ("sum", "mean", "min", "max", "std"):
        assert_eq(getattr(g.rolling(5), fn)(), getattr(a.rolling(5), fn)(), rtol=1e-9)
    assert_eq(g.rolling(5, min_periods=1).mean(), a.rolling(5, min_periods=1).mean(), rtol=1e-9)


def test_ewm(rng):
    a = pd.Series(rng.normal(size=50))
    assert_eq(ct.Series(a).ewm(alpha=0.3).mean(), a.ewm(alpha=0.3).mean(), rtol=1e-9)


def test_pivot_table(rng):
    pdf = pd.DataFrame({"r": rng.integers(0, 3, 60), "c": rng.choice(["x", "y"], 60),
                        "v": rng.normal(size=60)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.pivot_table(values="v", index="r", columns="c", aggfunc="sum").to_pandas()
    expect = pdf.pivot_table(values="v", index="r", columns="c", aggfunc="sum").reset_index()
    expect.columns = [str(c) for c in expect.columns]
    got.columns = [str(c) for c in got.columns]
    pd.testing.assert_frame_equal(got, expect[got.columns], check_dtype=False,
                                  check_names=False)
