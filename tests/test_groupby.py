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


# ----------------------------------------------------------------------
# round-2 agg completion: collect/set/topk/histogram/cov/corr/ewma/bitwise
# ----------------------------------------------------------------------

def test_groupby_collect_list_and_set(rng):
    pdf = pd.DataFrame({"k": [1, 2, 1, 2, 1], "v": [3, 1, 3, 2, 5]})
    df = ct.DataFrame.from_pandas(pdf)
    got = df.groupby("k").agg({"v": "collect"}).to_pandas()
    exp = pdf.groupby("k").agg({"v": list})
    for g, e in zip(got["v"], exp["v"]):
        assert list(g) == e
    # pandas agg(list) spelling
    got2 = df.groupby("k").agg({"v": list}).to_pandas()
    for g, e in zip(got2["v"], exp["v"]):
        assert list(g) == e
    # collect_set: distinct values (value-ordered)
    got3 = df.groupby("k").agg({"v": "unique"}).to_pandas()
    exp3 = pdf.groupby("k")["v"].apply(lambda s: sorted(set(s)))
    for g, e in zip(got3["v"], exp3):
        assert sorted(g) == e


def test_groupby_collect_strings():
    pdf = pd.DataFrame({"k": [1, 2, 1], "s": ["a", "bb", "ccc"]})
    df = ct.DataFrame.from_pandas(pdf)
    got = df.groupby("k").agg({"s": "collect"}).to_pandas()
    assert list(got["s"].iloc[0]) == ["a", "ccc"]
    assert list(got["s"].iloc[1]) == ["bb"]


def test_groupby_cov_corr(rng):
    n = 300
    pdf = pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "a": rng.normal(size=n),
        "b": rng.normal(size=n),
    })
    pdf.loc[::17, "a"] = np.nan
    df = ct.DataFrame.from_pandas(pdf)
    got = df.groupby("k").cov().to_pandas()
    exp = pdf.groupby("k").cov()
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)
    gotc = df.groupby("k").corr().to_pandas()
    expc = pdf.groupby("k").corr()
    np.testing.assert_allclose(gotc.values, expc.values, rtol=1e-9)


def test_groupby_ewm_mean(rng):
    n = 80
    pdf = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "v": rng.normal(size=n),
    })
    pdf.loc[::7, "v"] = np.nan
    df = ct.DataFrame.from_pandas(pdf)
    for adjust in (True, False):
        got = df.groupby("k")["v"].ewm(alpha=0.3, adjust=adjust).mean().to_pandas()
        exp = pdf.groupby("k")["v"].ewm(alpha=0.3, adjust=adjust).mean()
        np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)


def test_groupby_topk_histogram_ops(rng):
    import jax.numpy as jnp
    from cudf_tpu.core.column import Column
    from cudf_tpu.ops import groupby as gb_ops

    k = np.array([0, 1, 0, 1, 0, 0])
    v = np.array([5.0, 2.0, 1.0, 7.0, 3.0, 3.0])
    g = gb_ops.make_grouper([Column.from_numpy(k)])
    top = gb_ops.group_topk(Column.from_numpy(v), g, 2, largest=True)
    from cudf_tpu.ops.lists import to_pylists
    assert to_pylists(top) == [[5.0, 3.0], [7.0, 2.0]]
    hist = gb_ops.group_histogram(Column.from_numpy(v), g)
    # list<struct<value,count>>: group 0 has 1.0x1, 3.0x2, 5.0x1
    vals = to_pylists(hist)
    assert vals[0] == [
        {"value": 1.0, "count": 1}, {"value": 3.0, "count": 2},
        {"value": 5.0, "count": 1}]
    assert vals[1] == [{"value": 2.0, "count": 1}, {"value": 7.0, "count": 1}]


def test_groupby_bitwise_and_sumsq():
    pdf = pd.DataFrame({"k": [0, 0, 1, 1], "v": [6, 3, 5, 12]})
    df = ct.DataFrame.from_pandas(pdf)
    got = df.groupby("k").agg({"v": "bitwise_and"}).to_pandas()
    assert got["v"].tolist() == [6 & 3, 5 & 12]
    got_or = df.groupby("k").agg({"v": "bitwise_or"}).to_pandas()
    assert got_or["v"].tolist() == [6 | 3, 5 | 12]
    got_sq = df.groupby("k").agg({"v": "sum_of_squares"}).to_pandas()
    assert got_sq["v"].tolist() == [45.0, 169.0]


def test_groupby_m2():
    pdf = pd.DataFrame({"k": [0, 0, 0, 1, 1], "v": [1.0, 2.0, 4.0, 3.0, 3.0]})
    df = ct.DataFrame.from_pandas(pdf)
    got = df.groupby("k").agg({"v": "m2"}).to_pandas()
    exp = pdf.groupby("k")["v"].apply(lambda s: ((s - s.mean()) ** 2).sum())
    np.testing.assert_allclose(got["v"].values, exp.values, rtol=1e-12)


def test_groupby_tdigest(rng):
    from cudf_tpu.core.column import Column
    from cudf_tpu.ops import groupby as gb_ops

    n = 4000
    k = rng.integers(0, 3, n)
    v = rng.normal(size=n)
    g = gb_ops.make_grouper([Column.from_numpy(k)])
    td = gb_ops.group_tdigest(Column.from_numpy(v), g, delta=100)
    # struct<centroids: list<struct<mean,weight>>, min, max>
    cent_list, mins, maxs = td.children
    offs = np.asarray(cent_list.offsets)
    means = np.asarray(cent_list.children[0].children[0].data)
    weights = np.asarray(cent_list.children[0].children[1].data)
    for gi in range(3):
        sel = k == gi
        w_g = weights[offs[gi]:offs[gi + 1]]
        m_g = means[offs[gi]:offs[gi + 1]]
        assert abs(w_g.sum() - sel.sum()) < 1e-9          # mass preserved
        np.testing.assert_allclose((m_g * w_g).sum() / w_g.sum(),
                                   v[sel].mean(), rtol=1e-9)
        # median estimate from centroids within ~5% quantile error
        order = np.argsort(m_g)
        cw = np.cumsum(w_g[order]) - w_g[order] / 2
        est = np.interp(sel.sum() / 2, cw, m_g[order])
        assert abs(est - np.median(v[sel])) < 0.15
        assert abs(float(np.asarray(mins.data)[gi]) - v[sel].min()) < 1e-9
        assert abs(float(np.asarray(maxs.data)[gi]) - v[sel].max()) < 1e-9


def test_groupby_external_series_key_and_nan_keys(rng):
    """pandas parity: external Series keys keep ALL frame columns as
    values; float-NaN keys drop under dropna=True; group_keys/observed
    kwargs accepted."""
    pdf = pd.DataFrame({"A": [1.0, 2.0, 3.0, 1.0], "B": [4.0, 5.0, 6.0, 7.0]})
    df = ct.DataFrame.from_pandas(pdf)
    got = df.groupby(df["A"] * 0.0 + 1.0, group_keys=False).sum().to_pandas()
    exp = pdf.groupby(pdf["A"] * 0.0 + 1.0, group_keys=False).sum()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_names=False)
    # all-NaN keys -> empty result with all columns
    got0 = df.groupby(df["A"] * np.nan).sum().to_pandas()
    assert got0.shape == (0, 2)
    # partial NaN keys
    pdf2 = pd.DataFrame({"k": [1.0, np.nan, 1.0, 2.0], "v": [1, 2, 3, 4]})
    got2 = ct.DataFrame.from_pandas(pdf2).groupby("k").sum().to_pandas()
    pd.testing.assert_frame_equal(got2, pdf2.groupby("k").sum(),
                                  check_dtype=False)


def test_groupby_allnull_group_sum_prod_identity():
    """pandas min_count=0 semantics: sum of an all-NaN group is 0.0 and
    prod is 1.0 (NOT null); mean/min/max of the same group stay NaN."""
    pdf = pd.DataFrame({"k": [1, 2, 1, 2, 3],
                        "v": [1.0, np.nan, 3.0, np.nan, np.nan]})
    df = ct.DataFrame.from_pandas(pdf)
    for agg in ("sum", "prod", "mean", "min", "max"):
        got = getattr(df.groupby("k")["v"], agg)().to_pandas()
        exp = getattr(pdf.groupby("k")["v"], agg)()
        pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                       check_names=False)
    got = df.groupby("k").agg({"v": "sum"}).to_pandas()["v"].tolist()
    assert got == [4.0, 0.0, 0.0]
