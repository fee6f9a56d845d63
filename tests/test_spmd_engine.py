"""IR-graph → shard_map SPMD lowering (engine/spmd.py; VERDICT r2 item 3).

The same LazyFrame plan must produce identical results through the
in-memory executor, the partition-list executor, and the compiled SPMD
program on the 8-virtual-device CPU mesh — the one-code-path contract of
the reference's lower_ir_graph (streaming/parallel.py:128-190).
"""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu
from cudf_tpu.engine.lazy import LazyFrame
from cudf_tpu.engine.expr import col
from cudf_tpu.parallel.mesh import make_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(21)


@pytest.fixture
def mesh():
    return make_mesh(8)


def _lf(pdf):
    return LazyFrame.from_dataframe(cudf_tpu.DataFrame.from_pandas(pdf))


def _assert_spmd_used(node, mesh):
    from cudf_tpu.engine.spmd import evaluate_spmd

    return evaluate_spmd(node, mesh)   # raises Unlowerable on failure


def test_q1_shaped_groupby(rng, mesh):
    n = 4000
    pdf = pd.DataFrame({
        "flag": rng.integers(0, 3, n),
        "qty": rng.integers(1, 50, n).astype(np.int64),
        "price": rng.uniform(1, 100, n).round(2),
    })
    lf = (_lf(pdf)
          .with_columns((col("price") * col("qty")).alias("gross"))
          .group_by("flag")
          .agg(col("qty").sum().alias("sum_qty"),
               col("gross").sum().alias("sum_gross"),
               col("price").mean().alias("avg_price"),
               col("qty").count().alias("n")))
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = pd.DataFrame({n_: np.asarray(c.data) for n_, c in out.items()})
    got = got.sort_values("flag").reset_index(drop=True)
    exp = (pdf.assign(gross=pdf.price * pdf.qty)
           .groupby("flag")
           .agg(sum_qty=("qty", "sum"), sum_gross=("gross", "sum"),
                avg_price=("price", "mean"), n=("qty", "count"))
           .reset_index())
    np.testing.assert_array_equal(got["flag"], exp["flag"])
    np.testing.assert_array_equal(got["sum_qty"], exp["sum_qty"])
    np.testing.assert_allclose(got["sum_gross"], exp["sum_gross"], rtol=1e-12)
    np.testing.assert_allclose(got["avg_price"], exp["avg_price"], rtol=1e-12)
    np.testing.assert_array_equal(got["n"], exp["n"])


def test_q5_shaped_filter_join_groupby_sort(rng, mesh):
    """The dryrun_multichip plan, through the ENGINE: scan → filter →
    join → groupby → sort, one jitted SPMD program."""
    n_fact, n_dim, n_nation = 4000, 256, 5
    fact = pd.DataFrame({
        "suppkey": rng.integers(0, n_dim, n_fact),
        "price": rng.integers(1, 1000, n_fact).astype(np.float64),
        "qty": rng.integers(1, 50, n_fact),
    })
    dim = pd.DataFrame({"suppkey": np.arange(n_dim),
                        "nation": rng.integers(0, n_nation, n_dim)})
    lf = (_lf(fact)
          .filter(col("qty") < 25)
          .join(_lf(dim), on="suppkey", how="inner")
          .group_by("nation")
          .agg(col("price").sum().alias("revenue"))
          .sort("revenue", descending=True))
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = pd.DataFrame({n_: np.asarray(c.data) for n_, c in out.items()})
    exp = (fact[fact.qty < 25].merge(dim, on="suppkey")
           .groupby("nation")["price"].sum()
           .sort_values(ascending=False).reset_index())
    np.testing.assert_array_equal(got["nation"], exp["nation"])
    np.testing.assert_allclose(got["revenue"], exp["price"], rtol=1e-12)
    # and the SAME plan through the public collect(mesh=...) entry
    got2 = lf.collect(mesh=mesh).to_pandas()
    np.testing.assert_allclose(got2["revenue"].to_numpy(), exp["price"],
                               rtol=1e-12)


def test_min_max_distributed(rng, mesh):
    n = 3000
    pdf = pd.DataFrame({"k": rng.integers(0, 40, n),
                        "v": rng.normal(size=n)})
    lf = (_lf(pdf).group_by("k")
          .agg(col("v").min().alias("lo"), col("v").max().alias("hi"),
               col("v").std().alias("sd")))
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = pd.DataFrame({n_: np.asarray(c.data) for n_, c in out.items()})
    got = got.sort_values("k").reset_index(drop=True)
    exp = (pdf.groupby("k")["v"].agg(lo="min", hi="max", sd="std")
           .reset_index())
    np.testing.assert_allclose(got["lo"], exp["lo"], rtol=1e-12)
    np.testing.assert_allclose(got["hi"], exp["hi"], rtol=1e-12)
    np.testing.assert_allclose(got["sd"], exp["sd"], rtol=1e-9)


def test_string_key_dictionary_roundtrip(rng, mesh):
    n = 2000
    names = np.array(["ar", "br", "cn", "de", "us"])
    pdf = pd.DataFrame({"country": names[rng.integers(0, 5, n)],
                        "v": rng.integers(0, 100, n).astype(np.int64)})
    lf = _lf(pdf).group_by("country").agg(col("v").sum().alias("total"))
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = (pd.DataFrame({
        "country": out["country"].to_arrow().to_pylist(),
        "total": np.asarray(out["total"].data)})
        .sort_values("country").reset_index(drop=True))
    exp = pdf.groupby("country")["v"].sum().reset_index(name="total")
    np.testing.assert_array_equal(got["country"], exp["country"])
    np.testing.assert_array_equal(got["total"], exp["total"])


def test_semi_and_distinct(rng, mesh):
    n = 3000
    pdf = pd.DataFrame({"k": rng.integers(0, 500, n),
                        "v": rng.integers(0, 9, n)})
    keep = pd.DataFrame({"k": np.arange(0, 500, 7)})
    lf = (_lf(pdf).join(_lf(keep), on="k", how="semi")
          .unique())
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = set(zip(np.asarray(out["k"].data).tolist(),
                  np.asarray(out["v"].data).tolist()))
    sel = pdf[pdf.k.isin(keep.k)].drop_duplicates()
    exp = set(zip(sel.k.tolist(), sel.v.tolist()))
    assert got == exp


def test_unlowerable_falls_back(rng, mesh):
    """Median is not decomposable: evaluate_streaming must still answer
    (partition-list fallback), matching the single-device result."""
    n = 2000
    pdf = pd.DataFrame({"k": rng.integers(0, 10, n),
                        "v": rng.normal(size=n)})
    lf = _lf(pdf).group_by("k").agg(col("v").median().alias("med"))
    from cudf_tpu.engine.spmd import Unlowerable, evaluate_spmd

    with pytest.raises(Unlowerable):
        evaluate_spmd(lf.optimized(), mesh)
    from cudf_tpu.engine.streaming import PerformanceWarning
    import cudf_tpu.engine as eng

    eng.reset_fallback_stats()
    with pytest.warns(PerformanceWarning, match="agg median"):
        got = lf.collect(mesh=mesh).to_pandas().sort_values("k")
    exp = pdf.groupby("k")["v"].median().reset_index(name="med")
    np.testing.assert_allclose(got["med"].to_numpy(), exp["med"], rtol=1e-12)


def test_left_join_q13_shape(rng, mesh):
    """TPC-H q13 shape: customer LEFT JOIN orders, count non-null order
    keys per customer — unmatched rows must surface as nulls and the
    count agg must exclude them (VERDICT r4 item 5; reference
    streaming/join.py:58-266 lowers every how)."""
    n_cust, n_ord = 300, 1200
    cust = pd.DataFrame({"custkey": np.arange(n_cust),
                         "seg": rng.integers(0, 5, n_cust)})
    orders = pd.DataFrame({
        # leave custkeys [200, 300) orderless → null o_orderkey after join
        "o_custkey": rng.integers(0, 200, n_ord),
        "o_orderkey": np.arange(n_ord)})
    lf = (_lf(cust)
          .join(_lf(orders), left_on="custkey", right_on="o_custkey",
                how="left")
          .group_by("custkey")
          .agg(col("o_orderkey").count().alias("c_count")))
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = pd.DataFrame({n_: np.asarray(c.data) for n_, c in out.items()})
    got = got.sort_values("custkey").reset_index(drop=True)
    exp = (cust.merge(orders, left_on="custkey", right_on="o_custkey",
                      how="left")
           .groupby("custkey")["o_orderkey"].count()
           .reset_index(name="c_count"))
    np.testing.assert_array_equal(got["custkey"], exp["custkey"])
    np.testing.assert_array_equal(got["c_count"], exp["c_count"])
    # and null-aware mean/sum over the nullable payload
    lf2 = (_lf(cust)
           .join(_lf(orders), left_on="custkey", right_on="o_custkey",
                 how="left")
           .group_by("seg")
           .agg(col("o_orderkey").mean().alias("m"),
                col("o_orderkey").sum().alias("s")))
    out2 = _assert_spmd_used(lf2.optimized(), mesh)
    got2 = pd.DataFrame({n_: np.asarray(c.data) for n_, c in out2.items()})
    got2 = got2.sort_values("seg").reset_index(drop=True)
    exp2 = (cust.merge(orders, left_on="custkey", right_on="o_custkey",
                       how="left")
            .groupby("seg")["o_orderkey"].agg(m="mean", s="sum")
            .reset_index())
    np.testing.assert_allclose(got2["m"], exp2["m"], rtol=1e-12)
    np.testing.assert_allclose(got2["s"], exp2["s"], rtol=1e-12)


def test_left_join_null_output(rng, mesh):
    """Left-join output rows carry actual nulls for unmatched right
    payload through collect()."""
    left = pd.DataFrame({"k": np.arange(50), "lv": np.arange(50) * 10})
    right = pd.DataFrame({"k": np.arange(0, 50, 2),
                          "rv": np.arange(25).astype(np.float64)})
    lf = _lf(left).join(_lf(right), on="k", how="left")
    got = lf.collect(mesh=mesh).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    exp = left.merge(right, on="k", how="left")
    np.testing.assert_array_equal(got["k"], exp["k"])
    np.testing.assert_array_equal(got["rv"].isna(), exp["rv"].isna())
    np.testing.assert_allclose(got["rv"].dropna(), exp["rv"].dropna())


def test_full_join(rng, mesh):
    """Full outer join: both sides' unmatched rows surface, key
    coalesced (join.cu full_join composition)."""
    left = pd.DataFrame({"k": np.arange(0, 60, 2), "lv": np.arange(30)})
    right = pd.DataFrame({"k": np.arange(0, 90, 3),
                          "rv": np.arange(30) * 2})
    lf = _lf(left).join(_lf(right), on="k", how="full")
    out = _assert_spmd_used(lf.optimized(), mesh)
    k = np.asarray(out["k"].data)
    exp = left.merge(right, on="k", how="outer")
    assert sorted(k.tolist()) == sorted(exp["k"].tolist())


def test_multikey_sort_unbounded(rng, mesh):
    """3-key sort on unbounded dtypes (int64 / float64 / int64 mixed
    asc/desc) through the multi-key sample sort (VERDICT r4 item 5;
    reference streaming/sort.py)."""
    n = 5000
    pdf = pd.DataFrame({
        "a": rng.integers(0, 8, n),                  # dup-heavy primary
        "b": rng.normal(size=n).round(2),            # float w/ dups
        "c": rng.integers(0, 10**12, n),             # wide int64
        "v": np.arange(n)})
    lf = _lf(pdf).sort(["a", "b", "c"], descending=[False, True, False])
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = pd.DataFrame({n_: np.asarray(c.data) for n_, c in out.items()})
    exp = pdf.sort_values(["a", "b", "c"],
                          ascending=[True, False, True]).reset_index(drop=True)
    np.testing.assert_array_equal(got["a"], exp["a"])
    np.testing.assert_allclose(got["b"], exp["b"])
    np.testing.assert_array_equal(got["c"], exp["c"])
    np.testing.assert_array_equal(got["v"], exp["v"])


def test_nullable_source(rng, mesh):
    """Nullable source columns lower (validity rides as a mask array):
    null-aware sum/mean/count through the compiled program."""
    n = 3000
    v = rng.normal(size=n)
    vm = rng.random(n) < 0.8
    pdf = pd.DataFrame({"k": rng.integers(0, 20, n),
                        "v": np.where(vm, v, np.nan)})
    lf = (_lf(pdf).group_by("k")
          .agg(col("v").sum().alias("s"), col("v").mean().alias("m"),
               col("v").count().alias("c")))
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = pd.DataFrame({n_: np.asarray(c.data) for n_, c in out.items()})
    got = got.sort_values("k").reset_index(drop=True)
    exp = pdf.groupby("k")["v"].agg(s="sum", m="mean", c="count") \
        .reset_index()
    np.testing.assert_allclose(got["s"], exp["s"], rtol=1e-12)
    np.testing.assert_allclose(got["m"], exp["m"], rtol=1e-12)
    np.testing.assert_array_equal(got["c"], exp["c"])


def test_fallback_accounting(rng, mesh):
    """fallback_mode contract (reference utils/config.py:115-129): the
    counter records per-reason hits; 'raise' surfaces Unlowerable;
    'silent' neither warns nor raises."""
    import warnings

    import cudf_tpu.engine as eng
    from cudf_tpu.engine.spmd import Unlowerable
    from cudf_tpu.utils.config import get_option, set_option

    pdf = pd.DataFrame({"k": rng.integers(0, 10, 500),
                        "v": rng.normal(size=500)})
    lf = _lf(pdf).group_by("k").agg(col("v").median().alias("med"))
    eng.reset_fallback_stats()
    prev = get_option("executor.fallback_mode")
    try:
        set_option("executor.fallback_mode", "silent")
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            lf.collect(mesh=mesh)
        stats = eng.get_fallback_stats()
        assert stats["count"] == 1
        assert any("median" in r for r in stats["reasons"])
        set_option("executor.fallback_mode", "raise")
        with pytest.raises(Unlowerable):
            lf.collect(mesh=mesh)
        assert eng.get_fallback_stats()["count"] == 2
    finally:
        set_option("executor.fallback_mode", prev)


def test_over_window_exprs(rng, mesh):
    """Top-level .over(keys) window aggregates lower: shuffle by the
    partition keys, shard-local segment reduce, row order restored
    (streaming/over.py role)."""
    n = 4000
    pdf = pd.DataFrame({"k": rng.integers(0, 50, n),
                        "v": rng.normal(size=n).round(3),
                        "w": rng.integers(0, 100, n)})
    from cudf_tpu.engine.expr import col as c

    lf = (_lf(pdf)
          .with_columns(c("v").sum().over("k").alias("gsum"),
                        c("v").mean().over("k").alias("gmean"),
                        c("w").max().over("k").alias("gmax"),
                        (c("v") * 2.0).alias("v2")))
    out = _assert_spmd_used(lf.optimized(), mesh)
    got = pd.DataFrame({n_: np.asarray(col.data) for n_, col in out.items()})
    g = pdf.groupby("k")["v"]
    exp_gsum = g.transform("sum")
    exp_gmean = g.transform("mean")
    exp_gmax = pdf.groupby("k")["w"].transform("max")
    # row order must be preserved (the hidden row-id restore sort)
    np.testing.assert_array_equal(got["k"], pdf["k"])
    np.testing.assert_allclose(got["gsum"], exp_gsum, rtol=1e-12)
    np.testing.assert_allclose(got["gmean"], exp_gmean, rtol=1e-12)
    np.testing.assert_array_equal(got["gmax"], exp_gmax)
    np.testing.assert_allclose(got["v2"], pdf["v"] * 2.0, rtol=1e-12)
    # and through the public collect(), composed with a filter
    lf2 = (_lf(pdf)
           .with_columns(c("v").sum().over("k").alias("t"))
           .filter(c("v") > c("t") * 0.1))
    got2 = lf2.collect(mesh=mesh).to_pandas()
    sel = pdf[pdf.v > exp_gsum * 0.1]
    np.testing.assert_allclose(
        np.sort(got2["v"].to_numpy()), np.sort(sel["v"].to_numpy()),
        rtol=1e-12)
    assert len(got2) == len(sel)
