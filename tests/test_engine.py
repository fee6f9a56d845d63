"""Query-engine tests: IR/expr/LazyFrame, optimizer, streaming executor.

Differential oracle: same plan through the in-memory executor, the
8-partition streaming executor, and pandas (SURVEY §4: the reference runs
the same suite under a multi-process launcher — here the partitioned
executor IS the multi-chip code path, exercised partition-wise)."""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.engine import LazyFrame, col, lit, from_dataframe, scan_parquet, scan_csv
from cudf_tpu.engine.expr import when


@pytest.fixture
def data(rng):
    pdf = pd.DataFrame({
        "k": rng.integers(0, 7, 300),
        "v": rng.normal(size=300),
        "w": rng.integers(0, 100, 300),
        "s": rng.choice(["a", "bb", "c"], 300),
    })
    return ct.DataFrame.from_pandas(pdf), pdf


def test_select_filter(data):
    gdf, pdf = data
    got = (from_dataframe(gdf)
           .filter(col("v") > 0)
           .select(col("k"), (col("v") * 2).alias("v2"))
           .collect().to_pandas())
    expect = pdf[pdf.v > 0][["k"]].assign(v2=pdf[pdf.v > 0].v * 2).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_groupby_agg(data):
    gdf, pdf = data
    got = (from_dataframe(gdf)
           .group_by("k")
           .agg(col("v").sum().alias("s"), col("v").mean().alias("m"),
                col("w").min().alias("mn"), col("w").count().alias("c"))
           .sort("k").collect().to_pandas())
    expect = pdf.groupby("k").agg(
        s=("v", "sum"), m=("v", "mean"), mn=("w", "min"), c=("w", "count")
    ).reset_index()
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_join(data):
    gdf, pdf = data
    dim = ct.DataFrame({"k": [1, 2, 3], "z": [10.0, 20.0, 30.0]})
    got = (from_dataframe(gdf).join(from_dataframe(dim), on="k")
           .sort(["k", "v"]).collect().to_pandas().reset_index(drop=True))
    expect = pd.merge(pdf, dim.to_pandas(), on="k").sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], expect[sorted(expect.columns)],
                                  check_dtype=False)


def test_when_then(data):
    gdf, pdf = data
    got = from_dataframe(gdf).select(
        when(col("v") > 0).then(lit(1)).otherwise(lit(0)).alias("pos")
    ).collect().to_pandas()
    expect = pd.DataFrame({"pos": np.where(pdf.v > 0, 1, 0)})
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_reduce(data):
    gdf, pdf = data
    got = from_dataframe(gdf).agg(col("v").sum().alias("total"),
                                  col("w").max().alias("mx")).collect()
    assert np.isclose(got["total"].iloc[0], pdf.v.sum())
    assert got["mx"].iloc[0] == pdf.w.max()


def test_unique_slice_union(data):
    gdf, pdf = data
    lf = from_dataframe(gdf)
    got = lf.unique(subset="k").collect()
    assert len(got) == pdf.k.nunique()
    assert len(lf.head(10).collect()) == 10
    assert len(lf.concat(lf).collect()) == 2 * len(pdf)


def test_scan_parquet_pushdown(tmp_path, data):
    gdf, pdf = data
    path = str(tmp_path / "t.pq")
    gdf.to_parquet(path)
    lf = scan_parquet(path).filter(col("k") == 2).select(col("v"))
    plan = lf.explain()
    assert "pred=" in plan and "cols=['v'" in plan  # both pushdowns fired
    got = lf.collect().to_pandas()
    expect = pdf[pdf.k == 2][["v"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_scan_csv(tmp_path, data):
    gdf, pdf = data
    path = str(tmp_path / "t.csv")
    gdf.to_csv(path, index=False)
    got = scan_csv(path).select(col("k"), col("w")).collect().to_pandas()
    pd.testing.assert_frame_equal(got, pdf[["k", "w"]], check_dtype=False)


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_streaming_groupby_matches_memory(data, n_parts):
    gdf, pdf = data
    lf = (from_dataframe(gdf)
          .group_by("k")
          .agg(col("v").sum().alias("s"), col("v").mean().alias("m"),
               col("w").count().alias("c"))
          .sort("k"))
    mem = lf.collect().to_pandas()
    stream = lf.collect(mesh=n_parts).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(mem, stream, check_dtype=False)


def test_streaming_join_both_paths(data):
    gdf, pdf = data
    dim = ct.DataFrame({"k": [0, 1, 2, 3], "z": [1.0, 2.0, 3.0, 4.0]})
    lf = from_dataframe(gdf).join(from_dataframe(dim), on="k", how="inner")
    mem = lf.collect().to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    from cudf_tpu.utils.config import option_context

    stream_b = lf.collect(mesh=4).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    with option_context("executor.broadcast_limit", 0):
        stream_s = lf.collect(mesh=4).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(mem, stream_b, check_dtype=False)
    pd.testing.assert_frame_equal(mem, stream_s, check_dtype=False)


def test_streaming_nondecomposable_fallback(data):
    gdf, pdf = data
    lf = from_dataframe(gdf).group_by("k").agg(col("v").median().alias("med")).sort("k")
    mem = lf.collect().to_pandas()
    stream = lf.collect(mesh=4).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(mem, stream, check_dtype=False)


def test_explain_tree(data):
    gdf, _ = data
    plan = from_dataframe(gdf).filter(col("v") > 0).explain()
    assert "Filter" in plan or "DataFrameScan" in plan


def test_conditional_join(data):
    gdf, pdf = data
    from cudf_tpu.engine import ir as IRs
    from cudf_tpu.ops.binaryop import binary_operation

    small_l = IRs.DataFrameScan(gdf.head(30)._table.select(["k", "v"]))
    small_r = IRs.DataFrameScan(
        ct.DataFrame({"lo": [0, 2, 4], "hi": [2, 4, 8]})._table
    )

    def pred(lt, rt):
        ge = binary_operation(lt["k"], rt["lo"], "ge")
        lt_ = binary_operation(lt["k"], rt["hi"], "lt")
        return binary_operation(ge, lt_, "and")

    node = IRs.ConditionalJoin(small_l, small_r, pred)
    out = LazyFrame(node).collect().to_pandas()
    pl = pdf.head(30)[["k", "v"]]
    pr = pd.DataFrame({"lo": [0, 2, 4], "hi": [2, 4, 8]})
    expect = pl.merge(pr, how="cross")
    expect = expect[(expect.k >= expect.lo) & (expect.k < expect.hi)]
    assert len(out) == len(expect)


def test_sink_parquet(tmp_path, data):
    gdf, pdf = data
    path = str(tmp_path / "sink.pq")
    from_dataframe(gdf).filter(col("v") > 0).sink_parquet(path).collect()
    back = ct.read_parquet(path)
    assert len(back) == int((pdf.v > 0).sum())


def test_rolling_ir(data):
    gdf, pdf = data
    from cudf_tpu.engine import ir as IRs

    srt = pdf.sort_values("w").reset_index(drop=True)
    node = IRs.Rolling(
        IRs.DataFrameScan(ct.DataFrame.from_pandas(srt)._table),
        "w", 4, [("v_sum", "v", "sum")],
    )
    out = LazyFrame(node).collect().to_pandas()
    expect = srt["v"].rolling(4).sum()
    np.testing.assert_allclose(out["v_sum"].to_numpy(), expect.to_numpy(),
                               equal_nan=True, rtol=1e-9)


def test_python_scan():
    from cudf_tpu.engine import ir as IRs

    node = IRs.PythonScan(lambda: ct.DataFrame({"x": [1, 2, 3]}))
    out = LazyFrame(node).select((col("x") * 2).alias("y")).collect()
    assert out["y"].tolist() == [2, 4, 6]


def test_time_rolling_frame(rng):
    ts = pd.date_range("2021-01-01", periods=80, freq="11min")
    ps = pd.Series(rng.normal(size=80), index=ts)
    g = ct.from_pandas(ps)
    got = g.rolling("1h").sum().to_pandas()
    expect = ps.rolling("1h").sum()
    np.testing.assert_allclose(got.values, expect.values, equal_nan=True, rtol=1e-9)


def test_streaming_sort_range_partitioned(rng):
    """Sort lowering: range partitioning by key rank (not concat-resort);
    exact global order incl. tie stability and secondary keys."""
    import pandas as pd
    import cudf_tpu as ct
    from cudf_tpu.engine.lazy import LazyFrame

    n = 5000
    pdf = pd.DataFrame({
        "k": rng.integers(0, 50, n),     # heavy ties
        "v": rng.normal(size=n),
        "tag": np.arange(n),
    })
    lf = LazyFrame.from_dataframe(ct.DataFrame.from_pandas(pdf)) \
        .sort(["k", "v"], descending=[False, True])
    got = lf.collect(streaming=True, mesh=6).to_pandas().reset_index(drop=True)
    exp = pdf.sort_values(["k", "v"], ascending=[True, False],
                          kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_optimizer_cse_shares_subplans(rng):
    """Structurally-equal subtrees collapse to one node → evaluated once."""
    import pandas as pd
    import cudf_tpu as ct
    from cudf_tpu.engine.lazy import LazyFrame
    from cudf_tpu.engine.expr import col
    from cudf_tpu.engine import ir as IRs
    from cudf_tpu.engine.optimizer import optimize

    pdf = pd.DataFrame({"k": rng.integers(0, 10, 200), "v": rng.normal(size=200)})
    df = ct.DataFrame.from_pandas(pdf)
    base = LazyFrame.from_dataframe(df).group_by("k").agg(
        col("v").sum().alias("s"))
    # self-join of the same aggregation subplan
    joined = base.join(base, on="k", suffix="_r")
    plan = optimize(joined._node)
    assert isinstance(plan, IRs.Join)
    assert plan.children[0] is plan.children[1]  # CSE shared the subtree
    out = joined.collect().to_pandas()
    exp = pdf.groupby("k")["v"].sum()
    assert len(out) == len(exp)
    np.testing.assert_allclose(np.sort(out["s"].values), np.sort(exp.values))


def test_streaming_auto_spill_answers_q1(rng):
    """Executor spills under an artificial budget and still answers a
    Q1-shaped aggregation (spill_manager.py:202-351 role)."""
    import pandas as pd
    import cudf_tpu as ct
    from cudf_tpu.engine.lazy import LazyFrame
    from cudf_tpu.engine.expr import col
    from cudf_tpu.utils.config import option_context
    from cudf_tpu.utils.spill import get_spill_manager

    n = 20_000
    pdf = pd.DataFrame({
        "flag": rng.integers(0, 3, n),
        "qty": rng.integers(1, 50, n).astype(np.float64),
        "price": rng.normal(1000, 100, n),
    })
    lf = (LazyFrame.from_dataframe(ct.DataFrame.from_pandas(pdf))
          .with_columns((col("qty") * col("price")).alias("rev"))
          .group_by("flag")
          .agg(col("rev").sum().alias("rev"), col("qty").sum().alias("qty")))
    mgr = get_spill_manager()
    before = mgr.statistics.spills
    with option_context("spill", True), \
         option_context("spill.device_limit_bytes", 64 * 1024):
        out = lf.collect(streaming=True, mesh=8).to_pandas()
    assert mgr.statistics.spills > before          # budget actually bit
    exp = (pdf.assign(rev=pdf.qty * pdf.price).groupby("flag")
           .agg(rev=("rev", "sum"), qty=("qty", "sum")).reset_index())
    got = out.sort_values("flag").reset_index(drop=True)
    np.testing.assert_allclose(got["rev"], exp["rev"], rtol=1e-9)
    np.testing.assert_allclose(got["qty"], exp["qty"], rtol=1e-12)


def test_streaming_var_std_decomposed(rng):
    """var/std lower to (sum, sumsq, count) partials (M2/MERGE_M2 role),
    not the concat-everything global fallback."""
    import pandas as pd
    import cudf_tpu as ct
    from cudf_tpu.engine.lazy import LazyFrame
    from cudf_tpu.engine.expr import col
    from cudf_tpu.engine import streaming as st

    n = 4000
    pdf = pd.DataFrame({"k": rng.integers(0, 17, n), "v": rng.normal(size=n)})
    lf = (LazyFrame.from_dataframe(ct.DataFrame.from_pandas(pdf))
          .group_by("k").agg(col("v").var().alias("var"),
                             col("v").std().alias("std"),
                             col("v").mean().alias("mean")))
    # global fallback must NOT be taken
    import unittest.mock as mock

    with mock.patch.object(st, "_groupby_global",
                           side_effect=AssertionError("global fallback")):
        got = lf.collect(streaming=True, mesh=6).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    exp = (pdf.groupby("k")["v"].agg(["var", "std", "mean"])
           .reset_index())
    np.testing.assert_allclose(got["var"], exp["var"], rtol=1e-9)
    np.testing.assert_allclose(got["std"], exp["std"], rtol=1e-9)
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-9)


def test_over_window_expressions(rng):
    """col.agg().over(keys): per-group aggregate broadcast to rows, in
    both executors (the `over` lowering the round-1 review flagged)."""
    import pandas as pd
    import cudf_tpu as ct
    from cudf_tpu.engine.lazy import LazyFrame
    from cudf_tpu.engine.expr import col

    n = 3000
    pdf = pd.DataFrame({"k": rng.integers(0, 11, n), "v": rng.normal(size=n)})
    lf = (LazyFrame.from_dataframe(ct.DataFrame.from_pandas(pdf))
          .with_columns(col("v").sum().over("k").alias("gsum"),
                        (col("v") - col("v").mean().over("k")).alias("centered")))
    exp_gsum = pdf.groupby("k")["v"].transform("sum")
    exp_cent = pdf["v"] - pdf.groupby("k")["v"].transform("mean")
    got = lf.collect().to_pandas()
    np.testing.assert_allclose(got["gsum"], exp_gsum, rtol=1e-9)
    np.testing.assert_allclose(got["centered"], exp_cent, rtol=1e-9)
    # streaming executor repartitions by the over-keys; row ORDER across
    # partitions changes, so compare per-key aggregates
    got_s = lf.collect(streaming=True, mesh=5).to_pandas()
    gks = got_s.groupby("k")["gsum"].first().sort_index()
    eks = pdf.groupby("k")["v"].sum().sort_index()
    np.testing.assert_allclose(gks.values, eks.values, rtol=1e-9)
    np.testing.assert_allclose(got_s.groupby("k")["centered"].sum().values,
                               np.zeros(11), atol=1e-8)
