"""tpudf format, transpose, resample, groupby transform/filter, agg."""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


def test_tpudf_roundtrip(tmp_path, frames):
    gdf, pdf = frames
    path = str(tmp_path / "t.tpudf")
    gdf.to_tpudf(path)
    assert_eq(ct.read_tpudf(path), pdf, check_dtype=False)


def test_transpose_numeric():
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.T.to_pandas()
    expect = pdf.T
    np.testing.assert_allclose(got.values, expect.values)


def test_resample_vs_pandas(rng):
    ts = pd.date_range("2022-01-01", periods=300, freq="23min")
    pdf = pd.DataFrame({"v": rng.normal(size=300)}, index=ts)
    gdf = ct.DataFrame.from_pandas(pdf)
    for agg in ("sum", "mean", "count", "max"):
        got = getattr(gdf.resample("2h"), agg)().to_pandas()
        expect = getattr(pdf.resample("2h"), agg)()
        np.testing.assert_allclose(
            got["v"].fillna(-9e9).to_numpy(dtype=float),
            expect["v"].fillna(-9e9).to_numpy(dtype=float), rtol=1e-9,
        )
        assert (got.index == expect.index).all()


def test_groupby_transform(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 4, 80), "v": rng.normal(size=80)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").transform("mean").to_pandas()
    expect = pdf.groupby("k").transform("mean")
    np.testing.assert_allclose(got.values, expect.values)


def test_groupby_filter(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 4, 80), "v": rng.normal(size=80)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").filter(lambda g: g["v"].mean() > 0)
    expect = pdf.groupby("k").filter(lambda g: g["v"].mean() > 0)
    assert len(got) == len(expect)


def test_groupby_rank(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 4, 80), "v": rng.normal(size=80)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").rank(method="first").to_pandas()
    expect = pdf.groupby("k").rank(method="first")
    np.testing.assert_allclose(got.values, expect.values)


def test_frame_agg(rng):
    pdf = pd.DataFrame({"v": rng.normal(size=50), "w": rng.integers(0, 9, 50)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.agg({"v": "sum", "w": "max"})
    assert np.isclose(got["v"], pdf.v.sum()) and got["w"] == pdf.w.max()
    got2 = gdf["v"].agg(["sum", "mean"])
    assert np.isclose(got2["sum"], pdf.v.sum())


def test_index_setops_vs_pandas():
    # note: pandas Index.union preserves duplicate multiplicity; ours
    # returns the distinct sorted union — compare on unique inputs
    a = pd.Index([3, 1, 2])
    b = pd.Index([2, 4])
    ga, gb = ct.Index([3, 1, 2]), ct.Index([2, 4])
    assert ga.union(gb).to_pylist() == list(a.union(b))
    assert ga.intersection(gb).to_pylist() == list(a.intersection(b))
    assert ga.difference(gb).to_pylist() == list(a.difference(b))


def test_combine_first_update():
    s1 = ct.Series([1.0, None, 3.0])
    s2 = ct.Series([10.0, 20.0, 30.0])
    assert s1.combine_first(s2).tolist() == [1.0, 20.0, 3.0]
    s3 = ct.Series([1.0, 2.0, 3.0])
    s3.update(ct.Series([99.0], index=ct.Index([1])))
    assert s3.tolist() == [1.0, 99.0, 3.0]


def test_graft_entry_pipeline_cpu(rng):
    """Keep the driver entry's flagship pipeline covered by the CPU suite
    (bench.py's pipelines are the TPU Pallas kernels, covered by
    tests/test_radix.py and test_kernels.py in interpret mode)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    gk, s, m, c, ng = jax.jit(fn)(*args)
    keys, vals = args
    mask = np.asarray(c) > 0
    got = dict(zip(np.asarray(gk)[mask].tolist(), np.asarray(s)[mask].tolist()))
    expect = pd.DataFrame({"k": np.asarray(keys),
                           "v": np.asarray(vals)}).groupby("k")["v"].sum()
    assert len(got) == len(expect) == int(ng)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-2


def test_grouped_rolling_vs_pandas(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 5, 60),
                        "v": rng.normal(size=60),
                        "w": rng.normal(size=60)})
    gdf = ct.DataFrame.from_pandas(pdf)
    for agg in ("sum", "mean", "min", "max", "count", "std"):
        got = getattr(gdf.groupby("k").rolling(3), agg)().to_pandas()
        expect = getattr(pdf.groupby("k").rolling(3), agg)()
        np.testing.assert_allclose(
            got[["v", "w"]].fillna(-9e9).to_numpy(),
            expect[["v", "w"]].fillna(-9e9).to_numpy(), rtol=1e-9, atol=1e-12)
        # MultiIndex levels match
        assert got.index.get_level_values(0).tolist() == \
            expect.index.get_level_values(0).tolist()
        assert got.index.get_level_values(1).tolist() == \
            expect.index.get_level_values(1).tolist()


def test_grouped_rolling_min_periods(rng):
    pdf = pd.DataFrame({"k": rng.integers(0, 3, 30), "v": rng.normal(size=30)})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").rolling(4, min_periods=1).sum().to_pandas()
    expect = pdf.groupby("k").rolling(4, min_periods=1).sum()
    np.testing.assert_allclose(got["v"].to_numpy(), expect["v"].to_numpy(), rtol=1e-9)


def test_time_rolling_minmax_device(rng):
    ts = pd.date_range("2023-01-01", periods=100, freq="7min")
    pdf = pd.DataFrame({"v": rng.normal(size=100)}, index=ts)
    gdf = ct.DataFrame.from_pandas(pdf)
    for agg in ("min", "max", "std"):
        got = getattr(gdf["v"].rolling("30min"), agg)().to_pandas()
        expect = getattr(pdf["v"].rolling("30min"), agg)()
        np.testing.assert_allclose(got.fillna(-9e9).to_numpy(),
                                   expect.fillna(-9e9).to_numpy(), rtol=1e-9)


def test_masked_udf_dataframe():
    from cudf_tpu.utils import masked as mk

    df = ct.DataFrame({"a": [1.0, None, 3.0], "b": [10.0, 20.0, None]})
    out = df.apply(lambda r: r["a"] + r["b"], axis=1, engine="jax", masked=True)
    assert out.to_pandas().fillna(-1).tolist() == [11.0, -1.0, -1.0]
    # fillna inside the UDF clears nullness
    out2 = df.apply(lambda r: r["a"].fillna(0.0) + r["b"].fillna(0.0),
                    axis=1, engine="jax", masked=True)
    assert out2.to_pandas().tolist() == [11.0, 20.0, 3.0]
    # masked.where select
    out3 = df.apply(lambda r: mk.where(r["a"] > 2.0, r["a"], r["b"]),
                    axis=1, engine="jax", masked=True)
    assert out3.to_pandas().fillna(-1).tolist() == [10.0, -1.0, 3.0]


def test_masked_udf_series():
    s = ct.Series([1.0, None, -3.0])
    out = s.apply(lambda m: abs(m) * 2, masked=True)
    assert out.to_pandas().fillna(-1).tolist() == [2.0, -1.0, 6.0]


def test_stream_consumer(tmp_path):
    from cudf_tpu.io.streaming import FileLogSource, StreamConsumer

    p = tmp_path / "log.jsonl"
    p.write_bytes(b'{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n{"a": 3')
    c = StreamConsumer(FileLogSource(str(p)), fmt="jsonl")
    df = c.poll()
    assert df is not None and len(df) == 2  # partial third record held back
    assert df.to_pandas()["a"].tolist() == [1, 2]
    assert c.poll() is None                  # nothing complete yet
    with open(p, "ab") as f:
        f.write(b', "b": "z"}\n')
    df2 = c.poll()
    assert df2.to_pandas()["a"].tolist() == [3]
    assert c.poll() is None


def test_rolling_apply_device_udf():
    """Device rolling UDF (vmap in the rolling/jit NVRTC role): traceable
    funcs run on device; python funcs and partial windows fall back —
    both must match pandas exactly, incl. NaN-window masking."""
    import numpy as np
    import pandas as pd
    import cudf_tpu as ct

    rng = np.random.default_rng(0)
    x = rng.normal(size=150)
    x[[5, 17, 90]] = np.nan
    s, ps = ct.Series(x), pd.Series(x)
    for f in [lambda a: (a * a).mean() - a.min(),
              lambda a: 1.0,                    # NaN-window masking
              lambda a: float(sorted(a)[1])]:   # untraceable -> host
        got = s.rolling(7).apply(f, raw=True).to_pandas()
        exp = ps.rolling(7).apply(f, raw=True)
        pd.testing.assert_series_equal(got, exp, check_names=False)
    # min_periods < window -> host tier (raw both ways)
    f = lambda a: a.sum()
    got = s.rolling(6, min_periods=2).apply(f, raw=True).to_pandas()
    exp = ps.rolling(6, min_periods=2).apply(f, raw=True)
    pd.testing.assert_series_equal(got, exp, check_names=False)
    # raw=False keeps pandas Series skipna semantics -> host tier
    g2 = lambda a: a.mean()
    got = s.rolling(7).apply(g2).to_pandas()
    exp = ps.rolling(7).apply(g2, raw=False)
    pd.testing.assert_series_equal(got, exp, check_names=False)
