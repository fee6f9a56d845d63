"""cudf_tpu.pandas proxy tests (reference: cudf_pandas_tests/)."""

import numpy as np
import pytest


@pytest.fixture
def proxy_pd():
    import cudf_tpu.pandas

    mod = cudf_tpu.pandas.install()
    yield mod
    cudf_tpu.pandas.uninstall()


def test_dataframe_fast_path(proxy_pd):
    pd = proxy_pd
    df = pd.DataFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]})
    import cudf_tpu

    assert isinstance(df._fast, cudf_tpu.DataFrame)
    out = df.sum()
    assert out["a"] == 6


def test_groupby_through_proxy(proxy_pd):
    pd = proxy_pd
    df = pd.DataFrame({"k": [1, 1, 2], "v": [10, 20, 30]})
    got = df.groupby("k").sum()
    assert list(got["v"]) == [30, 30]


def test_fallback_to_pandas(proxy_pd):
    pd = proxy_pd
    df = pd.DataFrame({"a": [1, 2, 3]})
    # style is pandas-only — must transparently fall back
    sty = df.style
    assert sty is not None


def test_merge_function(proxy_pd):
    pd = proxy_pd
    a = pd.DataFrame({"k": [1, 2], "x": [1, 2]})
    b = pd.DataFrame({"k": [1, 2], "y": [3, 4]})
    out = pd.merge(a, b, on="k")
    assert len(out) == 2 and "y" in out.columns


def test_profiler(proxy_pd):
    import cudf_tpu.pandas as ctp

    pd = proxy_pd
    with ctp.Profiler() as prof:
        df = pd.DataFrame({"a": [1, 2, 3]})
        df.sum()
    assert prof.stats["fast"] >= 1


def test_numpy_interop(proxy_pd):
    pd = proxy_pd
    s = pd.Series([1.0, 2.0, 3.0])
    assert float(np.asarray(s).sum()) == 6.0


def test_chained_ops(proxy_pd):
    pd = proxy_pd
    df = pd.DataFrame({"k": [1, 2, 1, 2], "v": [1.0, 2.0, 3.0, 4.0]})
    out = df[df["v"] > 1.0].groupby("k").mean()
    assert len(out) == 2
