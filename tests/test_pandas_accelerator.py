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


def test_parity_sweep_no_fallbacks(proxy_pd, rng):
    """40 common pandas operations must run on the TPU fast path."""
    import cudf_tpu.pandas as ctp

    pd = proxy_pd
    with ctp.Profiler() as prof:
        df = pd.DataFrame({
            "k": rng.integers(0, 10, 200), "v": rng.normal(size=200),
            "w": rng.integers(0, 100, 200), "s": rng.choice(list("abcd"), 200),
        })
        df.head(); df[["v", "w"]].sum(); df.v.mean()
        df.groupby("k").sum(); df.groupby("k").agg({"v": "mean"})
        df.sort_values("v"); df[df.v > 0]; df.query("v > 0 & w < 50")
        pd.merge(df, df.head(20), on="k"); pd.concat([df, df])
        df.k.value_counts(); df.drop_duplicates("k"); df.v.fillna(0)
        df.w.astype("float64"); df.s.str.upper(); df.s.str.contains("a")
        df.v.cumsum(); df.v.rank(); df.v.nlargest(5); df.k.isin([1, 2])
        df.v.rolling(5).mean(); pd.get_dummies(df.s); pd.cut(df.v, 4)
        df.v.shift(1); df.v.diff(); df.v.clip(-1, 1); df.v.where(df.v > 0, 0)
        df.v.corr(df.w); df.k.nunique(); df.v.idxmax(); df.v.quantile(0.9)
    assert prof.stats.get("slow", 0) == 0, prof.stats
    assert prof.stats.get("fast", 0) >= 40


def test_numpy_dispatch_on_proxies():
    """np ufuncs/array-functions on proxies return proxied pandas results
    (the _wrappers/numpy.py interception role)."""
    import numpy as np

    from cudf_tpu.pandas import install, uninstall

    install()
    try:
        import pandas as pdp

        s = pdp.Series([1.0, 4.0, 9.0], name="x")
        r = np.sqrt(s)
        assert list(r) == [1.0, 2.0, 3.0]
        assert getattr(r, "name", None) == "x"        # pandas semantics kept
        df = pdp.DataFrame({"a": [1, 2], "b": [3, 4]})
        m = np.mean(df["a"])
        assert float(m) == 1.5
        w = np.where(df["a"] > 1, df["b"], 0)
        assert list(np.asarray(w)) == [0, 4]
    finally:
        uninstall()


def test_load_ipython_extension_entrypoint():
    import sys

    from cudf_tpu import pandas as ctp

    ctp.load_ipython_extension(None)
    try:
        import pandas as pdp

        assert getattr(pdp, "__proxy_for__", None) is not None
    finally:
        ctp.unload_ipython_extension(None)
