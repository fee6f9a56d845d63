"""Bit-exactness of the default-ON groupby kernel tier vs pandas
(VERDICT r2 item 2; BASELINE.md's bit-exact contract).

The kernel tier decomposes integer values into signed 8-bit chunks with
double-float f32 accumulators (kernels/hash_aggregate.py docstring), so
int sums/counts/means are bit-identical to pandas at any row count.
These tests drive it through the public DataFrame API on CPU via the
interpret-mode option; the driver's bench exercises the compiled path.
"""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu
from cudf_tpu.utils.config import set_option, get_option


@pytest.fixture
def kernel_tier():
    old = [get_option("groupby.kernel_interpret"),
           get_option("groupby.fast_path_min_rows")]
    set_option("groupby.kernel_interpret", True)
    set_option("groupby.fast_path_min_rows", 1000)
    yield
    set_option("groupby.kernel_interpret", old[0])
    set_option("groupby.fast_path_min_rows", old[1])


@pytest.fixture
def rng():
    return np.random.default_rng(11)


N = 1_000_000


def _compare(pdf, aggs, **kw):
    gdf = cudf_tpu.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k", **kw).agg(aggs).to_pandas()
    exp = pdf.groupby("k", **kw).agg(aggs)
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_int_sum_count_mean_bit_exact(rng, kernel_tier):
    pdf = pd.DataFrame({
        "k": rng.integers(0, 100, N).astype(np.int32),
        "v": rng.integers(-2**30, 2**30, N).astype(np.int64),
    })
    _compare(pdf, {"v": "sum"})
    _compare(pdf, {"v": "count"})
    _compare(pdf, {"v": "mean"})


def test_int_high_cardinality_sum_bit_exact(rng, kernel_tier):
    pdf = pd.DataFrame({
        "k": rng.integers(0, 50_000, 200_000).astype(np.int64),
        "v": rng.integers(-2**30, 2**30, 200_000).astype(np.int64),
    })
    _compare(pdf, {"v": "sum"})


def test_int_minmax_exact(rng, kernel_tier):
    pdf = pd.DataFrame({
        "k": rng.integers(0, 64, 100_000).astype(np.int32),
        "v": rng.integers(-2**23, 2**23, 100_000).astype(np.int32),
    })
    _compare(pdf, {"v": ["min", "max"]})


def test_bool_sum(rng, kernel_tier):
    pdf = pd.DataFrame({
        "k": rng.integers(0, 16, 100_000).astype(np.int32),
        "v": rng.random(100_000) < 0.3,
    })
    _compare(pdf, {"v": "sum"})


def test_value_nulls_keep_groups(rng, kernel_tier):
    # a key whose values are all-null still forms a group (count 0)
    k = rng.integers(0, 8, 50_000).astype(np.int32)
    v = rng.integers(0, 1000, 50_000).astype(np.float64)
    v[k == 3] = np.nan
    pdf = pd.DataFrame({"k": k, "v": v})
    gdf = cudf_tpu.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").agg({"v": "count"}).to_pandas()
    exp = pdf.groupby("k").agg({"v": "count"})
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_float_sum_close(rng, kernel_tier):
    # floats: double-float accumulators — documented ~1e-9 relative
    pdf = pd.DataFrame({
        "k": rng.integers(0, 100, N).astype(np.int32),
        "v": rng.uniform(0, 100, N),
    })
    gdf = cudf_tpu.DataFrame.from_pandas(pdf)
    got = gdf.groupby("k").agg({"v": "sum"}).to_pandas()
    exp = pdf.groupby("k").agg({"v": "sum"})
    pd.testing.assert_frame_equal(got, exp, rtol=1e-7)


def test_wide_int64_falls_back_exact(rng, kernel_tier):
    # values beyond the chunk range route to the sort tier, still exact
    pdf = pd.DataFrame({
        "k": rng.integers(0, 10, 100_000).astype(np.int32),
        "v": rng.integers(2**40, 2**50, 100_000).astype(np.int64),
    })
    _compare(pdf, {"v": "sum"})


def test_high_cardinality_min_max_exact(rng):
    """K>4096 min/max dispatches to the segment-reduce tier in the
    column's NATIVE dtype (VERDICT r4 item 9; reference hash groupby
    covers all agg kinds at any cardinality,
    compute_single_pass_aggs.cu:14-37) — bit-exact vs pandas, f64
    extremes and wide int64 included."""
    import jax

    import cudf_tpu as ct
    from cudf_tpu.utils.config import get_option, set_option

    n, K = 300_000, 50_000
    pdf = pd.DataFrame({
        "k": rng.integers(0, K, n),
        "f": rng.normal(size=n) * 1e12,              # f32-unrepresentable
        "i": rng.integers(-(1 << 60), 1 << 60, n),   # beyond 2^24 guard
    })
    prev = get_option("groupby.fast_path_min_rows")
    set_option("groupby.fast_path_min_rows", 1)
    prev_i = get_option("groupby.kernel_interpret")
    set_option("groupby.kernel_interpret", True)
    try:
        df = ct.DataFrame.from_pandas(pdf)
        got = df.groupby("k").agg({"f": ["min", "max"], "i": ["min", "max"]})
        gp = got.to_pandas().sort_index()
        exp = pdf.groupby("k").agg({"f": ["min", "max"],
                                    "i": ["min", "max"]}).sort_index()
        np.testing.assert_array_equal(gp[("f", "min")].to_numpy(),
                                      exp[("f", "min")].to_numpy())
        np.testing.assert_array_equal(gp[("f", "max")].to_numpy(),
                                      exp[("f", "max")].to_numpy())
        np.testing.assert_array_equal(gp[("i", "min")].to_numpy(),
                                      exp[("i", "min")].to_numpy())
        np.testing.assert_array_equal(gp[("i", "max")].to_numpy(),
                                      exp[("i", "max")].to_numpy())
    finally:
        set_option("groupby.fast_path_min_rows", prev)
        set_option("groupby.kernel_interpret", prev_i)
