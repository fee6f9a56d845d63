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
