"""TPC-H queries: engine vs pandas, in-memory and partitioned executors."""

import numpy as np
import pandas as pd
import pytest

from benchmarks import tpch


@pytest.fixture(scope="module")
def tables():
    return tpch.generate(scale=0.002, seed=7)


def test_q1(tables):
    got = tpch.q1(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q1")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, rtol=1e-9)


def test_q1_partitioned(tables):
    got = tpch.q1(tables, mesh=4).to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    expect = tpch.pandas_reference(tables, "q1")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, rtol=1e-9)


def test_q5(tables):
    got = tpch.q5(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q5")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, rtol=1e-9)


def test_q5_partitioned(tables):
    got = tpch.q5(tables, mesh=4).to_pandas().sort_values(
        "revenue", ascending=False).reset_index(drop=True)
    expect = tpch.pandas_reference(tables, "q5")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, rtol=1e-9)


def test_q6(tables):
    got = tpch.q6(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q6")
    assert np.isclose(float(got["revenue"].iloc[0]), expect, rtol=1e-9)


def test_q9(tables):
    got = tpch.q9(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q9")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, rtol=1e-9)


def test_q9_partitioned(tables):
    got = tpch.q9(tables, mesh=4).to_pandas().sort_values("n_name").reset_index(drop=True)
    expect = tpch.pandas_reference(tables, "q9")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, rtol=1e-9)


def test_q3(tables):
    got = tpch.q3(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q3")
    pd.testing.assert_frame_equal(got[["o_orderkey", "revenue"]],
                                  expect[["o_orderkey", "revenue"]],
                                  check_dtype=False, rtol=1e-9)


def test_q10(tables):
    got = tpch.q10(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q10")
    pd.testing.assert_frame_equal(got[["c_custkey", "revenue"]],
                                  expect[["c_custkey", "revenue"]],
                                  check_dtype=False, rtol=1e-9)


def test_q10_partitioned(tables):
    got = tpch.q10(tables, mesh=4).to_pandas()
    expect = tpch.pandas_reference(tables, "q10")
    np.testing.assert_allclose(got["revenue"].to_numpy(),
                               expect["revenue"].to_numpy(), rtol=1e-9)


def test_q4(tables):
    got = tpch.q4(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q4")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_q12(tables):
    got = tpch.q12(tables).to_pandas()
    expect = tpch.pandas_reference(tables, "q12")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_q14(tables):
    got = tpch.q14(tables)
    expect = tpch.pandas_reference(tables, "q14")
    assert abs(got - expect) < 1e-9


@pytest.fixture(scope="module")
def device_tables():
    return tpch.generate_device(scale=0.002, seed=7)


# ----------------------------------------------------------------------
# the same queries through the COMPILED SPMD path on a real 4-device
# mesh (reference discipline: the distributed tests are the same tests
# under a multi-device launcher, cudf_polars/tests/conftest.py:87-91).
# SPMD_LOWERED queries must compile (zero fallbacks); the rest must
# still answer bit-exact through the partition-list fallback.
# ----------------------------------------------------------------------

SPMD_LOWERED = {"q1", "q3", "q4", "q5", "q6", "q9", "q10",
                "q12", "q14"}
_ALL = ["q1", "q3", "q4", "q5", "q6", "q9", "q10", "q12", "q14"]


@pytest.mark.parametrize("nparts", [1, 4])
@pytest.mark.parametrize("qn", _ALL)
def test_spmd_mesh(device_tables, qn, nparts):
    import warnings

    import cudf_tpu.engine as eng
    from cudf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(nparts)
    eng.reset_fallback_stats()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = getattr(tpch, qn)(device_tables, mesh=mesh)
    stats = eng.get_fallback_stats()
    if qn in SPMD_LOWERED:
        assert stats["count"] == 0, f"{qn} fell back: {stats['reasons']}"
    else:
        assert stats["count"] > 0  # documented fallback (COVERAGE.md)
    expect = tpch.pandas_reference(device_tables, qn)
    if qn in ("q6", "q14"):
        val = float(got.to_pandas()["revenue"].iloc[0]) if qn == "q6" else got
        assert np.isclose(val, expect, rtol=1e-9)
        return
    got = got.to_pandas()
    sort_keys = {"q1": ["l_returnflag", "l_linestatus"], "q5": None,
                 "q9": ["n_name"], "q4": ["o_orderpriority"],
                 "q12": ["l_shipmode"], "q3": None, "q10": None}[qn]
    for c in got.columns:
        if got[c].dtype == object or str(got[c].dtype) == "category":
            got[c] = got[c].astype(str)
            expect[c] = expect[c].astype(str)
    if sort_keys:
        got = got.sort_values(sort_keys).reset_index(drop=True)
        expect = expect.sort_values(sort_keys).reset_index(drop=True)
    if qn in ("q3", "q10"):
        np.testing.assert_allclose(got["revenue"].to_numpy(),
                                   expect["revenue"].to_numpy(), rtol=1e-9)
        return
    pd.testing.assert_frame_equal(got, expect, check_dtype=False,
                                  rtol=1e-9, check_categorical=False)


@pytest.mark.parametrize("qn", ["q1", "q5", "q6", "q9"])
def test_device_generated(device_tables, qn):
    """generate_device tables (jax.random on device, dict-encoded strings)
    run the bench queries and agree with pandas on the same data."""
    got = getattr(tpch, qn)(device_tables).to_pandas()
    expect = tpch.pandas_reference(device_tables, qn)
    if qn == "q6":
        assert np.isclose(float(got["revenue"].iloc[0]), expect, rtol=1e-9)
    else:
        for c in got.columns:
            if got[c].dtype == object or str(got[c].dtype) == "category":
                got[c] = got[c].astype(str)
                expect[c] = expect[c].astype(str)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False,
                                      rtol=1e-9, check_categorical=False)
