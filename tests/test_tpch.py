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
