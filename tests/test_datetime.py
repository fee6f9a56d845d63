import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


@pytest.fixture
def ts_pair(rng):
    base = pd.Timestamp("2000-01-01").value
    ticks = base + rng.integers(0, 10**18, 200)
    ps = pd.Series(ticks.astype("datetime64[ns]"))
    return ct.Series(ps.to_numpy()), ps


@pytest.mark.parametrize("field", ["year", "month", "day", "hour", "minute",
                                   "second", "dayofyear", "quarter",
                                   "days_in_month", "is_leap_year",
                                   "is_month_start", "is_month_end"])
def test_dt_fields(ts_pair, field):
    g, p = ts_pair
    assert_eq(getattr(g.dt, field), getattr(p.dt, field), check_dtype=False)


def test_weekday(ts_pair):
    g, p = ts_pair
    assert_eq(g.dt.weekday, p.dt.weekday, check_dtype=False)


@pytest.mark.parametrize("freq", ["D", "h", "min", "s"])
def test_floor_ceil_round(ts_pair, freq):
    g, p = ts_pair
    assert_eq(g.dt.floor(freq), p.dt.floor(freq))
    assert_eq(g.dt.ceil(freq), p.dt.ceil(freq))
    assert_eq(g.dt.round(freq), p.dt.round(freq))


def test_to_datetime_strings():
    vals = ["2021-01-01 00:00:00", "2022-06-15 10:30:00", None]
    got = ct.to_datetime(ct.Series(vals))
    expect = pd.to_datetime(pd.Series(vals))
    assert_eq(got, expect)


def test_timedelta_props():
    td = pd.Series(pd.to_timedelta(["1 days 02:00:00", "3 days", "00:00:30"]))
    g = ct.Series(td.to_numpy())
    assert_eq(g.dt.days, td.dt.days, check_dtype=False)
    assert_eq(g.dt.seconds, td.dt.seconds, check_dtype=False)
    assert_eq(g.dt.total_seconds(), td.dt.total_seconds(), check_dtype=False)


def test_date_range():
    got = ct.date_range("2021-01-01", periods=5, freq="D")
    expect = pd.date_range("2021-01-01", periods=5, freq="D")
    assert got.to_pylist() == list(expect.to_numpy())


def test_unit_conversion():
    ps = pd.Series(pd.to_datetime(["2021-05-05 01:02:03.123456789"]))
    g = ct.Series(ps.to_numpy())
    got = g.astype("datetime64[ms]")
    expect = ps.astype("datetime64[ms]")
    assert_eq(got, expect)


def test_timestamp_sort_and_groupby(rng):
    ts = pd.Series(
        (pd.Timestamp("2020-01-01").value + rng.integers(0, 10**17, 100)).astype("datetime64[ns]")
    )
    g = ct.Series(ts.to_numpy())
    assert_eq(g.sort_values(ignore_index=True), ts.sort_values(ignore_index=True))
