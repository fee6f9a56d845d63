"""Timezone conversion vs pandas (reference: cpp/src/datetime/timezone.cpp
TZif table lookup)."""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.core.column import Column
from cudf_tpu.ops import timezone as tz_ops

NY = "America/New_York"


def test_load_transitions():
    trans, offs = tz_ops.load_transitions(NY)
    assert len(trans) > 100 and len(offs) == len(trans) + 1
    assert set(np.unique(offs[-10:])) <= {-5 * 3600, -4 * 3600}  # EST/EDT


def test_tz_localize_convert_roundtrip_vs_pandas():
    # unambiguous wall times across both DST regimes
    ts = pd.to_datetime([
        "2023-01-15 12:00", "2023-06-15 12:00", "2023-03-12 01:59",
        "2023-11-05 00:30", "1999-07-04 08:00", "2030-02-01 23:00",
    ])
    s = ct.Series(ts)
    aware = s.dt.tz_localize(NY)
    assert aware.dtype.tz == NY
    expect = pd.Series(ts).dt.tz_localize(NY)
    got = aware.to_pandas()
    assert (got == expect).all()
    # hour extraction respects the zone
    assert aware.dt.hour.to_pandas().tolist() == expect.dt.hour.tolist()
    # convert to another zone: same instants, different wall clock
    la = aware.dt.tz_convert("America/Los_Angeles")
    expect_la = expect.dt.tz_convert("America/Los_Angeles")
    assert (la.to_pandas() == expect_la).all()
    assert la.dt.hour.to_pandas().tolist() == expect_la.dt.hour.tolist()
    # back to naive
    naive = la.dt.tz_convert(None)
    assert naive.dtype.tz is None


def test_utc_fastpath_and_arrow_roundtrip():
    ts = pd.Series(pd.to_datetime(["2021-05-01 10:00", "2021-12-01 10:00"])
                   ).dt.tz_localize("UTC").dt.tz_convert(NY)
    s = ct.Series(ts)
    assert s.dtype.tz == NY
    assert (s.to_pandas() == ts).all()
    assert s.dt.hour.to_pandas().tolist() == ts.dt.hour.tolist()


def test_dtype_string_form():
    from cudf_tpu.core import dtypes as dt

    d = dt.dtype(f"datetime64[ns, {NY}]")
    assert d.tz == NY and d.time_unit == "ns"
    assert repr(d) == f"datetime64[ns, {NY}]"


def test_ambiguous_takes_post_transition_offset():
    # 2023-11-05 01:30 happens twice in NY; we document post-transition (EST)
    c = Column.from_numpy(np.array(["2023-11-05 01:30"], dtype="datetime64[ns]"))
    aware = tz_ops.tz_localize(c, NY)
    back = tz_ops.wall_clock_column(aware)
    assert np.asarray(back.data)[0] == np.datetime64("2023-11-05 01:30", "ns").astype(np.int64)
