"""Datetime field extraction & rounding on int64 tick columns.

TPU-native equivalent of libcudf datetime (reference: cpp/src/datetime/).
Calendar math uses Howard Hinnant's branch-light civil_from_days algorithm
(also what libcudf uses), fully vectorized on the VPU — no per-row host
work.  Timestamps are UTC int64 ticks; timezone tables are a later layer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column

_TICKS = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}

_SECONDS_PER_DAY = 86_400


def _to_days_and_time(col: Column):
    """(days since epoch, seconds-of-day, subsecond ticks, ticks/sec)."""
    unit = col.dtype.time_unit or "s"
    tps = _TICKS[unit]
    t = col.data.astype(jnp.int64)
    day_ticks = tps * _SECONDS_PER_DAY
    days = jnp.floor_divide(t, day_ticks)
    rem = t - days * day_ticks
    secs = jnp.floor_divide(rem, tps)
    sub = rem - secs * tps
    return days, secs, sub, tps


def _civil_from_days(z: jnp.ndarray):
    """days-since-1970 → (year, month, day); Hinnant's algorithm."""
    z = z + 719468
    era = jnp.floor_divide(jnp.where(z >= 0, z, z - 146096), 146097)
    doe = z - era * 146097                                   # [0, 146096]
    yoe = jnp.floor_divide(doe - doe // 1460 + doe // 36524 - doe // 146096, 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)          # [0, 365]
    mp = jnp.floor_divide(5 * doy + 2, 153)                  # [0, 11]
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1          # [1, 31]
    m = jnp.where(mp < 10, mp + 3, mp - 9)                   # [1, 12]
    y = jnp.where(m <= 2, y + 1, y)
    return y, m, d


def _days_from_civil(y, m, d):
    y = jnp.where(m <= 2, y - 1, y)
    era = jnp.floor_divide(jnp.where(y >= 0, y, y - 399), 400)
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = jnp.floor_divide(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def extract(col: Column, field: str) -> Column:
    """field ∈ year month day hour minute second millisecond microsecond
    nanosecond weekday dayofyear quarter days_in_month is_leap_year
    is_month_start is_month_end."""
    days, secs, sub, tps = _to_days_and_time(col)
    if field in ("year", "month", "day", "quarter", "dayofyear", "days_in_month",
                 "is_leap_year", "is_month_start", "is_month_end"):
        y, m, d = _civil_from_days(days)
        if field == "year":
            out = y
        elif field == "month":
            out = m
        elif field == "day":
            out = d
        elif field == "quarter":
            out = (m - 1) // 3 + 1
        elif field == "dayofyear":
            out = days - _days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d)) + 1
        elif field in ("days_in_month", "is_month_end"):
            dim = _days_in_month(y, m)
            out = dim if field == "days_in_month" else (d == dim)
        elif field == "is_leap_year":
            out = _is_leap(y)
        else:  # is_month_start
            out = d == 1
    elif field == "weekday":  # Monday=0 (pandas dt.weekday)
        out = jnp.mod(days + 3, 7)
    elif field == "hour":
        out = secs // 3600
    elif field == "minute":
        out = (secs % 3600) // 60
    elif field == "second":
        out = secs % 60
    elif field == "millisecond":
        out = jnp.floor_divide(sub * 1000, tps) if tps < 1000 else jnp.floor_divide(sub, tps // 1000)
    elif field == "microsecond":
        # pandas .dt.microsecond: microseconds within the second
        out = jnp.floor_divide(sub, max(tps // 1_000_000, 1)) if tps >= 1_000_000 else sub * (1_000_000 // tps)
    elif field == "nanosecond":
        out = sub * (1_000_000_000 // tps) % 1000 if tps < 1_000_000_000 else sub % 1000
    else:
        raise ValueError(f"unknown datetime field {field!r}")
    if field.startswith("is_"):
        return Column(dt.BOOL8, col.length, data=out.astype(jnp.bool_), validity=col.validity)
    return Column(dt.INT32, col.length, data=out.astype(jnp.int32), validity=col.validity)


def _is_leap(y):
    return (jnp.mod(y, 4) == 0) & ((jnp.mod(y, 100) != 0) | (jnp.mod(y, 400) == 0))


def _days_in_month(y, m):
    base = jnp.asarray([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], jnp.int64)
    dim = jnp.take(base, m - 1)
    return jnp.where((m == 2) & _is_leap(y), 29, dim)


_FREQ_TICKS_NS = {
    "D": 86_400 * 1_000_000_000,
    "h": 3_600 * 1_000_000_000,
    "min": 60 * 1_000_000_000,
    "s": 1_000_000_000,
    "ms": 1_000_000,
    "us": 1_000,
    "ns": 1,
    # aliases
    "H": 3_600 * 1_000_000_000,
    "T": 60 * 1_000_000_000,
    "S": 1_000_000_000,
}


def _freq_ticks(freq: str, unit: str) -> int:
    # accept multiplied offsets: "5min", "15s", "2h" (pandas Tick aliases)
    mult = 1
    i = 0
    while i < len(freq) and freq[i].isdigit():
        i += 1
    if i:
        mult = int(freq[:i])
        freq = freq[i:]
    ns = _FREQ_TICKS_NS[freq] * mult
    denom = 1_000_000_000 // _TICKS[unit]
    if ns % denom:
        raise ValueError(f"freq {freq} not representable in unit {unit}")
    return ns // denom


def floor(col: Column, freq: str) -> Column:
    step = _freq_ticks(freq, col.dtype.time_unit or "s")
    t = col.data.astype(jnp.int64)
    out = jnp.floor_divide(t, step) * step
    return Column(col.dtype, col.length, data=out, validity=col.validity)


def ceil(col: Column, freq: str) -> Column:
    step = _freq_ticks(freq, col.dtype.time_unit or "s")
    t = col.data.astype(jnp.int64)
    out = jnp.floor_divide(t + step - 1, step) * step
    return Column(col.dtype, col.length, data=out, validity=col.validity)


def round(col: Column, freq: str) -> Column:  # noqa: A001
    """Round-half-even on the tick grid (pandas dt.round semantics)."""
    step = _freq_ticks(freq, col.dtype.time_unit or "s")
    t = col.data.astype(jnp.int64)
    q = jnp.floor_divide(t, step)
    rem = t - q * step
    twice = 2 * rem
    up = (twice > step) | ((twice == step) & (jnp.mod(q, 2) == 1))
    out = (q + up.astype(jnp.int64)) * step
    return Column(col.dtype, col.length, data=out, validity=col.validity)


def add_calendrical_months(col: Column, months) -> Column:
    """cudf::datetime::add_calendrical_months — day clamped to month end."""
    days, secs, sub, tps = _to_days_and_time(col)
    y, m, d = _civil_from_days(days)
    mm = m - 1 + (months.data.astype(jnp.int64) if isinstance(months, Column) else jnp.int64(months))
    y2 = y + jnp.floor_divide(mm, 12)
    m2 = jnp.mod(mm, 12) + 1
    d2 = jnp.minimum(d, _days_in_month(y2, m2))
    new_days = _days_from_civil(y2, m2, d2)
    t = (new_days * _SECONDS_PER_DAY + secs) * tps + sub
    validity = col.validity
    if isinstance(months, Column) and months.validity is not None:
        from cudf_tpu.core import bitmask as bm

        validity = bm.and_masks(validity, months.validity)
    return Column(col.dtype, col.length, data=t, validity=validity)


def strftime_parts(col: Column):
    """(y, m, d, hh, mm, ss, sub, tps) — used by string formatting."""
    days, secs, sub, tps = _to_days_and_time(col)
    y, m, d = _civil_from_days(days)
    return y, m, d, secs // 3600, (secs % 3600) // 60, secs % 60, sub, tps
