"""IANA timezone conversion on device.

TPU-native equivalent of cudf's timezone support
(reference: cpp/src/datetime/timezone.cpp — loads the TZif transition
table once, then converts per-row on the GPU with a table lookup).  Same
design here: the TZif file parses on host (RFC 8536 binary format, v2+
64-bit section), and conversion is one `searchsorted` + gather over the
transition table on device — no per-row host work.

Ambiguity note (documented divergence, same as cudf): wall→UTC
(`tz_localize`) resolves fall-back-ambiguous and spring-forward-missing
times with the post-transition offset; pandas raises by default.
"""

from __future__ import annotations

import os
import struct
from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column

_TZDIR = os.environ.get("TZDIR", "/usr/share/zoneinfo")

_TICKS = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


@lru_cache(maxsize=128)
def load_transitions(tz: str) -> Tuple[np.ndarray, np.ndarray]:
    """(transitions_utc_sec int64[t], offsets_sec int32[t+1]) — offsets[i]
    applies to instants before transitions[i]; offsets[t] after the last."""
    if tz in ("UTC", "utc", "GMT"):
        return np.zeros((0,), np.int64), np.zeros((1,), np.int32)
    path = os.path.join(_TZDIR, tz)
    if not os.path.isfile(path) or not os.path.realpath(path).startswith(
            os.path.realpath(_TZDIR)):
        raise ValueError(f"unknown timezone {tz!r}")
    with open(path, "rb") as f:
        data = f.read()

    def parse(buf, pos, tsize, tfmt):
        (isutcnt, isstdcnt, leapcnt, timecnt, typecnt, charcnt) = struct.unpack(
            ">6I", buf[pos:pos + 24])
        pos += 24
        times = np.frombuffer(buf, dtype=tfmt, count=timecnt, offset=pos).astype(np.int64)
        pos += timecnt * tsize
        idx = np.frombuffer(buf, dtype=np.uint8, count=timecnt, offset=pos)
        pos += timecnt
        ttinfo = []
        for i in range(typecnt):
            utoff, isdst, _ = struct.unpack(">iBB", buf[pos:pos + 6])
            ttinfo.append((utoff, isdst))
            pos += 6
        pos += charcnt + leapcnt * (tsize + 4) + isstdcnt + isutcnt
        return times, idx, ttinfo, pos

    if data[:4] != b"TZif":
        raise ValueError(f"not a TZif file: {path}")
    version = data[4:5]
    times, idx, ttinfo, pos = parse(data, 20, 4, ">i4")
    if version >= b"2":
        # v2+ repeats with 64-bit times after the v1 block
        assert data[pos:pos + 4] == b"TZif"
        times, idx, ttinfo, pos = parse(data, pos + 20, 8, ">i8")
    if len(ttinfo) == 0:
        return np.zeros((0,), np.int64), np.zeros((1,), np.int32)
    # offset before the first transition: first non-dst type, else type 0
    first = next((u for u, isdst in ttinfo if not isdst), ttinfo[0][0])
    offsets = np.empty(len(times) + 1, np.int32)
    offsets[0] = first
    for i, ti in enumerate(idx):
        offsets[i + 1] = ttinfo[ti][0]
    return times, offsets


def _tables(tz: str, unit: str):
    trans, offs = load_transitions(tz)
    mult = _TICKS[unit]
    return jnp.asarray(trans * mult), jnp.asarray(offs.astype(np.int64) * mult)


def utc_to_wall_ticks(ticks: jnp.ndarray, tz: str, unit: str) -> jnp.ndarray:
    trans, offs = _tables(tz, unit)
    if trans.shape[0] == 0:
        return ticks + offs[0]
    i = jnp.searchsorted(trans, ticks, side="right")
    return ticks + jnp.take(offs, i)


def wall_to_utc_ticks(ticks: jnp.ndarray, tz: str, unit: str) -> jnp.ndarray:
    trans, offs = _tables(tz, unit)
    if trans.shape[0] == 0:
        return ticks - offs[0]
    # transition instants expressed on the post-transition wall clock
    wall_trans = trans + offs[1:]
    i = jnp.searchsorted(wall_trans, ticks, side="right")
    return ticks - jnp.take(offs, i)


def tz_localize(col: Column, tz: str) -> Column:
    """Naive wall-clock timestamps → tz-aware (ticks become UTC).

    cudf semantics (timezone.cpp lookup): ambiguous/nonexistent wall times
    take the post-transition offset rather than raising.
    """
    if not col.dtype.is_timestamp:
        raise TypeError("tz_localize requires timestamps")
    if col.dtype.tz is not None:
        if tz is None:
            return Column(dt.DType(col.dtype.id), col.length, data=col.data,
                          validity=col.validity)
        raise TypeError("already tz-aware; use tz_convert")
    if tz is None:
        return col
    unit = col.dtype.time_unit or "ns"
    data = wall_to_utc_ticks(col.data.astype(jnp.int64), tz, unit)
    return Column(dt.DType(col.dtype.id, tz=tz), col.length, data=data,
                  validity=col.validity)


def tz_convert(col: Column, tz: str) -> Column:
    """tz-aware → another zone (pure metadata + no tick change: ticks are
    UTC; conversion only matters when extracting wall-clock fields)."""
    if col.dtype.tz is None:
        raise TypeError("tz-naive timestamps; use tz_localize")
    if tz is None:  # pandas: tz_convert(None) → UTC wall clock, naive
        return Column(dt.DType(col.dtype.id), col.length, data=col.data,
                      validity=col.validity)
    load_transitions(tz)  # validate zone name
    return Column(dt.DType(col.dtype.id, tz=tz), col.length, data=col.data,
                  validity=col.validity)


def wall_clock_column(col: Column) -> Column:
    """tz-aware column → naive column holding local wall-clock ticks (the
    input to civil-calendar field extraction)."""
    if col.dtype.tz is None:
        return col
    unit = col.dtype.time_unit or "ns"
    data = utc_to_wall_ticks(col.data.astype(jnp.int64), col.dtype.tz, unit)
    return Column(dt.DType(col.dtype.id), col.length, data=data,
                  validity=col.validity)
