"""Avro reader tests (reference: python/cudf/cudf/tests — test_avro.py role).

fastavro is not in the image, so the oracle is a self-contained
spec-faithful encoder below (Avro 1.11 container format).
"""

import json
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.io import avro as avro_mod

SYNC = bytes(range(16))


def _zz(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(t, v, out: bytearray):
    if isinstance(t, list):                      # union with null
        nb = t.index("null")
        if v is None:
            out += _zz(nb)
            return
        out += _zz(1 - nb)
        t = t[1 - nb]
    base = t["type"] if isinstance(t, dict) else t
    if base == "null":
        return
    if base == "boolean":
        out.append(1 if v else 0)
    elif base in ("int", "long"):
        out += _zz(int(v))
    elif base == "float":
        out += struct.pack("<f", v)
    elif base == "double":
        out += struct.pack("<d", v)
    elif base in ("bytes", "string"):
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        out += _zz(len(b)) + b
    elif base == "enum":
        out += _zz(t["symbols"].index(v))
    elif base == "fixed":
        assert len(v) == t["size"]
        out += bytes(v)
    else:
        raise AssertionError(base)


def make_avro(schema: dict, rows: list, codec="null", block_rows=None) -> bytes:
    out = bytearray(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out += _zz(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zz(len(kb)) + kb + _zz(len(v)) + v
    out += _zz(0)
    out += SYNC
    block_rows = block_rows or max(len(rows), 1)
    fields = schema["fields"]
    for lo in range(0, len(rows), block_rows):
        chunk = rows[lo:lo + block_rows]
        body = bytearray()
        for row in chunk:
            for f in fields:
                _encode_value(f["type"], row[f["name"]], body)
        body = bytes(body)
        if codec == "deflate":
            comp = zlib.compress(body)[2:-4]     # raw deflate
        elif codec == "snappy":
            from cudf_tpu import native

            comp = native.snappy_compress(body) + struct.pack(
                ">I", zlib.crc32(body) & 0xFFFFFFFF)
        else:
            comp = body
        out += _zz(len(chunk)) + _zz(len(comp)) + comp + SYNC
    return bytes(out)


SCHEMA = {
    "type": "record", "name": "r",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": ["null", "int"]},
        {"name": "l", "type": ["long", "null"]},
        {"name": "f", "type": "float"},
        {"name": "d", "type": ["null", "double"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["red", "green", "blue"]}},
    ],
}

ROWS = [
    {"b": True, "i": 1, "l": 10**12, "f": 1.5, "d": 2.5, "s": "aa", "e": "red"},
    {"b": False, "i": None, "l": None, "f": -0.25, "d": None, "s": None,
     "e": "blue"},
    {"b": True, "i": -7, "l": -3, "f": 0.0, "d": 1e300, "s": "ü×", "e": "green"},
    {"b": False, "i": 2**31 - 1, "l": 2**62, "f": 2.0, "d": -1.0, "s": "",
     "e": "red"},
]


def _expected(rows=ROWS):
    return pd.DataFrame({
        "b": [r["b"] for r in rows],
        "i": pd.array([r["i"] for r in rows], dtype="Int32"),
        "l": pd.array([r["l"] for r in rows], dtype="Int64"),
        "f": np.asarray([r["f"] for r in rows], np.float32),
        "d": [r["d"] for r in rows],
        "s": [r["s"] for r in rows],
        "e": pd.Categorical([r["e"] for r in rows],
                            categories=["red", "green", "blue"]),
    })


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
@pytest.mark.parametrize("block_rows", [None, 2])
def test_roundtrip(tmp_path, codec, block_rows):
    p = tmp_path / "t.avro"
    p.write_bytes(make_avro(SCHEMA, ROWS, codec=codec,
                            block_rows=block_rows))
    got = ct.read_avro(str(p)).to_pandas()
    exp = _expected()
    assert list(got.columns) == list(exp.columns)
    for c in exp.columns:
        ge, ee = got[c].tolist(), exp[c].tolist()
        for g, e in zip(ge, ee):
            if e is None or e is pd.NA or (isinstance(e, float) and pd.isna(e)):
                assert g is None or pd.isna(g)
            elif isinstance(e, float):
                assert g == pytest.approx(e, rel=1e-6)
            else:
                assert g == e


def test_columns_skip_numrows(tmp_path):
    p = tmp_path / "t.avro"
    p.write_bytes(make_avro(SCHEMA, ROWS, block_rows=2))
    got = ct.read_avro(str(p), columns=["l", "s"], skiprows=1, num_rows=2)
    assert list(got.to_pandas().columns) == ["l", "s"]
    svals = got.to_pandas()["s"].tolist()
    assert pd.isna(svals[0]) and svals[1] == "ü×"
    # skip crossing a whole block
    got2 = ct.read_avro(str(p), skiprows=2, num_rows=1).to_pandas()
    assert got2["i"].tolist() == [-7]


def test_fixed_and_bytes(tmp_path):
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "fixed", "name": "f4", "size": 4}},
        {"name": "y", "type": ["null", "bytes"]},
    ]}
    rows = [{"x": b"abcd", "y": b"zz"}, {"x": b"wxyz", "y": None}]
    p = tmp_path / "t.avro"
    p.write_bytes(make_avro(schema, rows))
    got = ct.read_avro(str(p)).to_pandas()
    assert got["x"].tolist() == ["abcd", "wxyz"]
    yvals = got["y"].tolist()
    assert yvals[0] == "zz" and pd.isna(yvals[1])


def test_logical_types(tmp_path):
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "dte", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-millis"}},
        {"name": "tu", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
    ]}
    rows = [{"dte": 19000, "ts": 1_600_000_000_123, "tu": 1_600_000_000_123_456}]
    p = tmp_path / "t.avro"
    p.write_bytes(make_avro(schema, rows))
    got = ct.read_avro(str(p)).to_pandas()
    assert got["dte"].iloc[0] == pd.Timestamp("1970-01-01") + pd.Timedelta(days=19000)
    assert got["ts"].iloc[0] == pd.Timestamp(1_600_000_000_123, unit="ms")
    assert got["tu"].iloc[0] == pd.Timestamp(1_600_000_000_123_456, unit="us")


def test_python_fallback_matches_native(tmp_path):
    """The toolchain-free decoder and the csrc decoder agree bit-for-bit."""
    fields = avro_mod._parse_schema(json.dumps(SCHEMA))
    body = bytearray()
    for row in ROWS:
        for f in SCHEMA["fields"]:
            _encode_value(f["type"], row[f["name"]], body)
    a = avro_mod._decode_block_py(bytes(body), len(ROWS), fields)
    b = avro_mod._decode_block(bytes(body), len(ROWS), fields)
    for (pa_, pb_) in zip(a, b):
        assert len(pa_) == len(pb_)
        for xa, xb in zip(pa_, pb_):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_empty_and_errors(tmp_path):
    p = tmp_path / "t.avro"
    p.write_bytes(make_avro(SCHEMA, []))
    assert ct.read_avro(str(p)).shape == (0, 7)
    with pytest.raises(NotImplementedError):
        avro_mod._parse_schema(json.dumps({
            "type": "record", "name": "r", "fields": [
                {"name": "a", "type": {"type": "array", "items": "int"}}]}))
