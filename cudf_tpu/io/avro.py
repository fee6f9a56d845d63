"""Self-contained Avro container reader.

Reference: cpp/src/io/avro/ (avro.cpp header/schema parse, avro_gpu.cu
block decode, reader_impl.cu:1) and python/cudf/cudf/io/avro.py:12
(read_avro(path, columns, skiprows, num_rows)).

TPU-first shape: Avro rows are varint-delimited — decode is inherently
sequential within a block, so (like the reference, which parallelizes
over blocks on the GPU) the per-block record decode runs in the native
host tier (csrc avro_decode_block: zigzag varints -> columnar buffers),
and the assembled flat buffers make one contiguous HBM transfer per
column.  Schema/JSON and container framing are host metadata work, the
same tier as the thrift/footer parse (SURVEY §7 T3).

Supported (the reference reader's surface, avro_common.hpp:68): null,
boolean, int, long, float, double, bytes, string, enum (-> dictionary
column), fixed, 2-branch unions with null (-> validity), logical
date / timestamp-millis / timestamp-micros.  Nested records/arrays/maps
raise (the reference rejects them too).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.frame.dataframe import DataFrame
from cudf_tpu.frame.index import default_index

_MAGIC = b"Obj\x01"

# native decoder kind codes (csrc avro_decode_block)
_K_BOOL, _K_INT, _K_LONG, _K_FLOAT, _K_DOUBLE = 0, 1, 2, 3, 4
_K_BYTES, _K_STRING, _K_ENUM, _K_NULL, _K_FIXED = 5, 6, 7, 8, 9

_PRIMITIVE = {
    "null": _K_NULL, "boolean": _K_BOOL, "int": _K_INT, "long": _K_LONG,
    "float": _K_FLOAT, "double": _K_DOUBLE, "bytes": _K_BYTES,
    "string": _K_STRING,
}


class _Field:
    __slots__ = ("name", "kind", "null_branch", "extra", "symbols",
                 "logical")

    def __init__(self, name, kind, null_branch=-1, extra=0, symbols=None,
                 logical=None):
        self.name = name
        self.kind = kind
        self.null_branch = null_branch
        self.extra = extra
        self.symbols = symbols          # enum symbol list
        self.logical = logical          # "date"/"timestamp-millis"/...


def _resolve(t: Any, named: Dict[str, Any]) -> Tuple[int, int, Optional[list], Optional[str]]:
    """-> (kind, extra, symbols, logical) for one non-union type node."""
    if isinstance(t, str):
        if t in _PRIMITIVE:
            return _PRIMITIVE[t], 0, None, None
        if t in named:
            return _resolve(named[t], named)
        raise NotImplementedError(f"avro: unsupported type {t!r}")
    if isinstance(t, dict):
        base = t.get("type")
        if base == "enum":
            named[t["name"]] = t
            return _K_ENUM, 0, list(t["symbols"]), None
        if base == "fixed":
            named[t["name"]] = t
            return _K_FIXED, int(t["size"]), None, None
        if base in _PRIMITIVE:
            return (_PRIMITIVE[base], 0, None,
                    t.get("logicalType"))
        raise NotImplementedError(f"avro: unsupported complex type {base!r}")
    raise NotImplementedError(f"avro: unsupported schema node {t!r}")


def _parse_schema(schema_json: str) -> List[_Field]:
    schema = json.loads(schema_json)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise NotImplementedError("avro: top-level schema must be a record")
    named: Dict[str, Any] = {}
    fields: List[_Field] = []
    for f in schema["fields"]:
        t = f["type"]
        null_branch = -1
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise NotImplementedError(
                    "avro: only 2-branch unions with null are supported")
            null_branch = t.index("null")
            t = t[1 - null_branch]
        kind, extra, symbols, logical = _resolve(t, named)
        fields.append(_Field(f["name"], kind, null_branch, extra, symbols,
                             logical))
    return fields


# ----------------------------------------------------------------------
# container framing
# ----------------------------------------------------------------------

class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def raw_varint(self) -> int:
        v = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << shift
            if not (b & 0x80):
                return v
            shift += 7

    def zigzag(self) -> int:
        u = self.raw_varint()
        return (u >> 1) ^ -(u & 1)

    def take(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("avro: truncated container")
        self.pos += n
        return out


def _read_header(r: _Reader) -> Tuple[Dict[str, bytes], bytes]:
    if r.take(4) != _MAGIC:
        raise ValueError("avro: bad magic")
    meta: Dict[str, bytes] = {}
    while True:
        cnt = r.zigzag()
        if cnt == 0:
            break
        if cnt < 0:          # negative count: a byte size follows
            cnt = -cnt
            r.zigzag()
        for _ in range(cnt):
            klen = r.zigzag()
            key = r.take(klen).decode("utf-8")
            vlen = r.zigzag()
            meta[key] = r.take(vlen)
    sync = r.take(16)
    return meta, sync


def _decompress(block: bytes, codec: str) -> bytes:
    if codec in ("", "null"):
        return block
    if codec == "deflate":
        return zlib.decompress(block, wbits=-15)
    if codec == "snappy":
        # avro snappy codec = raw snappy + big-endian CRC32 of the plain
        from cudf_tpu import native

        plain = native.snappy_decompress(block[:-4])
        crc = struct.unpack(">I", block[-4:])[0]
        if zlib.crc32(plain) & 0xFFFFFFFF != crc:
            raise ValueError("avro: snappy block CRC mismatch")
        return plain
    raise NotImplementedError(f"avro: codec {codec!r}")


# ----------------------------------------------------------------------
# record decode (native with a pure-python fallback)
# ----------------------------------------------------------------------

def _decode_block_py(data: bytes, count: int, fields: List[_Field]):
    """Pure-python mirror of csrc avro_decode_block (toolchain-free tier)."""
    r = _Reader(data)
    outs = []
    for f in fields:
        if f.kind in (_K_BYTES, _K_STRING, _K_FIXED):
            outs.append(([0], bytearray(), []))
        else:
            outs.append(([], [], None))
    for _ in range(count):
        for f, o in zip(fields, outs):
            isnull = f.kind == _K_NULL
            if f.null_branch >= 0:
                br = r.zigzag()
                if br == f.null_branch:
                    isnull = True
            if f.kind in (_K_BYTES, _K_STRING, _K_FIXED):
                offs, chars, valid = o
                valid.append(0 if isnull else 1)
                if not isnull:
                    ln = f.extra if f.kind == _K_FIXED else r.zigzag()
                    chars.extend(r.take(ln))
                offs.append(len(chars))
            else:
                vals, valid, _ = o
                valid.append(0 if isnull else 1)
                if f.kind == _K_NULL:
                    pass
                elif isnull:
                    vals.append(0 if f.kind != _K_BOOL else 0)
                elif f.kind == _K_BOOL:
                    vals.append(r.take(1)[0])
                elif f.kind in (_K_INT, _K_LONG, _K_ENUM):
                    vals.append(r.zigzag())
                elif f.kind == _K_FLOAT:
                    vals.append(struct.unpack("<f", r.take(4))[0])
                elif f.kind == _K_DOUBLE:
                    vals.append(struct.unpack("<d", r.take(8))[0])
    res = []
    for f, o in zip(fields, outs):
        if f.kind in (_K_BYTES, _K_STRING, _K_FIXED):
            offs, chars, valid = o
            res.append((np.asarray(offs, np.int64), np.frombuffer(
                bytes(chars), np.uint8), np.asarray(valid, np.uint8)))
        else:
            vals, valid, _ = o
            npdt = {_K_BOOL: np.uint8, _K_INT: np.int32, _K_ENUM: np.int32,
                    _K_LONG: np.int64, _K_FLOAT: np.float32,
                    _K_DOUBLE: np.float64, _K_NULL: np.uint8}[f.kind]
            res.append((np.asarray(vals, npdt),
                        np.asarray(valid, np.uint8)))
    return res


def _decode_block(data: bytes, count: int, fields: List[_Field]):
    from cudf_tpu.native import load_native

    nat = load_native()
    if nat is None or not hasattr(nat, "avro_decode_block"):
        return _decode_block_py(data, count, fields)
    desc = np.asarray(
        [[f.kind, f.null_branch, f.extra] for f in fields],
        np.int32).tobytes()
    raw = nat.avro_decode_block(data, count, desc)
    res = []
    for f, entry in zip(fields, raw):
        if f.kind in (_K_BYTES, _K_STRING, _K_FIXED):
            offs, chars, valid = entry
            res.append((np.frombuffer(offs, np.int64),
                        np.frombuffer(chars, np.uint8),
                        np.frombuffer(valid, np.uint8)))
        else:
            vals, valid = entry
            npdt = {_K_BOOL: np.uint8, _K_INT: np.int32, _K_ENUM: np.int32,
                    _K_LONG: np.int64, _K_FLOAT: np.float32,
                    _K_DOUBLE: np.float64, _K_NULL: np.uint8}[f.kind]
            res.append((np.frombuffer(vals, npdt),
                        np.frombuffer(valid, np.uint8)))
    return res


# ----------------------------------------------------------------------
# column assembly
# ----------------------------------------------------------------------

def _make_column(f: _Field, parts: list) -> Column:
    import jax.numpy as jnp

    from cudf_tpu.core import bitmask as bm

    valid = np.concatenate([p[-1] for p in parts]) if parts else \
        np.zeros(0, np.uint8)
    n = int(valid.shape[0])
    mask = None if valid.all() else valid.astype(bool)
    if f.kind in (_K_BYTES, _K_STRING, _K_FIXED):
        chars = np.concatenate([p[1] for p in parts]) if parts else \
            np.zeros(0, np.uint8)
        offs = np.zeros(n + 1, np.int64)
        row, base = 1, 0
        for p in parts:
            po = p[0]
            offs[row:row + len(po) - 1] = po[1:] + base
            base += po[-1] if len(po) else 0
            row += len(po) - 1
        # bytes/fixed land as STRING columns too (the host boundary is
        # utf-8-agnostic; the reference maps them to cudf STRING as well)
        return Column(dt.STRING, n,
                      data=jnp.asarray(chars), offsets=jnp.asarray(offs),
                      validity=bm.from_numpy_mask(mask))
    vals = np.concatenate([p[0] for p in parts]) if parts else \
        np.zeros(0, {_K_BOOL: np.uint8, _K_INT: np.int32,
                     _K_ENUM: np.int32, _K_LONG: np.int64,
                     _K_FLOAT: np.float32, _K_DOUBLE: np.float64,
                     _K_NULL: np.uint8}[f.kind])
    if f.kind == _K_ENUM:
        keys = Column.from_strings(f.symbols or [])
        return Column(dt.dictionary_dtype(dt.STRING), n,
                      data=jnp.asarray(vals.astype(np.int32)),
                      validity=bm.from_numpy_mask(mask), children=(keys,))
    if f.kind == _K_NULL:
        return Column.full(n, None, dtype=dt.FLOAT64)
    if f.kind == _K_BOOL:
        return Column(dt.BOOL8, n, data=jnp.asarray(vals.astype(np.uint8)),
                      validity=bm.from_numpy_mask(mask))
    logical = f.logical
    if logical == "date" and f.kind == _K_INT:
        return Column(dt.TIMESTAMP_S, n,
                      data=jnp.asarray(vals.astype(np.int64) * 86400),
                      validity=bm.from_numpy_mask(mask))
    if logical == "timestamp-millis" and f.kind == _K_LONG:
        return Column(dt.TIMESTAMP_MS, n, data=jnp.asarray(vals),
                      validity=bm.from_numpy_mask(mask))
    if logical == "timestamp-micros" and f.kind == _K_LONG:
        return Column(dt.TIMESTAMP_US, n, data=jnp.asarray(vals),
                      validity=bm.from_numpy_mask(mask))
    logical_dt = {_K_INT: dt.INT32, _K_LONG: dt.INT64,
                  _K_FLOAT: dt.FLOAT32, _K_DOUBLE: dt.FLOAT64}[f.kind]
    return Column(logical_dt, n, data=jnp.asarray(vals),
                  validity=bm.from_numpy_mask(mask))


def read_avro(filepath_or_buffer, columns=None, skiprows: int = 0,
              num_rows: Optional[int] = None, **kw) -> DataFrame:
    """Read an Avro container file into a DataFrame.

    Mirrors python/cudf/cudf/io/avro.py:12 (columns/skiprows/num_rows).
    """
    if hasattr(filepath_or_buffer, "read"):
        data = filepath_or_buffer.read()
    elif isinstance(filepath_or_buffer, (bytes, bytearray)):
        data = bytes(filepath_or_buffer)
    else:
        with open(filepath_or_buffer, "rb") as fh:
            data = fh.read()
    r = _Reader(data)
    meta, sync = _read_header(r)
    fields = _parse_schema(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    skiprows = int(skiprows or 0)
    want = None if num_rows is None or num_rows < 0 else int(num_rows)

    per_field: List[list] = [[] for _ in fields]
    got = 0
    while r.pos < len(data):
        cnt = r.zigzag()
        size = r.zigzag()
        block = r.take(size)
        if r.take(16) != sync:
            raise ValueError("avro: sync marker mismatch")
        if skiprows >= cnt:       # whole block before the window: skip
            skiprows -= cnt
            continue
        parts = _decode_block(_decompress(block, codec), cnt, fields)
        lo = skiprows
        skiprows = 0
        hi = cnt if want is None else min(cnt, lo + want - got)
        if lo != 0 or hi != cnt:
            parts = [_slice_part(f, p, lo, hi)
                     for f, p in zip(fields, parts)]
        got += hi - lo
        for pf, p in zip(per_field, parts):
            pf.append(p)
        if want is not None and got >= want:
            break

    cols = {}
    for f, pf in zip(fields, per_field):
        if columns is not None and f.name not in columns:
            continue
        cols[f.name] = _make_column(f, pf)
    if columns:
        cols = {c: cols[c] for c in columns if c in cols}
    t = Table(cols)
    return DataFrame._from(t, default_index(t.num_rows))


def _slice_part(f: _Field, part, lo: int, hi: int):
    if f.kind in (_K_BYTES, _K_STRING, _K_FIXED):
        offs, chars, valid = part
        base = offs[lo]
        return (offs[lo:hi + 1] - base, chars[offs[lo]:offs[hi]],
                valid[lo:hi])
    vals, valid = part
    return (vals[lo:hi], valid[lo:hi])
