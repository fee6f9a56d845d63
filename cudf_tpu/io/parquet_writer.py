"""Self-contained Parquet writer: thrift compact encode + PLAIN pages.

TPU-native equivalent of the reference's writer stack
(reference: cpp/src/io/parquet/writer_impl.cu, page_enc.cu,
compact_protocol_writer.cpp) at the host tier: the write path is IO- and
metadata-bound, not FLOPs-bound, so a native host encoder is the right
shape (the reference's page_enc kernels exist to avoid device→host
copies it would otherwise make — our columns sync once regardless).

Round-trip needs NO pyarrow: write_parquet_native → parquet_native.read
(or any parquet reader).  Emits PLAIN-encoded data pages (v1),
UNCOMPRESSED codec, RLE definition levels for nullable columns, and
column-chunk Statistics (min/max/null_count) so the round-trip supports
this reader's own predicate pushdown.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# thrift compact type ids
_CT_STOP, _CT_TRUE, _CT_FALSE, _CT_BYTE = 0, 1, 2, 3
_CT_I16, _CT_I32, _CT_I64 = 4, 5, 6
_CT_DOUBLE, _CT_BINARY, _CT_LIST, _CT_STRUCT = 7, 8, 9, 12


class CompactWriter:
    """Thrift compact-protocol encoder (compact_protocol_writer.cpp)."""

    def __init__(self):
        self.buf = bytearray()
        self._last_fid = [0]

    def _varint(self, v: int):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.buf.append(b | 0x80)
            else:
                self.buf.append(b)
                return

    def _zigzag(self, v: int):
        self._varint((v << 1) ^ (v >> 63) if v < 0 else (v << 1))

    def field(self, fid: int, ctype: int):
        delta = fid - self._last_fid[-1]
        if 0 < delta < 16:
            self.buf.append((delta << 4) | ctype)
        else:
            self.buf.append(ctype)
            self._zigzag(fid)
        self._last_fid[-1] = fid

    def write_i(self, fid: int, v: int, ctype: int = _CT_I64):
        self.field(fid, ctype)
        self._zigzag(v)

    def write_bool(self, fid: int, v: bool):
        self.field(fid, _CT_TRUE if v else _CT_FALSE)

    def write_binary(self, fid: int, v: bytes):
        self.field(fid, _CT_BINARY)
        self._varint(len(v))
        self.buf += v

    def begin_struct(self, fid: Optional[int] = None):
        if fid is not None:
            self.field(fid, _CT_STRUCT)
        self._last_fid.append(0)

    def end_struct(self):
        self.buf.append(_CT_STOP)
        self._last_fid.pop()

    def begin_list(self, fid: int, etype: int, count: int):
        self.field(fid, _CT_LIST)
        if count < 15:
            self.buf.append((count << 4) | etype)
        else:
            self.buf.append(0xF0 | etype)
            self._varint(count)


# physical types
_PT_BOOLEAN, _PT_INT32, _PT_INT64, _PT_FLOAT, _PT_DOUBLE, _PT_BA = 0, 1, 2, 4, 5, 6


def _rle_encode_bits(levels: np.ndarray) -> bytes:
    """RLE/bit-packed hybrid for 1-bit def levels (rle encode, runs)."""
    out = bytearray()
    n = len(levels)
    i = 0
    while i < n:
        v = levels[i]
        j = i
        while j < n and levels[j] == v:
            j += 1
        run = j - i
        # RLE run: header = run << 1, then 1 byte value
        h = run << 1
        while True:
            b = h & 0x7F
            h >>= 7
            if h:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        out.append(int(v))
        i = j
    return bytes(out)


def _plain_encode(col) -> Tuple[bytes, int, Optional[bytes], Optional[bytes]]:
    """(value_bytes, physical_type, min_bytes, max_bytes) of valid rows."""
    import jax.numpy as jnp

    from cudf_tpu.core import dtypes as dt
    from cudf_tpu.ops._utils import materialize_validity

    valid = None
    if col.validity is not None:
        valid = np.asarray(materialize_validity(col))

    if col.dtype.is_string or col.dtype.is_dictionary:
        if col.dtype.is_dictionary:
            from cudf_tpu.ops.dictionary import decode as dict_decode

            col = dict_decode(col)
        offs = np.asarray(col.offsets)
        chars = np.asarray(col.data).tobytes()
        parts = []
        mn = mx = None
        for i in range(col.length):
            if valid is not None and not valid[i]:
                continue
            s = chars[offs[i]:offs[i + 1]]
            parts.append(struct.pack("<I", len(s)) + s)
            mn = s if mn is None or s < mn else mn
            mx = s if mx is None or s > mx else mx
        return b"".join(parts), _PT_BA, mn, mx

    data = np.asarray(col.data)
    if valid is not None:
        data = data[valid]
    if col.dtype.is_bool:
        bits = np.packbits(data.astype(bool), bitorder="little")
        return bits.tobytes(), _PT_BOOLEAN, None, None
    if col.dtype.is_temporal:
        data = data.astype(np.int64)
    kind = data.dtype.kind
    if kind in "iu":
        if data.dtype.itemsize <= 4 and data.dtype != np.int64:
            data = data.astype(np.int32)
            pt, fmt = _PT_INT32, "<i"
        else:
            data = data.astype(np.int64)
            pt, fmt = _PT_INT64, "<q"
    elif data.dtype == np.float32:
        pt, fmt = _PT_FLOAT, "<f"
    else:
        data = data.astype(np.float64)
        pt, fmt = _PT_DOUBLE, "<d"
    mn = struct.pack(fmt, data.min()) if data.size else None
    mx = struct.pack(fmt, data.max()) if data.size else None
    return data.tobytes(), pt, mn, mx


def _write_page_header(w: CompactWriter, n_values: int, encoding: int,
                       size: int):
    w.begin_struct()
    w.write_i(1, 0, _CT_I32)              # type = DATA_PAGE
    w.write_i(2, size, _CT_I32)           # uncompressed size
    w.write_i(3, size, _CT_I32)           # compressed size (UNCOMPRESSED)
    w.begin_struct(5)                     # DataPageHeader
    w.write_i(1, n_values, _CT_I32)
    w.write_i(2, encoding, _CT_I32)       # PLAIN
    w.write_i(3, 3, _CT_I32)              # def level encoding = RLE
    w.write_i(4, 3, _CT_I32)              # rep level encoding = RLE
    w.end_struct()
    w.end_struct()


def write_parquet_native(df, path: str, row_group_size: int = 1 << 20):
    """Write a DataFrame as a flat-schema parquet file (PLAIN pages)."""
    names = list(df._table.names)
    n = len(df)
    with open(path, "wb") as f:
        f.write(b"PAR1")
        row_groups_meta = []
        start = 0
        while start < n or (n == 0 and start == 0):
            stop = min(start + row_group_size, n)
            cols_meta = []
            for name in names:
                col = _slice_col(df._table[name], start, stop)
                offset = f.tell()
                nullable = col.validity is not None
                nv = col.length
                vals, pt, mn, mx = _plain_encode(col)
                body = bytearray()
                if nullable:
                    from cudf_tpu.ops._utils import materialize_validity

                    lv = np.asarray(materialize_validity(col)).astype(np.uint8)
                    rle = _rle_encode_bits(lv)
                    body += struct.pack("<I", len(rle)) + rle
                    nulls = int((lv == 0).sum())
                else:
                    nulls = 0
                body += vals
                w = CompactWriter()
                _write_page_header(w, nv, 0, len(body))
                f.write(bytes(w.buf))
                f.write(bytes(body))
                total = f.tell() - offset
                cols_meta.append(dict(
                    name=name, type=pt, offset=offset, nv=nv,
                    total=total, mn=mn, mx=mx, nulls=nulls,
                    nullable=nullable))
            row_groups_meta.append(
                dict(cols=cols_meta, rows=stop - start,
                     bytes=sum(c["total"] for c in cols_meta)))
            start = stop
            if n == 0:
                break

        # ---- FileMetaData footer --------------------------------------
        w = CompactWriter()
        w.begin_struct()
        w.write_i(1, 2, _CT_I32)          # version
        # schema: root + leaves
        leaves = row_groups_meta[0]["cols"] if row_groups_meta else []
        w.begin_list(2, _CT_STRUCT, 1 + len(names))
        w.begin_struct()                  # root
        w.write_binary(4, b"schema")
        w.write_i(5, len(names), _CT_I32)
        w.end_struct()
        for c in leaves:
            w.begin_struct()
            w.write_i(1, c["type"], _CT_I32)
            w.write_i(3, 1 if c["nullable"] else 0, _CT_I32)  # repetition
            w.write_binary(4, c["name"].encode())
            if c["type"] == _PT_BA:
                w.write_i(6, 0, _CT_I32)  # converted_type = UTF8
            w.end_struct()
        w.write_i(3, n, _CT_I64)          # num_rows
        w.begin_list(4, _CT_STRUCT, len(row_groups_meta))
        for rg in row_groups_meta:
            w.begin_struct()              # RowGroup
            w.begin_list(1, _CT_STRUCT, len(rg["cols"]))
            for c in rg["cols"]:
                w.begin_struct()          # ColumnChunk
                w.write_i(2, c["offset"], _CT_I64)   # file_offset
                w.begin_struct(3)         # ColumnMetaData
                w.write_i(1, c["type"], _CT_I32)
                w.begin_list(2, _CT_I32, 1)
                w._zigzag(0)              # encodings = [PLAIN]
                w.begin_list(3, _CT_BINARY, 1)
                nm = c["name"].encode()
                w._varint(len(nm))
                w.buf += nm
                w.write_i(4, 0, _CT_I32)  # codec = UNCOMPRESSED
                w.write_i(5, c["nv"], _CT_I64)
                w.write_i(6, c["total"], _CT_I64)    # uncompressed
                w.write_i(7, c["total"], _CT_I64)    # compressed
                w.write_i(9, c["offset"], _CT_I64)   # data_page_offset
                if c["mn"] is not None:
                    w.begin_struct(12)    # Statistics
                    w.write_i(3, c["nulls"], _CT_I64)
                    w.write_binary(5, c["mx"])
                    w.write_binary(6, c["mn"])
                    w.end_struct()
                w.end_struct()
                w.end_struct()
            w.write_i(2, rg["bytes"], _CT_I64)
            w.write_i(3, rg["rows"], _CT_I64)
            w.end_struct()
        w.end_struct()
        footer = bytes(w.buf)
        f.write(footer)
        f.write(struct.pack("<I", len(footer)))
        f.write(b"PAR1")


def _slice_col(col, start: int, stop: int):
    if start == 0 and stop == col.length:
        return col
    from cudf_tpu.ops import copying

    return copying.slice(col, start, stop)
