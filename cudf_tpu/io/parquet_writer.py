"""Self-contained Parquet writer: thrift compact encode, dictionary +
PLAIN pages, snappy/gzip/zstd page compression, v1 and v2 data pages.

TPU-native equivalent of the reference's writer stack
(reference: cpp/src/io/parquet/writer_impl.cu, page_enc.cu:1,
chunk_dict.cu:1 dictionary build with plain fallback on overflow,
compact_protocol_writer.cpp) at the host tier: the write path is IO- and
metadata-bound, not FLOPs-bound, so a native host encoder is the right
shape (the reference's page_enc kernels exist to avoid device→host
copies it would otherwise make — our columns sync once regardless).
Snappy compression runs in csrc/tpudf_native.cpp (the snap.cu role).

Round-trip needs NO pyarrow: write_parquet_native → parquet_native.read
(or any parquet reader; pyarrow cross-reads the output).  Emits RLE
definition levels for nullable columns and column-chunk Statistics
(min/max/null_count) so the round-trip supports this reader's own
predicate pushdown.
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


_CODECS = {"uncompressed": 0, None: 0, "none": 0,
           "snappy": 1, "gzip": 2, "zstd": 6}


def _compress(data: bytes, codec: int) -> bytes:
    if codec == 0:
        return data
    if codec == 1:
        from cudf_tpu.native import snappy_compress

        return snappy_compress(data)
    if codec == 2:
        import gzip

        return gzip.compress(data, compresslevel=1)
    if codec == 6:
        import zstandard

        return zstandard.ZstdCompressor().compress(data)
    raise NotImplementedError(f"codec {codec}")


def _rle_hybrid_encode(values: np.ndarray, bit_width: int) -> bytes:
    """Parquet RLE/bit-packed hybrid encoder for dictionary indices
    (page_enc.cu's index encoder role): greedy — runs >= 8 become RLE
    runs, the rest bit-packed groups of 8."""
    out = bytearray()
    n = len(values)
    byte_width = (bit_width + 7) // 8

    def varint(v):
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)

    i = 0
    pend = []                  # literal values pending bit-pack

    def flush_pend(final: bool):
        # bit-packed runs hold WHOLE groups of 8 values: mid-stream
        # flushes emit only complete groups (padding mid-stream would
        # insert phantom values the decoder consumes); the final flush
        # pads its tail group with zeros, which sit beyond num_values.
        if final:
            while len(pend) % 8:
                pend.append(0)
        groups = len(pend) // 8
        if not groups:
            return
        emit, rest = pend[:groups * 8], pend[groups * 8:]
        varint((groups << 1) | 1)
        acc = 0
        nbits = 0
        for v in emit:
            acc |= int(v) << nbits
            nbits += bit_width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        pend[:] = rest

    while i < n:
        v = values[i]
        j = i + 1
        while j < n and values[j] == v:
            j += 1
        run = j - i
        # only run-break at a group boundary: an RLE run after a partial
        # bit-packed group would strand a sub-8 remainder
        if run >= 8 and len(pend) % 8 == 0:
            flush_pend(final=False)
            varint(run << 1)
            out += int(v).to_bytes(byte_width, "little")
        else:
            pend.extend(values[i:j].tolist())
            if len(pend) >= 504:      # keep literal groups bounded
                flush_pend(final=False)
        i = j
    flush_pend(final=True)
    return bytes(out)


def _varint_bytes(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_bytes(v: int) -> bytes:
    return _varint_bytes((v << 1) ^ (v >> 63) if v < 0 else (v << 1))


def _delta_binary_encode(vals: np.ndarray) -> bytes:
    """DELTA_BINARY_PACKED encoder (delta_enc.cuh role): blocks of 128
    deltas in 4 miniblocks of 32, per-block min-delta zigzag + per-
    miniblock bit widths, little-endian bit packing.  Wrapping int64
    arithmetic per spec (the decoder wraps identically)."""
    v = vals.astype(np.int64)
    n = len(v)
    header = (_varint_bytes(128) + _varint_bytes(4) + _varint_bytes(n)
              + _zigzag_bytes(int(v[0]) if n else 0))
    if n <= 1:
        return header
    with np.errstate(over="ignore"):
        deltas = (v[1:].astype(np.uint64)
                  - v[:-1].astype(np.uint64)).astype(np.int64)
    out = bytearray(header)
    for b0 in range(0, len(deltas), 128):
        blk = deltas[b0:b0 + 128]
        md = int(blk.min())
        out += _zigzag_bytes(md)
        with np.errstate(over="ignore"):
            adj = (blk.astype(np.uint64)
                   - np.uint64(md & 0xFFFFFFFFFFFFFFFF)).astype(np.uint64)
        padded = np.zeros(128, np.uint64)
        padded[:len(adj)] = adj
        widths = []
        packed = []
        for m in range(4):
            mb = padded[m * 32:(m + 1) * 32]
            first = m * 32
            if first >= len(adj):
                widths.append(0)
                packed.append(b"")
                continue
            bw = max(int(x).bit_length() for x in mb.tolist())
            widths.append(bw)
            if bw == 0:
                packed.append(b"")
                continue
            acc = 0
            for i, x in enumerate(mb.tolist()):
                acc |= int(x) << (i * bw)
            packed.append(acc.to_bytes(4 * bw, "little"))
        out += bytes(widths)
        for p in packed:
            out += p
    return bytes(out)


def _present_int_values(col) -> np.ndarray:
    from cudf_tpu.ops._utils import materialize_validity

    data = np.asarray(col.data)
    if col.validity is not None:
        data = data[np.asarray(materialize_validity(col))]
    return data.astype(np.int64)


def _try_dictionary(vals: bytes, pt: int, col) -> Optional[Tuple[bytes, np.ndarray]]:
    """(dict_page_values_plain, indices) or None when a dictionary does
    not pay (the chunk_dict.cu plain-fallback heuristic: too many
    distinct values or dictionary bigger than half the data)."""
    from cudf_tpu.ops._utils import materialize_validity

    valid = None
    if col.validity is not None:
        valid = np.asarray(materialize_validity(col))
    if col.dtype.is_string or col.dtype.is_dictionary:
        c = col
        if c.dtype.is_dictionary:
            from cudf_tpu.ops.dictionary import decode as dict_decode

            c = dict_decode(c)
        offs = np.asarray(c.offsets)
        chars = np.asarray(c.data).tobytes()
        strs = [chars[offs[i]:offs[i + 1]] for i in range(c.length)
                if valid is None or valid[i]]
        uniq, inv = np.unique(np.asarray(strs, dtype=object), return_inverse=True) \
            if strs else (np.asarray([], dtype=object), np.asarray([], np.int64))
        if len(uniq) > 65536 or (strs and len(uniq) > len(strs) // 2):
            return None
        dict_vals = b"".join(struct.pack("<I", len(s)) + bytes(s) for s in uniq)
        return dict_vals, inv.astype(np.int32)
    if pt == _PT_BOOLEAN:
        return None
    data = np.asarray(col.data)
    if valid is not None:
        data = data[valid]
    if col.dtype.is_temporal:
        data = data.astype(np.int64)
    uniq, inv = np.unique(data, return_inverse=True)
    if len(uniq) > 65536 or len(uniq) > max(len(data) // 2, 1):
        return None
    # re-encode the unique values PLAIN with the chunk's physical type
    if pt == _PT_INT32:
        dict_vals = uniq.astype(np.int32).tobytes()
    elif pt == _PT_INT64:
        dict_vals = uniq.astype(np.int64).tobytes()
    elif pt == _PT_FLOAT:
        dict_vals = uniq.astype(np.float32).tobytes()
    else:
        dict_vals = uniq.astype(np.float64).tobytes()
    return dict_vals, inv.astype(np.int32)


def _write_page_header(w: CompactWriter, n_values: int, encoding: int,
                       usize: int, csize: int):
    w.begin_struct()
    w.write_i(1, 0, _CT_I32)              # type = DATA_PAGE
    w.write_i(2, usize, _CT_I32)          # uncompressed size
    w.write_i(3, csize, _CT_I32)          # compressed size
    w.begin_struct(5)                     # DataPageHeader
    w.write_i(1, n_values, _CT_I32)
    w.write_i(2, encoding, _CT_I32)
    w.write_i(3, 3, _CT_I32)              # def level encoding = RLE
    w.write_i(4, 3, _CT_I32)              # rep level encoding = RLE
    w.end_struct()
    w.end_struct()


def _write_page_header_v2(w: CompactWriter, n_values: int, n_nulls: int,
                          n_rows: int, encoding: int, usize: int,
                          csize: int, def_len: int, compressed: bool):
    w.begin_struct()
    w.write_i(1, 3, _CT_I32)              # type = DATA_PAGE_V2
    w.write_i(2, usize, _CT_I32)
    w.write_i(3, csize, _CT_I32)
    w.begin_struct(8)                     # DataPageHeaderV2
    w.write_i(1, n_values, _CT_I32)
    w.write_i(2, n_nulls, _CT_I32)
    w.write_i(3, n_rows, _CT_I32)
    w.write_i(4, encoding, _CT_I32)
    w.write_i(5, def_len, _CT_I32)        # def levels byte length
    w.write_i(6, 0, _CT_I32)              # rep levels byte length
    w.write_bool(7, compressed)
    w.end_struct()
    w.end_struct()


def _write_dict_page_header(w: CompactWriter, n_values: int, usize: int,
                            csize: int):
    w.begin_struct()
    w.write_i(1, 2, _CT_I32)              # type = DICTIONARY_PAGE
    w.write_i(2, usize, _CT_I32)
    w.write_i(3, csize, _CT_I32)
    w.begin_struct(7)                     # DictionaryPageHeader
    w.write_i(1, n_values, _CT_I32)
    w.write_i(2, 0, _CT_I32)              # encoding = PLAIN
    w.end_struct()
    w.end_struct()



def _list_levels(col) -> Tuple[np.ndarray, np.ndarray, "Column"]:
    """(rep_levels, def_levels, element_column) for a list column —
    dremel-style level generation (cpp/src/lists/dremel.cu:1).

    Levels use the standard 3-level optional schema: def 0 = null list,
    1 = empty list, 2 = null element, 3 = element present; rep 0 starts
    a row."""
    from cudf_tpu.ops._utils import materialize_validity

    n = col.length
    offs = np.asarray(col.offsets)
    counts = offs[1:] - offs[:-1]
    lvalid = (np.asarray(materialize_validity(col))
              if col.validity is not None else np.ones(n, bool))
    counts = np.where(lvalid, counts, 0)
    emit = np.maximum(counts, 1)
    tot = int(emit.sum())
    starts = np.cumsum(emit) - emit
    first = np.zeros(tot, bool)
    first[starts] = True
    rep = np.where(first, 0, 1).astype(np.int32)
    has = np.repeat(counts > 0, emit)
    lv_r = np.repeat(lvalid, emit)
    within = np.arange(tot) - np.repeat(starts, emit)
    child_idx = np.repeat(offs[:-1], emit) + within
    child = col.children[0]
    if child.validity is not None:
        evalid = np.asarray(materialize_validity(child))
    else:
        evalid = np.ones(child.length, bool)
    ev = evalid[np.clip(child_idx, 0, max(child.length - 1, 0))] \
        if child.length else np.zeros(tot, bool)
    defs = np.where(~lv_r, 0,
                    np.where(~has, 1, np.where(ev, 3, 2))).astype(np.int32)
    return rep, defs, child


def _encode_levels(levels: np.ndarray, max_level: int) -> bytes:
    bw = max(int(max_level).bit_length(), 1)
    body = _rle_hybrid_encode(levels.astype(np.int32), bw)
    return struct.pack("<I", len(body)) + body


def _sbbf_build(col, pt: int, max_ndv: int = 1 << 18) -> Optional[bytes]:
    """Split-block bloom filter bitset over a chunk's distinct present
    values (chunk_dict.cu's sibling bloom_filter writer role), or None
    when the column shape doesn't support it."""
    from cudf_tpu.io.parquet_pushdown import sbbf_insert_hashes, xxhash64
    from cudf_tpu.ops._utils import materialize_validity

    valid = None
    if col.validity is not None:
        valid = np.asarray(materialize_validity(col))
    if col.dtype.is_string or col.dtype.is_dictionary:
        c = col
        if c.dtype.is_dictionary:
            from cudf_tpu.ops.dictionary import decode as dict_decode

            c = dict_decode(c)
        offs = np.asarray(c.offsets)
        chars = np.asarray(c.data).tobytes()
        vals = {chars[offs[i]:offs[i + 1]] for i in range(c.length)
                if valid is None or valid[i]}
    elif pt in (_PT_INT32, _PT_INT64, _PT_FLOAT, _PT_DOUBLE):
        data = np.asarray(col.data)
        if valid is not None:
            data = data[valid]
        if col.dtype.is_temporal:
            data = data.astype(np.int64)
        uniq = np.unique(data)
        fmt = {_PT_INT32: "<i", _PT_INT64: "<q",
               _PT_FLOAT: "<f", _PT_DOUBLE: "<d"}[pt]
        if pt == _PT_INT32:
            uniq = uniq.astype(np.int32)
        elif pt == _PT_INT64:
            uniq = uniq.astype(np.int64)
        vals = {struct.pack(fmt, v) for v in uniq.tolist()}
    else:
        return None
    if not vals or len(vals) > max_ndv:
        return None
    # ~10.5 bits/value hits the spec's ~1% fpp; blocks are 32 bytes
    nbytes = max(32, 1 << (int(len(vals) * 10.5 / 8 - 1).bit_length()))
    bitset = bytearray(nbytes)
    sbbf_insert_hashes(bitset, (xxhash64(v) for v in vals))
    return bytes(bitset)


def _write_bloom_header(w: CompactWriter, num_bytes: int):
    """BloomFilterHeader: SBBF / xxhash / uncompressed (the only
    defined union members, parquet.thrift)."""
    w.begin_struct()
    w.write_i(1, num_bytes, _CT_I32)
    for fid in (2, 3, 4):                # algorithm / hash / compression
        w.begin_struct(fid)
        w.begin_struct(1)                # union member 1 = the default
        w.end_struct()
        w.end_struct()
    w.end_struct()


def write_parquet_native(df, path: str, row_group_size: int = 1 << 20,
                         compression: str = "snappy",
                         use_dictionary: bool = True,
                         data_page_version: int = 1,
                         data_page_rows: int = 0,
                         write_page_index: bool = True,
                         bloom_filter_columns=None,
                         use_delta_binary: bool = False):
    """Write a DataFrame as a parquet file (flat, one-level list and
    struct schemas).

    compression: uncompressed | snappy | gzip | zstd (page codec);
    use_dictionary: dictionary-encode chunks when it pays, falling back
    to PLAIN on overflow (chunk_dict.cu discipline);
    use_delta_binary: encode int32/int64 leaves that did not dictionary-
    encode as DELTA_BINARY_PACKED (delta_enc.cuh role);
    data_page_version: 1 or 2 (v2 keeps levels uncompressed and marks
    is_compressed per page);
    data_page_rows: split chunks into pages of this many rows (0 = one
    page per chunk);
    write_page_index: emit ColumnIndex/OffsetIndex per-page stats before
    the footer (the structures page_index_filter.cu consumes);
    bloom_filter_columns: column names to build split-block bloom
    filters for (bloom_filter_reader.cu's inputs).
    """
    codec = _CODECS[compression.lower() if compression else None]
    bloom_cols = set(bloom_filter_columns or ())
    names = list(df._table.names)
    n = len(df)
    with open(path, "wb") as f:
        f.write(b"PAR1")
        row_groups_meta = []
        start = 0
        while start < n or (n == 0 and start == 0):
            stop = min(start + row_group_size, n)
            cols_meta = []
            leaf_specs = []
            for name in names:
                col = _slice_col(df._table[name], start, stop)
                if col.dtype.is_list:
                    rep, defs, child = _list_levels(col)
                    leaf_specs.append(dict(
                        path=(name, "list", "element"), col=child,
                        rep=rep, defs=defs, max_rep=1, max_def=3,
                        nv=len(defs), dict_ok=False))
                elif col.dtype.is_struct:
                    from cudf_tpu.ops._utils import materialize_validity

                    svalid = (np.asarray(materialize_validity(col))
                              if col.validity is not None else None)
                    fields = col.dtype.fields or ()
                    for (fname, _), child in zip(fields, col.children):
                        cvalid = (np.asarray(materialize_validity(child))
                                  if child.validity is not None
                                  else np.ones(child.length, bool))
                        if svalid is not None:
                            defs = np.where(~svalid, 0,
                                            np.where(cvalid, 2, 1))
                        else:
                            defs = np.where(cvalid, 2, 1)
                        import jax.numpy as _jnp

                        both = cvalid if svalid is None else (cvalid & svalid)
                        leaf = child.with_validity(
                            None if both.all() else _jnp.asarray(both))
                        leaf_specs.append(dict(
                            path=(name, fname), col=leaf, rep=None,
                            defs=defs.astype(np.int32), max_rep=0, max_def=2,
                            nv=child.length, dict_ok=False))
                else:
                    leaf_specs.append(dict(
                        path=(name,), col=col, rep=None, defs=None,
                        max_rep=0, max_def=1 if col.validity is not None
                        else 0, nv=col.length, dict_ok=True))
            for spec in leaf_specs:
                col = spec["col"]
                offset = f.tell()
                nullable = col.validity is not None
                nv = spec["nv"]
                utotal = 0            # uncompressed byte accounting
                vals_all, pt, mn, mx = _plain_encode(col)
                dict_off = None
                encoding = 0          # PLAIN
                indices = None
                dic = _try_dictionary(vals_all, pt, col) \
                    if (use_dictionary and spec["dict_ok"]) else None
                delta_vals = None
                if (dic is None and use_delta_binary
                        and pt in (_PT_INT32, _PT_INT64)):
                    delta_vals = _present_int_values(col)
                    vals_all = _delta_binary_encode(delta_vals)
                    encoding = 5          # DELTA_BINARY_PACKED
                if dic is not None:
                    dict_vals, indices = dic
                    nuniq = max(len(indices) and int(indices.max()) + 1, 1)
                    cd = _compress(dict_vals, codec)
                    w = CompactWriter()
                    _write_dict_page_header(w, nuniq, len(dict_vals),
                                            len(cd))
                    dict_off = offset
                    f.write(bytes(w.buf))
                    f.write(cd)
                    utotal += len(w.buf) + len(dict_vals)
                    bw = max(int(nuniq - 1).bit_length(), 1)
                    encoding = 8      # RLE_DICTIONARY
                # whole-chunk definition levels (v1 layout: each RLE
                # section carries its own 4-byte length prefix)
                if spec["defs"] is not None:
                    dl_all = spec["defs"]
                elif nullable:
                    from cudf_tpu.ops._utils import materialize_validity

                    dl_all = np.asarray(
                        materialize_validity(col)).astype(np.int32)
                else:
                    dl_all = None
                nulls = int((dl_all < spec["max_def"]).sum()) \
                    if dl_all is not None else 0
                # page split (page_enc.cu fragments; flat leaves only —
                # a rep-levelled page boundary would need row alignment)
                if data_page_rows and spec["max_rep"] == 0 \
                        and nv > data_page_rows:
                    ranges = [(i, min(i + data_page_rows, nv))
                              for i in range(0, nv, data_page_rows)]
                else:
                    ranges = [(0, nv)]
                # prefix count of present values (dict index slicing)
                if dl_all is not None:
                    pv = np.zeros(nv + 1, np.int64)
                    np.cumsum(dl_all == spec["max_def"], out=pv[1:])
                else:
                    pv = None
                data_off = f.tell()
                pages_meta = []
                for (r0, r1) in ranges:
                    page_off = f.tell()
                    dl_page = dl_all[r0:r1] if dl_all is not None else None
                    lvl = b""
                    if spec["max_rep"]:
                        lvl += _encode_levels(spec["rep"], spec["max_rep"])
                    if dl_page is not None:
                        lvl += _encode_levels(dl_page, spec["max_def"])
                        nulls_page = int((dl_page < spec["max_def"]).sum())
                    else:
                        nulls_page = 0
                    if len(ranges) == 1:
                        mn_p, mx_p = mn, mx
                        if indices is not None:
                            vals = bytes([bw]) + _rle_hybrid_encode(
                                indices, bw)
                        else:
                            vals = vals_all
                    else:
                        sub = _slice_col(col, r0, r1)
                        sub_vals, _, mn_p, mx_p = _plain_encode(sub)
                        a = pv[r0] if pv is not None else r0
                        b = pv[r1] if pv is not None else r1
                        if indices is not None:
                            vals = bytes([bw]) + _rle_hybrid_encode(
                                indices[a:b], bw)
                        elif delta_vals is not None:
                            vals = _delta_binary_encode(delta_vals[a:b])
                        else:
                            vals = sub_vals
                    has_levels = len(lvl) > 0
                    npage = r1 - r0
                    w = CompactWriter()
                    if data_page_version == 2 and spec["max_rep"] == 0:
                        cbody = _compress(vals, codec)
                        lvl2 = lvl[4:] if has_levels else b""  # no prefix
                        _write_page_header_v2(
                            w, npage, nulls_page, npage, encoding,
                            len(lvl2) + len(vals), len(lvl2) + len(cbody),
                            len(lvl2), codec != 0)
                        f.write(bytes(w.buf))
                        f.write(lvl2)
                        f.write(cbody)
                        utotal += len(w.buf) + len(lvl2) + len(vals)
                    else:
                        body = lvl + vals
                        cbody = _compress(body, codec)
                        _write_page_header(w, npage, encoding, len(body),
                                           len(cbody))
                        f.write(bytes(w.buf))
                        f.write(cbody)
                        utotal += len(w.buf) + len(body)
                    pages_meta.append(dict(
                        off=page_off, size=f.tell() - page_off,
                        first_row=r0, mn=mn_p, mx=mx_p, nulls=nulls_page,
                        all_null=nulls_page == (r1 - r0)))
                total = f.tell() - offset
                name0 = spec["path"][0]
                bloom = (_sbbf_build(col, pt)
                         if name0 in bloom_cols and spec["max_rep"] == 0
                         else None)
                cols_meta.append(dict(
                    path=spec["path"], type=pt, offset=offset, nv=nv,
                    total=total, utotal=utotal, mn=mn, mx=mx, nulls=nulls,
                    nullable=nullable, codec=codec, encoding=encoding,
                    dict_off=dict_off, data_off=data_off,
                    pages=pages_meta, bloom=bloom))
            row_groups_meta.append(
                dict(cols=cols_meta, rows=stop - start,
                     bytes=sum(c["total"] for c in cols_meta)))
            start = stop
            if n == 0:
                break

        # ---- bloom filters + page index (before the footer, per spec:
        # PageIndex layout section; the reader finds them through the
        # ColumnChunk/ColumnMetaData offset fields) -------------------
        for rg in row_groups_meta:
            for c in rg["cols"]:
                if c.get("bloom"):
                    c["bloom_off"] = f.tell()
                    w = CompactWriter()
                    _write_bloom_header(w, len(c["bloom"]))
                    f.write(bytes(w.buf))
                    f.write(c["bloom"])
                    c["bloom_len"] = f.tell() - c["bloom_off"]
        if write_page_index:
            for rg in row_groups_meta:
                for c in rg["cols"]:
                    pages = c["pages"]
                    if any(p["mn"] is None and not p["all_null"]
                           for p in pages):
                        continue          # no stats (e.g. boolean)
                    w = CompactWriter()
                    w.begin_struct()      # ColumnIndex
                    w.begin_list(1, _CT_TRUE, len(pages))
                    for p in pages:
                        w.buf.append(1 if p["all_null"] else 2)
                    w.begin_list(2, _CT_BINARY, len(pages))
                    for p in pages:
                        v = p["mn"] or b""
                        w._varint(len(v))
                        w.buf += v
                    w.begin_list(3, _CT_BINARY, len(pages))
                    for p in pages:
                        v = p["mx"] or b""
                        w._varint(len(v))
                        w.buf += v
                    w.write_i(4, 0, _CT_I32)   # boundary_order UNORDERED
                    w.begin_list(5, _CT_I64, len(pages))
                    for p in pages:
                        w._zigzag(p["nulls"])
                    w.end_struct()
                    c["ci_off"] = f.tell()
                    f.write(bytes(w.buf))
                    c["ci_len"] = f.tell() - c["ci_off"]
            for rg in row_groups_meta:
                for c in rg["cols"]:
                    w = CompactWriter()
                    w.begin_struct()      # OffsetIndex
                    w.begin_list(1, _CT_STRUCT, len(c["pages"]))
                    for p in c["pages"]:
                        w.begin_struct()  # PageLocation
                        w.write_i(1, p["off"], _CT_I64)
                        w.write_i(2, p["size"], _CT_I32)
                        w.write_i(3, p["first_row"], _CT_I64)
                        w.end_struct()
                    w.end_struct()
                    c["oi_off"] = f.tell()
                    f.write(bytes(w.buf))
                    c["oi_len"] = f.tell() - c["oi_off"]

        # ---- FileMetaData footer --------------------------------------
        # schema tree in pre-order: (name, repetition, phys|None,
        # num_children, converted|None)
        leaves = row_groups_meta[0]["cols"] if row_groups_meta else []
        leaf_by_path = {c["path"]: c for c in leaves}
        schema_els = []
        for name in names:
            col0 = df._table[name]
            if col0.dtype.is_list:
                c = leaf_by_path[(name, "list", "element")]
                schema_els.append((name, 1, None, 1, 3))        # LIST group
                schema_els.append(("list", 2, None, 1, None))   # repeated
                schema_els.append(("element", 1, c["type"], 0,
                                   0 if c["type"] == _PT_BA else None))
            elif col0.dtype.is_struct:
                fields = col0.dtype.fields or ()
                schema_els.append((name, 1 if col0.validity is not None
                                   else 0, None, len(fields), None))
                for fname, _ in fields:
                    c = leaf_by_path[(name, fname)]
                    schema_els.append((fname, 1, c["type"], 0,
                                       0 if c["type"] == _PT_BA else None))
            else:
                c = leaf_by_path[(name,)]
                schema_els.append((name, 1 if c["nullable"] else 0,
                                   c["type"], 0,
                                   0 if c["type"] == _PT_BA else None))
        w = CompactWriter()
        w.begin_struct()
        w.write_i(1, 2, _CT_I32)          # version
        w.begin_list(2, _CT_STRUCT, 1 + len(schema_els))
        w.begin_struct()                  # root
        w.write_binary(4, b"schema")
        w.write_i(5, len(names), _CT_I32)
        w.end_struct()
        for (nm, repn, pt_, nkids, conv) in schema_els:
            w.begin_struct()
            if pt_ is not None:
                w.write_i(1, pt_, _CT_I32)
            w.write_i(3, repn, _CT_I32)   # repetition
            w.write_binary(4, nm.encode())
            if nkids:
                w.write_i(5, nkids, _CT_I32)
            if conv is not None:
                w.write_i(6, conv, _CT_I32)
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
                encs = [3, c["encoding"]] if c["encoding"] else [3, 0]
                if c["dict_off"] is not None:
                    encs.append(0)        # PLAIN dictionary page
                w.begin_list(2, _CT_I32, len(encs))
                for e in encs:
                    w._zigzag(e)
                w.begin_list(3, _CT_BINARY, len(c["path"]))
                for seg in c["path"]:
                    nm = seg.encode()
                    w._varint(len(nm))
                    w.buf += nm
                w.write_i(4, c["codec"], _CT_I32)
                w.write_i(5, c["nv"], _CT_I64)
                w.write_i(6, c["utotal"], _CT_I64)   # uncompressed
                w.write_i(7, c["total"], _CT_I64)    # compressed
                w.write_i(9, c["data_off"], _CT_I64)  # data_page_offset
                if c["dict_off"] is not None:
                    w.write_i(11, c["dict_off"], _CT_I64)
                if c["mn"] is not None:
                    w.begin_struct(12)    # Statistics
                    w.write_i(3, c["nulls"], _CT_I64)
                    w.write_binary(5, c["mx"])
                    w.write_binary(6, c["mn"])
                    w.end_struct()
                if c.get("bloom_off") is not None:
                    w.write_i(14, c["bloom_off"], _CT_I64)
                    w.write_i(15, c["bloom_len"], _CT_I32)
                w.end_struct()            # ColumnMetaData
                if c.get("oi_off") is not None:
                    w.write_i(4, c["oi_off"], _CT_I64)
                    w.write_i(5, c["oi_len"], _CT_I32)
                if c.get("ci_off") is not None:
                    w.write_i(6, c["ci_off"], _CT_I64)
                    w.write_i(7, c["ci_len"], _CT_I32)
                w.end_struct()            # ColumnChunk
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
