"""Self-contained ORC reader: protobuf metadata + stripe decode.

TPU-native equivalent of the ORC stack's read path
(reference: cpp/src/io/orc/ — stripe_init/stripe_data decode kernels,
protobuf footer in reader_impl.cu; the host walks metadata, the stripe
STREAM payloads decode into flat buffers that transfer to HBM once).

Covered: uncompressed / zlib / snappy / zstd chunked framing, the
PRESENT (boolean RLE), INT (RLEv1 + all four RLEv2 sub-encodings:
short-repeat, direct, delta, patched-base), DOUBLE/FLOAT (IEEE LE),
STRING (direct + dictionary), BOOLEAN, and TIMESTAMP column encodings —
the surface pyarrow's writer emits.  Nested types fall back to the
pyarrow tier (io/orc.py detects and routes).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table


# ----------------------------------------------------------------------
# protobuf (wire format) reader — the footer metadata is proto-encoded
# ----------------------------------------------------------------------

class ProtoReader:
    def __init__(self, buf: bytes, pos: int = 0, end: Optional[int] = None):
        self.buf = buf
        self.pos = pos
        self.end = len(buf) if end is None else end

    def varint(self) -> int:
        v = s = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << s
            if not (b & 0x80):
                return v
            s += 7

    def fields(self):
        """Yield (field_number, wire_type, value) until end."""
        while self.pos < self.end:
            key = self.varint()
            fn, wt = key >> 3, key & 7
            if wt == 0:
                yield fn, wt, self.varint()
            elif wt == 2:
                ln = self.varint()
                yield fn, wt, self.buf[self.pos:self.pos + ln]
                self.pos += ln
            elif wt == 5:
                yield fn, wt, self.buf[self.pos:self.pos + 4]
                self.pos += 4
            elif wt == 1:
                yield fn, wt, self.buf[self.pos:self.pos + 8]
                self.pos += 8
            else:
                raise ValueError(f"wire type {wt}")


def _proto_dict(buf: bytes):
    out: Dict[int, list] = {}
    for fn, wt, v in ProtoReader(buf).fields():
        out.setdefault(fn, []).append(v)
    return out


@dataclass
class OrcStream:
    kind: int          # 0=PRESENT 1=DATA 2=LENGTH 3=DICTIONARY_DATA ...
    column: int
    length: int


@dataclass
class OrcStripe:
    offset: int
    index_length: int
    data_length: int
    footer_length: int
    num_rows: int
    streams: List[OrcStream] = field(default_factory=list)
    encodings: List[int] = field(default_factory=list)
    dict_sizes: List[int] = field(default_factory=list)


@dataclass
class OrcMeta:
    compression: int           # 0=NONE 1=ZLIB 2=SNAPPY 3=LZO 4=LZ4 5=ZSTD
    block_size: int
    num_rows: int
    types: List[dict]          # per column: {"kind": int, "names": [..], "subtypes": [..]}
    stripes: List[OrcStripe]


_K = {"BOOLEAN": 0, "BYTE": 1, "SHORT": 2, "INT": 3, "LONG": 4,
      "FLOAT": 5, "DOUBLE": 6, "STRING": 7, "BINARY": 8, "TIMESTAMP": 9,
      "LIST": 10, "MAP": 11, "STRUCT": 12, "UNION": 13, "DECIMAL": 14,
      "DATE": 15, "VARCHAR": 16, "CHAR": 17}


def read_orc_metadata(path: str) -> OrcMeta:
    with open(path, "rb") as f:
        f.seek(0, 2)
        size = f.tell()
        f.seek(max(size - 256, 0))
        tail = f.read()
    ps_len = tail[-1]
    ps = _proto_dict(tail[-1 - ps_len:-1])
    footer_len = ps.get(1, [0])[0]
    compression = ps.get(2, [0])[0]
    block_size = ps.get(3, [262144])[0]
    with open(path, "rb") as f:
        f.seek(size - 1 - ps_len - footer_len)
        footer_raw = f.read(footer_len)
    footer_raw = _decompress_stream(footer_raw, compression, block_size)
    fd = _proto_dict(footer_raw)
    num_rows = fd.get(6, [0])[0]
    types = []
    for traw in fd.get(4, []):
        td = _proto_dict(traw)
        # subtypes: repeated uint32, PACKED on the wire (one bytes blob
        # of varints) or expanded (one varint per entry)
        subs = []
        for v in td.get(2, []):
            if isinstance(v, (bytes, bytearray)):
                r = ProtoReader(bytes(v))
                while r.pos < r.end:
                    subs.append(r.varint())
            else:
                subs.append(v)
        types.append({
            "kind": td.get(1, [0])[0],
            "subtypes": subs,
            "names": [n.decode() for n in td.get(3, [])],
            "precision": td.get(5, [0])[0] if 5 in td else 0,
            "scale": td.get(6, [0])[0] if 6 in td else 0,
        })
    stripes = []
    for sraw in fd.get(3, []):
        sd = _proto_dict(sraw)
        stripes.append(OrcStripe(
            offset=sd.get(1, [0])[0], index_length=sd.get(2, [0])[0],
            data_length=sd.get(3, [0])[0], footer_length=sd.get(4, [0])[0],
            num_rows=sd.get(5, [0])[0]))
    return OrcMeta(compression, block_size, num_rows, types, stripes)


def _decompress_stream(data: bytes, compression: int, block_size: int) -> bytes:
    """ORC chunked framing: 3-byte little-endian header per chunk,
    (len << 1) | is_original."""
    if compression == 0:
        return data
    out = []
    pos = 0
    while pos + 3 <= len(data):
        hdr = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        ln = hdr >> 1
        chunk = data[pos:pos + ln]
        pos += ln
        if hdr & 1:                      # original (stored) chunk
            out.append(chunk)
        elif compression == 1:           # ZLIB (raw deflate)
            import zlib

            out.append(zlib.decompress(chunk, -15))
        elif compression == 2:           # SNAPPY
            from cudf_tpu import native

            out.append(native.snappy_decompress(chunk))
        elif compression == 5:           # ZSTD
            import zstandard

            out.append(zstandard.ZstdDecompressor().decompress(
                chunk, max_output_size=block_size))
        else:
            raise NotImplementedError(f"orc compression {compression}")
    return b"".join(out)


# ----------------------------------------------------------------------
# run-length decoders
# ----------------------------------------------------------------------

def _zigzag_un(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_vulong(data: bytes, pos: int) -> Tuple[int, int]:
    v = s = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << s
        if not (b & 0x80):
            return v, pos
        s += 7


def decode_bool_rle(data: bytes, count: int) -> np.ndarray:
    """ORC boolean RLE: byte-level RLE of bit-packed bytes."""
    bytes_needed = (count + 7) // 8
    out = np.empty(bytes_needed, np.uint8)
    pos = w = 0
    while w < bytes_needed and pos < len(data):
        h = data[pos]
        pos += 1
        if h < 128:                       # run of h+3 repeated bytes
            n = h + 3
            out[w:w + n] = data[pos]
            pos += 1
            w += n
        else:                             # 256-h literal bytes
            n = 256 - h
            lit = np.frombuffer(data, np.uint8, count=min(n, bytes_needed - w),
                                offset=pos)
            out[w:w + lit.shape[0]] = lit
            pos += n
            w += n
    bits = np.unpackbits(out[:bytes_needed], bitorder="big")[:count]
    return bits.astype(bool)


def decode_byte_rle(data: bytes, count: int) -> np.ndarray:
    out = np.empty(count, np.uint8)
    pos = w = 0
    while w < count and pos < len(data):
        h = data[pos]
        pos += 1
        if h < 128:
            n = min(h + 3, count - w)
            out[w:w + n] = data[pos]
            pos += 1
            w += n
        else:
            n = min(256 - h, count - w)
            out[w:w + n] = np.frombuffer(data, np.uint8, count=n, offset=pos)
            pos += 256 - h
            w += n
    return out


def _read_be_bits(data: bytes, pos_bits: int, width: int) -> int:
    """Read `width` bits big-endian starting at bit offset pos_bits."""
    v = 0
    for _ in range(width):
        byte = data[pos_bits >> 3]
        bit = (byte >> (7 - (pos_bits & 7))) & 1
        v = (v << 1) | bit
        pos_bits += 1
    return v


_RLE2_WIDTHS = [1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64]


def _decode_width(enc: int) -> int:
    """5-bit encoded width → actual bit width (ORC spec table)."""
    if enc == 0:
        return 1
    if enc <= 23:
        return enc + 1 if enc >= 1 else 1
    return (enc - 23) * 8 + 24 if enc > 23 else enc + 1


def _w5(enc: int) -> int:
    # deltas use width code 0 → 0 bits (all identical)
    table = {0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 7, 7: 8, 8: 9, 9: 10,
             10: 11, 11: 12, 12: 13, 13: 14, 14: 15, 15: 16, 16: 17,
             17: 18, 18: 19, 19: 20, 20: 21, 21: 22, 22: 23, 23: 24,
             24: 26, 25: 28, 26: 30, 27: 32, 28: 40, 29: 48, 30: 56,
             31: 64}
    return table[enc]


def _unpack_be(data: bytes, start_bit: int, width: int, count: int) -> np.ndarray:
    """Vectorized big-endian bit unpack."""
    if width == 0:
        return np.zeros(count, np.int64)
    if width > 56:
        # the sliding 64-bit window below reads width+15..22 bits per
        # value and overflows for wide values; widths 57..64 are rare
        # (full-range int64 DIRECT chunks) — decode via python bigint
        total = start_bit + count * width
        acc = int.from_bytes(data[:(total + 7) // 8], "big")
        acc >>= (((total + 7) // 8) * 8 - total)
        mask = (1 << width) - 1
        out = np.empty(count, np.uint64)
        for i in range(count - 1, -1, -1):
            out[i] = (acc & mask) & 0xFFFFFFFFFFFFFFFF
            acc >>= width
        return out.view(np.int64)
    positions = start_bit + np.arange(count, dtype=np.int64) * width
    arr = np.frombuffer(data, np.uint8)
    out = np.zeros(count, np.uint64)
    for k in range((width + 14) // 8 + 1):
        byte_idx = (positions >> 3) + k
        valid = byte_idx < arr.shape[0]
        out = (out << np.uint64(8)) | np.where(
            valid, arr[np.minimum(byte_idx, arr.shape[0] - 1)], 0
        ).astype(np.uint64)
    total_read = ((width + 14) // 8 + 1) * 8
    shift = total_read - width - (positions & 7)
    out = (out >> shift.astype(np.uint64)) & \
        ((np.uint64(1) << np.uint64(width)) - np.uint64(1)
         if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF))
    return out.astype(np.int64) if width < 64 else out.view(np.int64)


def decode_int_rle2(data: bytes, count: int, signed: bool) -> np.ndarray:
    """ORC RLEv2: short-repeat / direct / patched-base / delta."""
    out = np.empty(count, np.int64)
    pos = w = 0
    while w < count and pos < len(data):
        b0 = data[pos]
        mode = b0 >> 6
        if mode == 0:                    # SHORT REPEAT
            width = ((b0 >> 3) & 0x7) + 1
            n = (b0 & 0x7) + 3
            v = int.from_bytes(data[pos + 1:pos + 1 + width], "big")
            pos += 1 + width
            if signed:
                v = _zigzag_un(v)
            m = min(n, count - w)
            out[w:w + m] = v
            w += m
        elif mode == 1:                  # DIRECT
            width = _w5((b0 >> 1) & 0x1F)
            n = (((b0 & 1) << 8) | data[pos + 1]) + 1
            pos += 2
            vals = _unpack_be(data, pos * 8, width, n)
            pos += (n * width + 7) // 8
            if signed:
                # unzigzag on the UNSIGNED view: an arithmetic >> on
                # int64 corrupts width-64 values with the top bit set
                u = vals.view(np.uint64)
                vals = ((u >> np.uint64(1))
                        ^ (np.uint64(0) - (u & np.uint64(1)))).view(np.int64)
            m = min(n, count - w)
            out[w:w + m] = vals[:m]
            w += m
        elif mode == 3:                  # DELTA
            width = (b0 >> 1) & 0x1F
            width = 0 if width == 0 else _w5(width)
            n = (((b0 & 1) << 8) | data[pos + 1]) + 1
            pos += 2
            if signed:
                base, pos = _read_vulong(data, pos)
                base = _zigzag_un(base)
            else:
                base, pos = _read_vulong(data, pos)
            delta0, pos = _read_vulong(data, pos)
            delta0 = _zigzag_un(delta0)
            vals = np.empty(n, np.int64)
            vals[0] = base
            if n > 1:
                vals[1] = base + delta0
                if n > 2:
                    if width:
                        deltas = _unpack_be(data, pos * 8, width, n - 2)
                        pos += ((n - 2) * width + 7) // 8
                    else:
                        # width code 0 = FIXED delta run: every step
                        # advances by delta0 (java RunLengthIntegerReaderV2
                        # readDeltaValues; spec example 1..10 = c0 09 02 02)
                        deltas = np.full(n - 2, abs(delta0), np.int64)
                    sign = 1 if delta0 >= 0 else -1
                    vals[2:] = vals[1] + np.cumsum(sign * deltas)
            m = min(n, count - w)
            out[w:w + m] = vals[:m]
            w += m
        else:                            # PATCHED BASE
            width = _w5((b0 >> 1) & 0x1F)
            n = (((b0 & 1) << 8) | data[pos + 1]) + 1
            b2 = data[pos + 2]
            bw = ((b2 >> 5) & 0x7) + 1          # base width, bytes
            pw = _w5(b2 & 0x1F)                 # patch value width, bits
            b3 = data[pos + 3]
            gapbits = ((b3 >> 5) & 0x7) + 1     # patch gap width, bits
            pll = b3 & 0x1F                     # patch list length
            pos += 4
            base = int.from_bytes(data[pos:pos + bw], "big")
            # base is sign-MAGNITUDE: msb of the base bytes is the sign
            if base & (1 << (bw * 8 - 1)):
                base = -(base & ((1 << (bw * 8 - 1)) - 1))
            pos += bw
            vals = _unpack_be(data, pos * 8, width, n)
            pos += (n * width + 7) // 8
            # patch entries: (gap << pw) | patch, padded to the closest
            # ALIGNED fixed width (Java impl getClosestAlignedFixedBits)
            entry_bits = next(wd for wd in _RLE2_WIDTHS
                              if wd >= gapbits + pw)
            entries = _unpack_be(data, pos * 8, entry_bits, pll) if pll else \
                np.zeros(0, np.int64)
            pos += (pll * entry_bits + 7) // 8
            idx = 0
            for e in entries:
                gap = int(e) >> pw
                patch = int(e) & ((1 << pw) - 1)
                idx += gap
                if idx < n:
                    vals[idx] |= patch << width
            m = min(n, count - w)
            out[w:w + m] = base + vals[:m]
            w += m
    return out[:w]


def decode_int_rle1(data: bytes, count: int, signed: bool) -> np.ndarray:
    out = np.empty(count, np.int64)
    pos = w = 0
    while w < count and pos < len(data):
        h = data[pos]
        pos += 1
        if h < 128:                       # run
            n = h + 3
            delta = struct.unpack("b", data[pos:pos + 1])[0]
            pos += 1
            v, pos = _read_vulong(data, pos)
            if signed:
                v = _zigzag_un(v)
            out[w:w + n] = v + delta * np.arange(n)
            w += n
        else:
            n = 256 - h
            n = min(n, count - w)
            for i in range(n):
                v, pos = _read_vulong(data, pos)
                out[w + i] = _zigzag_un(v) if signed else v
            w += n
    return out[:w]


# ----------------------------------------------------------------------
# stripe decode → columns
# ----------------------------------------------------------------------

_ORC_EPOCH_S = 1420070400       # 2015-01-01 00:00:00 UTC (timestamp base)


def _read_stripe_footer(f, stripe: OrcStripe, meta: OrcMeta):
    f.seek(stripe.offset + stripe.index_length + stripe.data_length)
    raw = _decompress_stream(f.read(stripe.footer_length), meta.compression,
                             meta.block_size)
    sd = _proto_dict(raw)
    streams = []
    for sraw in sd.get(1, []):
        d = _proto_dict(sraw)
        streams.append(OrcStream(kind=d.get(1, [0])[0],
                                 column=d.get(2, [0])[0],
                                 length=d.get(3, [0])[0]))
    encodings, dict_sizes = [], []
    for eraw in sd.get(2, []):
        d = _proto_dict(eraw)
        encodings.append(d.get(1, [0])[0])
        dict_sizes.append(d.get(2, [0])[0] if 2 in d else 0)
    stripe.streams = streams
    stripe.encodings = encodings
    stripe.dict_sizes = dict_sizes


def _stripe_column_data(f, stripe: OrcStripe, meta: OrcMeta, col_id: int):
    """dict of stream kind → decompressed bytes for one column."""
    # the streams list covers the index region (ROW_INDEX kind 6, bloom
    # kinds 7/8) FOLLOWED by the data region, in file order — walk from
    # the stripe start and the data streams land at offset+index_length
    pos = stripe.offset
    out = {}
    for s in stripe.streams:
        if s.column == col_id and s.kind in (0, 1, 2, 3, 5):
            f.seek(pos)
            out[s.kind] = _decompress_stream(f.read(s.length),
                                             meta.compression,
                                             meta.block_size)
        pos += s.length
    return out


def _decode_column_stripe(streams, enc: int, kind: int, n: int,
                          dict_size: int = 0):
    """(values ndarray | (offsets, chars), valid | None) for one stripe."""
    present = streams.get(0)
    valid = decode_bool_rle(present, n) if present is not None else None
    n_present = int(valid.sum()) if valid is not None else n
    v2 = enc in (2, 3)

    def ints(buf, cnt, signed=True):
        return (decode_int_rle2(buf, cnt, signed) if v2
                else decode_int_rle1(buf, cnt, signed))

    if kind in (_K["INT"], _K["LONG"], _K["SHORT"], _K["DATE"]):
        vals = ints(streams.get(1, b""), n_present)
        if kind == _K["DATE"]:
            vals = vals.astype("M8[D]").astype("M8[ns]")
    elif kind == _K["BYTE"]:
        vals = decode_byte_rle(streams.get(1, b""), n_present).astype(np.int8)
    elif kind == _K["DOUBLE"]:
        vals = np.frombuffer(streams.get(1, b""), "<f8", count=n_present)
    elif kind == _K["FLOAT"]:
        vals = np.frombuffer(streams.get(1, b""), "<f4", count=n_present)
    elif kind == _K["BOOLEAN"]:
        vals = decode_bool_rle(streams.get(1, b""), n_present)
    elif kind == _K["TIMESTAMP"]:
        secs = ints(streams.get(1, b""), n_present, signed=True)
        nraw = ints(streams.get(5, b""), n_present, signed=False)
        scale = nraw & 7
        nanos = nraw >> 3
        mult = np.array([1, 100, 1000, 10000, 100000, 1000000, 10000000,
                         100000000], np.int64)[scale]
        nanos = nanos * mult
        vals = ((secs + _ORC_EPOCH_S) * 1_000_000_000 +
                np.where(secs >= 0, nanos, nanos) *
                np.where((secs < 0) & (nanos != 0), 1, 1))
        # ORC quirk: for negative seconds with nanos, seconds are
        # decremented by one at write time; nanos always add forward
        vals = np.where((secs < 0) & (nanos != 0),
                        (secs + _ORC_EPOCH_S + 1) * 1_000_000_000 - (1_000_000_000 - nanos),
                        vals)
        vals = vals.view("M8[ns]")
    elif kind in (_K["STRING"], _K["VARCHAR"], _K["CHAR"], _K["BINARY"]):
        if enc in (1, 3):                # DICTIONARY
            idx = ints(streams.get(1, b""), n_present, signed=False)
            dlen = ints(streams.get(2, b""), dict_size, signed=False)
            chars = np.frombuffer(streams.get(3, b""), np.uint8)
            doffs = np.zeros(dlen.shape[0] + 1, np.int64)
            np.cumsum(dlen, out=doffs[1:])
            lens = dlen[idx]
            offs = np.zeros(n_present + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            out_chars = np.empty(int(offs[-1]), np.uint8)
            for i, j in enumerate(idx):
                out_chars[offs[i]:offs[i + 1]] = chars[doffs[j]:doffs[j + 1]]
            vals = (offs, out_chars)
        else:                            # DIRECT
            lens = ints(streams.get(2, b""), n_present, signed=False)
            chars = np.frombuffer(streams.get(1, b""), np.uint8)
            offs = np.zeros(n_present + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            vals = (offs, chars[:int(offs[-1])])
    else:
        raise NotImplementedError(f"orc column kind {kind}")
    return vals, valid


def read_orc_native(path: str, columns: Optional[List[str]] = None):
    """Read a flat-schema ORC file into a DataFrame."""
    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index
    import jax.numpy as jnp

    meta = read_orc_metadata(path)
    root = meta.types[0]
    if root["kind"] != _K["STRUCT"]:
        raise NotImplementedError("non-struct root")
    names = root["names"]
    child_ids = [int(c) for c in root["subtypes"]]
    for cid in child_ids:
        if meta.types[cid]["kind"] in (_K["LIST"], _K["MAP"], _K["STRUCT"],
                                       _K["UNION"], _K["DECIMAL"]):
            raise NotImplementedError("nested/decimal orc column")
    wanted = columns or names
    per_col: Dict[str, List] = {n: [] for n in wanted}
    per_val: Dict[str, List] = {n: [] for n in wanted}
    with open(path, "rb") as f:
        for stripe in meta.stripes:
            _read_stripe_footer(f, stripe, meta)
            for name, cid in zip(names, child_ids):
                if name not in per_col:
                    continue
                streams = _stripe_column_data(f, stripe, meta, cid)
                vals, valid = _decode_column_stripe(
                    streams, stripe.encodings[cid],
                    meta.types[cid]["kind"], stripe.num_rows,
                    stripe.dict_sizes[cid])
                per_col[name].append(vals)
                per_val[name].append(
                    valid if valid is not None
                    else np.ones(stripe.num_rows, bool))
    cols = {}
    for name, cid in zip(names, child_ids):
        if name not in per_col:
            continue
        valids = np.concatenate(per_val[name]) if per_val[name] else \
            np.zeros(0, bool)
        mask = None if valids.all() else valids
        parts = per_col[name]
        if parts and isinstance(parts[0], tuple):     # strings
            offs_parts, chars_parts = zip(*parts)
            # spread present strings into full row count
            total = valids.shape[0]
            offs = np.zeros(total + 1, np.int64)
            chars = np.concatenate(chars_parts) if chars_parts else \
                np.zeros(0, np.uint8)
            row = 0
            shift = 0
            lens_full = np.zeros(total, np.int64)
            for (po, _), pv in zip(parts, per_val[name]):
                lens = po[1:] - po[:-1]
                k = 0
                for v in pv:
                    if v:
                        lens_full[row] = lens[k]
                        k += 1
                    row += 1
            np.cumsum(lens_full, out=offs[1:])
            cols[name] = Column(dt.STRING, total, data=jnp.asarray(chars),
                                offsets=jnp.asarray(offs),
                                validity=jnp.asarray(mask)
                                if mask is not None else None)
        else:
            present = np.concatenate(parts) if parts else np.zeros(0)
            if valids.all():
                cols[name] = Column.from_numpy(present, mask=None)
            else:
                full = np.zeros(valids.shape[0], dtype=present.dtype)
                full[valids] = present
                cols[name] = Column.from_numpy(full, mask=valids)
    t = Table(cols)
    return DataFrame._from(t, default_index(t.num_rows))
