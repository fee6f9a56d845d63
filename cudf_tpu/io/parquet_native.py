"""Self-contained Parquet column-chunk reader (no pyarrow in the data path).

TPU-native equivalent of the reference's parquet decode stack
(reference: cpp/src/io/parquet/reader_impl.cpp:208-244 decode_kernel_mask
dispatch, page_data.cu, rle_stream.cuh, unsnap.cu):

- footer/page headers: cudf_tpu/io/thrift.py (host, like
  compact_protocol_reader.cpp)
- page decompress: native snappy (csrc/) / zstd (zstandard lib)
- definition levels: native RLE decode → validity
- values: PLAIN (memcpy-shaped) and RLE_DICTIONARY (native RLE indices +
  device gather from the dictionary page) — the two encodings that cover
  the NYC-Taxi-style analytics files
- the assembled flat buffers transfer to HBM once

Supported physical types: INT32, INT64, FLOAT, DOUBLE, BYTE_ARRAY (plain &
dict), BOOLEAN (plain).  Falls back to the pyarrow reader for anything
else (io/parquet.py).  Device-side RLE/bit-unpack Pallas kernels replace
the host tier in a later round — the interfaces here are already
column-chunk granular to slot them in.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from cudf_tpu import native
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.io import thrift

_PHYS = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY"}
_NP = {1: np.dtype("int32"), 2: np.dtype("int64"), 4: np.dtype("float32"), 5: np.dtype("float64")}
_CODEC_UNCOMPRESSED, _CODEC_SNAPPY, _CODEC_GZIP, _CODEC_ZSTD = 0, 1, 2, 6
_ENC_PLAIN, _ENC_RLE, _ENC_PLAIN_DICT, _ENC_RLE_DICT = 0, 3, 2, 8
_ENC_DELTA_BINARY, _ENC_DELTA_LENGTH_BA, _ENC_DELTA_BA = 5, 6, 7


def _decompress(data: bytes, codec: int, uncompressed_size: int) -> bytes:
    if codec == _CODEC_UNCOMPRESSED:
        return data
    if codec == _CODEC_SNAPPY:
        return native.snappy_decompress(data)
    if codec == _CODEC_ZSTD:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(data, max_output_size=uncompressed_size)
    if codec == _CODEC_GZIP:
        import gzip

        return gzip.decompress(data)
    raise NotImplementedError(f"codec {codec}")


def _read_levels(page: bytes, num_values: int, max_level: int) -> Tuple[np.ndarray, int]:
    """Definition levels (RLE with 4-byte length prefix) → (levels, consumed)."""
    if max_level == 0:
        return np.zeros(num_values, np.int32), 0
    bw = max(max_level.bit_length(), 1)
    ln = int.from_bytes(page[:4], "little")
    levels = native.rle_decode32(page[4:4 + ln], bw, num_values)
    return levels, 4 + ln


def _decode_plain(data: bytes, phys: int, n: int, type_length: int = 0):
    if phys in _NP:
        return np.frombuffer(data, dtype=_NP[phys], count=n)
    if phys == 0:  # BOOLEAN bit-packed LSB
        bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")[:n]
        return bits.astype(bool)
    if phys == 3:  # INT96 legacy timestamp: 8B nanos-of-day + 4B julian day
        raw = np.frombuffer(data, np.uint8, count=n * 12).reshape(n, 12)
        nanos = raw[:, :8].copy().view("<u8").reshape(n).astype(np.int64)
        jday = raw[:, 8:].copy().view("<u4").reshape(n).astype(np.int64)
        ns = (jday - 2440588) * 86_400_000_000_000 + nanos
        return ns.view("M8[ns]")
    if phys == 7:  # FIXED_LEN_BYTE_ARRAY
        tl = type_length
        if tl <= 0 or tl > 8:
            raise NotImplementedError(f"FLBA length {tl}")
        raw = np.frombuffer(data, np.uint8, count=n * tl).reshape(n, tl)
        # big-endian two's complement → int64 (decimal unscaled values)
        val = np.zeros(n, np.int64)
        for j in range(tl):
            val = (val << 8) | raw[:, j].astype(np.int64)
        shift = 64 - 8 * tl
        val = (val << shift) >> shift          # sign extend
        return val
    if phys == 6:  # BYTE_ARRAY: 4-byte length + bytes, repeated
        offs = np.zeros(n + 1, np.int64)
        chunks = []
        pos = 0
        for i in range(n):
            ln = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            chunks.append(data[pos:pos + ln])
            pos += ln
            offs[i + 1] = offs[i] + ln
        return offs, np.frombuffer(b"".join(chunks), np.uint8)
    raise NotImplementedError(f"physical type {phys}")


# observable for page-pruning tests (the reference's equivalent check
# asserts on pages decoded in page_index_filter tests)
PAGE_COUNTERS = {"decoded": 0, "skipped": 0}


def _read_page_payload(raw: bytes, pos: int, ph: thrift.PageHeader,
                       codec: int) -> bytes:
    """Decompress one page's payload (v2 keeps levels uncompressed)."""
    if ph.type == 3 and not ph.v2_is_compressed:
        return raw[pos:pos + ph.compressed_page_size]
    if ph.type == 3:
        # v2: levels are stored UNcompressed ahead of the compressed
        # values section (format spec DataPageHeaderV2)
        lvl_len = ph.def_levels_byte_length + ph.rep_levels_byte_length
        lvl = raw[pos:pos + lvl_len]
        body_c = raw[pos + lvl_len:pos + ph.compressed_page_size]
        return lvl + _decompress(
            body_c, codec, ph.uncompressed_page_size - lvl_len)
    return _decompress(raw[pos:pos + ph.compressed_page_size],
                       codec, ph.uncompressed_page_size)


def _decode_data_page(ph: thrift.PageHeader, payload: bytes, phys: int,
                      nullable: bool, type_length: int,
                      dictionary, dict_dev):
    """Decode one data page → (vals, valid, dict_dev).

    vals is an ndarray, or (offsets, chars) for strings."""
    PAGE_COUNTERS["decoded"] += 1
    nv = ph.num_values
    if ph.type == 3:
        # v2 def levels: RLE without the 4-byte length prefix
        if nullable and ph.def_levels_byte_length:
            dls = native.rle_decode32(
                payload[:ph.def_levels_byte_length], 1, nv)
        else:
            dls = np.ones(nv, np.int32) if not nullable or \
                (ph.num_nulls == 0) else np.ones(nv, np.int32)
        consumed = ph.def_levels_byte_length + ph.rep_levels_byte_length
    else:
        dls, consumed = _read_levels(payload, nv, 1 if nullable else 0)
    body = payload[consumed:]
    valid = dls.astype(bool) if nullable else np.ones(nv, bool)
    n_present = int(valid.sum())
    from cudf_tpu.utils.config import get_option

    device_tier = get_option("io.parquet.device_decode")
    if ph.encoding == _ENC_PLAIN:
        vals = _decode_plain(body, phys, n_present, type_length)
    elif ph.encoding == _ENC_DELTA_BINARY and phys in (1, 2):
        # DELTA_BINARY_PACKED on device (page_delta_decode.cu role)
        from cudf_tpu.io.parquet_device import device_delta_binary_decode

        v64, _ = device_delta_binary_decode(bytes(body), n_present)
        vals = np.asarray(v64).astype(_NP[phys])
    elif ph.encoding == _ENC_DELTA_LENGTH_BA and phys == 6:
        from cudf_tpu.io.parquet_device import (
            device_delta_length_byte_array)

        offs_j, chars_j = device_delta_length_byte_array(
            bytes(body), n_present)
        vals = (np.asarray(offs_j), np.asarray(chars_j))
    elif ph.encoding in (_ENC_RLE_DICT, _ENC_PLAIN_DICT):
        bw = body[0]
        if device_tier and phys in _NP:
            # device tier: RLE/bit-pack expand + dictionary gather on
            # the VPU (io/parquet_device.py)
            import jax.numpy as _jnp

            from cudf_tpu.io.parquet_device import device_rle_decode

            idx_j = device_rle_decode(bytes(body[1:]), bw, n_present)
            # stays DEVICE-resident: pulling decoded pages to host and
            # re-pushing them cost ~0.25 s/chunk over the tunnel
            vals = _jnp.take(_jnp.asarray(dictionary), idx_j)
            return vals, valid, dict_dev
        if device_tier and phys == 6:
            # device string decode for the dict-encoded case
            # (page_string_decode.cu role): indices + dictionary +
            # output assembly all device-resident
            import jax.numpy as _jnp

            from cudf_tpu.io.parquet_device import (
                device_dict_string_gather, device_rle_decode)

            if dict_dev is None:
                offs, chars = dictionary
                dict_dev = (_jnp.asarray(offs), _jnp.asarray(chars))
            idx_j = device_rle_decode(bytes(body[1:]), bw, n_present)
            offs_j, chars_j = device_dict_string_gather(
                idx_j, dict_dev[0], dict_dev[1])
            vals = (np.asarray(offs_j), np.asarray(chars_j))
            return vals, valid, dict_dev
        idx = native.rle_decode32(body[1:], bw, n_present)
        if phys == 6:
            offs, chars = dictionary
            lens = (offs[1:] - offs[:-1])[idx]
            new_offs = np.zeros(n_present + 1, np.int64)
            np.cumsum(lens, out=new_offs[1:])
            out_chars = np.empty(int(new_offs[-1]), np.uint8)
            for i, j in enumerate(idx):
                out_chars[new_offs[i]:new_offs[i + 1]] = chars[offs[j]:offs[j + 1]]
            vals = (new_offs, out_chars)
        else:
            vals = dictionary[idx]
    else:
        raise NotImplementedError(f"encoding {ph.encoding}")
    return vals, valid, dict_dev


def read_column_chunk(path: str, meta: thrift.ColumnChunkMeta, nullable: bool = True,
                      type_length: int = 0):
    """Decode one column chunk → (values ndarray | (offsets, chars), validity | None)."""
    phys = meta.type
    with open(path, "rb") as f:
        start = meta.dictionary_page_offset or meta.data_page_offset
        f.seek(start)
        raw = f.read(meta.total_compressed_size + (1 << 16))

    pos = 0
    dictionary = None
    dict_dev = None                      # device-resident (offsets, chars)
    values_parts: List = []
    validity_parts: List[np.ndarray] = []
    remaining = meta.num_values
    while remaining > 0 and pos < len(raw):
        ph = thrift.PageHeader.parse(raw, pos)
        pos += ph.header_len
        payload = _read_page_payload(raw, pos, ph, meta.codec)
        pos += ph.compressed_page_size
        if ph.type == 2:  # dictionary page
            dictionary = _decode_plain(payload, phys, ph.dict_num_values, type_length)
            continue
        if ph.type not in (0, 3):
            raise NotImplementedError(f"page type {ph.type}")
        vals, valid, dict_dev = _decode_data_page(
            ph, payload, phys, nullable, type_length, dictionary, dict_dev)
        values_parts.append(vals)
        validity_parts.append(valid)
        remaining -= ph.num_values

    validity = np.concatenate(validity_parts) if validity_parts else np.zeros(0, bool)
    if phys == 6:
        # merge string parts (spread valid slots) — vectorized: the
        # per-row python loop cost ~1 s/Mrow
        total = validity.shape[0]
        lens_full = np.zeros(total, np.int64)
        chars_parts = []
        row = 0
        for vals, valid in zip(values_parts, validity_parts):
            po, pc = np.asarray(vals[0]), np.asarray(vals[1])
            n_page = valid.shape[0]
            lens_full[row:row + n_page][valid] = po[1:] - po[:-1]
            row += n_page
            chars_parts.append(pc)
        offs = np.zeros(total + 1, np.int64)
        np.cumsum(lens_full, out=offs[1:])
        chars = np.concatenate(chars_parts) if chars_parts else np.zeros(0, np.uint8)
        return (offs, chars), (None if validity.all() else validity)
    if validity.all() and values_parts and any(
            not isinstance(v, np.ndarray) for v in values_parts):
        # device-resident pages: concat on device, never pull
        parts_d = [v if not isinstance(v, np.ndarray) else jnp.asarray(v)
                   for v in values_parts]
        return (parts_d[0] if len(parts_d) == 1
                else jnp.concatenate(parts_d)), None
    present = np.concatenate([np.asarray(v) for v in values_parts]) if values_parts else np.zeros(0)
    if validity.all():
        return present, None
    # spread present values into full-length buffer
    full = np.zeros(validity.shape[0], dtype=present.dtype)
    full[validity] = present
    return full, validity


def _spread_page(vals, valid, phys):
    """Expand a page's present-only values to full page length.

    numeric → (full_vals, valid); strings → (full_offs, chars, valid)."""
    n = valid.shape[0]
    if phys == 6:
        offs, chars = vals
        lens = np.zeros(n, np.int64)
        lens[valid] = np.asarray(offs[1:]) - np.asarray(offs[:-1])
        full_offs = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=full_offs[1:])
        return full_offs, np.asarray(chars), valid
    present = np.asarray(vals)
    if valid.all():
        return present, valid
    full = np.zeros(n, dtype=present.dtype)
    full[valid] = present
    return full, valid


def read_column_chunk_pruned(path: str, meta: thrift.ColumnChunkMeta,
                             page_locs, intervals, rg_rows: int,
                             nullable: bool = True, type_length: int = 0):
    """Decode only the pages of one chunk that overlap ``intervals``
    (sorted disjoint [start, stop) row ranges, rg-relative), returning
    exactly the interval rows — the page-skip read the reference's
    page-index filter performs (experimental/page_index_filter.cu);
    ``page_locs`` comes from the chunk's OffsetIndex.

    → same contract as read_column_chunk, for the selected rows only."""
    phys = meta.type
    starts = [p.first_row_index for p in page_locs]
    bounds = starts[1:] + [rg_rows]
    dictionary = None
    with open(path, "rb") as f:
        if meta.dictionary_page_offset is not None:
            f.seek(meta.dictionary_page_offset)
            raw = f.read((page_locs[0].offset if page_locs else
                          meta.data_page_offset) - meta.dictionary_page_offset
                         + (1 << 16))
            ph = thrift.PageHeader.parse(raw, 0)
            payload = _read_page_payload(raw, ph.header_len, ph, meta.codec)
            dictionary = _decode_plain(payload, phys, ph.dict_num_values,
                                       type_length)
        pages = {}                       # page idx → spread full-page arrays
        dict_dev = None
        for i, loc in enumerate(page_locs):
            p0, p1 = starts[i], bounds[i]
            if not any(a < p1 and b > p0 for a, b in intervals):
                PAGE_COUNTERS["skipped"] += 1
                continue
            f.seek(loc.offset)
            raw = f.read(loc.compressed_page_size + (1 << 12))
            ph = thrift.PageHeader.parse(raw, 0)
            payload = _read_page_payload(raw, ph.header_len, ph, meta.codec)
            vals, valid, dict_dev = _decode_data_page(
                ph, payload, phys, nullable, type_length, dictionary,
                dict_dev)
            pages[i] = _spread_page(vals, valid, phys)
    # assemble interval rows (pages are row-aligned within the group:
    # flat schemas only, so num_values == num_rows per page)
    out_valid: List[np.ndarray] = []
    if phys == 6:
        offs_parts: List[np.ndarray] = []
        chars_parts: List[np.ndarray] = []
        for a, b in intervals:
            for i in pages:
                p0, p1 = starts[i], bounds[i]
                lo, hi = max(a, p0), min(b, p1)
                if lo >= hi:
                    continue
                full_offs, chars, valid = pages[i]
                o = full_offs[lo - p0:hi - p0 + 1]
                chars_parts.append(chars[o[0]:o[-1]])
                offs_parts.append(np.asarray(o[1:]) - o[0])
                out_valid.append(valid[lo - p0:hi - p0])
        validity = (np.concatenate(out_valid) if out_valid
                    else np.zeros(0, bool))
        total = validity.shape[0]
        offs = np.zeros(total + 1, np.int64)
        shift = 0
        row = 0
        for o in offs_parts:
            offs[row + 1: row + 1 + len(o)] = np.asarray(o) + shift
            shift += o[-1] if len(o) else 0
            row += len(o)
        chars = (np.concatenate(chars_parts) if chars_parts
                 else np.zeros(0, np.uint8))
        return (offs, chars), (None if validity.all() else validity)
    vals_parts: List[np.ndarray] = []
    for a, b in intervals:
        for i in pages:
            p0, p1 = starts[i], bounds[i]
            lo, hi = max(a, p0), min(b, p1)
            if lo >= hi:
                continue
            full, valid = pages[i]
            vals_parts.append(full[lo - p0:hi - p0])
            out_valid.append(valid[lo - p0:hi - p0])
    validity = np.concatenate(out_valid) if out_valid else np.zeros(0, bool)
    full = np.concatenate(vals_parts) if vals_parts else np.zeros(0)
    return full, (None if validity.all() else validity)


def _rg_passes_filters(rg, filters, phys_of) -> bool:
    """Row-group min/max stats pruning (predicate_pushdown.cpp role).

    filters: AND-list of (column, op, value), op ∈ {==,=,<,<=,>,>=,!=}.
    Returns False only when the stats PROVE no row can match.
    """
    if not filters:
        return True
    stats = {}
    for cc in rg.columns:
        name = cc.path[-1] if cc.path else ""
        if cc.statistics is not None:
            stats[name] = cc.statistics.decode(cc.type)
    for name, op, val in filters:
        if name not in stats:
            continue
        mn, mx = stats[name]
        if mn is None or mx is None:
            continue
        if isinstance(val, str) and isinstance(mn, (bytes, bytearray)):
            val = val.encode()
        try:
            if op in ("==", "=") and (val < mn or val > mx):
                return False
            if op == "<" and mn >= val:
                return False
            if op == "<=" and mn > val:
                return False
            if op == ">" and mx <= val:
                return False
            if op == ">=" and mx < val:
                return False
        except TypeError:
            continue
    return True


def prune_row_groups(path: str, filters) -> Tuple[int, int]:
    """(kept, total) row-group counts for the given filters — the
    observable the Q6 pushdown test asserts on."""
    md = thrift.read_file_metadata(path)
    kept = sum(1 for rg in md.row_groups
               if _rg_passes_filters(rg, filters, None))
    return kept, len(md.row_groups)


def _page_intervals_for_rg(path, rg, filters, wanted):
    """Kept row intervals for one row group from its page index, or None
    when page pruning is not applicable (missing index on any wanted or
    filter column).  [] means the whole group is provably empty."""
    from cudf_tpu.io import parquet_pushdown as ppd

    by_name = {(cc.path[-1] if cc.path else ""): cc for cc in rg.columns}
    needed = set(wanted) | {f[0] for f in filters if f[0] in by_name}
    for n in needed:
        cc = by_name.get(n)
        if cc is None or cc.offset_index_offset is None:
            return None
    per_col: Dict[str, List] = {}
    for name, op, val in filters:
        if name in by_name:
            per_col.setdefault(name, []).append((op, val))
    intervals = [(0, rg.num_rows)]
    any_pruned = False
    for name, col_filters in per_col.items():
        cc = by_name[name]
        ci, oi = ppd.read_page_index(path, cc)
        if ci is None or not ci.min_values:
            continue
        keep = ppd.page_keep_intervals(ci, oi, rg.num_rows, col_filters,
                                       cc.type)
        intervals = ppd.intervals_intersect(intervals, keep)
        any_pruned = True
    return intervals if any_pruned else None


_CMP = {
    "==": lambda a, b: a == b, "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
}


def _hybrid_exact_intervals(path, rg, filters, intervals, type_len,
                            nullable):
    """Filter-column-first pass (experimental/hybrid_scan.cpp role):
    decode only the filter columns over the stat-kept ``intervals``,
    evaluate the predicates exactly, and return coalesced intervals of
    the actual matching rows — payload columns then decode only pages
    holding matches.  None = not applicable (non-numeric filter col)."""
    by_name = {(cc.path[-1] if cc.path else ""): cc for cc in rg.columns}
    per_col: Dict[str, List] = {}
    for name, op, val in filters:
        if name not in by_name or op not in _CMP:
            return None
        if by_name[name].type not in _NP:       # numeric-only exact pass
            return None
        per_col.setdefault(name, []).append((op, val))
    if not per_col:
        return None
    from cudf_tpu.io import parquet_pushdown as ppd

    rows = np.concatenate([np.arange(a, b) for a, b in intervals]) \
        if intervals else np.zeros(0, np.int64)
    mask = np.ones(rows.shape[0], bool)
    for name, col_filters in per_col.items():
        cc = by_name[name]
        _, oi = ppd.read_page_index(path, cc)
        vals, valid = read_column_chunk_pruned(
            path, cc, oi.page_locations, intervals, rg.num_rows,
            nullable=nullable.get(name, True),
            type_length=type_len.get(name) or 0)
        for op, val in col_filters:
            try:
                mask &= _CMP[op](vals, val)
            except TypeError:
                return None
        if valid is not None:
            mask &= valid
    hit = rows[mask]
    if hit.size == 0:
        return []
    # coalesce matching rows into intervals, bridging gaps ≤ 512 rows
    # (scattered singletons would defeat the page-overlap scan; the
    # residual filter trims bridged rows exactly)
    brk = np.nonzero(np.diff(hit) > 512)[0]
    starts = np.concatenate([[0], brk + 1])
    stops = np.concatenate([brk, [hit.size - 1]])
    return [(int(hit[a]), int(hit[b]) + 1) for a, b in zip(starts, stops)]


def read_parquet_native(path: str, columns: Optional[List[str]] = None,
                        filters=None, row_groups: Optional[List[int]] = None):
    """Full-file reader over the self-contained decode path.

    filters: AND-list of (col, op, val) → row-group stats + bloom-filter
    pruning and, when the file carries a page index, page-granular
    pruning (reference: predicate_pushdown.cpp, bloom_filter_reader.cu,
    experimental/page_index_filter.cu; pruned groups/pages are never
    read from disk).  row_groups: explicit subset (chunked passes).
    """
    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index
    import jax.numpy as jnp

    md = thrift.read_file_metadata(path)
    if any(s.num_children for s in md.schema[1:]):
        # nested schema: list/struct assembly via rep/def levels
        # (io/parquet_nested.py — dremel.cu / page_data.cu roles)
        return _read_parquet_nested(path, md, columns, filters, row_groups)
    # leaf schema (flat files only in this tier)
    leaves = [s for s in md.schema[1:] if s.num_children == 0]
    names = [s.name for s in leaves]
    nullable = {s.name: s.repetition_type == 1 for s in leaves}
    conv = {s.name: s.converted_type for s in leaves}
    logical = {s.name: s.logical for s in leaves}
    type_len = {s.name: s.type_length for s in leaves}
    dec_scale = {s.name: s.scale for s in leaves}
    phys_of = {s.name: s.type for s in leaves}
    wanted = columns or names
    per_col: Dict[str, List] = {n: [] for n in wanted}
    per_val: Dict[str, List] = {n: [] for n in wanted}
    groups = md.row_groups
    if row_groups is not None:
        groups = [groups[i] for i in row_groups]
    if filters:
        from cudf_tpu.io import parquet_pushdown as ppd

        groups = [rg for rg in groups
                  if _rg_passes_filters(rg, filters, None)
                  and ppd.rg_bloom_passes(path, rg, filters)]
    for rg in groups:
        intervals = (_page_intervals_for_rg(path, rg, filters, wanted)
                     if filters else None)
        if intervals == []:
            continue                     # page stats prove no row matches
        if intervals is not None:
            from cudf_tpu.utils.config import get_option

            if get_option("io.parquet.hybrid_scan"):
                exact = _hybrid_exact_intervals(path, rg, filters,
                                                intervals, type_len,
                                                nullable)
                if exact == []:
                    continue             # predicate proves no row matches
                if exact is not None:
                    intervals = exact
        for cc in rg.columns:
            name = cc.path[-1] if cc.path else ""
            if name not in per_col:
                continue
            if intervals is not None:
                from cudf_tpu.io import parquet_pushdown as ppd

                _, oi = ppd.read_page_index(path, cc)
                vals, valid = read_column_chunk_pruned(
                    path, cc, oi.page_locations, intervals, rg.num_rows,
                    nullable=nullable.get(name, True),
                    type_length=type_len.get(name) or 0)
                kept = sum(b - a for a, b in intervals)
            else:
                vals, valid = read_column_chunk(
                    path, cc, nullable=nullable.get(name, True),
                    type_length=type_len.get(name) or 0)
                kept = rg.num_rows
            per_col[name].append(vals)
            per_val[name].append(valid if valid is not None else
                                 np.ones(kept, bool))
    cols = {}
    for n in wanted:
        parts = per_col[n]
        valids = np.concatenate(per_val[n])
        mask = None if valids.all() else valids
        if parts and isinstance(parts[0], tuple):  # strings
            offs_parts, chars_parts = zip(*parts)
            offs = [np.asarray(offs_parts[0])]
            shift = offs_parts[0][-1]
            for o in offs_parts[1:]:
                offs.append(np.asarray(o[1:]) + shift)
                shift += o[-1]
            offsets = np.concatenate(offs)
            chars = np.concatenate(chars_parts)
            col = Column(dt.STRING, offsets.shape[0] - 1,
                         data=jnp.asarray(chars), offsets=jnp.asarray(offsets),
                         validity=jnp.asarray(mask) if mask is not None else None)
            if conv.get(n) == 0:  # UTF8
                pass
            cols[n] = col
        else:
            if parts and any(not isinstance(p, np.ndarray) for p in parts):
                dev = [p if not isinstance(p, np.ndarray)
                       else jnp.asarray(p) for p in parts]
                data_dev = dev[0] if len(dev) == 1 else jnp.concatenate(dev)
                col_d = _device_logical_column(
                    data_dev, mask, logical.get(n), conv.get(n))
                if col_d is not None:
                    cols[n] = col_d
                    continue
                parts = [np.asarray(p) for p in parts]
            data = np.concatenate(parts) if parts else np.zeros(0)
            lg = logical.get(n)
            cv = conv.get(n)
            # logical/converted type fidelity (the reference applies the
            # same mapping in reader_impl.cpp finalize): TIMESTAMP unit,
            # DATE days, INTEGER bit width/sign
            if (lg and lg[0] == "timestamp") or cv in (9, 10):
                unit = lg[1] if lg else ("ms" if cv == 9 else "us")
                data = data.astype(np.int64).view(f"M8[{unit}]")
            elif (lg and lg[0] == "date") or cv == 6:
                mask_j = None
                if mask is not None:
                    import jax.numpy as _jnp

                    mask_j = _jnp.asarray(mask)
                import jax.numpy as _jnp

                cols[n] = Column(dt.DType(dt.TypeId.TIMESTAMP_DAYS),
                                 data.shape[0],
                                 data=_jnp.asarray(data.astype(np.int32)),
                                 validity=mask_j)
                continue
            elif (lg and lg[0] == "int") or cv in range(11, 19):
                if lg:
                    bits, signed = lg[1], lg[2]
                else:
                    signed = cv >= 15
                    bits = 8 << ((cv - 11) & 3)
                data = data.astype(np.dtype(f"{'i' if signed else 'u'}{bits // 8}"))
            if phys_of.get(n) == 7 and (conv.get(n) == 5 or
                                        (lg and lg[0] == "decimal")):
                # FLBA DECIMAL: unscaled int64 rep, our scale = -parquet
                # scale (fixed_point.hpp:37 convention)
                import jax.numpy as _jnp

                if lg and lg[0] == "decimal" and not dec_scale.get(n):
                    dec_scale[n] = lg[1]
                col = Column(dt.decimal_dtype(-dec_scale.get(n, 0)),
                             data.shape[0], data=_jnp.asarray(data),
                             validity=_jnp.asarray(mask) if mask is not None else None)
                cols[n] = col
                continue
            cols[n] = Column.from_numpy(data, mask=mask)
    t = Table(cols)
    return DataFrame._from(t, default_index(t.num_rows))


def read_parquet_native_chunked(path: str, columns: Optional[List[str]] = None,
                                memory_budget: int = 1 << 30,
                                filters=None):
    """Generator of DataFrames: row groups batched into passes whose
    TOTAL uncompressed size fits ``memory_budget`` (the pass/subpass
    memory governance of reader_impl_chunking.cu, row-group granular)."""
    md = thrift.read_file_metadata(path)
    sizes = [sum(cc.total_uncompressed_size for cc in rg.columns)
             for rg in md.row_groups]
    batch: List[int] = []
    used = 0
    for i, sz in enumerate(sizes):
        if batch and used + sz > memory_budget:
            yield read_parquet_native(path, columns, filters=filters,
                                      row_groups=batch)
            batch, used = [], 0
        batch.append(i)
        used += sz
    if batch:
        yield read_parquet_native(path, columns, filters=filters,
                                  row_groups=batch)


def _device_logical_column(data, mask, lg, cv):
    """Device-resident column assembly for the common logical types
    (None = shape needs the host path; reader_impl.cpp finalize role)."""
    from cudf_tpu.core.column import Column

    validity = jnp.asarray(mask) if mask is not None else None
    if (lg and lg[0] == "timestamp") or cv in (9, 10):
        unit = lg[1] if lg else ("ms" if cv == 9 else "us")
        return Column(dt.dtype(f"datetime64[{unit}]"), data.shape[0],
                      data=data.astype(jnp.int64), validity=validity)
    if (lg and lg[0] == "date") or cv == 6:
        return Column(dt.DType(dt.TypeId.TIMESTAMP_DAYS), data.shape[0],
                      data=data.astype(jnp.int32), validity=validity)
    if lg or cv is not None:
        return None
    return Column(dt.dtype(np.dtype(data.dtype)), data.shape[0],
                  data=data, validity=validity)


def _read_parquet_nested(path, md, columns, filters, row_groups):
    """Mixed flat/list/struct schema reader (see io/parquet_nested.py)."""
    import jax.numpy as jnp

    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index
    from cudf_tpu.io import parquet_nested as pn
    from cudf_tpu.ops import copying

    fields = pn.schema_tree(md.schema)
    wanted = columns or [f.name for f in fields]
    groups = md.row_groups
    if row_groups is not None:
        groups = [groups[i] for i in row_groups]
    if filters:
        groups = [rg for rg in groups if _rg_passes_filters(rg, filters, None)]
    # index column chunks by dotted path per row group
    cols: Dict[str, List[Column]] = {n: [] for n in wanted}
    for rg in groups:
        by_path = {tuple(cc.path): cc for cc in rg.columns}
        for f in fields:
            if f.name not in cols:
                continue
            streams = {}
            for leaf in f.leaves():
                cc = by_path[leaf.path]
                streams[leaf.path] = pn.read_chunk_levels(path, cc, leaf)
            cols[f.name].append(pn.assemble_node(f, streams))
    out = {}
    for n in wanted:
        parts = cols[n]
        out[n] = parts[0] if len(parts) == 1 else copying.concatenate(parts)
    t = Table(out)
    return DataFrame._from(t, default_index(t.num_rows))
