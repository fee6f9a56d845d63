"""Device JSON-lines tokenizer: escape-aware FST + columnar extraction.

TPU-native equivalent of the GPU JSON stack for the dominant NDJSON
shape — one flat object per line (reference: cpp/src/io/json/ — FST
tokenization agent_dfa.cuh, token-tree → columns json_tree.cu /
json_column.cu; nested objects/arrays fall back to the host tier).

Passes (all data-parallel over the byte buffer, simdjson-style):
  1. escape mask   — a byte is escaped iff the backslash run ending
                     just before it has odd length (run-start cummax +
                     position parity; no sequential scan);
  2. string mask   — parity of unescaped quotes (exclusive prefix);
  3. structure     — unquoted { } : , and record-break newlines; depth
                     via cumsum(open) - cumsum(close), fields at depth 1;
  4. extraction    — per field: key span (the string before ':'), value
                     span (':'+1 .. next ',' or '}'), trimmed; key
                     strings dictionary-encode to column ids; values
                     parse per inferred column dtype on device.

Missing keys yield nulls (pandas read_json(lines=True) semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table


def _escape_mask(buf: jnp.ndarray) -> jnp.ndarray:
    """bool[b]: byte b is escaped by a preceding backslash run."""
    n = buf.shape[0]
    bs = buf == ord("\\")
    prev_bs = jnp.concatenate([jnp.zeros((1,), jnp.bool_), bs[:-1]])
    run_start = bs & ~prev_bs
    pos = jnp.arange(n, dtype=jnp.int64)
    rsp = jax.lax.cummax(jnp.where(run_start, pos, jnp.int64(-1)))
    # length of the backslash run ENDING at b-1 (0 if b-1 not backslash)
    run_len_before = jnp.where(prev_bs, pos - rsp, 0)
    return (run_len_before & 1) == 1


def read_json_records_device(path_or_data,
                             usecols: Optional[List[str]] = None):
    """Parse a top-level JSON array of flat objects ([{...}, ...]) into a
    DataFrame — the 'records' orient, sharing the FST passes with the
    lines tokenizer (reference: read_json.cu handles both shapes through
    the same token pipeline)."""
    return read_json_lines_device(path_or_data, usecols, records=True)


def read_json_lines_device(path_or_data, usecols: Optional[List[str]] = None,
                           records: bool = False):
    """Parse NDJSON (flat objects) into a DataFrame, device-resident."""
    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index
    from cudf_tpu.io.csv_device import _field_column, _infer_dtype, \
        _parse_bools_device, _BOOL_SPELLINGS
    from cudf_tpu.ops import strings as S
    from cudf_tpu.ops.stream_compaction import filter_indices

    if isinstance(path_or_data, (bytes, bytearray)):
        data = bytes(path_or_data)
    else:
        with open(path_or_data, "rb") as f:
            data = f.read()
    raw = np.frombuffer(data, np.uint8)
    if records:
        stripped = data.strip()
        if not (stripped.startswith(b"[") and stripped.endswith(b"]")):
            raise ValueError("records orient needs a top-level array")
        if stripped == b"[]":
            from cudf_tpu.frame.dataframe import DataFrame as _DF

            return _DF._from(Table({}), default_index(0))
    if len(raw) == 0:
        return DataFrame._from(Table({}), default_index(0))
    if raw[-1:] != b"\n"[0]:
        raw = np.concatenate([raw, np.frombuffer(b"\n", np.uint8)])
    buf = jnp.asarray(raw)
    nb = buf.shape[0]
    escaped = _escape_mask(buf)
    q = (buf == ord('"')) & ~escaped
    inq_excl = (jnp.cumsum(q.astype(jnp.int32)) - q.astype(jnp.int32)) & 1
    outside = inq_excl == 0                      # quote bytes count outside
    is_open = (buf == ord("{")) & outside
    is_close = (buf == ord("}")) & outside
    is_arr = (buf == ord("[")) & outside
    is_arr_c = (buf == ord("]")) & outside
    depth = jnp.cumsum(is_open.astype(jnp.int32)) - \
        jnp.cumsum(is_close.astype(jnp.int32))
    if records:
        arr_depth = jnp.cumsum(is_arr.astype(jnp.int32)) - \
            jnp.cumsum(is_arr_c.astype(jnp.int32))
        if int(jnp.max(depth)) > 1 or int(jnp.max(arr_depth)) > 1 or \
                int(jnp.sum(is_arr)) != 1:
            raise ValueError("nested objects/arrays — host tier")
        # record break: the '}' closing each object (depth 1 → 0)
        nl = is_close
        fdepth = depth == 1
    else:
        if int(jnp.max(depth)) > 1 or bool(jnp.any(is_arr)):
            raise ValueError("nested objects/arrays — host tier")
        nl = (buf == ord("\n")) & outside
        fdepth = depth == 1
    colon = (buf == ord(":")) & outside & fdepth
    comma = (buf == ord(",")) & outside & fdepth

    pos = jnp.arange(nb, dtype=jnp.int64)
    colon_pos = filter_indices(colon)
    n_fields = int(colon_pos.shape[0])
    if n_fields == 0:
        n_rows = int(jnp.sum(nl))
        return DataFrame._from(Table({}), default_index(n_rows))
    # row of each field (records: objects closed BEFORE this field)
    row_cum = jnp.cumsum(nl.astype(jnp.int64))
    row_of = jnp.take(row_cum - nl.astype(jnp.int64), colon_pos) \
        if records else jnp.take(row_cum, colon_pos)
    # key span: the string immediately before the colon — last unescaped
    # quote pair before it.  qpos = positions of unescaped quotes.
    qpos = filter_indices(q)
    kq_end = jnp.searchsorted(qpos, colon_pos, side="left") - 1
    key_end = jnp.take(qpos, jnp.clip(kq_end, 0, None))        # closing "
    key_start = jnp.take(qpos, jnp.clip(kq_end - 1, 0, None)) + 1
    # value span: colon+1 .. next (comma | close) at depth 1 on this line
    vend_mask = comma | is_close
    vend_cum = jnp.cumsum(vend_mask.astype(jnp.int64))
    vend_pos = filter_indices(vend_mask)
    nxt = jnp.searchsorted(vend_pos, colon_pos, side="right")
    val_end = jnp.take(vend_pos, jnp.clip(nxt, 0, vend_pos.shape[0] - 1))
    val_start = colon_pos + 1
    # trim whitespace on both ends of the value
    ws = (buf == 32) | (buf == 9) | (buf == 13)
    ws_cum = jnp.cumsum(ws.astype(jnp.int64))

    def count_ws(a, b):
        return jnp.take(ws_cum, jnp.clip(b - 1, 0, nb - 1)) - \
            jnp.take(ws_cum, jnp.clip(a - 1, 0, nb - 1))

    # leading ws: advance start while ws — bounded loop (values small)
    for _ in range(4):
        ch = jnp.take(buf, jnp.clip(val_start, 0, nb - 1))
        is_ws = (ch == 32) | (ch == 9)
        val_start = jnp.where(is_ws & (val_start < val_end),
                              val_start + 1, val_start)
    for _ in range(4):
        ch = jnp.take(buf, jnp.clip(val_end - 1, 0, nb - 1))
        is_ws = (ch == 32) | (ch == 9) | (ch == 13)
        val_end = jnp.where(is_ws & (val_end > val_start),
                            val_end - 1, val_end)
    # literal null values → empty spans (to_numbers/'' = null; a string
    # "null" is quoted and unaffected)
    nul = (val_end - val_start) == 4
    for k, c in enumerate(b"null"):
        nul &= jnp.take(buf, jnp.clip(val_start + k, 0, nb - 1)) == c
    val_end = jnp.where(nul, val_start, val_end)

    # key strings → column ids (dictionary encode)
    key_col = _substr_col(buf, key_start, key_end - key_start)
    from cudf_tpu.ops.dictionary import encode as dict_encode

    kd = dict_encode(key_col)
    names = kd.children[0].to_pylist()
    codes = kd.data.astype(jnp.int64)
    n_rows = int(jnp.sum(nl))
    n_cols = len(names)
    # pandas orders columns by FIRST occurrence, not sorted key order
    first_pos = np.full(n_cols, 1 << 60, np.int64)
    codes_np = np.asarray(codes)
    for i, c in enumerate(codes_np):
        if first_pos[c] > i:
            first_pos[c] = i
    col_order = np.argsort(first_pos, kind="stable")

    # per (row, col) field index table: scatter field idx by row*n_cols+code
    slot = row_of * n_cols + codes
    field_of_slot = jnp.full((n_rows * n_cols,), -1, jnp.int64)
    field_of_slot = field_of_slot.at[slot].set(
        jnp.arange(n_fields, dtype=jnp.int64))
    cols: Dict[str, Column] = {}
    want = usecols or names
    for j in (int(x) for x in col_order):
        name = names[j]
        if name not in want:
            continue
        fidx = field_of_slot[j::n_cols]
        present = fidx >= 0
        fsafe = jnp.clip(fidx, 0, n_fields - 1)
        starts_j = jnp.take(val_start, fsafe)
        lens_j = jnp.where(present, jnp.take(val_end, fsafe) - starts_j, 0)
        raw_col = _substr_col(buf, starts_j, lens_j)
        vals = raw_col.to_pylist()
        sample = [v for v, p in zip(vals[:64], np.asarray(present)[:64]) if p]
        if sample and all(s == "" or s.startswith('"') for s in sample):
            # string column: strip quotes, un-escape, null for 'null'
            is_str = jnp.asarray(
                np.array([v.startswith('"') for v in vals], bool))
            stripped = _strip_quotes(raw_col, is_str)
            stripped = _json_unescape(stripped)
            validity = present & is_str
            cols[name] = stripped.with_validity(
                None if bool(jnp.all(validity)) else validity)
        elif sample and all(s in ("",) + _BOOL_SPELLINGS
                            or s in ("true", "false") for s in sample):
            bval = jnp.asarray(np.array([v == "true" for v in vals], bool))
            validity = present & jnp.asarray(
                np.array([v in ("true", "false") for v in vals], bool))
            cols[name] = Column(
                dt.BOOL8, n_rows, data=bval,
                validity=None if bool(jnp.all(validity)) else validity)
        else:
            target = _infer_dtype([s for s in sample if s != ""])
            if target == dt.STRING:
                validity = present
                cols[name] = raw_col.with_validity(
                    None if bool(jnp.all(validity)) else validity)
            else:
                parsed = S.to_numbers(raw_col, target)
                base_v = parsed.validity
                validity = present if base_v is None else (present & base_v)
                cols[name] = parsed.with_validity(
                    None if bool(jnp.all(validity)) else validity)
    t = Table(cols)
    return DataFrame._from(t, default_index(n_rows))


def _substr_col(buf, starts, lens) -> Column:
    from cudf_tpu.ops._utils import segment_expand

    n = starts.shape[0]
    lens = jnp.maximum(lens, 0)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lens)])
    total = int(offsets[-1])
    if total == 0:
        return Column(dt.STRING, n, data=jnp.zeros((0,), jnp.uint8),
                      offsets=offsets)
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    src = jnp.take(starts, row) + within
    chars = jnp.take(buf, jnp.clip(src, 0, buf.shape[0] - 1))
    return Column(dt.STRING, n, data=chars.astype(jnp.uint8), offsets=offsets)


def _strip_quotes(col: Column, is_str) -> Column:
    from cudf_tpu.ops._utils import segment_expand

    lens = col.offsets[1:] - col.offsets[:-1]
    trim = jnp.where(is_str & (lens >= 2), 1, 0)
    new_lens = lens - 2 * trim
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(new_lens)])
    total = int(offsets[-1])
    n = col.length
    if total == 0:
        return Column(dt.STRING, n, data=jnp.zeros((0,), jnp.uint8),
                      offsets=offsets)
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    src = jnp.take(col.offsets[:-1] + trim, row) + within
    chars = jnp.take(col.data, jnp.clip(src, 0, col.data.shape[0] - 1))
    return Column(dt.STRING, n, data=chars.astype(jnp.uint8), offsets=offsets)


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "\\": "\\", "/": "/"}


def _json_unescape(col: Column) -> Column:
    """Resolve backslash escapes; \\uXXXX routes through the host tier."""
    if col.data.shape[0] == 0 or not bool(jnp.any(col.data == ord("\\"))):
        return col
    vals = col.to_pylist()

    def unesc(s):
        out = []
        i = 0
        while i < len(s):
            c = s[i]
            if c == "\\" and i + 1 < len(s):
                nxt = s[i + 1]
                if nxt == "u" and i + 6 <= len(s):
                    out.append(chr(int(s[i + 2:i + 6], 16)))
                    i += 6
                    continue
                out.append(_ESCAPES.get(nxt, nxt))
                i += 2
                continue
            out.append(c)
            i += 1
        return "".join(out)

    return Column.from_strings([None if v is None else unesc(v)
                                for v in vals])
