"""Device CSV tokenizer: quote-state FST + field-offset extraction.

TPU-native equivalent of the block-parallel CSV parse
(reference: cpp/src/io/csv/csv_gpu.cu — per-block row detection +
typed field parse; io/fst/agent_dfa.cuh — the GPU FST framework).

The CUDA design simulates a DFA per block with lookahead merging; on the
TPU the same structure is THREE data-parallel passes over the byte
buffer, each a one-liner on the VPU:

  1. quote state  — in_quote[b] = parity of quote count before b
                    (escaped "" flips twice → structure-neutral, the
                    same trick the simdjson/FST literature uses);
  2. structure    — record breaks = unquoted \\n; field breaks =
                    unquoted delimiter or record break;
  3. extraction   — the k-th field of each row as (start, end) byte
                    ranges via ONE cumsum + searchsorted, then a string
                    Column per requested column (chars gathered straight
                    from the file buffer in HBM).

Typed parse reuses the device string converters (ops/strings.to_numbers:
vectorized int/float folds).  Quoted fields strip the outer quotes and
unescape "" on device (string_spans.replace_literal_device).

Fallbacks (→ io/csv.py pyarrow tier): multi-byte delimiters, comment
lines, skip_blank_lines=False, non-UTF8.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table


def _structure(buf: jnp.ndarray, delim: int, quote: int = ord('"')):
    """(field_break_mask, record_break_mask) over the byte buffer."""
    is_q = buf == quote
    inq = (jnp.cumsum(is_q.astype(jnp.int32)) - is_q.astype(jnp.int32)) & 1
    unquoted = inq == 0
    nl = (buf == ord("\n")) & unquoted
    fb = ((buf == delim) & unquoted) | nl
    return fb, nl


def tokenize(data: bytes, delim: str = ","):
    """(field_starts, field_ends, row_of_field, fields_per_row, n_rows).

    Fields are byte ranges in `data` (exclusive of separators; \\r before
    a record break is trimmed).  One device pass + small host scalars.
    """
    raw = np.frombuffer(data, np.uint8)
    if len(raw) and raw[-1:] != b"\n"[0]:
        raw = np.concatenate([raw, np.frombuffer(b"\n", np.uint8)])
    buf = jnp.asarray(raw)
    nb = buf.shape[0]
    fb, nl = _structure(buf, ord(delim))
    from cudf_tpu.ops.stream_compaction import filter_indices

    break_pos = filter_indices(fb)                  # all field breaks
    is_rec = jnp.take(nl, break_pos)
    n_fields = break_pos.shape[0]
    # field start = previous break + 1 (or 0)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), break_pos[:-1] + 1])
    ends = break_pos
    # trim \r before record breaks
    prev = jnp.take(buf, jnp.clip(ends - 1, 0, nb - 1))
    ends = jnp.where(is_rec & (prev == 13) & (ends > starts), ends - 1, ends)
    row = jnp.cumsum(is_rec.astype(jnp.int64)) - is_rec.astype(jnp.int64)
    n_rows = int(is_rec.sum())
    return buf, starts, ends, row, n_fields, n_rows


def _field_column(buf, starts, ends, sel) -> Column:
    """STRING column from selected field ranges (indices into fields)."""
    from cudf_tpu.ops._utils import segment_expand

    s = jnp.take(starts, sel)
    e = jnp.take(ends, sel)
    lens = e - s
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lens)])
    total = int(offsets[-1])
    n = sel.shape[0]
    if total == 0:
        return Column(dt.STRING, n, data=jnp.zeros((0,), jnp.uint8),
                      offsets=offsets)
    rowm = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, rowm)
    src = jnp.take(s, rowm) + within
    chars = jnp.take(buf, jnp.clip(src, 0, buf.shape[0] - 1))
    return Column(dt.STRING, n, data=chars.astype(jnp.uint8), offsets=offsets)


def _unquote(col: Column) -> Column:
    """Strip outer quotes and unescape doubled quotes, device-side."""
    if col.data.shape[0] == 0:
        return col
    first = jnp.take(col.data, jnp.clip(col.offsets[:-1], 0,
                                        col.data.shape[0] - 1))
    lens = col.offsets[1:] - col.offsets[:-1]
    quoted = (lens >= 2) & (first == ord('"'))
    if not bool(jnp.any(quoted)):
        return col
    from cudf_tpu.ops import copying
    from cudf_tpu.ops.string_spans import replace_literal_device

    # slice outer quotes off quoted rows via offset arithmetic: narrow
    # the row's range by one byte on each side
    new_offs_lo = jnp.where(quoted, 1, 0)
    new_offs_hi = jnp.where(quoted, 1, 0)
    # rebuild with per-row trimming
    from cudf_tpu.ops._utils import segment_expand

    new_lens = lens - new_offs_lo - new_offs_hi
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(new_lens)])
    total = int(offsets[-1])
    rowm = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, rowm)
    src = jnp.take(col.offsets[:-1] + new_offs_lo, rowm) + within
    chars = jnp.take(col.data, jnp.clip(src, 0, col.data.shape[0] - 1))
    out = Column(dt.STRING, col.length, data=chars.astype(jnp.uint8),
                 offsets=offsets)
    unescaped = replace_literal_device(out, '""', '"')
    return unescaped if unescaped is not None else out


_INFER_ROWS = 64


_BOOL_SPELLINGS = ("True", "TRUE", "true", "False", "FALSE", "false")


def _infer_dtype(samples: List[str]):
    seen_float = False
    seen_any = False
    all_bool = True
    for s in samples:
        if s == "":
            continue
        seen_any = True
        if s not in _BOOL_SPELLINGS:
            all_bool = False
        try:
            int(s)
            continue
        except ValueError:
            pass
        try:
            float(s)
            seen_float = True
            continue
        except ValueError:
            if not all_bool:
                return dt.STRING
    if not seen_any:
        return dt.STRING
    if all_bool:
        return dt.BOOL8
    return dt.FLOAT64 if seen_float else dt.INT64


def _parse_bools_device(col: Column) -> Column:
    from cudf_tpu.ops import strings as S

    lens = col.offsets[1:] - col.offsets[:-1]
    eq = {}
    for sp in _BOOL_SPELLINGS:
        eq[sp] = S.startswith(col, sp).data & (lens == len(sp))
    val = eq["True"] | eq["TRUE"] | eq["true"]
    return Column(dt.BOOL8, col.length, data=val)


def read_csv_device(path_or_data, delimiter: str = ",", header: bool = True,
                    usecols: Optional[List[str]] = None,
                    dtypes: Optional[Dict[str, object]] = None):
    """Parse a CSV into a DataFrame with the device tokenizer.

    The file's bytes move host→HBM ONCE; structure detection, field
    extraction, unquoting, and int/float parses all run on device.
    """
    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index
    from cudf_tpu.ops import strings as S

    if isinstance(path_or_data, (bytes, bytearray)):
        data = bytes(path_or_data)
    else:
        with open(path_or_data, "rb") as f:
            data = f.read()
    buf, starts, ends, row, n_fields, n_rows = tokenize(data, delimiter)
    if n_rows == 0:
        return DataFrame._from(Table({}), default_index(0))
    # column count from row 0 (ragged rows → fallback caller)
    fpr = int(jnp.sum(row == 0))
    if fpr * n_rows != n_fields:
        raise ValueError("ragged rows — host tier")
    if header:
        hdr_sel = jnp.arange(fpr, dtype=jnp.int64)
        hdr_col = _field_column(buf, starts, ends, hdr_sel)
        names = _unquote(hdr_col).to_pylist()
        first_data_row = 1
    else:
        names = [f"f{i}" for i in range(fpr)]
        first_data_row = 0
    ndata = n_rows - first_data_row
    cols: Dict[str, Column] = {}
    want = usecols or names
    for j, name in enumerate(names):
        if name not in want:
            continue
        sel = (jnp.arange(ndata, dtype=jnp.int64) + first_data_row) * fpr + j
        sel = jnp.clip(sel, 0, n_fields - 1)
        col = _unquote(_field_column(buf, starts, ends, sel))
        target = (dtypes or {}).get(name)
        if target is None:
            head = col.to_pylist()[:_INFER_ROWS]
            target = _infer_dtype([h for h in head if h is not None])
        else:
            target = dt.dtype(target)
        if target == dt.BOOL8:
            cols[name] = _parse_bools_device(col)
        elif target != dt.STRING and target.is_numeric:
            parsed = S.to_numbers(col, target)
            cols[name] = parsed
        else:
            # empty unquoted fields are nulls (pandas semantics)
            lens = col.offsets[1:] - col.offsets[:-1]
            empty = np.asarray(lens) == 0
            if empty.any():
                col = col.with_validity(jnp.asarray(~empty))
            cols[name] = col
    t = Table(cols)
    return DataFrame._from(t, default_index(t.num_rows))
