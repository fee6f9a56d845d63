"""String operations over (offsets, chars) columns.

TPU-native equivalent of libcudf strings (reference: cpp/src/strings/ —
case.cu, slice.cu, find.cu, split/, convert/, combine/, pad.cu, 20k LoC).

Tiering:
- Device (jnp/VPU): utf8-aware length, case-mapping (ASCII fast path),
  char-indexed slicing, startswith/endswith/contains/find for literal
  needles, padding, int parse/format — all expressed as flat vectorized
  passes over the chars buffer using ``segment_expand`` row mapping.
- Host fallback: regex and locale-dependent ops round-trip through CPython
  (the same resilience pattern as cudf.pandas's GPU→CPU fallback,
  fast_slow_proxy.py).  A compiled-NFA device regex engine (regcomp.cpp →
  regex.inl equivalent) is planned.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import bitmask as bm
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops._utils import materialize_validity, segment_expand


# ----------------------------------------------------------------------
# infrastructure
# ----------------------------------------------------------------------

def _char_row_map(col: Column):
    """(row id per byte, byte position array) for the whole chars buffer."""
    total = int(col.offsets[-1])
    row = segment_expand(col.offsets, total)
    return row, total


def _rebuild(col: Column, keep_mask: jnp.ndarray, new_bytes: jnp.ndarray,
             row: jnp.ndarray) -> Column:
    """Compact per-row kept bytes into a new string column."""
    from cudf_tpu.ops.stream_compaction import filter_indices

    n = col.length
    lengths = jax.ops.segment_sum(keep_mask.astype(jnp.int64), row, num_segments=n)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lengths)])
    kept = filter_indices(keep_mask)
    chars = jnp.take(new_bytes, kept)
    return Column(dt.STRING, n, data=chars.astype(jnp.uint8), offsets=offsets,
                  validity=col.validity)


def _host_map(col: Column, fn: Callable, dtype=None) -> Column:
    """Host fallback: apply a python function per string."""
    vals = col.to_pylist()
    out = [None if v is None else fn(v) for v in vals]
    return Column.from_sequence(out, dtype=dtype)


def _has_non_ascii(col: Column) -> bool:
    if col.data.shape[0] == 0:
        return False
    return bool(jnp.any(col.data >= 128))


def _empty_like(col: Column) -> Column:
    return Column(dt.STRING, col.length,
                  data=jnp.zeros((0,), jnp.uint8),
                  offsets=jnp.zeros((col.length + 1,), jnp.int64),
                  validity=col.validity)


# ----------------------------------------------------------------------
# attributes
# ----------------------------------------------------------------------

def length(col: Column) -> Column:
    """utf8 character count per row (count_characters, attributes.cu)."""
    n = col.length
    if col.data.shape[0] == 0:
        return Column(dt.INT64, n, data=jnp.zeros((n,), jnp.int64), validity=col.validity)
    row, total = _char_row_map(col)
    is_start = (col.data & jnp.uint8(0xC0)) != jnp.uint8(0x80)
    counts = jax.ops.segment_sum(is_start.astype(jnp.int64), row, num_segments=n)
    return Column(dt.INT64, n, data=counts, validity=col.validity)


def byte_count(col: Column) -> Column:
    lens = col.offsets[1:] - col.offsets[:-1]
    return Column(dt.INT64, col.length, data=lens, validity=col.validity)


# ----------------------------------------------------------------------
# case mapping
# ----------------------------------------------------------------------


def _unicode_case(col: Column, kind: str) -> Optional[Column]:
    """Device Unicode case tier (unicode_case.py); None -> host."""
    from cudf_tpu.ops import unicode_case as uc

    return uc.case_map(col, kind)


def lower(col: Column) -> Column:
    if _has_non_ascii(col):
        out = _unicode_case(col, "lower")
        if out is not None:
            return out
        return _host_map(col, str.lower, dt.STRING).with_validity(col.validity)
    b = col.data
    out = jnp.where((b >= 65) & (b <= 90), b + 32, b)
    return Column(dt.STRING, col.length, data=out, offsets=col.offsets, validity=col.validity)


def upper(col: Column) -> Column:
    if _has_non_ascii(col):
        out = _unicode_case(col, "upper")
        if out is not None:
            return out
        return _host_map(col, str.upper, dt.STRING).with_validity(col.validity)
    b = col.data
    out = jnp.where((b >= 97) & (b <= 122), b - 32, b)
    return Column(dt.STRING, col.length, data=out, offsets=col.offsets, validity=col.validity)


def swapcase(col: Column) -> Column:
    if _has_non_ascii(col):
        out = _unicode_case(col, "swapcase")
        if out is not None:
            return out
        return _host_map(col, str.swapcase, dt.STRING).with_validity(col.validity)
    b = col.data
    out = jnp.where((b >= 65) & (b <= 90), b + 32,
                    jnp.where((b >= 97) & (b <= 122), b - 32, b))
    return Column(dt.STRING, col.length, data=out, offsets=col.offsets, validity=col.validity)


def capitalize(col: Column) -> Column:
    if _has_non_ascii(col):
        out = _unicode_case(col, "capitalize")
        if out is not None:
            return out
        return _host_map(col, str.capitalize, dt.STRING).with_validity(col.validity)
    n = col.length
    if col.data.shape[0] == 0:
        return col
    row, total = _char_row_map(col)
    pos_in_row = jnp.arange(total, dtype=jnp.int64) - jnp.take(col.offsets, row)
    b = col.data
    up = jnp.where((b >= 97) & (b <= 122), b - 32, b)
    lo = jnp.where((b >= 65) & (b <= 90), b + 32, b)
    out = jnp.where(pos_in_row == 0, up, lo)
    return Column(dt.STRING, n, data=out, offsets=col.offsets, validity=col.validity)


def title(col: Column) -> Column:
    if col.data.shape[0]:
        out = _unicode_case(col, "title")
        if out is not None:
            return out
    return _host_map(col, str.title, dt.STRING).with_validity(col.validity)


# ----------------------------------------------------------------------
# predicates on characters
# ----------------------------------------------------------------------

def _char_class_all(col: Column, pred) -> Column:
    """all(pred(byte)) per row, False for empty strings (pandas semantics)."""
    n = col.length
    if col.data.shape[0] == 0:
        return Column(dt.BOOL8, n, data=jnp.zeros((n,), jnp.bool_), validity=col.validity)
    row, total = _char_row_map(col)
    ok = pred(col.data)
    allok = jax.ops.segment_min(ok.astype(jnp.int8), row, num_segments=n) > 0
    nonempty = (col.offsets[1:] - col.offsets[:-1]) > 0
    return Column(dt.BOOL8, n, data=allok & nonempty, validity=col.validity)


def isdigit(col: Column) -> Column:
    if _has_non_ascii(col):
        from cudf_tpu.ops.unicode_case import char_class_all

        out = char_class_all(col, "isdigit")
        if out is not None:
            return out
        return _host_map(col, str.isdigit, dt.BOOL8).with_validity(col.validity)
    return _char_class_all(col, lambda b: (b >= 48) & (b <= 57))


def isdecimal(col: Column) -> Column:
    if _has_non_ascii(col):
        from cudf_tpu.ops.unicode_case import char_class_all

        out = char_class_all(col, "isdecimal")
        if out is not None:
            return out
        return _host_map(col, str.isdecimal, dt.BOOL8).with_validity(col.validity)
    return _char_class_all(col, lambda b: (b >= 48) & (b <= 57))


def isnumeric(col: Column) -> Column:
    if _has_non_ascii(col):
        from cudf_tpu.ops.unicode_case import char_class_all

        out = char_class_all(col, "isnumeric")
        if out is not None:
            return out
        return _host_map(col, str.isnumeric, dt.BOOL8).with_validity(col.validity)
    return isdigit(col)


def isalpha(col: Column) -> Column:
    if _has_non_ascii(col):
        from cudf_tpu.ops.unicode_case import char_class_all

        out = char_class_all(col, "isalpha")
        if out is not None:
            return out
        return _host_map(col, str.isalpha, dt.BOOL8).with_validity(col.validity)
    return _char_class_all(col, lambda b: ((b >= 65) & (b <= 90)) | ((b >= 97) & (b <= 122)))


def isalnum(col: Column) -> Column:
    if _has_non_ascii(col):
        from cudf_tpu.ops.unicode_case import char_class_all

        out = char_class_all(col, "isalnum")
        if out is not None:
            return out
        return _host_map(col, str.isalnum, dt.BOOL8).with_validity(col.validity)
    return _char_class_all(
        col, lambda b: ((b >= 48) & (b <= 57)) | ((b >= 65) & (b <= 90)) | ((b >= 97) & (b <= 122))
    )


def isspace(col: Column) -> Column:
    return _char_class_all(col, lambda b: (b == 32) | ((b >= 9) & (b <= 13)))


def isupper(col: Column) -> Column:
    if _has_non_ascii(col):
        from cudf_tpu.ops.unicode_case import char_class_all

        out = char_class_all(col, "isupper")
        if out is not None:
            return out
        return _host_map(col, str.isupper, dt.BOOL8).with_validity(col.validity)
    n = col.length
    if col.data.shape[0] == 0:
        return Column(dt.BOOL8, n, data=jnp.zeros((n,), jnp.bool_), validity=col.validity)
    row, _ = _char_row_map(col)
    b = col.data
    has_lower = jax.ops.segment_max(((b >= 97) & (b <= 122)).astype(jnp.int8), row, num_segments=n) > 0
    has_upper = jax.ops.segment_max(((b >= 65) & (b <= 90)).astype(jnp.int8), row, num_segments=n) > 0
    return Column(dt.BOOL8, n, data=~has_lower & has_upper, validity=col.validity)


def islower(col: Column) -> Column:
    if _has_non_ascii(col):
        from cudf_tpu.ops.unicode_case import char_class_all

        out = char_class_all(col, "islower")
        if out is not None:
            return out
        return _host_map(col, str.islower, dt.BOOL8).with_validity(col.validity)
    n = col.length
    if col.data.shape[0] == 0:
        return Column(dt.BOOL8, n, data=jnp.zeros((n,), jnp.bool_), validity=col.validity)
    row, _ = _char_row_map(col)
    b = col.data
    has_lower = jax.ops.segment_max(((b >= 97) & (b <= 122)).astype(jnp.int8), row, num_segments=n) > 0
    has_upper = jax.ops.segment_max(((b >= 65) & (b <= 90)).astype(jnp.int8), row, num_segments=n) > 0
    return Column(dt.BOOL8, n, data=has_lower & ~has_upper, validity=col.validity)


# ----------------------------------------------------------------------
# strip / slice
# ----------------------------------------------------------------------

def strip(col: Column, to_strip: Optional[str] = None, side: str = "both") -> Column:
    """cudf::strings::strip (strip.cu), fully on device."""
    n = col.length
    if col.data.shape[0] == 0:
        return col
    row, total = _char_row_map(col)
    b = col.data
    if to_strip is None:
        is_ws = (b == 32) | ((b >= 9) & (b <= 13))
    else:
        sb = np.frombuffer(to_strip.encode(), dtype=np.uint8)
        is_ws = jnp.zeros((total,), jnp.bool_)
        for c in sb:
            is_ws = is_ws | (b == int(c))
    pos = jnp.arange(total, dtype=jnp.int64)
    pos_in_row = pos - jnp.take(col.offsets, row)
    lens = col.offsets[1:] - col.offsets[:-1]
    # first/last non-strip byte per row
    big = jnp.int64(1 << 60)
    first_keep = jax.ops.segment_min(jnp.where(is_ws, big, pos_in_row), row, num_segments=n)
    last_keep = jax.ops.segment_max(jnp.where(is_ws, jnp.int64(-1), pos_in_row), row, num_segments=n)
    lo = first_keep if side in ("both", "left") else jnp.zeros((n,), jnp.int64)
    hi = last_keep if side in ("both", "right") else (lens - 1)
    keep = (pos_in_row >= jnp.take(lo, row)) & (pos_in_row <= jnp.take(hi, row))
    return _rebuild(col, keep, b, row)


def slice_strings(col: Column, start: Optional[int] = None, stop: Optional[int] = None,
                  step: Optional[int] = None) -> Column:
    """Character-indexed substring (slice.cu).  utf8-aware via char indices."""
    n = col.length
    if col.data.shape[0] == 0:
        return col
    if step not in (None, 1):
        return _host_map(col, lambda s: s[start:stop:step], dt.STRING).with_validity(col.validity)
    row, total = _char_row_map(col)
    is_start = (col.data & jnp.uint8(0xC0)) != jnp.uint8(0x80)
    # char index of each byte within its row
    cum = jnp.cumsum(is_start.astype(jnp.int64))
    row_base = jnp.take(jnp.concatenate([jnp.zeros((1,), jnp.int64), cum]),
                        jnp.take(col.offsets, row))
    char_idx = cum - 1 - row_base  # cum is inclusive → subtract 1
    nchars = jax.ops.segment_sum(is_start.astype(jnp.int64), row, num_segments=n)
    s = jnp.zeros((n,), jnp.int64) if start is None else jnp.full((n,), start, jnp.int64)
    e = nchars if stop is None else jnp.full((n,), stop, jnp.int64)
    s = jnp.where(s < 0, jnp.maximum(nchars + s, 0), s)
    e = jnp.where(e < 0, jnp.maximum(nchars + e, 0), jnp.minimum(e, nchars))
    keep = (char_idx >= jnp.take(s, row)) & (char_idx < jnp.take(e, row))
    return _rebuild(col, keep, col.data, row)


def get(col: Column, i: int) -> Column:
    return slice_strings(col, i, i + 1 if i != -1 else None)


# ----------------------------------------------------------------------
# find / contains (literal)
# ----------------------------------------------------------------------

def _literal_match_positions(col: Column, pat: str):
    """bool[total_bytes]: literal pattern match starting at this byte."""
    pb = np.frombuffer(pat.encode(), dtype=np.uint8)
    total = int(col.offsets[-1])
    if total == 0 or len(pb) == 0:
        return jnp.ones((total,), jnp.bool_) if len(pb) == 0 else jnp.zeros((total,), jnp.bool_)
    row, _ = _char_row_map(col)
    pos = jnp.arange(total, dtype=jnp.int64)
    ends = jnp.take(col.offsets, row + 1)
    match = (pos + len(pb)) <= ends
    chars = col.data
    for j, c in enumerate(pb):
        idx = jnp.clip(pos + j, 0, total - 1)
        match = match & (jnp.take(chars, idx) == int(c))
    return match


def contains_literal(col: Column, pat: str) -> Column:
    n = col.length
    if col.data.shape[0] == 0:
        data = jnp.full((n,), pat == "", jnp.bool_)
        return Column(dt.BOOL8, n, data=data, validity=col.validity)
    if pat == "":
        return Column(dt.BOOL8, n, data=jnp.ones((n,), jnp.bool_), validity=col.validity)
    match = _literal_match_positions(col, pat)
    row, _ = _char_row_map(col)
    got = jax.ops.segment_max(match.astype(jnp.int8), row, num_segments=n) > 0
    return Column(dt.BOOL8, n, data=got, validity=col.validity)


def find_literal(col: Column, pat: str, from_end: bool = False) -> Column:
    """Char position of first (last) occurrence, -1 if absent (find.cu)."""
    n = col.length
    if col.data.shape[0] == 0 or pat == "":
        data = jnp.zeros((n,), jnp.int64) if pat == "" else jnp.full((n,), -1, jnp.int64)
        return Column(dt.INT64, n, data=data, validity=col.validity)
    match = _literal_match_positions(col, pat)
    row, total = _char_row_map(col)
    is_start = (col.data & jnp.uint8(0xC0)) != jnp.uint8(0x80)
    cum = jnp.cumsum(is_start.astype(jnp.int64))
    starts_cum = jnp.take(jnp.concatenate([jnp.zeros((1,), jnp.int64), cum]),
                          jnp.take(col.offsets, row))
    char_idx = cum - 1 - starts_cum
    big = jnp.int64(1 << 60)
    if from_end:
        found = jax.ops.segment_max(jnp.where(match, char_idx, -1), row, num_segments=n)
        found = jnp.where(found < -1, -1, found)  # empty segments → identity (int min)
    else:
        found = jax.ops.segment_min(jnp.where(match, char_idx, big), row, num_segments=n)
        found = jnp.where(found >= big, -1, found)  # incl. empty-segment identity
    return Column(dt.INT64, n, data=found, validity=col.validity)


def startswith(col: Column, pat: str) -> Column:
    n = col.length
    pb = np.frombuffer(pat.encode(), dtype=np.uint8)
    lens = col.offsets[1:] - col.offsets[:-1]
    ok = lens >= len(pb)
    chars = col.data if col.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    for j, c in enumerate(pb):
        idx = jnp.clip(col.offsets[:-1] + j, 0, max(int(chars.shape[0]) - 1, 0))
        ok = ok & (jnp.take(chars, idx) == int(c))
    return Column(dt.BOOL8, n, data=ok, validity=col.validity)


def endswith(col: Column, pat: str) -> Column:
    n = col.length
    pb = np.frombuffer(pat.encode(), dtype=np.uint8)
    lens = col.offsets[1:] - col.offsets[:-1]
    ok = lens >= len(pb)
    chars = col.data if col.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    base = col.offsets[1:] - len(pb)
    for j, c in enumerate(pb):
        idx = jnp.clip(base + j, 0, max(int(chars.shape[0]) - 1, 0))
        ok = ok & (jnp.take(chars, idx) == int(c))
    return Column(dt.BOOL8, n, data=ok, validity=col.validity)


def count_literal(col: Column, pat: str) -> Column:
    n = col.length
    if col.data.shape[0] == 0 or pat == "":
        return Column(dt.INT64, n, data=jnp.zeros((n,), jnp.int64), validity=col.validity)
    match = _literal_match_positions(col, pat)
    row, _ = _char_row_map(col)
    # non-overlapping count ≈ overlapping for distinct pats; pandas counts
    # non-overlapping — use host fallback when pattern self-overlaps
    if pat[0] in pat[1:]:
        return _host_map(col, lambda s: s.count(pat), dt.INT64).with_validity(col.validity)
    cnt = jax.ops.segment_sum(match.astype(jnp.int64), row, num_segments=n)
    return Column(dt.INT64, n, data=cnt, validity=col.validity)


# ----------------------------------------------------------------------
# regex (host fallback tier)
# ----------------------------------------------------------------------

def _re_predicate(col: Column, pat: str, flags: int, mode: str) -> Optional[Column]:
    """Device DFA path (regex_engine.py); None if the pattern needs host."""
    from cudf_tpu.ops import regex_engine as rex

    try:
        hit = rex.run_predicate(col, pat, flags, mode)
    except rex.Unsupported:
        return None
    return Column(dt.BOOL8, col.length, data=hit, validity=col.validity)


def contains_re(col: Column, pat: str, flags: int = 0) -> Column:
    out = _re_predicate(col, pat, flags, "search")
    if out is not None:
        return out
    import re

    rx = re.compile(pat, flags)
    return _host_map(col, lambda s: rx.search(s) is not None, dt.BOOL8).with_validity(col.validity)


def match_re(col: Column, pat: str, flags: int = 0) -> Column:
    out = _re_predicate(col, pat, flags, "match")
    if out is not None:
        return out
    import re

    rx = re.compile(pat, flags)
    return _host_map(col, lambda s: rx.match(s) is not None, dt.BOOL8).with_validity(col.validity)


def fullmatch_re(col: Column, pat: str, flags: int = 0) -> Column:
    out = _re_predicate(col, pat, flags, "fullmatch")
    if out is not None:
        return out
    import re

    rx = re.compile(pat, flags)
    return _host_map(col, lambda s: rx.fullmatch(s) is not None, dt.BOOL8).with_validity(col.validity)


def replace_re(col: Column, pat: str, repl: str, n: int = -1, flags: int = 0) -> Column:
    from cudf_tpu.ops import string_spans as sp

    if col.data.shape[0]:
        out = sp.replace_re_device(col, pat, repl, n=n, flags=flags)
        if out is not None:
            return out.with_validity(col.validity)
    import re

    rx = re.compile(pat, flags)
    cnt = 0 if n < 0 else n
    return _host_map(col, lambda s: rx.sub(repl, s, count=cnt), dt.STRING).with_validity(col.validity)


def count_re(col: Column, pat: str, flags: int = 0) -> Column:
    from cudf_tpu.ops import string_spans as sp

    if col.data.shape[0]:
        out = sp.count_re_device(col, pat, flags=flags)
        if out is not None:
            return out.with_validity(col.validity)
    import re

    rx = re.compile(pat, flags)
    return _host_map(col, lambda s: len(rx.findall(s)), dt.INT64).with_validity(col.validity)


def extract_re(col: Column, pat: str, flags: int = 0) -> List[Column]:
    from cudf_tpu.ops import string_spans as sp

    if col.data.shape[0]:
        out = sp.extract_re_device(col, pat, flags=flags)
        if out is not None:
            return out
    import re

    rx = re.compile(pat, flags)
    ngroups = rx.groups
    vals = col.to_pylist()
    outs: List[List] = [[] for _ in range(ngroups)]
    for v in vals:
        m = rx.search(v) if v is not None else None
        for g in range(ngroups):
            outs[g].append(m.group(g + 1) if m else None)
    return [Column.from_sequence(o, dtype=dt.STRING) for o in outs]


def replace_literal(col: Column, pat: str, repl: str, n: int = -1) -> Column:
    from cudf_tpu.ops import string_spans as sp

    if col.data.shape[0] and pat:
        out = sp.replace_literal_device(col, pat, repl, n=n)
        if out is not None:
            return out.with_validity(col.validity)
    cnt = -1 if n < 0 else n
    return _host_map(col, lambda s: s.replace(pat, repl, cnt), dt.STRING).with_validity(col.validity)


def split_expand(col: Column, sep: Optional[str], maxsplit: int = -1, regex: bool = False) -> List[Column]:
    """split into N columns (split.cu 'expand' mode)."""
    from cudf_tpu.ops import string_spans as sp

    if col.data.shape[0] and sep is not None:
        cols = sp.split_columns(col, sep, maxsplit=maxsplit, regex=regex)
        if cols is not None:
            if col.validity is not None:
                cols = [c.with_validity(
                    (c.validity & col.validity) if c.validity is not None
                    else col.validity) for c in cols]
            return cols
    import re

    if regex:
        rx = re.compile(sep)
        fn = lambda s: rx.split(s, maxsplit=0 if maxsplit < 0 else maxsplit)
    elif sep is None:
        fn = lambda s: s.split(None, maxsplit)
    else:
        fn = lambda s: s.split(sep, maxsplit)
    vals = col.to_pylist()
    parts = [fn(v) if v is not None else None for v in vals]
    width = max((len(p) for p in parts if p is not None), default=0)
    cols = []
    for i in range(width):
        cols.append(Column.from_sequence(
            [None if p is None or i >= len(p) else p[i] for p in parts], dtype=dt.STRING
        ))
    return cols


def split_record(col: Column, sep: Optional[str], maxsplit: int = -1):
    """split → python lists (list column support lands with LIST dtype)."""
    vals = col.to_pylist()
    if sep is None:
        return [None if v is None else v.split(None, maxsplit) for v in vals]
    return [None if v is None else v.split(sep, maxsplit) for v in vals]


# ----------------------------------------------------------------------
# padding
# ----------------------------------------------------------------------

def pad(col: Column, width: int, side: str = "left", fillchar: str = " ") -> Column:
    """ljust/rjust/center (pad.cu), on device via select over expanded bytes."""
    n = col.length
    fb = ord(fillchar)
    nchars_col = length(col)
    nchars = nchars_col.data
    lens = col.offsets[1:] - col.offsets[:-1]
    padn = jnp.maximum(width - nchars, 0)
    if side == "left":  # rjust
        left_pad = padn
    elif side == "right":
        left_pad = jnp.zeros((n,), jnp.int64)
    else:
        # CPython str.center: left = marg//2 + (marg & width & 1)
        left_pad = padn // 2 + (padn & jnp.int64(width) & 1)
    right_pad = padn - left_pad
    new_lens = lens + padn  # pad chars are 1 byte each
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(new_lens)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    lp = jnp.take(left_pad, row)
    ln = jnp.take(lens, row)
    in_body = (within >= lp) & (within < lp + ln)
    src = jnp.take(col.offsets[:-1], row) + (within - lp)
    chars_buf = col.data if col.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    body = jnp.take(chars_buf, jnp.clip(src, 0, chars_buf.shape[0] - 1))
    out = jnp.where(in_body, body, jnp.uint8(fb))
    return Column(dt.STRING, n, data=out, offsets=offsets, validity=col.validity)


def zfill(col: Column, width: int) -> Column:
    """Left-pad with '0' keeping a leading sign in front (pad.cu zfill)."""
    n = col.length
    if col.data.shape[0] == 0:
        return pad(col, width, side="left", fillchar="0")
    nchars = length(col).data
    lens = col.offsets[1:] - col.offsets[:-1]
    padn = jnp.maximum(width - nchars, 0)
    chars_buf = col.data
    first = jnp.take(chars_buf, jnp.clip(col.offsets[:-1], 0, chars_buf.shape[0] - 1))
    has_sign = (lens > 0) & ((first == ord("+")) | (first == ord("-")))
    new_lens = lens + padn
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(new_lens)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    hs = jnp.take(has_sign, row).astype(jnp.int64)
    pd_ = jnp.take(padn, row)
    is_sign_pos = (within == 0) & (hs == 1)
    in_zeros = (within >= hs) & (within < hs + pd_)
    src = jnp.take(col.offsets[:-1], row) + jnp.where(
        is_sign_pos, 0, within - pd_)
    body = jnp.take(chars_buf, jnp.clip(src, 0, chars_buf.shape[0] - 1))
    out = jnp.where(in_zeros, jnp.uint8(ord("0")), body)
    return Column(dt.STRING, n, data=out, offsets=offsets,
                  validity=col.validity)


def repeat_strings(col: Column, times: int) -> Column:
    """s * times on device (repeat_strings.cu)."""
    n = col.length
    t = max(times, 0)
    lens = col.offsets[1:] - col.offsets[:-1]
    new_lens = lens * t
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(new_lens)])
    total = int(offsets[-1])
    if total == 0:
        return Column(dt.STRING, n, data=jnp.zeros((0,), jnp.uint8),
                      offsets=offsets, validity=col.validity)
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    ln = jnp.maximum(jnp.take(lens, row), 1)
    src = jnp.take(col.offsets[:-1], row) + (within % ln)
    out = jnp.take(col.data, jnp.clip(src, 0, col.data.shape[0] - 1))
    return Column(dt.STRING, n, data=out, offsets=offsets,
                  validity=col.validity)


# ----------------------------------------------------------------------
# conversion (convert/ in the reference)
# ----------------------------------------------------------------------

def to_numbers(col: Column, target: dt.DType) -> Column:
    """Parse strings → numeric (convert_integers.cu / convert_floats.cu).

    Integers parse on device (vectorized digit fold over the padded tile);
    floats go through the host (device float parse is a later kernel).
    """
    if target.is_integer and not _has_non_ascii(col):
        return _parse_ints_device(col, target)
    if target.is_float and not _has_non_ascii(col):
        out = _parse_floats_device(col, target)
        if out is not None:
            return out
    storage = target.storage

    def parse(s: str):
        s = s.strip()
        if s == "":
            return None
        if target.is_bool:
            return s.lower() in ("true", "1", "t", "yes")
        return storage.type(float(s) if not target.is_integer else int(float(s)))

    return _host_map(col, parse, target)


def _parse_floats_device(col: Column, target: dt.DType) -> Optional[Column]:
    """Vectorized float parse: [+-]?D[.D][eE[+-]?D] (convert_floats.cu).

    Correctly rounded for <= 15 significant digits (int64 mantissa fold +
    ONE exact power-of-ten scale = single rounding); returns None when a
    longer mantissa or a non-float token (inf/nan spellings) appears so
    the host strtod path keeps bit-exactness.
    """
    n = col.length
    if n == 0 or col.data.shape[0] == 0:
        return None
    from cudf_tpu.ops.binaryop import _padded_bytes

    lens = col.offsets[1:] - col.offsets[:-1]
    width = max(int(jnp.max(lens)), 1)
    if width > 26:
        return None
    mat = _padded_bytes(col, width).astype(jnp.int32)       # [n, w]
    posm = jnp.arange(width, dtype=jnp.int64)[None, :]
    in_str = posm < lens[:, None]
    mat = jnp.where(in_str, mat, 0)
    is_digit = (mat >= 48) & (mat <= 57)
    neg = mat[:, 0] == ord("-")
    has_sign = neg | (mat[:, 0] == ord("+"))
    big = jnp.int64(width + 1)
    dotpos = jnp.min(jnp.where((mat == ord(".")) & in_str, posm, big), axis=1)
    e_mask = ((mat == ord("e")) | (mat == ord("E"))) & in_str
    epos = jnp.min(jnp.where(e_mask, posm, big), axis=1)
    mant_end = jnp.minimum(epos, lens)
    # mantissa region: [sign, mant_end) minus the dot
    in_mant = (posm >= has_sign[:, None].astype(jnp.int64)) & \
        (posm < mant_end[:, None]) & (posm != dotpos[:, None])
    ok = jnp.all(~in_mant | is_digit, axis=1)
    n_mant = jnp.sum(in_mant, axis=1)
    ok = ok & (n_mant > 0) & (n_mant <= 15)
    # exponent region
    has_e = epos < lens
    esign_pos = epos + 1
    eneg = jnp.take_along_axis(
        mat, jnp.clip(esign_pos, 0, width - 1)[:, None], axis=1)[:, 0] == ord("-")
    e_has_sign = eneg | (jnp.take_along_axis(
        mat, jnp.clip(esign_pos, 0, width - 1)[:, None], axis=1)[:, 0] == ord("+"))
    in_exp = (posm > (epos + e_has_sign.astype(jnp.int64))[:, None]) & \
        (posm < lens[:, None])
    ok = ok & (~has_e | (jnp.sum(in_exp, axis=1) > 0))
    ok = ok & jnp.all(~in_exp | is_digit, axis=1)
    # folds
    digits = jnp.where(is_digit, mat - 48, 0).astype(jnp.int64)
    mant = jnp.zeros((n,), jnp.int64)
    exp10 = jnp.zeros((n,), jnp.int64)
    for j in range(width):
        m_j = in_mant[:, j]
        mant = jnp.where(m_j, mant * 10 + digits[:, j], mant)
        exp10 = exp10 + jnp.where(m_j & (posm[0, j] > dotpos), -1, 0)
    eexp = jnp.zeros((n,), jnp.int64)
    for j in range(width):
        x_j = in_exp[:, j]
        eexp = jnp.where(x_j, eexp * 10 + digits[:, j], eexp)
    ok = ok & (jnp.abs(eexp) <= 300)
    exp10 = exp10 + jnp.where(eneg, -eexp, eexp)
    # one exact scale: mantissa(int64, <=15 digits) {*,/} 10^|e| — both
    # operands exact for |e| <= 22, so the single fp op rounds correctly
    ok = ok & (jnp.abs(exp10) <= 22)
    if not bool(jnp.all(ok | (lens == 0))):
        return None                    # host path keeps strtod exactness
    m = mant.astype(jnp.float64)
    p = jnp.power(10.0, jnp.abs(exp10).astype(jnp.float64))
    val = jnp.where(exp10 >= 0, m * p, m / p)
    val = jnp.where(neg, -val, val)
    empty = lens == 0
    validity = bm.and_masks(col.validity, ~empty)
    if validity is not None and bool(jnp.all(validity)):
        validity = None
    if target.storage == np.float32:
        val = val.astype(jnp.float32)
    return Column(target, n, data=val.astype(target.storage),
                  validity=validity)


def _parse_ints_device(col: Column, target: dt.DType) -> Column:
    n = col.length
    from cudf_tpu.ops.binaryop import _padded_bytes

    lens = col.offsets[1:] - col.offsets[:-1]
    width = int(jnp.max(lens)) if n and col.data.shape[0] else 1
    width = max(width, 1)
    mat = _padded_bytes(col, width).astype(jnp.int64)  # [n, w]
    neg = mat[:, 0] == ord("-")
    has_sign = (mat[:, 0] == ord("-")) | (mat[:, 0] == ord("+"))
    is_digit = (mat >= 48) & (mat <= 57)
    posmat = jnp.arange(width, dtype=jnp.int64)[None, :]
    in_range = posmat < lens[:, None]
    body = in_range & ~(has_sign[:, None] & (posmat == 0))
    valid_parse = jnp.all(~body | is_digit, axis=1) & (lens > 0) & ~(has_sign & (lens == 1))
    digits = jnp.where(body & is_digit, mat - 48, 0)
    val = jnp.zeros((n,), jnp.int64)
    for j in range(width):
        val = val * jnp.where(body[:, j], 10, 1) + digits[:, j]
    val = jnp.where(neg, -val, val)
    validity = bm.and_masks(col.validity, valid_parse)
    if validity is not None and bool(jnp.all(validity)):
        validity = None
    return Column(target, n, data=val.astype(target.storage), validity=validity)


def from_column(col: Column) -> Column:
    """Numeric/temporal/bool → string (convert/: from_integers.cu etc.).

    Integers format on device (digit peel); floats/temporal format on host
    to match pandas repr exactly.
    """
    if col.dtype.is_integer:
        return _format_ints_device(col)
    if col.dtype.is_bool:
        vals = np.asarray(col.data)
        return Column.from_strings(
            ["True" if v else "False" for v in vals],
            mask=np.asarray(col.validity) if col.validity is not None else None,
        )
    if col.dtype.is_timestamp:
        # pandas DatetimeArray._format_native_types: date-only when every
        # value is midnight, else trim to the coarsest uniform precision;
        # ' ' separates date and time (not ISO 'T')
        import pandas as _pd

        mask = np.asarray(col.validity) if col.validity is not None else None
        arr = np.asarray(col.data).astype(col.dtype.to_numpy())
        ts = _pd.DatetimeIndex(arr)
        if getattr(col.dtype, "tz", None):
            # ticks are UTC epochs; present in the column's zone
            ts = ts.tz_localize("UTC").tz_convert(col.dtype.tz)
        strs = [str(s) for s in ts._data._format_native_types(na_rep="NaT")]
        return Column.from_strings(strs, mask=mask)
    if col.dtype.is_temporal:
        arr = np.asarray(col.data).astype(col.dtype.to_numpy())
        strs = [str(v) for v in arr]
        return Column.from_strings(
            strs, mask=np.asarray(col.validity) if col.validity is not None else None
        )
    vals = np.asarray(col.data)
    return Column.from_strings(
        [repr(float(v)) for v in vals],
        mask=np.asarray(col.validity) if col.validity is not None else None,
    )


def _format_ints_device(col: Column) -> Column:
    n = col.length
    x = col.data.astype(jnp.int64)
    neg = x < 0
    ax = jnp.where(neg, -x, x)  # NOTE: INT64_MIN overflows; handled below
    # digit count
    ndig = jnp.ones((n,), jnp.int64)
    p = jnp.full((n,), 10, jnp.int64)
    for _ in range(18):
        ndig = ndig + (ax >= p).astype(jnp.int64)
        p = p * 10
    total_len = ndig + neg.astype(jnp.int64)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(total_len)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    rneg = jnp.take(neg, row)
    rdig = jnp.take(ndig, row)
    rax = jnp.take(ax, row)
    digit_pos = rdig - 1 - (within - rneg.astype(jnp.int64))  # power index
    # extract digit: (ax // 10^digit_pos) % 10 — compute 10^k via cumulative trick
    pow10 = jnp.power(jnp.full_like(digit_pos, 10), jnp.clip(digit_pos, 0, 18))
    dig = jnp.mod(jnp.floor_divide(rax, pow10), 10)
    ch = jnp.where(rneg & (within == 0), jnp.int64(ord("-")), dig + 48)
    return Column(dt.STRING, n, data=ch.astype(jnp.uint8), offsets=offsets, validity=col.validity)


def to_timestamps(col: Column, target: Optional[dt.DType] = None,
                  format: Optional[str] = None) -> Column:
    """Parse strings → timestamps.  Host tier (device fixed-format kernel
    is a later round; reference: convert_datetime.cu).

    target=None keeps pandas' inferred resolution (pandas 3 infers 'us'
    for second-precision strings)."""
    import pandas as pd

    vals = col.to_pylist()
    parsed = pd.to_datetime(pd.Series(vals), format=format, errors="coerce")
    if target is None:
        arr = parsed.to_numpy()
    else:
        arr = parsed.to_numpy(dtype=f"datetime64[{target.time_unit or 'ns'}]")
    return Column.from_numpy(arr)


def join_strings(col: Column, sep: str = "") -> Optional[str]:
    vals = [v for v in col.to_pylist() if v is not None]
    if not vals:
        return None
    return sep.join(vals)
