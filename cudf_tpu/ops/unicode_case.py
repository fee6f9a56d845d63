"""Device Unicode case mapping: UTF-8 decode → BMP table lookup → encode.

TPU-native equivalent of cudf's device case kernels
(reference: cpp/src/strings/case.cu — full Unicode case tables on
device; round 1 host-fell-back on any non-ASCII byte).

Tables are built ONCE from CPython's own str.upper/lower/swapcase/title
(so mappings are bit-identical to the pandas oracle) for the Basic
Multilingual Plane; codepoints whose mapping expands to multiple
characters (ß→SS, ﬁ→FI, …) or astral-plane rows are detected on device
and routed to the host tier by the caller.

Pipeline (all jnp, scatter-free):
  1. decode: per-byte start mask → per-char codepoints (≤4-byte gather)
  2. map:    cp' = table[cp]; needs_host = any(table[cp] < 0 | cp ≥ 2^16)
  3. encode: per-char UTF-8 length of cp' → prefix-sum offsets → emit
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops._utils import segment_expand

_BMP = 1 << 16
_tables = {}


def _build_table(kind: str) -> np.ndarray:
    """int32[65536]: mapped cp, or -1 where the mapping is not a single
    BMP codepoint (caller falls back to host)."""
    tab = np.arange(_BMP, dtype=np.int32)
    for cp in range(_BMP):
        ch = chr(cp)
        if kind == "upper":
            m = ch.upper()
        elif kind == "lower":
            m = ch.lower()
        elif kind == "swapcase":
            m = ch.swapcase()
        else:  # title (per-char titlecase)
            m = ch.title() if ch.title() else ch
        if m != ch:
            if len(m) == 1 and ord(m) < _BMP:
                tab[cp] = ord(m)
            else:
                tab[cp] = -1
    return tab


def _get_table(kind: str) -> jnp.ndarray:
    if kind not in _tables:
        _tables[kind] = jnp.asarray(_build_table(kind))
    return _tables[kind]


def _cased_mask() -> jnp.ndarray:
    if "cased" not in _tables:
        arr = np.zeros((_BMP,), np.bool_)
        for cp in range(_BMP):
            ch = chr(cp)
            # CPython's title(): a char continues a word iff the previous
            # char is CASED (islower/isupper/istitle), not merely alpha
            arr[cp] = ch.islower() or ch.isupper() or ch.istitle()
        _tables["cased"] = jnp.asarray(arr)
    return _tables["cased"]


def decode_utf8(col: Column):
    """(cp[nchar] int32, char_row[nchar], char_idx_in_row[nchar],
    ok: False if any astral char).  nchar = total character count."""
    from cudf_tpu.ops.stream_compaction import filter_indices

    buf = col.data.astype(jnp.int32)
    total = buf.shape[0]
    is_start = (buf & 0xC0) != 0x80
    starts = filter_indices(is_start)
    b0 = jnp.take(buf, starts)
    clip = lambda i: jnp.clip(starts + i, 0, total - 1)
    b1 = jnp.take(buf, clip(1)) & 0x3F
    b2 = jnp.take(buf, clip(2)) & 0x3F
    b3 = jnp.take(buf, clip(3)) & 0x3F
    ln = jnp.where(b0 < 0x80, 1,
                   jnp.where(b0 < 0xE0, 2, jnp.where(b0 < 0xF0, 3, 4)))
    cp = jnp.where(
        ln == 1, b0,
        jnp.where(ln == 2, ((b0 & 0x1F) << 6) | b1,
                  jnp.where(ln == 3, ((b0 & 0x0F) << 12) | (b1 << 6) | b2,
                            ((b0 & 0x07) << 18) | (b1 << 12) | (b2 << 6) | b3)))
    row_of_byte = segment_expand(col.offsets, total)
    char_row = jnp.take(row_of_byte, starts)
    # char index within row: running count of starts minus row base
    cum = jnp.cumsum(is_start.astype(jnp.int64))
    starts_cum = jnp.take(
        jnp.concatenate([jnp.zeros((1,), jnp.int64), cum]),
        jnp.take(col.offsets, char_row))
    char_idx = jnp.take(cum, starts) - 1 - starts_cum
    return cp, char_row, char_idx


def encode_utf8(cp: jnp.ndarray, char_row: jnp.ndarray, n_rows: int,
                validity) -> Column:
    """Assemble a string column from per-char BMP codepoints."""
    ln = jnp.where(cp < 0x80, 1, jnp.where(cp < 0x800, 2, 3)).astype(jnp.int64)
    row_lens = jax.ops.segment_sum(ln, char_row, num_segments=n_rows)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(row_lens)])
    char_off = jnp.cumsum(ln) - ln
    total = int(offsets[-1])
    if total == 0:
        return Column(dt.STRING, n_rows, data=jnp.zeros((0,), jnp.uint8),
                      offsets=offsets, validity=validity)
    q = jnp.arange(total, dtype=jnp.int64)
    c = jnp.clip(jnp.searchsorted(jnp.cumsum(ln), q, side="right"),
                 0, cp.shape[0] - 1)
    within = q - jnp.take(char_off, c)
    cpc = jnp.take(cp, c)
    lnc = jnp.take(ln, c)
    one = cpc
    two = jnp.where(within == 0, 0xC0 | (cpc >> 6), 0x80 | (cpc & 0x3F))
    three = jnp.where(within == 0, 0xE0 | (cpc >> 12),
                      jnp.where(within == 1, 0x80 | ((cpc >> 6) & 0x3F),
                                0x80 | (cpc & 0x3F)))
    out = jnp.where(lnc == 1, one, jnp.where(lnc == 2, two, three))
    return Column(dt.STRING, n_rows, data=out.astype(jnp.uint8),
                  offsets=offsets, validity=validity)


def case_map(col: Column, kind: str) -> Optional[Column]:
    """lower/upper/swapcase/capitalize/title on device; None → host
    (expanding mapping or astral char present)."""
    cp, char_row, char_idx = decode_utf8(col)
    if bool(jnp.any(cp >= _BMP)):
        return None
    if kind in ("upper", "lower", "swapcase"):
        tab = _get_table(kind)
        mapped = jnp.take(tab, jnp.clip(cp, 0, _BMP - 1))
    elif kind == "capitalize":
        up = jnp.take(_get_table("title"), jnp.clip(cp, 0, _BMP - 1))
        lo = jnp.take(_get_table("lower"), jnp.clip(cp, 0, _BMP - 1))
        mapped = jnp.where(char_idx == 0, up, lo)
    elif kind == "title":
        up = jnp.take(_get_table("title"), jnp.clip(cp, 0, _BMP - 1))
        lo = jnp.take(_get_table("lower"), jnp.clip(cp, 0, _BMP - 1))
        cased = jnp.take(_cased_mask(), jnp.clip(cp, 0, _BMP - 1))
        # previous char in the same row cased? (shift within rows)
        prev_cased = jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), cased[:-1]])
        prev_cased = prev_cased & (char_idx > 0)
        mapped = jnp.where(prev_cased, lo, up)
    else:
        raise ValueError(kind)
    if bool(jnp.any(mapped < 0)):
        return None                       # expanding mapping → host tier
    return encode_utf8(mapped, char_row, col.length, col.validity)


_CLASS_TESTS = {
    "isdigit": str.isdigit, "isdecimal": str.isdecimal,
    "isnumeric": str.isnumeric, "isalpha": str.isalpha,
    "isalnum": str.isalnum, "isspace": str.isspace,
    "isupper": str.isupper, "islower": str.islower,
    "istitle": None,   # positional — not a per-char table
}


def _class_table(kind: str) -> jnp.ndarray:
    key = f"class:{kind}"
    if key not in _tables:
        fn = _CLASS_TESTS[kind]
        arr = np.zeros((_BMP,), np.bool_)
        for cp in range(_BMP):
            try:
                arr[cp] = fn(chr(cp))
            except Exception:     # pragma: no cover
                arr[cp] = False
        _tables[key] = jnp.asarray(arr)
    return _tables[key]


def char_class_all(col: Column, kind: str):
    """Python str.isX semantics per row on device (char_types.cu role):
    all chars satisfy the class AND the row is non-empty.  isupper/
    islower use the cased-char rule (any cased char, none of the
    opposite case).  None → host (astral chars present)."""
    import jax

    cp, char_row, _ = decode_utf8(col)
    if bool(jnp.any(cp >= _BMP)):
        return None
    n = col.length
    nonempty = (col.offsets[1:] - col.offsets[:-1]) > 0
    cpc = jnp.clip(cp, 0, _BMP - 1)
    if kind in ("isupper", "islower"):
        cased = jnp.take(_cased_mask(), cpc)
        this = jnp.take(_class_table(kind), cpc)
        other = jnp.take(_class_table(
            "islower" if kind == "isupper" else "isupper"), cpc)
        has_this = jax.ops.segment_max(this.astype(jnp.int8), char_row,
                                       num_segments=n) > 0
        has_other = jax.ops.segment_max(other.astype(jnp.int8), char_row,
                                        num_segments=n) > 0
        out = has_this & ~has_other
        return Column(dt.BOOL8, n, data=out & nonempty,
                      validity=col.validity)
    ok = jnp.take(_class_table(kind), cpc)
    allok = jax.ops.segment_min(
        jnp.concatenate([ok.astype(jnp.int8)]), char_row,
        num_segments=n) > 0
    return Column(dt.BOOL8, n, data=allok & nonempty, validity=col.validity)
