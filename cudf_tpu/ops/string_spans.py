"""Device match-span consumers: replace / split / extract / count.

TPU-native equivalent of the span-tracking half of cudf strings
(reference: cpp/src/strings/replace/replace.cu, split/split_re.cu,
extract/extract.cu, contains.cu count path — all built on
reprog_device::find span scans, regex.inl).

Design: spans live in the row-major char-matrix coordinate system
([n, L] byte positions, from regex_engine.match_spans or the literal
matcher below).  Consumers flatten the span masks onto the flat chars
buffer and rebuild output columns with pure gather/prefix-sum assembly —
no per-element scatter, no host round-trip.  Rows longer than
_MAX_DEVICE_LEN fall back to the host tier at the caller.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops._utils import segment_expand

_MAX_DEVICE_LEN = 1024          # char-matrix width cap (host tier beyond)
_CHUNK_ELEMS = 4_000_000


def max_row_len(col: Column) -> int:
    if col.length == 0 or col.data.shape[0] == 0:
        return 0
    return int(jnp.max(col.offsets[1:] - col.offsets[:-1]))


def _char_matrix(col: Column) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """chars[n, L] int32 (0-padded), lens[n] — byte-level row matrix."""
    offs = col.offsets
    n = col.length
    lens = (offs[1:] - offs[:-1]).astype(jnp.int32)
    L = max(max_row_len(col), 1)
    pos = offs[:-1, None] + jnp.arange(L, dtype=offs.dtype)[None, :]
    in_range = pos < offs[1:, None]
    src = col.data.astype(jnp.int32) if col.data.shape[0] else jnp.zeros(
        (1,), jnp.int32)
    chars = jnp.take(src, jnp.clip(pos, 0, src.shape[0] - 1).reshape(-1)
                     ).reshape(n, L)
    return jnp.where(in_range, chars, 0), lens


def literal_match_matrix(col: Column, pat: str):
    """match[n, L]: literal pattern starts at byte position p."""
    pb = np.frombuffer(pat.encode(), dtype=np.uint8)
    chars, lens = _char_matrix(col)
    n, L = chars.shape
    Lp = len(pb)
    cm = jnp.concatenate(
        [chars, jnp.zeros((n, Lp), jnp.int32)], axis=1)
    match = (jnp.arange(L, dtype=jnp.int32)[None, :] + Lp) <= lens[:, None]
    for j, c in enumerate(pb):
        match = match & (cm[:, j:j + L] == int(c))
    return match, lens


def select_greedy(matchlen, lens, max_matches: int = -1):
    """Greedy left-to-right non-overlapping selection.

    matchlen[n, L] int32 (-1 / 0 = no match at p).  Returns
    (sel[n, L] span-start mask, covered[n, L] inside-a-span mask).
    """
    n, L = matchlen.shape

    def step(carry, xs):
        next_free, count = carry
        ml, p = xs
        can = (ml > 0) & (p >= next_free)
        if max_matches >= 0:
            can = can & (count < max_matches)
        next_free = jnp.where(can, p + ml, next_free)
        count = count + can.astype(jnp.int32)
        covered = next_free > p
        return (next_free, count), (can, covered)

    (_, _), (sel_T, cov_T) = jax.lax.scan(
        step,
        (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32)),
        (matchlen.T, jnp.arange(L, dtype=jnp.int32)))
    return sel_T.T, cov_T.T


def _flatten(mat: jnp.ndarray, col: Column) -> jnp.ndarray:
    """[n, L] matrix → flat per-byte array over the chars buffer."""
    total = int(col.offsets[-1])
    row = segment_expand(col.offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(col.offsets, row)
    L = mat.shape[1]
    return jnp.take(mat.reshape(-1), row * L + within)


def assemble_replace(col: Column, sel_flat, covered_flat,
                     repl: str) -> Column:
    """Rebuild strings with selected spans replaced by ``repl``.

    Pure prefix-sum + gather assembly (replace.cu's two-phase size-then-
    copy, as one XLA program)."""
    rb = np.frombuffer(repl.encode(), dtype=np.uint8)
    R = len(rb)
    n = col.length
    total = int(col.offsets[-1])
    row = segment_expand(col.offsets, total)
    out_count = jnp.where(~covered_flat, 1,
                          jnp.where(sel_flat, R, 0)).astype(jnp.int64)
    new_lens = jax.ops.segment_sum(out_count, row, num_segments=n)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(new_lens)])
    total_out = int(offsets[-1])
    if total_out == 0:
        return Column(dt.STRING, n, data=jnp.zeros((0,), jnp.uint8),
                      offsets=offsets, validity=col.validity)
    emit_off = jnp.cumsum(out_count) - out_count       # exclusive
    q = jnp.arange(total_out, dtype=jnp.int64)
    # source byte emitting output position q
    b = jnp.clip(jnp.searchsorted(jnp.cumsum(out_count), q, side="right"),
                 0, total - 1)
    within = q - jnp.take(emit_off, b)
    from_repl = jnp.take(sel_flat, b)
    repl_arr = jnp.asarray(rb) if R else jnp.zeros((1,), jnp.uint8)
    out = jnp.where(
        from_repl,
        jnp.take(repl_arr, jnp.clip(within, 0, max(R - 1, 0))),
        jnp.take(col.data if col.data.shape[0] else jnp.zeros((1,), jnp.uint8),
                 b))
    return Column(dt.STRING, n, data=out.astype(jnp.uint8), offsets=offsets,
                  validity=col.validity)


def replace_literal_device(col: Column, pat: str, repl: str,
                           n: int = -1) -> Optional[Column]:
    if max_row_len(col) > _MAX_DEVICE_LEN or not pat:
        return None
    match, lens = literal_match_matrix(col, pat)
    Lp = len(pat.encode())
    sel, covered = select_greedy(
        jnp.where(match, Lp, 0).astype(jnp.int32), lens, max_matches=n)
    return assemble_replace(col, _flatten(sel, col), _flatten(covered, col),
                            repl)


def _regex_spans(col: Column, pat: str, flags: int, max_matches: int = -1):
    from cudf_tpu.ops import regex_engine as rex

    if max_row_len(col) > _MAX_DEVICE_LEN:
        raise rex.Unsupported("row too long for device span scan")
    _, matchlen, lens = rex.match_spans(col, pat, flags)
    sel, covered = select_greedy(
        jnp.where(matchlen > 0, matchlen, 0), lens,
        max_matches=max_matches)
    return sel, covered, matchlen, lens


def replace_re_device(col: Column, pat: str, repl: str, n: int = -1,
                      flags: int = 0) -> Optional[Column]:
    from cudf_tpu.ops import regex_engine as rex

    if any(tok in repl for tok in ("\\", "$")):
        return None                      # group references → host
    try:
        sel, covered, matchlen, lens = _regex_spans(col, pat, flags,
                                                    max_matches=n)
    except rex.Unsupported:
        return None
    return assemble_replace(col, _flatten(sel, col), _flatten(covered, col),
                            repl)


def count_re_device(col: Column, pat: str, flags: int = 0) -> Optional[Column]:
    from cudf_tpu.ops import regex_engine as rex

    try:
        sel, covered, matchlen, lens = _regex_spans(col, pat, flags)
    except rex.Unsupported:
        return None
    cnt = jnp.sum(sel, axis=1).astype(jnp.int64)
    return Column(dt.INT64, col.length, data=cnt, validity=col.validity)


def _substring_column(col: Column, starts, lengths, valid) -> Column:
    """Build a string column from per-row (byte start, byte len) within
    each row; rows with valid=False are null."""
    n = col.length
    lengths = jnp.where(valid, lengths, 0).astype(jnp.int64)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(lengths)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    src = jnp.take(col.offsets, row) + jnp.take(starts.astype(jnp.int64), row) + within
    buf = col.data if col.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    out = jnp.take(buf, jnp.clip(src, 0, buf.shape[0] - 1))
    base_valid = jnp.asarray(valid)
    from cudf_tpu.ops._utils import materialize_validity

    if col.validity is not None:
        base_valid = base_valid & materialize_validity(col)
    validity = None if bool(jnp.all(base_valid)) else base_valid
    return Column(dt.STRING, n, data=out.astype(jnp.uint8), offsets=offsets,
                  validity=validity)


def _first_span(sel, matchlen):
    """(start[n], len[n], found[n]) of each row's first selected span."""
    n, L = sel.shape
    pidx = jnp.arange(L, dtype=jnp.int32)[None, :]
    big = jnp.int32(L + 1)
    first = jnp.min(jnp.where(sel, pidx, big), axis=1)
    found = first < big
    start = jnp.where(found, first, 0)
    ln = jnp.take_along_axis(matchlen, start[:, None].astype(jnp.int32),
                             axis=1)[:, 0]
    return start, jnp.where(found, ln, 0), found


def extract_re_device(col: Column, pat: str,
                      flags: int = 0) -> Optional[List[Column]]:
    """Device extract for single-group patterns whose group IS the whole
    pattern (the common ``(\\d+)`` shape).  Multi-group → host."""
    from cudf_tpu.ops import regex_engine as rex

    try:
        import re as _re
        if _re.compile(pat, flags).groups != 1:
            raise rex.Unsupported("multi-group extract")
        try:
            import re._parser as sre_parse
            import re._constants as sre_c
        except ImportError:              # pragma: no cover
            import sre_parse
            import sre_constants as sre_c
        toks = list(sre_parse.parse(pat, flags))
        if not (len(toks) == 1 and toks[0][0] is sre_c.SUBPATTERN):
            raise rex.Unsupported("group is not the whole pattern")
        sel, covered, matchlen, lens = _regex_spans(col, pat, flags,
                                                    max_matches=1)
    except rex.Unsupported:
        return None
    start, ln, found = _first_span(sel, matchlen)
    return [_substring_column(col, start, ln, found)]


def split_device(col: Column, pat: str, maxsplit: int = -1,
                 regex: bool = False, flags: int = 0):
    """(piece_starts[n,W], piece_lens[n,W], npieces[n]) or None.

    W = max pieces.  Selected spans are separators (split.cu/split_re.cu).
    """
    from cudf_tpu.ops import regex_engine as rex

    if max_row_len(col) > _MAX_DEVICE_LEN:
        return None
    if regex:
        try:
            sel, covered, matchlen, lens = _regex_spans(
                col, pat, flags, max_matches=maxsplit)
        except rex.Unsupported:
            return None
    else:
        if not pat:
            return None
        match, lens = literal_match_matrix(col, pat)
        Lp = len(pat.encode())
        sel, covered = select_greedy(
            jnp.where(match, Lp, 0).astype(jnp.int32), lens,
            max_matches=maxsplit)
        matchlen = jnp.full_like(match, Lp, jnp.int32)
    n, L = sel.shape
    nsep = jnp.sum(sel, axis=1).astype(jnp.int32)
    npieces = nsep + 1
    W = int(jnp.max(npieces)) if n else 1
    # k-th separator position per row: sort selected positions
    pidx = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (n, L))
    big = jnp.int32(1 << 30)
    sep_pos = jnp.sort(jnp.where(sel, pidx, big), axis=1)[:, :max(W - 1, 1)]
    sep_len = jnp.take_along_axis(
        matchlen, jnp.clip(sep_pos, 0, L - 1), axis=1)
    k = jnp.arange(W, dtype=jnp.int32)[None, :]
    prev_end = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32),
         (jnp.where(sep_pos >= big, 0, sep_pos + sep_len))], axis=1)[:, :W]
    # piece k: [prev_end[k], sep_pos[k]) ; last piece ends at len
    next_sep = jnp.concatenate(
        [sep_pos, jnp.full((n, 1), big, jnp.int32)], axis=1)[:, :W]
    piece_start = prev_end
    piece_end = jnp.minimum(next_sep, lens[:, None])
    piece_len = jnp.maximum(piece_end - piece_start, 0)
    exists = k < npieces[:, None]
    return piece_start, piece_len, exists, npieces


def split_columns(col: Column, pat: str, maxsplit: int = -1,
                  regex: bool = False, flags: int = 0):
    """split into W string columns (expand mode) — None if host needed."""
    out = split_device(col, pat, maxsplit, regex, flags)
    if out is None:
        return None
    piece_start, piece_len, exists, npieces = out
    W = piece_start.shape[1]
    return [
        _substring_column(col, piece_start[:, i], piece_len[:, i],
                          exists[:, i])
        for i in range(W)
    ]
