"""nvtext-equivalent text operations.

TPU-native equivalent of libcudf nvtext (reference: cpp/src/text/ —
tokenize.cu, generate_ngrams.cu, minhash.cu, jaccard.cu, edit_distance.cu,
normalize.cu).  Device tier uses the same flat-chars + segment machinery
as ops/strings; alignment-hostile algorithms (edit distance) stay host.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops._utils import segment_expand
from cudf_tpu.ops.strings import _host_map


def _is_space(b: jnp.ndarray) -> jnp.ndarray:
    return (b == 32) | ((b >= 9) & (b <= 13))


def count_tokens(col: Column, delimiter: Optional[str] = None) -> Column:
    """Tokens per row (tokenize.cu token counting pass)."""
    n = col.length
    total = int(col.offsets[-1])
    if total == 0:
        return Column(dt.INT64, n, data=jnp.zeros((n,), jnp.int64), validity=col.validity)
    row = segment_expand(col.offsets, total)
    b = col.data
    if delimiter is None:
        sep = _is_space(b)
    else:
        sep = b == ord(delimiter[0])
    pos = jnp.arange(total, dtype=jnp.int64)
    at_row_start = pos == jnp.take(col.offsets, row)
    prev_sep = jnp.concatenate([jnp.ones((1,), jnp.bool_), sep[:-1]])
    token_start = ~sep & (at_row_start | prev_sep)
    counts = jax.ops.segment_sum(token_start.astype(jnp.int64), row, num_segments=n)
    return Column(dt.INT64, n, data=counts, validity=col.validity)


def tokenize(col: Column, delimiter: Optional[str] = None) -> Column:
    """All tokens as one flat string column (tokenize.cu)."""
    vals = col.to_pylist()
    toks: List[str] = []
    for v in vals:
        if v is None:
            continue
        toks.extend(v.split(delimiter))
    toks = [t for t in toks if t != ""]
    return Column.from_strings(toks)


def character_ngrams(col: Column, n: int = 2) -> Column:
    """Per-row character n-grams as a list column (generate_ngrams.cu)."""
    from cudf_tpu.ops.lists import from_pylists

    vals = col.to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
        else:
            out.append([v[i:i + n] for i in range(max(len(v) - n + 1, 0))])
    return from_pylists(out, dtype=dt.STRING)


def ngrams_tokenize(col: Column, n: int = 2, separator: str = "_") -> Column:
    vals = col.to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        toks = v.split()
        out.append([separator.join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 0))])
    from cudf_tpu.ops.lists import from_pylists

    return from_pylists(out, dtype=dt.STRING)


def minhash(col: Column, seeds: jnp.ndarray, width: int = 4) -> Column:
    """Per-row MinHash over character shingles (minhash.cu).

    Fully on device: rolling polynomial hash per byte position (one pass),
    then per-seed remix + segment-min.  Returns a list column [n][n_seeds].
    """
    n = col.length
    total = int(col.offsets[-1])
    nseeds = int(seeds.shape[0])
    if total == 0:
        from cudf_tpu.ops.lists import from_pylists

        return from_pylists([[0] * nseeds] * n)
    row = segment_expand(col.offsets, total)
    pos = jnp.arange(total, dtype=jnp.int64)
    ends = jnp.take(col.offsets, row + 1)
    valid_shingle = (pos + width) <= ends
    # polynomial shingle hash
    h = jnp.zeros((total,), jnp.uint64)
    P = jnp.uint64(1099511628211)
    chars = col.data
    for j in range(width):
        idx = jnp.clip(pos + j, 0, total - 1)
        h = h * P + jnp.take(chars, idx).astype(jnp.uint64)
    mins = []
    big = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    for s in np.asarray(seeds).tolist():
        hs = (h ^ jnp.uint64(np.uint64(s))) * P
        hs = hs ^ (hs >> jnp.uint64(33))
        masked = jnp.where(valid_shingle, hs, big)
        # segment_min on uint64: order-preserve via int64 bitcast with sign flip
        as_i64 = jax.lax.bitcast_convert_type(masked ^ (jnp.uint64(1) << jnp.uint64(63)), jnp.int64)
        m = jax.ops.segment_min(as_i64, row, num_segments=n)
        back = jax.lax.bitcast_convert_type(m, jnp.uint64) ^ (jnp.uint64(1) << jnp.uint64(63))
        mins.append(back)
    from cudf_tpu.ops.lists import make_list_column

    stacked = jnp.stack(mins, axis=1).reshape(-1)  # [n, nseeds] row-major
    child = Column(dt.UINT64, n * nseeds, data=stacked)
    offsets = jnp.arange(0, (n + 1) * nseeds, nseeds, dtype=jnp.int64)
    return make_list_column(offsets, child, col.validity)


def jaccard_index(a: Column, b: Column, width: int = 4) -> Column:
    """Shingle-set Jaccard similarity per row pair (jaccard.cu) — host tier."""
    av = a.to_pylist()
    bv = b.to_pylist()
    out = []
    for x, y in zip(av, bv):
        if x is None or y is None:
            out.append(None)
            continue
        sa = {x[i:i + width] for i in range(max(len(x) - width + 1, 0))}
        sb = {y[i:i + width] for i in range(max(len(y) - width + 1, 0))}
        u = len(sa | sb)
        out.append(len(sa & sb) / u if u else 0.0)
    return Column.from_sequence(out, dtype=dt.FLOAT64)


def edit_distance(a: Column, b: Column) -> Column:
    """Levenshtein distance (edit_distance.cu) — host tier."""

    def lev(x: str, y: str) -> int:
        if len(x) < len(y):
            x, y = y, x
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy)))
            prev = cur
        return prev[-1]

    av = a.to_pylist()
    bv = b.to_pylist()
    out = [None if (x is None or y is None) else lev(x, y) for x, y in zip(av, bv)]
    return Column.from_sequence(out, dtype=dt.INT64)


def normalize_spaces(col: Column) -> Column:
    """Collapse runs of whitespace to single spaces, strip ends
    (normalize.cu) — device tier via the strings rebuild machinery."""
    from cudf_tpu.ops.strings import _rebuild

    n = col.length
    total = int(col.offsets[-1])
    if total == 0:
        return col
    row = segment_expand(col.offsets, total)
    b = col.data
    sp = _is_space(b)
    norm = jnp.where(sp, jnp.uint8(32), b)
    prev_sp = jnp.concatenate([jnp.ones((1,), jnp.bool_), sp[:-1]])
    pos = jnp.arange(total, dtype=jnp.int64)
    at_start = pos == jnp.take(col.offsets, row)
    # drop: space preceded by space/row start; trailing spaces handled by
    # dropping spaces that have no non-space after them in the row
    keep = ~sp | (~prev_sp & ~at_start)
    # trailing: last non-space position per row
    nonsp_pos = jnp.where(~sp, pos, -1)
    last_nonsp = jax.ops.segment_max(nonsp_pos, row, num_segments=n)
    keep = keep & (pos <= jnp.take(last_nonsp, row))
    return _rebuild(col, keep, norm, row)


def porter_stemmer_measure(col: Column) -> Column:
    """Porter 'measure' (VC sequence count) — host tier (stemmer.cu)."""

    def measure(s: str) -> int:
        vowels = "aeiou"
        seq = ""
        prev_y_vowel = False
        for i, ch in enumerate(s.lower()):
            is_v = ch in vowels or (ch == "y" and i > 0 and s[i - 1].lower() not in vowels)
            seq += "V" if is_v else "C"
        import re

        return len(re.findall("VC", seq.replace("VV", "V").replace("CC", "C")))

    return _host_map(col, measure, dt.INT32).with_validity(col.validity)


# ---------------------------------------------------------------------------
# Vocabulary / subword tokenizers (reference: nvtext subword_tokenize.cu,
# byte_pair_encoding.cu, vocabulary tokenizer tokenize.cu:vocabulary)
# ---------------------------------------------------------------------------

def tokenize_with_vocabulary(col: Column, vocab: Column,
                             delimiter: Optional[str] = None,
                             default_id: int = -1) -> Column:
    """LIST<int32> of per-row token ids looked up in `vocab`
    (nvtext::tokenize_with_vocabulary).  The id lookup runs on device:
    tokens and vocabulary are compared as packed string-chunk key operands
    through one sorted search — no host hash table."""
    from cudf_tpu.ops.lists import make_list_column
    from cudf_tpu.ops.row_ops import order_keys
    from cudf_tpu.ops._utils import searchsorted_fast
    from cudf_tpu.ops.row_ops import rows_equal_at

    vals = col.to_pylist()
    toks: List[str] = []
    counts: List[int] = []
    for v in vals:
        t = [] if v is None else [t for t in v.split(delimiter) if t != ""]
        counts.append(len(t))
        toks.extend(t)
    tok_col = Column.from_strings(toks)
    # device lookup: lexicographic order keys for vocab + tokens, then a
    # sorted binary search per packed key (ties broken by chunk equality)
    from cudf_tpu.ops import sort as sort_ops
    from cudf_tpu.ops import copying as cp

    order = sort_ops.sorted_order([vocab], [True], "last")
    sorted_vocab = cp.gather(vocab, order, bounds_check=False)
    lo = _vocab_lookup(sorted_vocab, tok_col)
    ids = jnp.where(lo >= 0, jnp.take(order, jnp.maximum(lo, 0)), default_id)
    offsets = np.zeros(len(vals) + 1, np.int64)
    np.cumsum(np.asarray(counts), out=offsets[1:])
    validity = jnp.asarray(np.asarray([v is not None for v in vals])) if any(
        v is None for v in vals) else None
    ids_col = Column(dt.INT32, len(toks), data=ids.astype(jnp.int32))
    return make_list_column(jnp.asarray(offsets), ids_col, validity)


def _vocab_lookup(sorted_vocab: Column, needles: Column) -> jnp.ndarray:
    """int64[n] position of each needle in sorted vocab, -1 if absent."""
    from cudf_tpu.ops.join import _align_pair
    from cudf_tpu.ops import search as search_ops

    lo = search_ops.lower_bound(sorted_vocab, needles)
    nv = sorted_vocab.length
    safe = jnp.clip(lo, 0, max(nv - 1, 0))
    eq = jnp.ones(needles.length, jnp.bool_)
    hk_ops, nk_ops = _align_pair(sorted_vocab, needles)
    for hk, nk in zip(hk_ops, nk_ops):
        eq = eq & (jnp.take(hk, safe) == nk)
    return jnp.where((lo < nv) & eq, lo, -1)


def wordpiece_tokenize(col: Column, vocab, max_tokens: int = 128,
                       unk_token: str = "[UNK]") -> Column:
    """LIST<int32> BERT wordpiece ids: greedy longest-match-first with
    ``##`` continuation prefixes (nvtext::subword_tokenize semantics).

    Host tier: the greedy per-token loop is data-dependent and tiny
    relative to the model compute it feeds; the reference's GPU hash-table
    design (subword_tokenize.cu) targets throughputs the downstream TPU
    embedding lookup doesn't need from a preprocessing step.
    """
    from cudf_tpu.ops.lists import from_pylists

    if isinstance(vocab, Column):
        vocab = {w: i for i, w in enumerate(vocab.to_pylist())}
    unk = vocab.get(unk_token, -1)
    max_word = max((len(w) for w in vocab), default=1)

    def encode_word(w: str) -> List[int]:
        out, start = [], 0
        while start < len(w):
            end = min(len(w), start + max_word)
            cur = None
            while end > start:
                piece = w[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in vocab:
                    cur = vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [unk]
            out.append(cur)
            start = end
        return out

    rows = []
    for v in col.to_pylist():
        if v is None:
            rows.append(None)
            continue
        ids: List[int] = []
        for w in v.split():
            ids.extend(encode_word(w))
            if len(ids) >= max_tokens:
                break
        rows.append(ids[:max_tokens])
    return from_pylists(rows, dtype=dt.INT32)


def byte_pair_encoding(col: Column, merge_pairs, separator: str = " ") -> Column:
    """Apply BPE merges per whitespace token, joining pieces with
    `separator` (nvtext::byte_pair_encoding, byte_pair_encoding.cu).

    Host tier — the merge loop is sequential per token by construction.
    """
    if isinstance(merge_pairs, Column):
        pairs = [tuple(p.split(" ", 1)) for p in merge_pairs.to_pylist()]
    else:
        pairs = [tuple(p) for p in merge_pairs]
    rank = {p: i for i, p in enumerate(pairs)}

    def encode(word: str) -> List[str]:
        parts = list(word)
        while len(parts) > 1:
            best, bi = None, -1
            for i in range(len(parts) - 1):
                r = rank.get((parts[i], parts[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            parts[bi:bi + 2] = [parts[bi] + parts[bi + 1]]
        return parts

    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        toks = []
        for w in v.split():
            toks.extend(encode(w))
        out.append(separator.join(toks))
    return Column.from_strings(out)
