"""Device regex: host NFA→DFA compile, data-parallel DFA byte scan.

TPU-native replacement for cudf's device regex
(reference: cpp/src/strings/regex/regcomp.cpp, regex.inl — a per-thread
NFA backtracking interpreter tuned for GPU warps).  Backtracking per
string is the wrong shape for SIMD/XLA, so the design here is different:

  1. host: parse with the stdlib's sre parser, build a Thompson NFA over
     the byte alphabet, subset-construct a DFA, and compress bytes into
     equivalence classes (typically < 32 classes);
  2. device: one `lax.scan` over character positions — each step is two
     gathers (byte → class, (state, class) → state) and a mask, identical
     work for every row, branch-free, O(n · maxlen) with tiny constants.

Supported constructs: literals, ``.``, character classes (ranges,
negation, ``\\d \\D \\s \\S \\w \\W``), alternation, groups, ``* + ?``,
bounded ``{m,n}`` (unrolled), ``^``/``$`` anchors at the pattern ends,
``re.IGNORECASE``.  Backreferences, lookaround, and non-ASCII pattern
literals raise ``Unsupported`` → callers fall back to the host tier.

Byte-level caveat: ``.`` and negated classes match each UTF-8 *byte* of a
multibyte character; for containment/anchored predicates this agrees with
character-level semantics in all but pathological patterns (documented in
SURVEY-level parity notes).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # python >= 3.11
    import re._parser as sre_parse
    import re._constants as sre_c
except ImportError:  # pragma: no cover
    import sre_parse
    import sre_constants as sre_c


class Unsupported(Exception):
    """Pattern uses a construct the device engine doesn't cover."""


_ALL = frozenset(range(256))
_NL = frozenset({10})
_DIGIT = frozenset(range(48, 58))
_WORD = _DIGIT | frozenset(range(65, 91)) | frozenset(range(97, 123)) | {95}
_SPACE = frozenset({9, 10, 11, 12, 13, 32})

_CATEGORY = {
    sre_c.CATEGORY_DIGIT: _DIGIT,
    sre_c.CATEGORY_NOT_DIGIT: _ALL - _DIGIT,
    sre_c.CATEGORY_WORD: _WORD,
    sre_c.CATEGORY_NOT_WORD: _ALL - _WORD,
    sre_c.CATEGORY_SPACE: _SPACE,
    sre_c.CATEGORY_NOT_SPACE: _ALL - _SPACE,
}

_MAX_UNROLL = 16       # bounded-repeat expansion cap
_MAX_DFA_STATES = 2048


class _NFA:
    """Thompson NFA: eps edges + byteset edges."""

    def __init__(self):
        self.eps: List[Set[int]] = []
        self.edges: List[List[Tuple[FrozenSet[int], int]]] = []

    def new_state(self) -> int:
        self.eps.append(set())
        self.edges.append([])
        return len(self.eps) - 1

    def add_eps(self, a: int, b: int) -> None:
        self.eps[a].add(b)

    def add_edge(self, a: int, byteset: FrozenSet[int], b: int) -> None:
        self.edges[a].append((byteset, b))


def _swapcase(bs: FrozenSet[int]) -> FrozenSet[int]:
    out = set(bs)
    for b in bs:
        if 65 <= b <= 90:
            out.add(b + 32)
        elif 97 <= b <= 122:
            out.add(b - 32)
    return frozenset(out)


def _in_byteset(items, ignorecase: bool) -> FrozenSet[int]:
    """Byteset for an IN [...] item list."""
    negate = False
    bs: Set[int] = set()
    for op, av in items:
        if op is sre_c.NEGATE:
            negate = True
        elif op is sre_c.LITERAL:
            if av > 127:
                raise Unsupported("non-ASCII literal in class")
            bs.add(av)
        elif op is sre_c.RANGE:
            lo, hi = av
            if hi > 127:
                raise Unsupported("non-ASCII range in class")
            bs.update(range(lo, hi + 1))
        elif op is sre_c.CATEGORY:
            cat = _CATEGORY.get(av)
            if cat is None:
                raise Unsupported(f"category {av}")
            bs.update(cat)
        else:
            raise Unsupported(f"class item {op}")
    out = frozenset(bs)
    if ignorecase:
        out = _swapcase(out)
    if negate:
        out = _ALL - out
    return out


def _compile_tokens(nfa: _NFA, tokens, start: int, ignorecase: bool,
                    pos_info) -> int:
    """Thread tokens onto the NFA from `start`; returns the exit state.

    pos_info is a dict collecting ^/$ anchor flags — anchors are only
    supported at the very ends of the pattern.
    """
    cur = start
    for ti, (op, av) in enumerate(tokens):
        if op is sre_c.LITERAL:
            if av > 127:
                raise Unsupported("non-ASCII literal")
            bs = frozenset({av})
            if ignorecase:
                bs = _swapcase(bs)
            nxt = nfa.new_state()
            nfa.add_edge(cur, bs, nxt)
            cur = nxt
        elif op is sre_c.NOT_LITERAL:
            if av > 127:
                raise Unsupported("non-ASCII literal")
            bs = frozenset({av})
            if ignorecase:
                bs = _swapcase(bs)
            nxt = nfa.new_state()
            nfa.add_edge(cur, _ALL - bs, nxt)
            cur = nxt
        elif op is sre_c.ANY:
            nxt = nfa.new_state()
            nfa.add_edge(cur, _ALL - _NL, nxt)
            cur = nxt
        elif op is sre_c.IN:
            nxt = nfa.new_state()
            nfa.add_edge(cur, _in_byteset(av, ignorecase), nxt)
            cur = nxt
        elif op is sre_c.SUBPATTERN:
            if av[1] or av[2]:
                raise Unsupported("inline flag group")
            cur = _compile_tokens(nfa, av[3], cur, ignorecase, None)
        elif op is sre_c.BRANCH:
            _, branches = av
            join = nfa.new_state()
            for br in branches:
                b_start = nfa.new_state()
                nfa.add_eps(cur, b_start)
                b_end = _compile_tokens(nfa, br, b_start, ignorecase, None)
                nfa.add_eps(b_end, join)
            cur = join
        elif op in (sre_c.MAX_REPEAT, sre_c.MIN_REPEAT):
            if op is sre_c.MIN_REPEAT and _STRICT_SPANS:
                # non-greedy spans differ from DFA longest-match
                raise Unsupported("non-greedy repeat in span mode")
            lo, hi, sub = av
            # greediness is irrelevant for DFA membership
            for _ in range(min(lo, _MAX_UNROLL)):
                cur = _compile_tokens(nfa, sub, cur, ignorecase, None)
            if lo > _MAX_UNROLL:
                raise Unsupported(f"repeat lower bound > {_MAX_UNROLL}")
            if hi == sre_c.MAXREPEAT:
                loop_in = nfa.new_state()
                nfa.add_eps(cur, loop_in)
                loop_out = _compile_tokens(nfa, sub, loop_in, ignorecase, None)
                nfa.add_eps(loop_out, loop_in)
                out = nfa.new_state()
                nfa.add_eps(cur, out)
                nfa.add_eps(loop_out, out)
                cur = out
            else:
                extra = hi - lo
                if extra > _MAX_UNROLL:
                    raise Unsupported(f"repeat span > {_MAX_UNROLL}")
                skip_targets = [cur]
                for _ in range(extra):
                    cur = _compile_tokens(nfa, sub, cur, ignorecase, None)
                    skip_targets.append(cur)
                out = nfa.new_state()
                for s in skip_targets:
                    nfa.add_eps(s, out)
                cur = out
        elif op is sre_c.AT:
            if av is sre_c.AT_BEGINNING:
                if pos_info is None or ti != 0:
                    raise Unsupported("^ not at pattern start")
                pos_info["anchor_start"] = True
            elif av is sre_c.AT_END:
                if pos_info is None or ti != len(tokens) - 1:
                    raise Unsupported("$ not at pattern end")
                pos_info["anchor_end"] = True
            else:
                raise Unsupported(f"anchor {av}")
        else:
            raise Unsupported(f"construct {op}")
    return cur


def _eps_closure(nfa: _NFA, states: FrozenSet[int]) -> FrozenSet[int]:
    seen = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in seen:
                seen.add(t)
                stack.append(t)
    return frozenset(seen)


@lru_cache(maxsize=256)
def compile_dfa(pattern: str, flags: int = 0, search: bool = True):
    """pattern → (table[S, C] int32, accept[S] bool, class_map[256] int32,
    anchor_end, start_accepts).

    ``search=True`` builds the containment automaton (implicit ``.*``
    prefix unless the pattern starts with ``^``).
    """
    if flags & ~(re.IGNORECASE | re.DOTALL):
        raise Unsupported(f"flags {flags}")
    ignorecase = bool(flags & re.IGNORECASE)
    try:
        tokens = list(sre_parse.parse(pattern, flags))
    except re.error as e:
        raise Unsupported(str(e))

    info = {"anchor_start": False, "anchor_end": False}
    nfa = _NFA()
    start = nfa.new_state()
    end = _compile_tokens(nfa, tokens, start, ignorecase, info)
    if flags & re.DOTALL:
        # rebuild with . matching \n: cheap hack — patch edges
        for es in nfa.edges:
            for i, (bs, t) in enumerate(es):
                if bs == _ALL - _NL:
                    es[i] = (_ALL, t)
    if search and not info["anchor_start"]:
        nfa.add_edge(start, _ALL, start)  # implicit .* prefix

    # ---- byte equivalence classes ------------------------------------
    bytesets = {bs for es in nfa.edges for bs, _ in es}
    sig = np.zeros((256,), np.int64)
    for k, bs in enumerate(sorted(bytesets, key=sorted)):
        arr = np.zeros((256,), bool)
        arr[list(bs)] = True
        sig = sig * 2 + arr
        if k > 60:  # signature overflow guard → fall back to identity classes
            sig = np.arange(256)
            break
    _, class_map = np.unique(sig, return_inverse=True)
    n_classes = int(class_map.max()) + 1
    # representative byte per class
    rep = np.zeros((n_classes,), np.int64)
    for b in range(255, -1, -1):
        rep[class_map[b]] = b

    # ---- subset construction ------------------------------------------
    start_set = _eps_closure(nfa, frozenset({start}))
    dfa_index: Dict[FrozenSet[int], int] = {start_set: 0}
    worklist = [start_set]
    table_rows: List[List[int]] = []
    accept: List[bool] = []
    while worklist:
        cur = worklist.pop()
        i = dfa_index[cur]
        while len(table_rows) <= i:
            table_rows.append([0] * n_classes)
            accept.append(False)
        accept[i] = end in cur
        for c in range(n_classes):
            b = int(rep[c])
            nxt = set()
            for s in cur:
                for bs, t in nfa.edges[s]:
                    if b in bs:
                        nxt.add(t)
            nxt_f = _eps_closure(nfa, frozenset(nxt)) if nxt else frozenset()
            j = dfa_index.get(nxt_f)
            if j is None:
                j = len(dfa_index)
                if j >= _MAX_DFA_STATES:
                    raise Unsupported("DFA too large")
                dfa_index[nxt_f] = j
                worklist.append(nxt_f)
            table_rows[i][c] = j
    while len(accept) < len(dfa_index):
        table_rows.append([0] * n_classes)
        accept.append(False)
    # fill rows created late
    for st, i in dfa_index.items():
        accept[i] = end in st

    table = np.asarray(table_rows, np.int32)
    acc = np.asarray(accept, bool)
    return (jnp.asarray(table.reshape(-1)), jnp.asarray(acc),
            jnp.asarray(class_map.astype(np.int32)), n_classes,
            info["anchor_end"], bool(acc[0]))


def _char_matrix(col) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """strings column → (chars[maxlen, n] int32, lens[n])."""
    offs = col.offsets
    n = col.length
    lens = (offs[1:] - offs[:-1]).astype(jnp.int64)
    max_len = max(int(jnp.max(lens)) if n else 0, 1)
    pos = offs[:-1, None] + jnp.arange(max_len, dtype=offs.dtype)[None, :]
    in_range = pos < offs[1:, None]
    src = col.data.astype(jnp.int32)
    chars = jnp.take(src, jnp.clip(pos, 0, max(src.shape[0] - 1, 0)).reshape(-1),
                     mode="clip").reshape(n, max_len)
    chars = jnp.where(in_range, chars, 0)
    return chars.T, lens


def run_predicate(col, pattern: str, flags: int = 0,
                  mode: str = "search") -> jnp.ndarray:
    """bool[n]: does each row satisfy the regex under `mode`
    (search | match | fullmatch)."""
    search = mode == "search"
    table, acc, class_map, n_classes, anchor_end, start_acc = compile_dfa(
        pattern, flags, search=search)
    final_only = anchor_end or mode == "fullmatch"
    chars_T, lens = _char_matrix(col)
    n = col.length

    def step(carry, xs):
        state, hit = carry
        c, j = xs
        cls = jnp.take(class_map, c)
        nxt = jnp.take(table, state * n_classes + cls)
        active = j < lens
        state = jnp.where(active, nxt, state)
        if not final_only:
            hit = hit | (active & jnp.take(acc, state))
        return (state, hit), None

    state0 = jnp.zeros((n,), jnp.int32)
    hit0 = jnp.full((n,), bool(start_acc) and not final_only)
    m = chars_T.shape[0]
    (state, hit), _ = jax.lax.scan(
        step, (state0, hit0),
        (chars_T, jnp.arange(m, dtype=jnp.int64)))
    hit = hit | jnp.take(acc, state)
    if final_only and not anchor_end and mode != "fullmatch":
        pass
    return hit


# ----------------------------------------------------------------------
# span engine: per-start-position longest-match lengths (round 2)
#
# Powers device extract/replace/split/count (reference tracks match spans
# in its NFA interpreter, regex.inl reprog_device::find).  The DFA gives
# LEFTMOST-LONGEST semantics, which equals Python's greedy semantics for
# unambiguous patterns; non-greedy quantifiers raise Unsupported (callers
# host-fallback), as do patterns that can match the empty string.
# ----------------------------------------------------------------------

_STRICT_SPANS = False  # set during compile_spans: reject non-greedy repeats


@lru_cache(maxsize=256)
def compile_spans_dfa(pattern: str, flags: int = 0):
    """Anchored DFA for span scanning.  Raises Unsupported for patterns
    whose DFA longest-match may differ from Python (non-greedy) or that
    match empty."""
    global _STRICT_SPANS
    _STRICT_SPANS = True
    try:
        table, acc, class_map, n_classes, anchor_end, start_acc = compile_dfa(
            pattern, flags, search=False)
    finally:
        _STRICT_SPANS = False
    if start_acc:
        raise Unsupported("pattern matches the empty string")
    return table, acc, class_map, n_classes, anchor_end


def _span_chunk(chars, lens, table, acc, class_map, n_classes, anchor_end,
                anchor_start):
    """matchlen[nc, L] for one row chunk: longest anchored match starting
    at each byte position (-1 = none)."""
    nc, L = chars.shape
    pidx = jnp.arange(L, dtype=jnp.int32)[None, :]

    def step(carry, xs):
        states, matchlen = carry
        c, j = xs
        cls = jnp.take(class_map, c)                      # [nc]
        active = (pidx <= j) & (j < lens[:, None])
        nxt = jnp.take(table, states * n_classes + cls[:, None])
        states = jnp.where(active, nxt, states)
        accepts = jnp.take(acc, states) & active
        if anchor_end:
            accepts = accepts & (j == lens[:, None] - 1)
        matchlen = jnp.where(accepts, j - pidx + 1, matchlen)
        return (states, matchlen), None

    states0 = jnp.zeros((nc, L), jnp.int32)
    ml0 = jnp.full((nc, L), -1, jnp.int32)
    (_, matchlen), _ = jax.lax.scan(
        step, (states0, ml0),
        (chars.T, jnp.arange(L, dtype=jnp.int32)))
    if anchor_start:
        matchlen = jnp.where(pidx == 0, matchlen, -1)
    return matchlen


def match_spans(col, pattern: str, flags: int = 0, max_matches: int = -1,
                chunk_elems: int = 4_000_000):
    """Greedy non-overlapping match spans per row.

    Returns (sel[n, L] bool — span starts, matchlen[n, L] int32, lens[n])
    in BYTE units over the row-major char matrix.  max_matches limits
    selected spans per row (re.sub count semantics); -1 = unlimited.
    """
    table, acc, class_map, n_classes, anchor_end = compile_spans_dfa(
        pattern, flags)
    # recover anchor_start by probing: compile_dfa(search=False) already
    # folds ^ into "no implicit .* prefix"; an explicit ^ means only
    # position 0 may start a match
    anchor_start = pattern.startswith("^")
    chars_T, lens = _char_matrix(col)
    chars = chars_T.T                      # [n, L]
    n, L = chars.shape
    rows_per_chunk = max(1, chunk_elems // max(L, 1))
    parts = []
    for i in range(0, n, rows_per_chunk):
        parts.append(_span_chunk(
            chars[i:i + rows_per_chunk], lens[i:i + rows_per_chunk],
            table, acc, class_map, n_classes, anchor_end, anchor_start))
    matchlen = parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    # greedy left-to-right non-overlapping selection (finditer order)
    def sel_step(carry, xs):
        next_free, count = carry
        ml, p = xs                                        # [n], scalar
        can = (ml > 0) & (p >= next_free)
        if max_matches >= 0:
            can = can & (count < max_matches)
        next_free = jnp.where(can, p + ml, next_free)
        count = count + can.astype(jnp.int32)
        return (next_free, count), can

    (_, _), sel_T = jax.lax.scan(
        sel_step,
        (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32)),
        (matchlen.T, jnp.arange(L, dtype=jnp.int32)))
    return sel_T.T, matchlen, lens
