"""Device regex DFA engine vs python `re` — differential testing over a
pattern corpus and randomized strings (reference behavior:
cpp/src/strings/regex/ regexec semantics for contains/matches)."""

import re

import numpy as np
import pytest

from cudf_tpu.core.column import Column
from cudf_tpu.ops import regex_engine as rex
from cudf_tpu.ops import strings as str_ops

PATTERNS = [
    r"abc",
    r"a.c",
    r"^ab",
    r"bc$",
    r"^abc$",
    r"a*b",
    r"a+b",
    r"ab?c",
    r"[abc]+",
    r"[^abc]",
    r"[a-f0-9]+",
    r"\d+",
    r"\D\d",
    r"\w+@\w+",
    r"\s",
    r"\S+",
    r"(ab|cd)e",
    r"x(yz)*",
    r"a{2,4}",
    r"(a|b){1,3}c",
    r"^\d{3}-\d{4}$",
    r"foo|bar|baz",
    r"[A-Z][a-z]*",
    r"a.*z",
    r".*",
    r"colou?r",
]

STRINGS = [
    "", "a", "ab", "abc", "abcd", "aabc", "xabcz", "aaab", "b",
    "123", "123-4567", "x123-4567", "a1b2c3", "hello world",
    "foo", "foobar", "bazz", "colour", "color", "colr",
    "user@host", "no at sign", "   ", "\tws", "Az", "Hello",
    "aaaa", "aaaaab", "xyzyz", "x", "deadbeef", "DEADBEEF",
]


@pytest.fixture(scope="module")
def col():
    return Column.from_strings(STRINGS)


@pytest.mark.parametrize("pat", PATTERNS)
def test_search_vs_re(col, pat):
    got = np.asarray(rex.run_predicate(col, pat, 0, "search")).tolist()
    expect = [re.search(pat, s) is not None for s in STRINGS]
    assert got == expect, pat


@pytest.mark.parametrize("pat", PATTERNS)
def test_match_vs_re(col, pat):
    got = np.asarray(rex.run_predicate(col, pat, 0, "match")).tolist()
    expect = [re.match(pat, s) is not None for s in STRINGS]
    assert got == expect, pat


@pytest.mark.parametrize("pat", [r"abc", r"a.*z", r"[a-c]+", r"\w+", r"a{2,4}"])
def test_fullmatch_vs_re(col, pat):
    got = np.asarray(rex.run_predicate(col, pat, 0, "fullmatch")).tolist()
    expect = [re.fullmatch(pat, s) is not None for s in STRINGS]
    assert got == expect, pat


def test_ignorecase(col):
    got = np.asarray(rex.run_predicate(col, r"dead[b-f]+", re.IGNORECASE, "search")).tolist()
    expect = [re.search(r"dead[b-f]+", s, re.IGNORECASE) is not None for s in STRINGS]
    assert got == expect


def test_randomized(rng):
    strs = ["".join(rng.choice(list("abcxyz012 .-"), size=rng.integers(0, 25)))
            for _ in range(200)]
    c = Column.from_strings(strs)
    for pat in [r"[abc]{2,3}[xyz]", r"\d+\s*-", r"^a.*2$", r"(ab|0x)+"]:
        got = np.asarray(rex.run_predicate(c, pat, 0, "search")).tolist()
        expect = [re.search(pat, s) is not None for s in strs]
        assert got == expect, pat


def test_unsupported_falls_back():
    with pytest.raises(rex.Unsupported):
        rex.compile_dfa(r"(a)\1", 0)  # backreference
    with pytest.raises(rex.Unsupported):
        rex.compile_dfa(r"a(?=b)", 0)  # lookahead
    # public entry point silently takes the host tier
    c = Column.from_strings(["aa", "ab"])
    out = str_ops.contains_re(c, r"(a)\1")
    assert out.to_pylist() == [True, False]


def test_strings_entry_points_use_device():
    c = Column.from_strings(["abc", "xyz", None, "aabbcc"])
    out = str_ops.contains_re(c, r"b{2}")
    assert out.to_pylist() == [False, False, None, True]
    out = str_ops.match_re(c, r"[ab]+")
    assert out.to_pylist() == [True, False, None, True]
    out = str_ops.fullmatch_re(c, r"[a-c]+")
    assert out.to_pylist() == [True, False, None, True]


def test_series_str_api():
    import cudf_tpu as ct

    s = ct.Series(["apple-1", "banana", "cherry-22"])
    got = s.str.contains(r"-\d+$").to_pandas().tolist()
    assert got == [True, False, True]
