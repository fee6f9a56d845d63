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


# ----------------------------------------------------------------------
# round-2 device span engine: replace/extract/split/count without host
# ----------------------------------------------------------------------

@pytest.fixture
def no_host_map(monkeypatch):
    """Fail the test if the host fallback tier is touched."""
    from cudf_tpu.ops import strings as S

    def boom(*a, **k):
        raise AssertionError("_host_map called — device path did not engage")

    monkeypatch.setattr(S, "_host_map", boom)
    return None


def _scol(vals):
    from cudf_tpu.core.column import Column

    return Column.from_strings(vals)


def test_replace_literal_device(no_host_map):
    from cudf_tpu.ops import strings as S

    vals = ["aXbXc", "XX", "", "noX", "aaa"]
    got = S.replace_literal(_scol(vals), "X", "__").to_pylist()
    assert got == [v.replace("X", "__") for v in vals]
    # n-limited
    got2 = S.replace_literal(_scol(vals), "X", "_", n=1).to_pylist()
    assert got2 == [v.replace("X", "_", 1) for v in vals]
    # self-overlapping pattern stays greedy-left like str.replace
    vals3 = ["aaaa", "aaa", "a"]
    got3 = S.replace_literal(_scol(vals3), "aa", "b").to_pylist()
    assert got3 == [v.replace("aa", "b") for v in vals3]


def test_replace_re_device(no_host_map):
    import re
    from cudf_tpu.ops import strings as S

    vals = ["ab12cd345", "9", "xyz", "", "a1b2c3"]
    got = S.replace_re(_scol(vals), r"\d+", "#").to_pylist()
    assert got == [re.sub(r"\d+", "#", v) for v in vals]
    got2 = S.replace_re(_scol(vals), r"[a-c]+", "<>", n=1).to_pylist()
    assert got2 == [re.sub(r"[a-c]+", "<>", v, count=1) for v in vals]


def test_count_re_device(no_host_map):
    import re
    from cudf_tpu.ops import strings as S

    vals = ["a1b22c333", "no digits", "", "7 8 99"]
    got = S.count_re(_scol(vals), r"\d+").to_pylist()
    assert got == [len(re.findall(r"\d+", v)) for v in vals]


def test_extract_re_device(no_host_map):
    import re
    from cudf_tpu.ops import strings as S

    vals = ["order 123 now", "zero", "x9y88", ""]
    [got] = S.extract_re(_scol(vals), r"(\d+)")
    exp = [(re.search(r"\d+", v).group(0) if re.search(r"\d+", v) else None)
           for v in vals]
    assert got.to_pylist() == exp


def test_split_literal_device(no_host_map):
    from cudf_tpu.ops import strings as S

    vals = ["a,b,c", "x", "", ",lead", "trail,"]
    cols = S.split_expand(_scol(vals), ",")
    exp_parts = [v.split(",") for v in vals]
    width = max(len(p) for p in exp_parts)
    assert len(cols) == width
    for i in range(width):
        exp_i = [p[i] if i < len(p) else None for p in exp_parts]
        assert cols[i].to_pylist() == exp_i


def test_split_regex_device(no_host_map):
    import re
    from cudf_tpu.ops import strings as S

    vals = ["a1b22c", "xx3yy", "nope"]
    cols = S.split_expand(_scol(vals), r"\d+", regex=True)
    exp_parts = [re.split(r"\d+", v) for v in vals]
    width = max(len(p) for p in exp_parts)
    assert len(cols) == width
    for i in range(width):
        exp_i = [p[i] if i < len(p) else None for p in exp_parts]
        assert cols[i].to_pylist() == exp_i


def test_zfill_repeat_device(no_host_map):
    from cudf_tpu.ops import strings as S

    vals = ["42", "-7", "+1", "abc", ""]
    got = S.zfill(_scol(vals), 5).to_pylist()
    assert got == [v.zfill(5) for v in vals]
    got2 = S.repeat_strings(_scol(vals), 3).to_pylist()
    assert got2 == [v * 3 for v in vals]


def test_replace_re_host_fallback_nongreedy():
    """Non-greedy must STILL be correct via the host tier."""
    import re
    from cudf_tpu.ops import strings as S

    vals = ["<a><b>", "<x>"]
    got = S.replace_re(_scol(vals), r"<.+?>", "T").to_pylist()
    assert got == [re.sub(r"<.+?>", "T", v) for v in vals]


def test_series_str_surface_device(no_host_map):
    import pandas as pd
    import cudf_tpu as ct

    pdf = pd.Series(["a1b", "22x", None, "c3d4"])
    s = ct.Series(pdf)
    got = s.str.replace(r"\d+", "#", regex=True).to_pandas()
    pd.testing.assert_series_equal(
        got, pdf.str.replace(r"\d+", "#", regex=True))
    got2 = s.str.count(r"\d").to_pandas()
    pd.testing.assert_series_equal(got2, pdf.str.count(r"\d"), check_dtype=False)
