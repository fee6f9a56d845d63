import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq

DATA = ["hello", "World", "", None, "TEST case", "ümlaut", "a b c", "123", "-45"]


@pytest.fixture
def pair():
    ps = pd.Series(DATA)
    return ct.Series(ps), ps


@pytest.mark.parametrize("meth", ["lower", "upper", "capitalize", "title",
                                  "swapcase", "strip", "lstrip", "rstrip"])
def test_case_strip(pair, meth):
    g, p = pair
    assert_eq(getattr(g.str, meth)(), getattr(p.str, meth)())


def test_len(pair):
    g, p = pair
    assert_eq(g.str.len(), p.str.len(), check_dtype=False)


@pytest.mark.parametrize("meth,arg", [
    ("startswith", "he"), ("endswith", "d"), ("contains", "es"), ("find", "l"),
])
def test_predicates(pair, meth, arg):
    g, p = pair
    assert_eq(getattr(g.str, meth)(arg), getattr(p.str, meth)(arg), check_dtype=False)


@pytest.mark.parametrize("sl", [(0, 3), (1, None), (None, -1), (-3, None)])
def test_slice(pair, sl):
    g, p = pair
    assert_eq(g.str.slice(*sl), p.str.slice(*sl))


def test_contains_regex(pair):
    g, p = pair
    assert_eq(g.str.contains(r"\d+"), p.str.contains(r"\d+"), check_dtype=False)


def test_replace(pair):
    g, p = pair
    assert_eq(g.str.replace("l", "L", regex=False), p.str.replace("l", "L", regex=False))
    assert_eq(g.str.replace(r"\d", "#", regex=True), p.str.replace(r"\d", "#", regex=True))


def test_pad(pair):
    g, p = pair
    assert_eq(g.str.rjust(8), p.str.rjust(8))
    assert_eq(g.str.ljust(8, "."), p.str.ljust(8, "."))
    assert_eq(g.str.center(9, "*"), p.str.center(9, "*"))


def test_cat_sep():
    g = ct.Series(["a", "b"])
    assert g.str.cat(ct.Series(["x", "y"]), sep="-").tolist() == ["a-x", "b-y"]


@pytest.mark.parametrize("meth", ["isdigit", "isalpha", "isalnum", "isspace",
                                  "isupper", "islower"])
def test_charclass(pair, meth):
    g, p = pair
    assert_eq(getattr(g.str, meth)(), getattr(p.str, meth)(), check_dtype=False)


def test_split_expand():
    ps = pd.Series(["a b c", "x y", None])
    g = ct.Series(ps)
    got = g.str.split(" ", expand=True).to_pandas()
    expect = ps.str.split(" ", expand=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, check_names=False)


def test_extract():
    ps = pd.Series(["a1", "b22", "c"])
    g = ct.Series(ps)
    got = g.str.extract(r"([a-z])(\d+)").to_pandas()
    expect = ps.str.extract(r"([a-z])(\d+)")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, check_names=False)


def test_count(pair):
    g, p = pair
    assert_eq(g.str.count("l"), p.str.count("l"), check_dtype=False)


def test_numeric_cast_roundtrip():
    s = ct.Series(["1", "-42", "300"])
    assert s.astype("int64").tolist() == [1, -42, 300]
    back = s.astype("int64").astype("str")
    assert back.tolist() == ["1", "-42", "300"]


def test_float_format():
    s = ct.Series([1.5, -2.25])
    assert s.astype("str").tolist() == ["1.5", "-2.25"]


# ----------------------------------------------------------------------
# round-2 device Unicode case tier
# ----------------------------------------------------------------------

def test_unicode_case_device(monkeypatch):
    from cudf_tpu.core.column import Column
    from cudf_tpu.ops import strings as S

    def boom(*a, **k):
        raise AssertionError("_host_map called — device case did not engage")

    monkeypatch.setattr(S, "_host_map", boom)
    # no ß/ligatures: expanding mappings legitimately take the host tier
    vals = ["Grüne", "ΑΒΓαβγ", "ёЖик", "café", "mixedCASE", "日本語ab"]
    col = Column.from_strings(vals)
    assert S.lower(col).to_pylist() == [v.lower() for v in vals]
    assert S.upper(col).to_pylist() == [v.upper() for v in vals]
    assert S.swapcase(col).to_pylist() == [v.swapcase() for v in vals]
    assert S.capitalize(col).to_pylist() == [v.capitalize() for v in vals]
    assert S.title(col).to_pylist() == [v.title() for v in vals]


def test_unicode_case_expanding_falls_back():
    """ß→SS expands: host tier must be used and stay correct."""
    from cudf_tpu.core.column import Column
    from cudf_tpu.ops import strings as S

    vals = ["straße", "ß"]
    col = Column.from_strings(vals)
    assert S.upper(col).to_pylist() == [v.upper() for v in vals]


def test_unicode_title_ascii_words():
    from cudf_tpu.core.column import Column
    from cudf_tpu.ops import strings as S

    vals = ["hello world", "they're", "abc3de", "ALL CAPS"]
    col = Column.from_strings(vals)
    assert S.title(col).to_pylist() == [v.title() for v in vals]


def test_unicode_char_classes_device(monkeypatch):
    from cudf_tpu.core.column import Column
    from cudf_tpu.ops import strings as S

    def boom(*a, **k):
        raise AssertionError("_host_map called — device class did not engage")

    monkeypatch.setattr(S, "_host_map", boom)
    vals = ["١٢٣", "Ⅻ", "²³", "abcé", "ΑΒΓ", "αβγ", "abc123é", "  ", "日本語"]
    col = Column.from_strings(vals)
    for kind in ("isdigit", "isdecimal", "isnumeric", "isalpha", "isalnum",
                 "isupper", "islower"):
        got = getattr(S, kind)(col).to_pylist()
        exp = [getattr(v, kind)() for v in vals]
        assert got == exp, (kind, got, exp)
