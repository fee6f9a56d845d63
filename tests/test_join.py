import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


def _cmp_merge(gl, gr, pl, pr, sort_cols, **kw):
    got = ct.merge(gl, gr, **kw).to_pandas()
    expect = pd.merge(pl, pr, **kw)
    got = got.sort_values(sort_cols).reset_index(drop=True)
    expect = expect.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], expect[sorted(expect.columns)],
                                  check_dtype=False)


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_merge_vs_pandas(how, rng):
    pl = pd.DataFrame({"k": rng.integers(0, 50, 300), "a": rng.normal(size=300)})
    pr = pd.DataFrame({"k": rng.integers(0, 50, 200), "b": rng.normal(size=200)})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    _cmp_merge(gl, gr, pl, pr, ["k", "a", "b"], on="k", how=how)


def test_merge_multi_key(rng):
    pl = pd.DataFrame({"a": rng.integers(0, 5, 100), "b": rng.integers(0, 5, 100),
                       "x": np.arange(100)})
    pr = pd.DataFrame({"a": rng.integers(0, 5, 80), "b": rng.integers(0, 5, 80),
                       "y": np.arange(80)})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    _cmp_merge(gl, gr, pl, pr, ["a", "b", "x", "y"], on=["a", "b"], how="inner")


def test_merge_string_keys(rng):
    pl = pd.DataFrame({"k": rng.choice(["aa", "b", "ccc", "dd"], 100), "x": np.arange(100)})
    pr = pd.DataFrame({"k": ["aa", "ccc", "e"], "y": [1, 2, 3]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    _cmp_merge(gl, gr, pl, pr, ["k", "x"], on="k", how="left")


def test_merge_null_keys_equal():
    """pandas (and cudf: null_equality::EQUAL, join.py:58) matches NaN
    keys to NaN keys in merges."""
    pl = pd.DataFrame({"k": [1.0, None, 3.0], "x": [1, 2, 3]})
    pr = pd.DataFrame({"k": [1.0, None], "y": [10, 20]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = ct.merge(gl, gr, on="k", how="inner").to_pandas()
    expect = pd.merge(pl, pr, on="k", how="inner")
    assert len(got) == len(expect) == 2
    assert sorted(got["x"].tolist()) == sorted(expect["x"].tolist())
    assert sorted(got["y"].tolist()) == sorted(expect["y"].tolist())


def test_merge_null_keys_equal_int_extension():
    """Int64 extension nulls (<NA>) pair up too — validity-mask path."""
    pl = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                       "x": [1, 2, 3]})
    pr = pd.DataFrame({"k": pd.array([None, 1], dtype="Int64"),
                       "y": [10, 20]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    for how in ("inner", "left", "outer"):
        got = ct.merge(gl, gr, on="k", how=how).to_pandas()
        expect = pd.merge(pl, pr, on="k", how=how)
        assert len(got) == len(expect), how
        assert (sorted(got["x"].fillna(-9).tolist())
                == sorted(expect["x"].fillna(-9).tolist())), how


def test_merge_null_keys_equal_multikey():
    """Multi-key: null==null per column, but (1, null) != (2, null)."""
    pl = pd.DataFrame({"a": [1, 2, 1], "b": [None, None, 7.0],
                       "x": [0, 1, 2]})
    pr = pd.DataFrame({"a": [1, 2, 3], "b": [None, 5.0, None],
                       "y": [10, 20, 30]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = ct.merge(gl, gr, on=["a", "b"], how="inner").to_pandas()
    expect = pd.merge(pl, pr, on=["a", "b"], how="inner")
    assert sorted(got["x"].tolist()) == sorted(expect["x"].tolist()) == [0]


def test_merge_left_on_right_on(rng):
    pl = pd.DataFrame({"lk": rng.integers(0, 10, 50), "x": np.arange(50)})
    pr = pd.DataFrame({"rk": rng.integers(0, 10, 40), "y": np.arange(40)})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    _cmp_merge(gl, gr, pl, pr, ["lk", "x", "y"], left_on="lk", right_on="rk", how="inner")


def test_merge_suffixes():
    pl = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    pr = pd.DataFrame({"k": [1, 2], "v": [30, 40]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = ct.merge(gl, gr, on="k").to_pandas()
    assert set(got.columns) == {"k", "v_x", "v_y"}


def test_cross_join():
    gl = ct.DataFrame({"a": [1, 2]})
    gr = ct.DataFrame({"b": [10, 20, 30]})
    got = ct.merge(gl, gr, how="cross")
    assert len(got) == 6


def test_semi_anti_join(rng):
    pl = pd.DataFrame({"k": [1, 2, 3, 4], "x": [1, 2, 3, 4]})
    pr = pd.DataFrame({"k": [2, 4, 5]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    semi = ct.merge(gl, gr, on="k", how="semi").to_pandas()
    anti = ct.merge(gl, gr, on="k", how="anti").to_pandas()
    assert semi["k"].tolist() == [2, 4]
    assert anti["k"].tolist() == [1, 3]


def test_join_on_index():
    pl = pd.DataFrame({"a": [1, 2, 3]}, index=[10, 20, 30])
    pr = pd.DataFrame({"b": [4, 5]}, index=[20, 30])
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = gl.join(gr).to_pandas()
    expect = pl.join(pr)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_merge_duplicate_keys():
    pl = pd.DataFrame({"k": [1, 1, 2], "x": [1, 2, 3]})
    pr = pd.DataFrame({"k": [1, 1], "y": [10, 20]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = ct.merge(gl, gr, on="k").to_pandas()
    assert len(got) == 4  # 2x2 multiplicity


def test_dense_fast_path_matches_general(rng):
    from cudf_tpu.utils.config import option_context

    # unique dense build side, shape that qualifies for the fast path
    rkeys = rng.permutation(500).astype("int64")
    pl = pd.DataFrame({"k": rng.integers(-10, 520, 400), "lv": np.arange(400)})
    pr = pd.DataFrame({"k": rkeys, "rv": np.arange(500)})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    with option_context("join.dense_fast_path", True):
        got = gl.merge(gr, on="k").to_pandas()
    with option_context("join.dense_fast_path", False):
        want = gl.merge(gr, on="k").to_pandas()
    expect = pl.merge(pr, on="k")
    key = lambda d: d.sort_values(["k", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got), key(expect), check_dtype=False)
    pd.testing.assert_frame_equal(key(got), key(want), check_dtype=False)


def test_dense_fast_path_rejects_duplicates(rng):
    # duplicate build keys must fall back and keep multiplicity
    pl = pd.DataFrame({"k": rng.integers(0, 50, 300)})
    pr = pd.DataFrame({"k": rng.integers(0, 50, 200), "rv": np.arange(200)})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = gl.merge(gr, on="k")
    expect = pl.merge(pr, on="k")
    assert len(got) == len(expect)


def test_dense_fast_path_with_nulls():
    pl = pd.DataFrame({"k": pd.array([1, None, 3, 700], dtype="Int64")})
    pl = pd.concat([pl] * 20, ignore_index=True)  # pass the nl >= 64 gate
    pr = pd.DataFrame({"k": pd.array(list(range(100)), dtype="Int64"),
                       "rv": list(range(100))})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = gl.merge(gr, on="k").to_pandas()
    expect = pl.merge(pr, on="k")
    assert len(got) == len(expect) == 40  # nulls and 700 never match
    assert set(got["k"].astype(int)) == {1, 3}


def test_hash_join_object_reuse(rng):
    """Build-once-probe-many (hash_join.hpp:70)."""
    from cudf_tpu.core.column import Column
    from cudf_tpu.ops.join import DistinctHashJoin, HashJoin

    rk = rng.integers(0, 50, 80)
    hj = HashJoin([Column.from_numpy(rk)])
    for trial in range(3):
        lk = rng.integers(0, 60, 120)
        li, ri = hj.inner_join([Column.from_numpy(lk)])
        exp = pd.merge(pd.DataFrame({"k": lk, "i": np.arange(120)}),
                       pd.DataFrame({"k": rk, "j": np.arange(80)}), on="k")
        assert len(li) == len(exp)
        got = set(zip(np.asarray(li).tolist(), np.asarray(ri).tolist()))
        assert got == set(zip(exp["i"], exp["j"]))
        sel = np.asarray(hj.semi_join([Column.from_numpy(lk)]))
        assert set(sel.tolist()) == set(exp["i"].unique().tolist())
    # distinct (unique build keys): probe-aligned single matches
    ru = rng.permutation(100)[:40]
    dhj = DistinctHashJoin([Column.from_numpy(ru)])
    lk = rng.integers(0, 100, 200)
    li, ri = dhj.inner_join([Column.from_numpy(lk)])
    rmap = {k: j for j, k in enumerate(ru.tolist())}
    exp_pairs = [(i, rmap[k]) for i, k in enumerate(lk.tolist()) if k in rmap]
    assert list(zip(np.asarray(li).tolist(), np.asarray(ri).tolist())) == exp_pairs


def test_radix_kernel_tier_through_merge(rng):
    """VERDICT r2 item 1: the radix/MXU join kernel reachable from the
    public DataFrame.merge API (dispatch of hash_join.cu:123-125)."""
    import cudf_tpu
    from cudf_tpu.utils.config import get_option, set_option

    old = [get_option("join.kernel_interpret"),
           get_option("join.fast_path_min_rows")]
    set_option("join.kernel_interpret", True)
    set_option("join.fast_path_min_rows", 1000)
    try:
        nl, nr, dom = 20_000, 10_000, 40_000
        rk = rng.permutation(dom)[:nr].astype(np.int64)
        lk = rng.integers(0, dom, nl).astype(np.int64)
        pl_ = pd.DataFrame({"k": lk, "x": rng.normal(size=nl)})
        pr = pd.DataFrame({"k": rk, "y": rng.normal(size=nr)})
        got = cudf_tpu.DataFrame.from_pandas(pl_).merge(
            cudf_tpu.DataFrame.from_pandas(pr), on="k").to_pandas()
        exp = pl_.merge(pr, on="k")
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True))
    finally:
        set_option("join.kernel_interpret", old[0])
        set_option("join.fast_path_min_rows", old[1])


def test_swapped_build_side_through_merge(rng):
    """dim.merge(fact): the build side is the LEFT (unique) table — the
    fast tiers must probe from the right and restore pandas left-row
    order (hash_join.cu builds on the smaller table the same way)."""
    import cudf_tpu
    from cudf_tpu.utils.config import get_option, set_option

    old = [get_option("join.kernel_interpret"),
           get_option("join.fast_path_min_rows")]
    set_option("join.kernel_interpret", True)
    set_option("join.fast_path_min_rows", 1000)
    try:
        ndim, nfact, dom = 8_000, 30_000, 20_000
        dk = rng.permutation(dom)[:ndim].astype(np.int64)
        fk = rng.integers(0, dom, nfact).astype(np.int64)  # duplicates
        pdim = pd.DataFrame({"k": dk, "dv": rng.normal(size=ndim)})
        pfact = pd.DataFrame({"k": fk, "fv": np.arange(nfact)})
        got = ct.DataFrame.from_pandas(pdim).merge(
            ct.DataFrame.from_pandas(pfact), on="k").to_pandas()
        exp = pdim.merge(pfact, on="k")
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True))
    finally:
        set_option("join.kernel_interpret", old[0])
        set_option("join.fast_path_min_rows", old[1])


def test_swapped_dense_build_side(rng):
    """Same swap on the dense direct-address tier (CPU path)."""
    from cudf_tpu.utils.config import option_context

    dk = rng.permutation(600).astype("int64")[:500]
    fk = rng.integers(-10, 620, 4000)
    pdim = pd.DataFrame({"k": dk, "dv": np.arange(500)})
    pfact = pd.DataFrame({"k": fk, "fv": np.arange(4000)})
    gl, gr = ct.DataFrame.from_pandas(pdim), ct.DataFrame.from_pandas(pfact)
    with option_context("join.dense_fast_path", True,
                        "join.radix_fast_path", False):
        got = gl.merge(gr, on="k").to_pandas()
    exp = pdim.merge(pfact, on="k")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)


def test_multi_fanout_kernel_tier_through_merge(rng):
    """Bounded build-side fan-out through the public merge: stacked
    ordinal tables + count-then-allocate expansion, pandas-exact order."""
    from cudf_tpu.utils.config import get_option, set_option

    old = [get_option("join.kernel_interpret"),
           get_option("join.fast_path_min_rows")]
    set_option("join.kernel_interpret", True)
    set_option("join.fast_path_min_rows", 1000)
    try:
        nl, dom = 15_000, 9_000
        base = rng.permutation(dom)[:3000].astype(np.int64)
        rk = np.concatenate([base, base[:1200], base[:300], base[:50]])
        rng.shuffle(rk)
        lk = rng.integers(0, dom, nl).astype(np.int64)
        pl_ = pd.DataFrame({"k": lk, "x": rng.normal(size=nl)})
        pr = pd.DataFrame({"k": rk, "y": np.arange(len(rk))})
        got = ct.DataFrame.from_pandas(pl_).merge(
            ct.DataFrame.from_pandas(pr), on="k").to_pandas()
        exp = pl_.merge(pr, on="k")
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True))
    finally:
        set_option("join.kernel_interpret", old[0])
        set_option("join.fast_path_min_rows", old[1])


def test_dict_code_pair_joins(rng):
    """Dictionary/categorical keys join through shared-space int32 codes
    (ops/join.py _dict_code_pair): the smaller side's dictionary is
    remapped, values absent from the large dictionary never match."""
    lv = rng.choice(["apple", "pear", "fig", "kiwi", "plum"], 400)
    rv = ["pear", "kiwi", "mango", "fig"]  # mango absent on the left
    pl = pd.DataFrame({"k": pd.Categorical(lv), "x": np.arange(400)})
    pr = pd.DataFrame({"k": pd.Categorical(rv), "y": [1, 2, 3, 4]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    for how in ("inner", "left"):
        got = ct.merge(gl, gr, on="k", how=how).to_pandas()
        expect = pd.merge(pl.assign(k=pl.k.astype(str)),
                          pr.assign(k=pr.k.astype(str)), on="k", how=how)
        got = got.sort_values(["x", "y"]).reset_index(drop=True)
        expect = expect.sort_values(["x", "y"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)].astype({"k": str}),
            expect[sorted(expect.columns)], check_dtype=False)


def test_dict_code_pair_null_and_unmatched(rng):
    """Null categorical rows pair up (pandas/cudf null-equal merges);
    two distinct left-only values sharing the -1 recode sentinel do not
    cross-match anything (the -1 codes live on one side only)."""
    pl = pd.DataFrame({"k": pd.Categorical(["a", None, "zz", "qq", "b"]),
                       "x": [0, 1, 2, 3, 4]})
    pr = pd.DataFrame({"k": pd.Categorical(["b", "a", None]),
                       "y": [10, 20, 30]})
    gl, gr = ct.DataFrame.from_pandas(pl), ct.DataFrame.from_pandas(pr)
    got = ct.merge(gl, gr, on="k", how="inner").to_pandas()
    expect = pd.merge(pl.assign(k=pl.k.astype(object)),
                      pr.assign(k=pr.k.astype(object)), on="k", how="inner")
    assert sorted(got["x"].tolist()) == sorted(expect["x"].tolist())
    assert sorted(got["y"].tolist()) == sorted(expect["y"].tolist())
