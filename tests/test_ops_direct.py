"""Direct kernel-layer tests (the pylibcudf-level surface, SURVEY §2.4) —
ops exercised against numpy/pyarrow references, bypassing the frame API."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.core import dtypes as dt
from cudf_tpu.ops import (
    copying, replace as replace_ops, scan as scan_ops, search as search_ops,
    sort as sort_ops, stream_compaction as sc, unary, binaryop,
)


# ------------------------- copying -------------------------

def test_gather_nullify_oob():
    c = Column.from_sequence([10, 20, 30])
    out = copying.gather(c, jnp.asarray([2, 5, -1, 0]))
    assert out.to_pylist() == [30, None, None, 10]


def test_scatter():
    tgt = Column.from_sequence([0, 0, 0, 0])
    src = Column.from_sequence([7, 8])
    out = copying.scatter(src, jnp.asarray([3, 1]), tgt)
    assert out.to_pylist() == [0, 8, 0, 7]


def test_scatter_strings():
    tgt = Column.from_strings(["a", "b", "c"])
    src = Column.from_strings(["XX"])
    out = copying.scatter(src, jnp.asarray([1]), tgt)
    assert out.to_pylist() == ["a", "XX", "c"]


def test_split():
    c = Column.from_sequence(list(range(10)))
    parts = copying.split(c, [3, 7])
    assert [p.to_pylist() for p in parts] == [[0, 1, 2], [3, 4, 5, 6], [7, 8, 9]]


def test_shift_fill():
    c = Column.from_sequence([1, 2, 3, 4])
    assert copying.shift(c, 2, fill_value=0).to_pylist() == [0, 0, 1, 2]
    assert copying.shift(c, -1).to_pylist() == [2, 3, 4, None]


def test_repeat_counts():
    c = Column.from_sequence([7, 8])
    assert copying.repeat(c, jnp.asarray([2, 3])).to_pylist() == [7, 7, 8, 8, 8]


def test_interleave_tile_sequence_reverse():
    a = Column.from_sequence([1, 3])
    b = Column.from_sequence([2, 4])
    assert copying.interleave_columns([a, b]).to_pylist() == [1, 2, 3, 4]
    assert copying.tile(a, 2).to_pylist() == [1, 3, 1, 3]
    assert copying.sequence(4, 10, 5).to_pylist() == [10, 15, 20, 25]
    assert copying.reverse(a).to_pylist() == [3, 1]


def test_copy_if_else():
    l = Column.from_sequence([1, 2, 3])
    r = Column.from_sequence([10, 20, 30])
    out = copying.copy_if_else(jnp.asarray([True, False, True]), l, r)
    assert out.to_pylist() == [1, 20, 3]


# ------------------------- replace -------------------------

def test_ffill_bfill_limits():
    c = Column.from_sequence([1, None, None, 4, None])
    assert replace_ops.ffill(c).to_pylist() == [1, 1, 1, 4, 4]
    assert replace_ops.bfill(c).to_pylist() == [1, 4, 4, 4, None]
    assert replace_ops.ffill(c, limit=1).to_pylist() == [1, 1, None, 4, 4]


def test_replace_values():
    c = Column.from_sequence([1, 2, 3, 2])
    out = replace_ops.replace_values(
        c, Column.from_sequence([2, 3]), Column.from_sequence([20, 30])
    )
    assert out.to_pylist() == [1, 20, 30, 20]


def test_clamp_nans_to_nulls():
    c = Column.from_sequence([1.0, float("nan"), 5.0])
    assert replace_ops.clamp(c, 2.0, 4.0).to_pylist()[2] == 4.0
    nn = replace_ops.nans_to_nulls(c)
    assert nn.null_count == 1


# ------------------------- search -------------------------

def test_lower_upper_bound():
    hay = Column.from_sequence([1, 3, 3, 5])
    needles = Column.from_sequence([0, 3, 6])
    lo = search_ops.lower_bound(hay, needles)
    hi = search_ops.upper_bound(hay, needles)
    assert np.asarray(lo).tolist() == [0, 1, 4]
    assert np.asarray(hi).tolist() == [0, 3, 4]


def test_contains_strings():
    hay = Column.from_strings(["aa", "bb"])
    needles = Column.from_strings(["bb", "cc", "aa"])
    assert np.asarray(search_ops.contains(hay, needles)).tolist() == [True, False, True]


# ------------------------- scans -------------------------

def test_scan_ops_vs_pandas(rng):
    s = pd.Series(rng.integers(0, 10, 50).astype("int64"))
    c = Column.from_numpy(s.to_numpy())
    assert scan_ops.cummax(c).to_pylist() == s.cummax().tolist()
    assert scan_ops.cummin(c).to_pylist() == s.cummin().tolist()
    assert scan_ops.cumcount(c).to_pylist() == list(range(1, 51))


# ------------------------- sort extras -------------------------

def test_top_k():
    c = Column.from_sequence([5, 1, 9, 3, 7])
    assert sort_ops.top_k(c, 2).to_pylist() == [9, 7]
    assert sort_ops.top_k(c, 2, largest=False).to_pylist() == [1, 3]


def test_segmented_sort_indices():
    seg = jnp.asarray([0, 0, 0, 1, 1])
    vals = Column.from_sequence([3, 1, 2, 9, 8])
    order = sort_ops.segmented_sort_indices(seg, [vals])
    out = copying.gather(vals, order, bounds_check=False)
    assert out.to_pylist() == [1, 2, 3, 8, 9]


# ------------------------- stream compaction -------------------------

def test_unique_adjacent():
    c = Column.from_sequence([1, 1, 2, 2, 2, 1])
    assert sc.unique(c).to_pylist() == [1, 2, 1]


def test_approx_distinct_count(rng):
    vals = rng.integers(0, 5000, 50_000)
    c = Column.from_numpy(vals)
    est = sc.approx_distinct_count(c)
    true = len(np.unique(vals))
    assert abs(est - true) / true < 0.1


# ------------------------- unary / binary extras -------------------------

def test_unary_math(rng):
    x = np.abs(rng.normal(size=40)) + 0.1
    c = Column.from_numpy(x)
    np.testing.assert_allclose(np.asarray(unary.unary_operation(c, "log").data),
                               np.log(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(unary.unary_operation(c, "sqrt").data),
                               np.sqrt(x), rtol=1e-6)


def test_null_equals_and_null_max():
    a = Column.from_sequence([1, None, 3])
    b = Column.from_sequence([1, None, 4])
    eq = binaryop.binary_operation(a, b, "null_equals")
    assert eq.to_pylist() == [True, True, False]
    mx = binaryop.binary_operation(a, b, "null_max")
    assert mx.to_pylist() == [1, None, 4]


def test_temporal_cast_units():
    arr = np.array(["2021-01-01T00:00:00.123456789"], dtype="datetime64[ns]")
    c = Column.from_numpy(arr)
    us = unary.cast(c, dt.TIMESTAMP_US)
    assert np.asarray(us.data)[0] == arr.astype("datetime64[us]").astype(np.int64)[0]


# ------------------------- table ops -------------------------

def test_table_select_drop_insert():
    t = Table({"a": Column.from_sequence([1]), "b": Column.from_sequence([2])})
    assert t.select(["b"]).names == ("b",)
    assert t.drop(["a"]).names == ("b",)
    t2 = t.insert("c", Column.from_sequence([3]))
    assert t2.names == ("a", "b", "c")
    assert t2.rename({"a": "x"}).names == ("x", "b", "c")


def test_merge_sorted():
    from cudf_tpu.ops.join import merge_sorted

    a = Column.from_sequence([1, 4, 9])
    b = Column.from_sequence([2, 3, 10])
    order = merge_sorted([[a], [b]])
    merged = copying.gather(copying.concatenate([a, b]), order, bounds_check=False)
    assert merged.to_pylist() == [1, 2, 3, 4, 9, 10]


# ------------------------- mixed joins -------------------------

def _pred_lt(lvals, rvals):
    import jax.numpy as jnp
    from cudf_tpu.ops import join as join_ops

    def pred(li, ri):
        return jnp.take(lvals, li) < jnp.take(rvals, ri)
    return pred


def test_mixed_inner_join():
    import jax.numpy as jnp
    from cudf_tpu.ops import join as join_ops

    lk = Column.from_sequence([1, 1, 2, 3])
    rk = Column.from_sequence([1, 2, 2, 4])
    lv = jnp.asarray([10.0, 99.0, 5.0, 0.0])
    rv = jnp.asarray([50.0, 6.0, 4.0, 1.0])
    li, ri = join_ops.mixed_inner_join([lk], [rk], _pred_lt(lv, rv))
    pairs = sorted(zip(np.asarray(li).tolist(), np.asarray(ri).tolist()))
    # equality pairs: (0,0),(1,0),(2,1),(2,2); predicate lv<rv keeps (0,0),(2,1)
    assert pairs == [(0, 0), (2, 1)]


def test_mixed_left_and_semi_anti():
    import jax.numpy as jnp
    from cudf_tpu.ops import join as join_ops

    lk = Column.from_sequence([1, 1, 2, 3])
    rk = Column.from_sequence([1, 2, 2, 4])
    lv = jnp.asarray([10.0, 99.0, 5.0, 0.0])
    rv = jnp.asarray([50.0, 6.0, 4.0, 1.0])
    pred = _pred_lt(lv, rv)
    li, ri = join_ops.mixed_left_join([lk], [rk], pred)
    got = sorted(zip(np.asarray(li).tolist(), np.asarray(ri).tolist()))
    assert got == [(0, 0), (1, -1), (2, 1), (3, -1)]
    semi = sorted(np.asarray(join_ops.mixed_semi_join([lk], [rk], pred)).tolist())
    anti = sorted(np.asarray(join_ops.mixed_anti_join([lk], [rk], pred)).tolist())
    assert semi == [0, 2] and anti == [1, 3]


def test_lower_bound_string_chunk_mismatch():
    # haystack max len 2 (1 chunk), needles max len 20 (3 chunks):
    # operand layouts must be aligned, not zip-truncated
    hay = Column.from_strings(["aa", "bb", "zz"])
    needles = Column.from_strings(["bb", "bbbbbbbbbbbbbbbbbbbb", "a", "zz"])
    lo = np.asarray(search_ops.lower_bound(hay, needles)).tolist()
    assert lo == [1, 2, 0, 2]
    got = np.asarray(search_ops.contains(hay, needles)).tolist()
    assert got == [True, False, False, True]


def test_lower_bound_null_flag_mismatch():
    hay = Column.from_sequence([1, 3, 5])          # no nulls
    needles = Column.from_sequence([0, 3, None])   # has nulls
    lo = np.asarray(search_ops.lower_bound(hay, needles)).tolist()
    assert lo[:2] == [0, 1] and lo[2] == 3  # null sorts last


def test_dense_key_table_probe():
    import jax.numpy as jnp
    from cudf_tpu.ops._utils import dense_key_table, dense_probe

    rk = jnp.asarray([7, 3, 5, 9], dtype=jnp.int32)  # unique keys
    tbl = dense_key_table(rk, 3, 7)                  # domain [3, 10)
    lk = jnp.asarray([3, 4, 9, 2, 10, 7], dtype=jnp.int32)
    r, found = dense_probe(tbl, lk, 3)
    assert np.asarray(found).tolist() == [True, False, True, False, False, True]
    got = np.asarray(r)[np.asarray(found)].tolist()
    assert got == [1, 3, 0]  # row ids of keys 3, 9, 7


def test_bloom_filter(rng):
    from cudf_tpu.ops.bloom import BloomFilter

    build = Column.from_numpy(rng.integers(0, 10_000, 5000))
    probe_in = Column.from_numpy(np.asarray(build.to_numpy()[:100]))
    probe_out = Column.from_numpy(rng.integers(100_000, 200_000, 2000))
    bf = BloomFilter(num_bits=1 << 18).add([build])
    assert np.asarray(bf.maybe_contains([probe_in])).all()  # no false negatives
    fp = np.asarray(bf.maybe_contains([probe_out])).mean()
    assert fp < 0.05  # false-positive rate small at this fill
    assert 0 < bf.fill_ratio() < 0.2


def test_bloom_filter_strings():
    from cudf_tpu.ops.bloom import BloomFilter

    build = Column.from_strings(["apple", "banana", "cherry"])
    bf = BloomFilter(num_bits=1 << 14, num_hashes=3).add([build])
    probe = Column.from_strings(["banana", "durian", "apple", "grape"])
    got = np.asarray(bf.maybe_contains([probe])).tolist()
    assert got[0] and got[2]
    assert not (got[1] and got[3])  # both being FPs at this size is ~impossible
