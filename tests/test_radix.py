"""Radix partition kernel family: bitonic tile sort, partition layout,
end-to-end dense-key groupby (interpret mode; the driver exercises the
compiled path on hardware via bench.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cudf_tpu.kernels.bitonic import tile_sort
from cudf_tpu.kernels.radix_partition import (
    digit_histogram, partition_layout, radix_groupby_sum_count, SENTINEL,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("R,TR", [(8, 8), (32, 16), (64, 64)])
def test_bitonic_tile_sort(rng, R, TR):
    k = rng.integers(-2**31, 2**31 - 1, (R, 128)).astype(np.int32)
    k[: R // 2] = rng.integers(0, 4, (R // 2, 128))  # heavy ties
    v = np.arange(R * 128, dtype=np.int32).reshape(R, 128)
    ks, vs = tile_sort(jnp.asarray(k), jnp.asarray(v), tile_rows=TR,
                       interpret=True)
    ks, vs = np.asarray(ks), np.asarray(vs)
    for t in range(R // TR):
        blk = slice(t * TR, (t + 1) * TR)
        assert (ks[blk].ravel() == np.sort(k[blk].ravel())).all()
        # riders stay paired with their keys, and form a permutation
        assert (k.ravel()[vs[blk].ravel()] == ks[blk].ravel()).all()
        assert (np.sort(vs[blk].ravel())
                == np.arange(t * TR * 128, (t + 1) * TR * 128)).all()


def test_digit_histogram(rng):
    n, K = 20_000, 600
    tile_rows = 16
    keys = rng.integers(0, K, n).astype(np.int32)
    tile_elems = tile_rows * 128
    nt = -(-n // tile_elems)
    pad = nt * tile_elems - n
    kp = np.concatenate([keys, np.full(pad, SENTINEL, np.int32)])
    hist = np.asarray(digit_histogram(
        jnp.asarray(kp.reshape(1, nt * tile_rows, 128)), nbits=3, shift=7,
        tile_rows=tile_rows, interpret=True))
    assert hist.shape == (nt, 8)
    digits = keys >> 7
    exp = np.zeros((nt, 8), np.int64)
    for t in range(nt):
        seg = digits[t * tile_elems:(t + 1) * tile_elems]
        exp[t] = np.bincount(seg, minlength=8)[:8]
    assert (hist == exp).all()


def test_partition_layout_invariants(rng):
    hist = rng.integers(0, 700, (5, 16)).astype(np.int64)
    dst, lstart, w, base, total = partition_layout(hist, tile_rows=64,
                                                   chunk_rows=2,
                                                   region_align_rows=8)
    assert (w >= 2).all()
    # runs within a bucket are disjoint and inside the bucket region
    for b in range(16):
        assert dst[0, b] >= base[b]
        assert dst[-1, b] + w[-1, b] <= base[b + 1]
        for t in range(1, 5):
            assert dst[t, b] >= dst[t - 1, b] + w[t - 1, b]
    assert total == base[-1]
    assert total % 8 == 0


@pytest.mark.parametrize("n,K", [(50_000, 1000), (40_000, 30_000),
                                 (60_000, 7), (24_000, 1_000_000)])
def test_radix_groupby_sum_count(rng, n, K):
    keys = rng.integers(0, K, n).astype(np.int32)
    vals = rng.normal(size=n).astype(np.float32)
    s, c = radix_groupby_sum_count(jnp.asarray(keys), jnp.asarray(vals), K,
                                   tile_rows=32, chunk_rows=2, agg_rows=8,
                                   interpret=True)
    s, c = np.asarray(s), np.asarray(c)
    assert (c == np.bincount(keys, minlength=K)).all()
    exp_s = np.bincount(keys, weights=vals.astype(np.float64), minlength=K)
    np.testing.assert_allclose(s, exp_s, rtol=1e-4, atol=1e-3)


def test_radix_groupby_skew(rng):
    # adversarial skew: 90% of rows in one key — exact counts, no drops
    n, K = 40_000, 25_000
    keys = np.where(rng.random(n) < 0.9, 17, rng.integers(0, K, n)).astype(np.int32)
    vals = np.ones(n, np.float32)
    s, c = radix_groupby_sum_count(jnp.asarray(keys), jnp.asarray(vals), K,
                                   tile_rows=32, chunk_rows=2, agg_rows=8,
                                   interpret=True)
    assert (np.asarray(c) == np.bincount(keys, minlength=K)).all()
    np.testing.assert_allclose(np.asarray(s),
                               np.bincount(keys, minlength=K), rtol=1e-5)


def test_radix_groupby_two_pass(rng):
    # >20-bit key domain: exercises the second partition pass
    n, K = 20_000, 1_200_000
    keys = rng.integers(0, K, n).astype(np.int32)
    vals = rng.normal(size=n).astype(np.float32)
    s, c = radix_groupby_sum_count(jnp.asarray(keys), jnp.asarray(vals), K,
                                   tile_rows=32, chunk_rows=2, agg_rows=8,
                                   interpret=True)
    assert (np.asarray(c) == np.bincount(keys, minlength=K)).all()
    exp_s = np.bincount(keys, weights=vals.astype(np.float64), minlength=K)
    np.testing.assert_allclose(np.asarray(s), exp_s, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("merge_tiles", [1, 2, 4])
def test_radix_partition_merge_tiles(rng, merge_tiles):
    """Partition correctness at every supertile merge factor (the DMA
    descriptor-issue lever): per-window multisets of (key, val) pairs in
    each window's row region must match the input exactly."""
    from cudf_tpu.kernels.radix_partition import radix_partition, SPAN

    n, dom_bits = 30_000, 17            # one partition pass, 4 windows
    keys = rng.integers(0, 1 << dom_bits, n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    pdata, base, G = radix_partition(
        jnp.asarray(keys), jnp.asarray(vals), dom_bits, tile_rows=8,
        chunk_rows=2, align_rows=8, merge_tiles=merge_tiles,
        interpret=True)
    pk = np.asarray(pdata[0]).ravel()
    pv = np.asarray(pdata[1]).ravel()
    base = np.asarray(base) * 128        # rows -> elements
    assert G == (1 << dom_bits) // SPAN
    for w in range(G):
        seg_k = pk[base[w]:base[w + 1]]
        seg_v = pv[base[w]:base[w + 1]]
        inw = (seg_k >= w * SPAN) & (seg_k < (w + 1) * SPAN)
        exp = keys[(keys >= w * SPAN) & (keys < (w + 1) * SPAN)]
        assert sorted(seg_k[inw].tolist()) == sorted(exp.tolist())
        # riders stay paired
        assert (keys[seg_v[inw]] == seg_k[inw]).all()


def test_radix_groupby_int_exact(rng):
    """int mode: bit-exact int64 sums vs numpy/pandas (BASELINE.md)."""
    n, K = 40_000, 30_000
    keys = rng.integers(0, K, n).astype(np.int32)
    vals = rng.integers(-2**30, 2**30, n).astype(np.int32)
    s, c = radix_groupby_sum_count(jnp.asarray(keys), jnp.asarray(vals), K,
                                   tile_rows=32, chunk_rows=2, agg_rows=8,
                                   interpret=True, int_mode=True)
    assert (np.asarray(c) == np.bincount(keys, minlength=K)).all()
    exp = np.zeros(K, np.int64)
    np.add.at(exp, keys, vals.astype(np.int64))
    assert (np.asarray(s) == exp).all()


def _check_join(rng, lk, lv, rk, rv, dom, **kw):
    from cudf_tpu.kernels.radix_partition import radix_join_inner_unique

    pkl, pvl, bid, unique = radix_join_inner_unique(
        jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk), dom,
        interpret=True, **kw)
    assert unique
    pkl = np.asarray(pkl).ravel()
    pvl = np.asarray(pvl).ravel()
    bid = np.asarray(bid).ravel()
    found = bid >= 0
    rmap = dict(zip(rk.tolist(), rv.tolist()))
    # every found row points at the build row with the matching key
    assert (rk[bid[found]] == pkl[found]).all()
    # the probe payload rides along correctly (row ids)
    assert (lk[pvl[found]] == pkl[found]).all()
    # and the number of matches equals the expected inner-join size
    assert found.sum() == sum(1 for k in lk.tolist() if k in rmap)


def test_radix_join_inner_unique(rng):
    nl, nr, dom = 24_000, 18_000, 36_000
    rk = rng.permutation(dom)[:nr].astype(np.int32)
    rv = rng.normal(size=nr).astype(np.float32)
    lk = rng.integers(0, dom, nl).astype(np.int32)
    lv = np.arange(nl, dtype=np.int32)    # probe row ids as payload
    _check_join(rng, lk, lv, rk, rv, dom,
                tile_rows=32, chunk_rows=2, agg_rows=8)


def test_radix_join_single_window(rng):
    """Small-dim fast path: domain <= one window, no partition pass."""
    dom, nl = 100, 5000
    rk = rng.permutation(dom).astype(np.int32)[:80]
    rv = rng.normal(size=80).astype(np.float32)
    lk = rng.integers(0, dom, nl).astype(np.int32)
    lv = np.arange(nl, dtype=np.int32)
    _check_join(rng, lk, lv, rk, rv, dom, agg_rows=8)


def test_radix_join_payload_through_table(rng):
    """idpay mode: build payload retrieved by the probe lookup itself."""
    from cudf_tpu.kernels.radix_partition import radix_join_inner_unique

    nl, nr, dom = 20_000, 10_000, 40_000
    rk = rng.permutation(dom)[:nr].astype(np.int32)
    rv = rng.normal(size=nr).astype(np.float32)
    lk = rng.integers(0, dom, nl).astype(np.int32)
    lv = np.arange(nl, dtype=np.int32)
    pkl, pvl, bid, pay, unique = radix_join_inner_unique(
        jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk), dom,
        rv=jnp.asarray(rv), tile_rows=32, chunk_rows=2, agg_rows=8,
        interpret=True)
    assert unique
    bid = np.asarray(bid).ravel()
    pay = np.asarray(pay).ravel()
    found = bid >= 0
    np.testing.assert_array_equal(pay[found], rv[bid[found]])


def test_radix_join_nonunique_detected(rng):
    """A duplicated build key must be reported (caller falls back)."""
    from cudf_tpu.kernels.radix_partition import radix_join_inner_unique

    rk = np.array([3, 9, 3, 40], np.int32)
    lk = rng.integers(0, 50, 4000).astype(np.int32)
    lv = np.arange(4000, dtype=np.int32)
    _, _, _, unique = radix_join_inner_unique(
        jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk), 50,
        agg_rows=8, interpret=True)
    assert not unique


def test_radix_join_multi_bounded_fanout(rng):
    """Stacked ordinal tables: build-side duplicates up to m_max served
    by the kernel tier (inner_join_retrieve.cu multiset probe role)."""
    from cudf_tpu.kernels.radix_partition import radix_join_inner_multi

    nl, dom = 12_000, 9_000
    # build side: each key 1..3 times (max fan-out 3)
    base = rng.permutation(dom)[:4000].astype(np.int32)
    rk = np.concatenate([base, base[:1500], base[:500]]).astype(np.int32)
    rng.shuffle(rk)
    lk = rng.integers(0, dom, nl).astype(np.int32)
    lv = np.arange(nl, dtype=np.int32)
    pkl, pvl, bids, mult = radix_join_inner_multi(
        jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk), dom, m_max=4,
        tile_rows=32, chunk_rows=2, agg_rows=8, interpret=True)
    assert mult == 3
    pvl = np.asarray(pvl).ravel()
    got_pairs = set()
    for b in bids:
        b = np.asarray(b).ravel()
        f = b >= 0
        assert (rk[b[f]] == np.asarray(pkl).ravel()[f]).all()
        got_pairs |= set(zip(pvl[f].tolist(), b[f].tolist()))
    import pandas as pd
    exp = pd.merge(pd.DataFrame({"k": lk, "i": np.arange(nl)}),
                   pd.DataFrame({"k": rk, "j": np.arange(len(rk))}), on="k")
    assert got_pairs == set(zip(exp["i"], exp["j"]))


def test_radix_join_multi_exceeds_bound(rng):
    from cudf_tpu.kernels.radix_partition import radix_join_inner_multi

    rk = np.array([5] * 9 + [7, 8], np.int32)
    lk = rng.integers(0, 10, 4000).astype(np.int32)
    _, _, bids, mult = radix_join_inner_multi(
        jnp.asarray(lk), jnp.asarray(np.arange(4000, dtype=np.int32)),
        jnp.asarray(rk), 10, m_max=4, agg_rows=8, interpret=True)
    assert bids is None and mult == 9
