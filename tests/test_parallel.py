"""Distributed ops on an 8-device virtual CPU mesh (SURVEY §4: same tests,
multi-device launcher)."""

import numpy as np
import pandas as pd
import pytest

import jax

import cudf_tpu as ct
from cudf_tpu.parallel import (
    make_mesh,
    dist_groupby_sum,
    dist_inner_join,
    broadcast_inner_join,
    distributed_groupby_agg,
)
from cudf_tpu.parallel.mesh import partition_frame

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dist_groupby_sum_vs_pandas(rng):
    n = 512
    pdf = pd.DataFrame({
        "k": rng.integers(0, 37, n),
        "v": rng.integers(0, 1000, n),
        "w": rng.normal(size=n),
    })
    gdf = ct.DataFrame.from_pandas(pdf)
    mesh = make_mesh(8)
    got = distributed_groupby_agg(gdf, "k", ["v", "w"], mesh, aggs=("sum", "count", "mean"))
    expect = pdf.groupby("k").agg(
        v_sum=("v", "sum"), v_mean=("v", "mean"),
        w_sum=("w", "sum"), w_mean=("w", "mean"), count=("v", "count"),
    ).reset_index()
    got_p = got.to_pandas()
    merged = got_p.merge(expect, on="k", suffixes=("_got", "_exp"))
    assert len(merged) == len(expect) == len(got_p)
    np.testing.assert_allclose(merged["v_sum_got"], merged["v_sum_exp"], rtol=1e-12)
    np.testing.assert_allclose(merged["w_sum_got"], merged["w_sum_exp"], rtol=1e-9)
    np.testing.assert_allclose(merged["v_mean_got"], merged["v_mean_exp"], rtol=1e-9)
    np.testing.assert_array_equal(merged["count_got"], merged["count_exp"])


def test_dist_groupby_jit_compiles(rng):
    import jax.numpy as jnp

    mesh = make_mesh(8)
    n = 256
    key = jnp.asarray(rng.integers(0, 13, n))
    vals = [jnp.asarray(rng.integers(0, 100, n))]
    valid = jnp.ones((n,), jnp.bool_)

    @jax.jit
    def step(k, v, m):
        return dist_groupby_sum(mesh, k, v, m)

    gk, sums, cnt, gv = step(key, vals, valid)
    mask = np.asarray(gv)
    total_from_groups = np.asarray(sums[0])[mask].sum()
    assert total_from_groups == np.asarray(vals[0]).sum()
    # group count matches
    assert mask.sum() >= 13   # 13 distinct keys spread over shards (owners unique)
    got = {}
    for k, s in zip(np.asarray(gk)[mask], np.asarray(sums[0])[mask]):
        got[int(k)] = got.get(int(k), 0) + int(s)
    pdf = pd.DataFrame({"k": np.asarray(key), "v": np.asarray(vals[0])})
    expect = pdf.groupby("k")["v"].sum().to_dict()
    assert got == {int(k): int(v) for k, v in expect.items()}


def test_dist_inner_join(rng):
    import jax.numpy as jnp

    mesh = make_mesh(8)
    nl, nr = 256, 128
    lk = jnp.asarray(rng.integers(0, 40, nl))
    rk = jnp.asarray(rng.integers(0, 40, nr))
    lv = jnp.asarray(np.arange(nl))
    rv = jnp.asarray(np.arange(nr) * 10)
    ones_l = jnp.ones((nl,), bool)
    ones_r = jnp.ones((nr,), bool)

    @jax.jit
    def step(a, b, c, d, e, f):
        return dist_inner_join(mesh, a, b, c, d, e, f)

    key, lpay, rpay, ovalid = step(lk, [lv], ones_l, rk, [rv], ones_r)
    mask = np.asarray(ovalid)
    got = pd.DataFrame({
        "k": np.asarray(key)[mask],
        "lv": np.asarray(lpay[0])[mask],
        "rv": np.asarray(rpay[0])[mask],
    }).sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    expect = pd.merge(
        pd.DataFrame({"k": np.asarray(lk), "lv": np.asarray(lv)}),
        pd.DataFrame({"k": np.asarray(rk), "rv": np.asarray(rv)}),
        on="k",
    ).sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_broadcast_join(rng):
    import jax.numpy as jnp

    mesh = make_mesh(8)
    nl, nr = 256, 64
    lk = jnp.asarray(rng.integers(0, 20, nl))
    rk = jnp.asarray(np.arange(8).repeat(8))  # 64 rows, keys 0..7
    lv = jnp.asarray(np.arange(nl))
    rv = jnp.asarray(np.arange(nr))

    @jax.jit
    def step(a, b, c, d, e, f):
        return broadcast_inner_join(mesh, a, b, c, d, e, f, max_out_per_shard=1024)

    key, lpay, rpay, ovalid = step(
        lk, [lv], jnp.ones((nl,), bool), rk, [rv], jnp.ones((nr,), bool)
    )
    mask = np.asarray(ovalid)
    got_n = mask.sum()
    expect = pd.merge(
        pd.DataFrame({"k": np.asarray(lk), "lv": np.asarray(lv)}),
        pd.DataFrame({"k": np.asarray(rk), "rv": np.asarray(rv)}),
        on="k",
    )
    assert got_n == len(expect)


def test_bootstrap_single_process():
    from cudf_tpu.parallel import bootstrap

    bootstrap.initialize()  # single-process: no-op
    info = bootstrap.process_info()
    assert info["process_count"] == 1 and info["global_devices"] >= 1
    mesh = bootstrap.global_mesh()
    assert mesh.devices.size == len(__import__("jax").devices())
    sl = bootstrap.host_local_slice(100)
    assert sl == slice(0, 100)


def test_streaming_auto_partitions():
    import cudf_tpu as ct
    from cudf_tpu.engine.streaming import choose_partitions, estimate_source_bytes
    from cudf_tpu.utils.config import option_context

    from cudf_tpu.engine.lazy import LazyFrame
    from cudf_tpu.engine.expr import col

    df = ct.DataFrame({"k": list(range(1000)), "v": [1.0] * 1000})
    lf = (LazyFrame.from_dataframe(df).group_by("k")
          .agg(col("v").sum().alias("v")))
    est = estimate_source_bytes(lf.optimized())
    assert est > 0
    with option_context("executor.target_partition_size", 4096):
        n = choose_partitions(lf.optimized())
        assert n > 1
    out = lf.collect(streaming=True).to_pandas()
    assert len(out) == 1000


def test_streaming_join_bloom_prefilter(rng):
    # force the shuffle-join path (broadcast_limit=0) to exercise the
    # bloom pre-filter; results must match the in-memory join exactly
    import cudf_tpu as ct
    import pandas as pd
    from cudf_tpu.engine.lazy import LazyFrame
    from cudf_tpu.utils.config import option_context

    pl = pd.DataFrame({"k": rng.integers(0, 2000, 3000), "lv": np.arange(3000)})
    pr = pd.DataFrame({"k": rng.integers(0, 300, 500), "rv": np.arange(500)})
    lf = LazyFrame.from_dataframe(ct.DataFrame.from_pandas(pl)).join(
        LazyFrame.from_dataframe(ct.DataFrame.from_pandas(pr)), on="k")
    with option_context("executor.broadcast_limit", 0):
        got = lf.collect(mesh=4).to_pandas()
    expect = pl.merge(pr, on="k")
    key = lambda d: d.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(got)[["k", "lv", "rv"]], key(expect)[["k", "lv", "rv"]],
        check_dtype=False)


# ----------------------------------------------------------------------
# round-2 widened tier: multi-key, join families, sample-sort, distinct
# ----------------------------------------------------------------------

def _pad_to(mesh, arrs, n_shards=8):
    import jax.numpy as jnp
    n = arrs[0].shape[0]
    per = -(-n // n_shards)
    total = per * n_shards
    pad = total - n
    out = []
    for a in arrs:
        a = jnp.asarray(a)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
        out.append(a)
    valid = jnp.arange(total) < n
    return out, valid


def test_dist_groupby_multikey(rng):
    import jax.numpy as jnp
    from cudf_tpu.parallel import dist_groupby_sum_multi

    mesh = make_mesh(8)
    n = 700
    k1 = rng.integers(0, 9, n)
    k2 = rng.integers(0, 7, n)
    v = rng.normal(size=n)
    (k1j, k2j, vj), valid = _pad_to(mesh, [k1, k2, v])
    keys, sums, cnt, gvalid, dropped = jax.jit(
        lambda a, b, c, m: dist_groupby_sum_multi(mesh, [a, b], [c], m)
    )(k1j, k2j, vj, valid)
    assert int(np.asarray(dropped).sum()) == 0
    mask = np.asarray(gvalid)
    got = pd.DataFrame({
        "k1": np.asarray(keys[0])[mask], "k2": np.asarray(keys[1])[mask],
        "s": np.asarray(sums[0])[mask], "c": np.asarray(cnt)[mask],
    }).sort_values(["k1", "k2"]).reset_index(drop=True)
    exp = (pd.DataFrame({"k1": k1, "k2": k2, "v": v})
           .groupby(["k1", "k2"]).agg(s=("v", "sum"), c=("v", "count"))
           .reset_index().sort_values(["k1", "k2"]).reset_index(drop=True))
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["s"], exp["s"], rtol=1e-9)
    np.testing.assert_array_equal(got["c"], exp["c"])


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_dist_join_families(rng, how):
    from cudf_tpu.parallel import dist_join

    mesh = make_mesh(8)
    nl, nr = 600, 400
    lk1 = rng.integers(0, 40, nl)
    lk2 = rng.integers(0, 3, nl)
    lv = rng.normal(size=nl)
    rk1 = rng.integers(0, 40, nr)
    rk2 = rng.integers(0, 3, nr)
    rv = rng.normal(size=nr)
    (lk1j, lk2j, lvj), lvalid = _pad_to(mesh, [lk1, lk2, lv])
    (rk1j, rk2j, rvj), rvalid = _pad_to(mesh, [rk1, rk2, rv])
    keys, out_l, out_r, ovalid, rmatch, dropped = jax.jit(
        lambda a, b, c, vm, d, e, f, wm: dist_join(
            mesh, [a, b], [c], vm, [d, e], [f], wm, how=how,
            max_out_per_shard=8 * nl)
    )(lk1j, lk2j, lvj, lvalid, rk1j, rk2j, rvj, rvalid)
    assert int(np.asarray(dropped).sum()) == 0
    ldf = pd.DataFrame({"k1": lk1, "k2": lk2, "lv": lv})
    rdf = pd.DataFrame({"k1": rk1, "k2": rk2, "rv": rv})
    mask = np.asarray(ovalid)
    if how in ("semi", "anti"):
        exists = ldf.merge(rdf[["k1", "k2"]].drop_duplicates(),
                           on=["k1", "k2"], how="left", indicator=True)
        exp_n = int((exists["_merge"] == "both").sum()) if how == "semi" \
            else int((exists["_merge"] == "left_only").sum())
        assert int(mask.sum()) == exp_n
        # selected rows' lv multiset matches
        sel_lv = np.sort(np.concatenate([np.asarray(p)[mask] for p in out_l[:1]]))
        exp_lv = np.sort(exists.loc[exists["_merge"] ==
                                    ("both" if how == "semi" else "left_only"),
                                    "lv"].values)
        np.testing.assert_allclose(sel_lv, exp_lv)
    else:
        exp = ldf.merge(rdf, on=["k1", "k2"], how=how)
        assert int(mask.sum()) == len(exp)
        got_sum_lv = np.asarray(out_l[0])[mask].sum()
        np.testing.assert_allclose(got_sum_lv, exp["lv"].sum(), rtol=1e-9)
        if how == "left":
            nmatch = int(np.asarray(rmatch)[mask].sum())
            assert nmatch == int(exp["rv"].notna().sum())
            got_rv = np.asarray(out_r[0])[np.asarray(rmatch)].sum()
            np.testing.assert_allclose(got_rv, exp["rv"].sum(), rtol=1e-9)


def test_dist_sort_sample_sort(rng):
    from cudf_tpu.parallel import dist_sort

    mesh = make_mesh(8)
    n = 4000
    k = rng.integers(-1000, 1000, n)
    v = rng.normal(size=n)
    (kj, vj), valid = _pad_to(mesh, [k, v])
    ks, pays, mask, dropped = jax.jit(
        lambda a, b, m: dist_sort(mesh, a, [b], m, capacity_factor=3.0)
    )(kj, vj, valid)
    assert int(np.asarray(dropped).sum()) == 0
    mask = np.asarray(mask)
    got_k = np.asarray(ks)[mask]
    got_v = np.asarray(pays[0])[mask]
    assert len(got_k) == n
    # concatenated shard order IS the global sorted order
    np.testing.assert_array_equal(got_k, np.sort(k))
    # payload rides correctly: per-key value multisets match
    exp = pd.DataFrame({"k": k, "v": v}).sort_values("k")
    np.testing.assert_allclose(np.sort(got_v), np.sort(exp["v"].values))
    got_sum_by_key = pd.DataFrame({"k": got_k, "v": got_v}).groupby("k")["v"].sum()
    exp_sum_by_key = exp.groupby("k")["v"].sum()
    np.testing.assert_allclose(got_sum_by_key.values, exp_sum_by_key.values, rtol=1e-9)


def test_dist_sort_descending(rng):
    from cudf_tpu.parallel import dist_sort

    mesh = make_mesh(8)
    n = 1000
    k = rng.integers(0, 500, n)
    (kj,), valid = _pad_to(mesh, [k])
    ks, _, mask, dropped = jax.jit(
        lambda a, m: dist_sort(mesh, a, [], m, capacity_factor=3.0,
                               descending=True)
    )(kj, valid)
    assert int(np.asarray(dropped).sum()) == 0
    got = np.asarray(ks)[np.asarray(mask)]
    np.testing.assert_array_equal(got, -np.sort(-k))


def test_dist_distinct(rng):
    from cudf_tpu.parallel import dist_distinct

    mesh = make_mesh(8)
    n = 900
    k1 = rng.integers(0, 25, n)
    k2 = rng.integers(0, 4, n)
    (k1j, k2j), valid = _pad_to(mesh, [k1, k2])
    keys, gvalid, dropped = jax.jit(
        lambda a, b, m: dist_distinct(mesh, [a, b], m)
    )(k1j, k2j, valid)
    assert int(np.asarray(dropped).sum()) == 0
    mask = np.asarray(gvalid)
    got = set(zip(np.asarray(keys[0])[mask].tolist(),
                  np.asarray(keys[1])[mask].tolist()))
    exp = set(zip(k1.tolist(), k2.tolist()))
    assert got == exp


def test_shuffle_overflow_detected(rng):
    """Undersized capacity must REPORT drops, not silently mask them."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from cudf_tpu.parallel import shuffle_by_key

    mesh = make_mesh(8)
    n = 512
    key = jnp.asarray(rng.integers(0, 4, n))  # heavy skew: 4 keys, 8 shards
    valid = jnp.ones((n,), bool)

    def shard_fn(k, m):
        kr, _, mk, dropped = shuffle_by_key(k, [], m, 8, 4, "x")
        return kr, mk, dropped.reshape(1)

    kr, mk, dropped = shard_map(
        shard_fn, mesh=mesh, in_specs=(P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x")))(key, valid)
    total_dropped = int(np.asarray(dropped).sum())
    total_kept = int(np.asarray(mk).sum())
    assert total_dropped > 0
    assert total_kept + total_dropped == n


def test_dist_groupby_multislice_dcn(rng):
    """2-D (dcn x ici) mesh: hierarchical shuffle, exact groupby."""
    from cudf_tpu.parallel.mesh import make_multislice_mesh
    from cudf_tpu.parallel.dist import dist_groupby_sum_multislice

    mesh = make_multislice_mesh(2, 4)     # 2 slices x 4 chips
    n = 800
    k = rng.integers(0, 23, n)
    v = rng.normal(size=n)
    (kj, vj), valid = _pad_to(mesh, [k, v])
    keys, sums, cnt, gvalid, dropped = jax.jit(
        lambda a, b, m: dist_groupby_sum_multislice(mesh, [a], [b], m)
    )(kj, vj, valid)
    assert int(np.asarray(dropped).sum()) == 0
    mask = np.asarray(gvalid)
    got = pd.DataFrame({"k": np.asarray(keys[0])[mask],
                        "s": np.asarray(sums[0])[mask],
                        "c": np.asarray(cnt)[mask]}).sort_values("k")
    exp = (pd.DataFrame({"k": k, "v": v}).groupby("k")
           .agg(s=("v", "sum"), c=("v", "count")).reset_index())
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["s"].values, exp["s"].values, rtol=1e-9)
    np.testing.assert_array_equal(got["c"].values, exp["c"].values)


def test_distributed_groupby_string_key(rng):
    """String keys ride the jitted tier as dictionary codes end-to-end."""
    n = 400
    pdf = pd.DataFrame({
        "k": [["alpha", "beta", "gamma"][i] for i in rng.integers(0, 3, n)],
        "v": rng.normal(size=n),
    })
    gdf = ct.DataFrame.from_pandas(pdf)
    mesh = make_mesh(8)
    got = distributed_groupby_agg(gdf, "k", ["v"], mesh, aggs=("sum",))
    exp = pdf.groupby("k").agg(v_sum=("v", "sum")).reset_index()
    got_p = got.to_pandas().sort_values("k").reset_index(drop=True)
    assert got_p["k"].tolist() == exp["k"].tolist()
    np.testing.assert_allclose(got_p["v_sum"], exp["v_sum"], rtol=1e-9)


def test_dist_join_full_outer(rng):
    from cudf_tpu.parallel import dist_join

    mesh = make_mesh(8)
    nl, nr = 600, 400
    lk1 = rng.integers(0, 60, nl)
    lk2 = rng.integers(0, 3, nl)
    lv = rng.normal(size=nl)
    rk1 = rng.integers(20, 80, nr)   # partial overlap: both-only regions
    rk2 = rng.integers(0, 3, nr)
    rv = rng.normal(size=nr)
    (lk1j, lk2j, lvj), lvalid = _pad_to(mesh, [lk1, lk2, lv])
    (rk1j, rk2j, rvj), rvalid = _pad_to(mesh, [rk1, rk2, rv])
    keys, out_l, out_r, ovalid, lpres, rpres, dropped = jax.jit(
        lambda a, b, c, vm, d, e, f, wm: dist_join(
            mesh, [a, b], [c], vm, [d, e], [f], wm, how="full",
            max_out_per_shard=8 * (nl + nr))
    )(lk1j, lk2j, lvj, lvalid, rk1j, rk2j, rvj, rvalid)
    assert int(np.asarray(dropped).sum()) == 0
    ldf = pd.DataFrame({"k1": lk1, "k2": lk2, "lv": lv})
    rdf = pd.DataFrame({"k1": rk1, "k2": rk2, "rv": rv})
    exp = ldf.merge(rdf, on=["k1", "k2"], how="outer")
    mask = np.asarray(ovalid)
    lp = np.asarray(lpres)
    rp = np.asarray(rpres)
    assert int(mask.sum()) == len(exp)
    assert int(lp.sum()) == int(exp["lv"].notna().sum())
    assert int(rp.sum()) == int(exp["rv"].notna().sum())
    np.testing.assert_allclose(np.asarray(out_l[0])[lp].sum(),
                               exp["lv"].sum(), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out_r[0])[rp].sum(),
                               exp["rv"].sum(), rtol=1e-9)
    # key columns populated from whichever side is present
    k1_all = np.asarray(keys[0])[mask]
    exp_k1 = np.sort(exp["k1"].values)
    np.testing.assert_array_equal(np.sort(k1_all), exp_k1)


def test_dist_quantile_tdigest(rng):
    from cudf_tpu.parallel.dist import dist_quantile
    import jax.numpy as jnp

    mesh = make_mesh(8)
    n = 8000
    x = rng.normal(size=n) * 100.0
    xj = jnp.asarray(x)
    valid = jnp.ones((n,), bool)
    pcts = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = dist_quantile(mesh, xj, valid, pcts, delta=200)
    exp = np.quantile(x, pcts)
    # t-digest is approximate: tight at the tails, ~1% of range mid-body
    span = x.max() - x.min()
    assert np.all(np.abs(got - exp) < 0.02 * span)
    # min/max-anchored extremes
    got_ends = dist_quantile(mesh, xj, valid, [0.0, 1.0], delta=200)
    np.testing.assert_allclose(got_ends, [x.min(), x.max()], rtol=1e-9)


def test_dist_quantile_with_invalid_rows(rng):
    from cudf_tpu.parallel.dist import dist_quantile
    import jax.numpy as jnp

    mesh = make_mesh(8)
    n = 4096
    x = rng.normal(size=n)
    valid = np.asarray(rng.random(n) < 0.7)
    got = dist_quantile(mesh, jnp.asarray(x), jnp.asarray(valid), [0.5],
                        delta=200)
    exp = np.quantile(x[valid], 0.5)
    span = x[valid].max() - x[valid].min()
    assert abs(got[0] - exp) < 0.02 * span
