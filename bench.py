"""Benchmark driver — prints ONE JSON line.

Primary metric: db-benchmark G1-style groupby (sum+mean+count over int
keys) rows/sec/chip on the real TPU, geometric mean over a
low-cardinality (100 groups) and high-cardinality (~n/2 groups) config —
matching BASELINE.md's north-star metric.

Measurement notes:
- The axon tunnel to the chip has ~0.5 s per-sync latency and dispatch
  doesn't block, so iterations are chained through a data dependence and
  throughput is the delta between a long and a short chain (one host
  fetch each), cancelling tunnel latency and dispatch overhead.
- Keys are int32 on device: db-benchmark G1 key cardinalities fit 31
  bits, and v5e has no native int64 (x64 is emulated).  This is the
  radix-width optimization cub uses via begin_bit/end_bit
  (reference: cpp/src/sort/sort_radix.cu).

vs_baseline anchors against A100-cuDF db-benchmark G1 throughput
(~5e8 rows/s per query on the 1e8-row configs from the published
db-benchmark results at data.rapids.ai; the repo itself publishes no
absolute numbers — see BASELINE.md).
"""

import json
import time
from functools import partial

import jax

# persistent compilation cache: remote compiles over the axon tunnel take
# minutes for the big fused pipelines; cache them across bench runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

A100_CUDF_G1_ROWS_PER_SEC = 5.0e8  # baseline anchor (see module docstring)

N = 10_000_000


def groupby_pipeline(keys, vals):
    """Static-shape G1 groupby: ONE sort (values riding as int32-bitcast
    payload) -> prefix-diff run reductions.  Scatter-free and only one
    monotone gather.  Measured primitive costs on v5 lite at 2e7:
    lax.sort 290-450 Mrows/s, scans 2-4 Grows/s, random gather 133 Mrows/s,
    scatter 90 Mrows/s.  The f32-payload sort and associative reset-scan
    formulations hit pathological multi-minute remote Mosaic compiles and
    are parked (NEXT_STEPS.md); bitcasting the payload to int32 sidesteps
    the f32-payload pathology (20 s compile, 101 Mrows/s at 1e7).
    Outputs are padded to n, aligned to run-END positions, with num_groups
    as the live count (parallel/dist.local_groupby_sum convention)."""
    n = keys.shape[0]
    # values ride the sort BITCAST to int32: int payload operands compile
    # fine where f32 payloads hit a pathological remote Mosaic compile, and
    # this removes a ~75 ms random gather at 1e7
    vbits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    ks, vb = jax.lax.sort([keys, vbits], num_keys=1, is_stable=False)
    vs = jax.lax.bitcast_convert_type(vb, jnp.float32)
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
    is_end = jnp.concatenate([neq[1:], jnp.ones((1,), jnp.bool_)])
    pos = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(neq, pos, jnp.int32(0)))
    cs = jnp.cumsum(vs)
    cs_before = jnp.where(run_start > 0,
                          jnp.take(cs, jnp.maximum(run_start - 1, 0)),
                          jnp.zeros((), vs.dtype))
    sums = jnp.where(is_end, cs - cs_before, 0)
    cnts = jnp.where(is_end, pos - run_start + 1, 0).astype(jnp.int32)
    means = sums / jnp.maximum(cnts, 1).astype(vs.dtype)
    gkeys = jnp.where(is_end, ks, 0)
    num_groups = neq.astype(jnp.int32).sum()
    return gkeys, sums, means, cnts, num_groups


@jax.jit
def _step(keys, vals, bump):
    """One chained G1 iteration.  The return folds FULL reductions of every
    output so XLA cannot dead-code-eliminate or slice-narrow any stage
    (element-0-only dependencies let XLA skip the value aggregation
    entirely); the fold feeds the next call's key bump to serialize."""
    gkeys, sums, means, cnts, ng = groupby_pipeline(keys + bump, vals)
    fold = (jnp.sum(sums) + jnp.sum(means)).astype(jnp.int32)         + jnp.sum(gkeys) + jnp.sum(cnts) + ng
    return fold & 1


@partial(jax.jit, static_argnames=("num_groups",))
def _step_onehot(keys, vals, bump, num_groups: int):
    """Low-cardinality path: Pallas single-pass one-hot MXU aggregation
    (cudf_tpu.kernels.hash_aggregate) — the hash-groupby fast path."""
    from cudf_tpu.kernels.hash_aggregate import onehot_groupby_aggregate

    s, c, mn, mx = onehot_groupby_aggregate(
        keys, vals + bump.astype(jnp.float32) * 0, num_groups
    )
    fold = (jnp.sum(s) + jnp.sum(mn) + jnp.sum(mx)).astype(jnp.int32) + jnp.sum(c).astype(jnp.int32)
    return (fold & 1) + bump % 2


def _chained(step_fn, keys, vals, k: int) -> float:
    """Wall time for k serially-dependent pipeline executions + one fetch."""
    t0 = time.perf_counter()
    bump = jnp.int32(0)
    for i in range(k):
        bump = step_fn(keys, vals, bump + jnp.int32(i % 2))
    int(bump)  # real host fetch — syncs the whole chain
    return time.perf_counter() - t0


# cardinality below which the dispatcher uses the Pallas one-hot MXU kernel
# instead of the sort path (the hash-vs-sort decision, groupby.cu:54-69)
ONEHOT_MAX_GROUPS = 1024


def bench_config(n, cardinality, seed, iters=12):
    # synthesize on device: 800MB of host->tunnel transfer would dominate
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    keys = jax.random.randint(k1, (n,), 0, cardinality, dtype=jnp.int32)
    vals = jax.random.normal(k2, (n,), dtype=jnp.float32)
    if cardinality <= ONEHOT_MAX_GROUPS:
        step_fn = lambda k, v, b: _step_onehot(k, v, b, cardinality)
    else:
        step_fn = _step
    int(step_fn(keys, vals, jnp.int32(0)))  # compile + sync
    # subtract the single-execution wall (tunnel latency + 1 exec) from the
    # (1 + iters)-execution wall → per-iteration device time
    t_short = min(_chained(step_fn, keys, vals, 1) for _ in range(2))
    t_long = min(_chained(step_fn, keys, vals, 1 + iters) for _ in range(2))
    dt = max((t_long - t_short) / iters, 1e-9)
    return n / dt


def join_pipeline(lk, lv, rk, rv, max_out: int):
    """Static-shape J1 inner join: sort build side once, two vectorized
    binary searches for match ranges, padded expand (the two-phase
    inner_join_size.cu -> inner_join_retrieve.cu pattern, jitted)."""
    nr = rk.shape[0]
    nl = lk.shape[0]
    from cudf_tpu.ops._utils import expand_rows, merge_join_ranges

    ridx = jnp.arange(nr, dtype=jnp.int32)
    r_sorted, r_order = jax.lax.sort([rk, ridx], num_keys=1, is_stable=False)
    # merged-sort match ranges: XLA's binary-search searchsorted loops
    # random gathers (~2 Mrows/s) and method="sort" scatters internally
    # (~8 Mrows/s); two sorts + scans is the TPU-native lowering
    lo, hi = merge_join_ranges(r_sorted, lk)
    counts = hi - lo
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])
    row = expand_rows(offsets, max_out)
    row_c = jnp.clip(row, 0, nl - 1)
    pos = jnp.arange(max_out, dtype=offsets.dtype)
    within = pos - jnp.take(offsets, row_c)
    out_valid = pos < offsets[-1]
    r_pos = jnp.take(lo, row_c) + within
    r_idx = jnp.take(r_order, jnp.clip(r_pos, 0, nr - 1))
    out_l = jnp.where(out_valid, jnp.take(lv, row_c), 0)
    out_r = jnp.where(out_valid, jnp.take(rv, r_idx), 0)
    return out_l, out_r, out_valid


@partial(jax.jit, static_argnames=("max_out",))
def _join_step(lk, lv, rk, rv, bump, max_out: int):
    ol, orr, ov = join_pipeline(lk + bump, lv, rk + bump, rv, max_out)
    return (ol[0].astype(jnp.int32) & 1) + (ov[0].astype(jnp.int32))


@jax.jit
def _join_unique_step(lk, lv, r_sorted, r_order, rv, bump):
    """J1 probe: unique-key build side (db-benchmark dim-table semantics),
    ONE merged sort, output in merge order (ops/_utils.unique_key_join)."""
    from cudf_tpu.ops._utils import unique_key_join

    l_idx, r_idx, found = unique_key_join(r_sorted, r_order, lk + bump % 2)
    out_l = jnp.where(found, jnp.take(lv, l_idx), 0.0)
    out_r = jnp.where(found, jnp.take(rv, r_idx), 0.0)
    fold = (jnp.sum(out_l) + jnp.sum(out_r)).astype(jnp.int32) + jnp.sum(found).astype(jnp.int32)
    return (fold & 1) + bump % 2


@jax.jit
def _join_dense_step(lk, lv, tbl, rv, bump):
    """J1 probe against the direct-address build table
    (ops/_utils.dense_key_table — the cuco static-map analogue with
    addressing instead of hashing; ONE gather per probe row).  Measured
    4.6x over the merged-sort probe on v5 lite (66 vs 14 Mrows/s)."""
    from cudf_tpu.ops._utils import dense_probe

    r_idx, found = dense_probe(tbl, lk + bump % 2, 0)
    out_l = jnp.where(found, lv, 0.0)
    out_r = jnp.where(found, jnp.take(rv, jnp.clip(r_idx, 0, rv.shape[0] - 1)), 0.0)
    fold = (jnp.sum(out_l) + jnp.sum(out_r)).astype(jnp.int32) + jnp.sum(found).astype(jnp.int32)
    return (fold & 1) + bump % 2


def bench_join(n, seed, iters=8):
    """db-benchmark J1 inner join: n probe rows against an n-row
    unique-key build side (the x-join-big shape).  Build once (the
    hash_join-object pattern, hash_join.hpp:70), probe per iteration;
    e2e including a per-iteration rebuild measures 36.7 Mrows/s."""
    from cudf_tpu.ops._utils import dense_key_table

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    lk = jax.random.randint(k1, (n,), 0, n, dtype=jnp.int32)
    rk = jax.random.permutation(k2, n).astype(jnp.int32)   # unique keys
    rv = jax.random.normal(k3, (n,), dtype=jnp.float32)
    lv = jax.random.normal(k4, (n,), dtype=jnp.float32)
    tbl = jax.jit(lambda r: dense_key_table(r, 0, n + 2))(rk)
    int(_join_dense_step(lk, lv, tbl, rv, jnp.int32(0)))

    def chained(k):
        t0 = time.perf_counter()
        bump = jnp.int32(0)
        for i in range(k):
            bump = _join_dense_step(lk, lv, tbl, rv, bump + jnp.int32(i % 2))
        int(bump)
        return time.perf_counter() - t0

    ts = min(chained(1) for _ in range(2))
    tl = min(chained(1 + iters) for _ in range(2))
    dt = max((tl - ts) / iters, 1e-9)
    return n / dt


def _bench_join_multiplicity(n, seed, iters=8):
    """general multiplicity join (kept for reference measurements)."""
    rng = np.random.default_rng(seed)
    lk = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    rk = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    lv = jnp.asarray(rng.normal(size=n).astype(np.float32))
    rv = jnp.asarray(rng.normal(size=n).astype(np.float32))
    max_out = int(n * 2)
    step = lambda a, b, c: _join_step(a, lv, rk, rv, c, max_out)  # chain via lk bump
    int(_join_step(lk, lv, rk, rv, jnp.int32(0), max_out))

    def chained(k):
        t0 = time.perf_counter()
        bump = jnp.int32(0)
        for i in range(k):
            bump = _join_step(lk, lv, rk, rv, bump + jnp.int32(i % 2), max_out)
        int(bump)
        return time.perf_counter() - t0

    ts = min(chained(1) for _ in range(2))
    tl = min(chained(1 + iters) for _ in range(2))
    dt = max((tl - ts) / iters, 1e-9)
    return n / dt


def main():
    import sys

    print("config: low cardinality (K=100, one-hot MXU kernel)...", file=sys.stderr, flush=True)
    low = bench_config(N, 100, seed=1)
    print(f"  low: {low/1e6:.0f} Mrows/s", file=sys.stderr, flush=True)
    print("config: high cardinality (K=n/2, sort pipeline)...", file=sys.stderr, flush=True)
    high = bench_config(N, N // 2, seed=2)
    print(f"  high: {high/1e6:.0f} Mrows/s", file=sys.stderr, flush=True)
    print("config: J1 inner join (1e7 x 1e7)...", file=sys.stderr, flush=True)
    join_rps = bench_join(N, seed=3)
    print(f"  join: {join_rps/1e6:.0f} Mrows/s", file=sys.stderr, flush=True)
    rows_per_sec = float(np.sqrt(low * high))  # geomean of the two configs
    print(json.dumps({
        "metric": "db-benchmark G1 groupby rows/sec/chip (geomean low/high cardinality, 1e7 rows)",
        "value": round(rows_per_sec),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / A100_CUDF_G1_ROWS_PER_SEC, 4),
        "detail": {"low_card_rows_per_sec": round(low), "high_card_rows_per_sec": round(high),
                   "j1_join_rows_per_sec": round(join_rps)},
    }))


if __name__ == "__main__":
    main()
