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
import jax.numpy as jnp
import numpy as np

A100_CUDF_G1_ROWS_PER_SEC = 5.0e8  # baseline anchor (see module docstring)

N = 10_000_000


def groupby_pipeline(keys, vals):
    """Static-shape G1 groupby: sort → run reductions, fully SCATTER-FREE.

    XLA scatter on TPU runs at ~90 Mrows/s while sort_pairs runs at
    ~450 Mrows/s, so segment_sum is replaced by prefix-sum differences
    over the sorted runs: for a run starting at i and ending at e,
    sum = cumsum[e] - cumsum[start-1], with each row's run start from a
    forward cummax over run-start positions.  Outputs are padded to n,
    aligned to run-END positions, with num_groups as the live count —
    same padded-group-table convention as parallel/dist.local_groupby_sum."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    ks, order = jax.lax.sort([keys, idx], num_keys=1, is_stable=False)
    vs = jnp.take(vals, order)
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
    is_end = jnp.concatenate([neq[1:], jnp.ones((1,), jnp.bool_)])
    cs = jnp.cumsum(vs)
    pos = jnp.arange(n, dtype=jnp.int32)
    # start of MY run: forward running max over run-start positions
    run_start = jax.lax.cummax(jnp.where(neq, pos, jnp.int32(0)))
    cs_before = jnp.where(run_start > 0, jnp.take(cs, jnp.maximum(run_start - 1, 0)),
                          jnp.zeros((), vs.dtype))
    # outputs aligned to run-END positions (padded; num_groups live)
    sums = jnp.where(is_end, cs - cs_before, 0)
    cnts = jnp.where(is_end, pos - run_start + 1, 0).astype(jnp.int32)
    means = sums / jnp.maximum(cnts, 1).astype(vs.dtype)
    gkeys = jnp.where(is_end, ks, 0)
    num_groups = neq.astype(jnp.int32).sum()
    return gkeys, sums, means, cnts, num_groups


@jax.jit
def _step(keys, vals, bump):
    """One chained G1 iteration: output feeds the next call's key bump so
    consecutive dispatches serialize on device and can't be cached."""
    gkeys, sums, means, cnts, ng = groupby_pipeline(keys + bump, vals)
    return (cnts[0] & 1) + (ng & 1)


@partial(jax.jit, static_argnames=("num_groups",))
def _step_onehot(keys, vals, bump, num_groups: int):
    """Low-cardinality path: Pallas single-pass one-hot MXU aggregation
    (cudf_tpu.kernels.hash_aggregate) — the hash-groupby fast path."""
    from cudf_tpu.kernels.hash_aggregate import onehot_groupby_aggregate

    s, c, mn, mx = onehot_groupby_aggregate(
        keys, vals + bump.astype(jnp.float32) * 0, num_groups
    )
    return (c[0].astype(jnp.int32) & 1) + bump % 2


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
    rng = np.random.default_rng(seed)
    keys = jnp.asarray(rng.integers(0, cardinality, n).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=n).astype(np.float32))
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


def main():
    low = bench_config(N, 100, seed=1)
    high = bench_config(N, N // 2, seed=2)
    rows_per_sec = float(np.sqrt(low * high))  # geomean of the two configs
    print(json.dumps({
        "metric": "db-benchmark G1 groupby rows/sec/chip (geomean low/high cardinality, 1e7 rows)",
        "value": round(rows_per_sec),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / A100_CUDF_G1_ROWS_PER_SEC, 4),
        "detail": {"low_card_rows_per_sec": round(low), "high_card_rows_per_sec": round(high)},
    }))


if __name__ == "__main__":
    main()
