"""Benchmark driver — prints ONE JSON line.

Primary metric: db-benchmark G1-style groupby (sum+mean+count over int
keys) rows/sec/chip on the real TPU, geometric-mean over a low-cardinality
(100 groups) and high-cardinality (~n/2 groups) config — matching
BASELINE.md's north-star metric.

vs_baseline anchors against A100-cuDF db-benchmark G1 throughput
(~5e8 rows/s per query on 1e8-row configs, from published db-benchmark
results at data.rapids.ai; the repo itself publishes no absolute numbers —
see BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_CUDF_G1_ROWS_PER_SEC = 5.0e8  # baseline anchor (see module docstring)

N = 10_000_000


def groupby_pipeline(keys, vals):
    """Static-shape G1 groupby: sort → segment reduce (the jitted hot path).

    Identical shape to cudf_tpu.parallel.dist.local_groupby_sum (padded
    group table, no host syncs)."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    ks, order = jax.lax.sort([keys, idx], num_keys=1, is_stable=False)
    neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
    gid = jnp.cumsum(neq.astype(jnp.int32)) - 1
    vs = jnp.take(vals, order)
    sums = jax.ops.segment_sum(vs, gid, num_segments=n)
    cnts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), gid, num_segments=n)
    means = sums / jnp.maximum(cnts, 1).astype(vs.dtype)
    gkeys = jax.ops.segment_max(ks, gid, num_segments=n)
    num_groups = neq.astype(jnp.int32).sum()
    return gkeys, sums, means, cnts, num_groups


def bench_config(n, cardinality, seed):
    rng = np.random.default_rng(seed)
    keys = jnp.asarray(rng.integers(0, cardinality, n, dtype=np.int64))
    vals = jnp.asarray(rng.normal(size=n).astype(np.float64))
    fn = jax.jit(groupby_pipeline)
    # warmup/compile
    out = fn(keys, vals)
    jax.block_until_ready(out)
    iters = 5
    t0 = time.perf_counter()
    carry = jnp.float64(0)
    for i in range(iters):
        # distinct inputs every iteration, chained through the previous
        # output, so no layer (jit cache, remote relay) can elide a run
        out = fn(keys + jnp.int64(i) + (carry.astype(jnp.int64) & 1), vals)
        carry = out[1][0]
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / iters
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
