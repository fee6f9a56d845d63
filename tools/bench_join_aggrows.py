"""J1 big-join end-to-end vs agg_rows (region alignment = aggregation
block rows).  Pass-2 bucket regions align to agg_rows; at 2^27 domains
the 16384 windows average ~60 rows, so align=128 pads ~2x (measured
inflation 2.001) — every downstream stage (scatter2 writes, aggregate,
probe) pays it.  Hypothesis: agg_rows=32 cuts pass-2 rows ~40%.

Usage: python tools/bench_join_aggrows.py [n=100_000_000]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cudf_tpu.kernels.radix_partition import radix_join_inner_unique

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
rk = jax.random.permutation(k1, n).astype(jnp.int32)
rv = jax.random.normal(k2, (n,), jnp.float32)
lk = jax.random.randint(k3, (n,), 0, n, dtype=jnp.int32)
jax.block_until_ready((rk, rv, lk))


def run(agg_rows, i):
    pkl, pvl, bid, mval, unique = radix_join_inner_unique(
        lk ^ (i & 1), jnp.arange(n, dtype=jnp.int32), rk ^ (i & 1), n,
        rv=rv, agg_rows=agg_rows)
    assert unique
    return float(jnp.sum(mval)) + int(jnp.sum(bid >= 0))


for agg_rows in (128, 64, 32):
    try:
        run(agg_rows, 0)     # compile both shape variants
        run(agg_rows, 1)
        t0 = time.perf_counter()
        chk = [run(agg_rows, i) for i in range(2)]
        dt = (time.perf_counter() - t0) / 2
        print(f"agg_rows={agg_rows}: {dt*1e3:7.1f} ms  "
              f"{n/dt/1e6:6.0f} Mrows/s  chk={chk[0]:.1f}", flush=True)
    except Exception as e:
        print(f"agg_rows={agg_rows}: FAILED {type(e).__name__}: {e}",
              flush=True)
