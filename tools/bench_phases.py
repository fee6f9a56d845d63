"""Radix-partition phase timings on real TPU: hist / tile_sort /
merge_scatter / aggregate at 1e8 rows, parameterized by merge_tiles.

Usage (hardware only; do NOT co-run with pytest — 1 host CPU):
    python tools/bench_phases.py [merge_tiles=2] [K=1_000_000]

Round-3 baseline at MT=2 (v5e, idle): sort 57ms + merge_scatter 70ms,
agg 57ms, inflation 1.127.  MT=4 measured 2026-08-18 (v5e, light CPU
contention): hist 8.4ms, sort 57.1ms, merge_scatter 52.4ms, agg 53.9ms,
inflation 1.067 — merge_tiles default is now 4 (needs the raised
scoped-vmem cap in merge_scatter; default 16MiB cap OOMs at 27.9MiB).
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cudf_tpu.kernels.bitonic import tile_sort_data
from cudf_tpu.kernels.radix_partition import (
    LANES, SENTINEL, bucket_aggregate, digit_histogram, layout_device,
    merge_scatter, step_table_device, _prep_data,
)

MT = int(sys.argv[1]) if len(sys.argv) > 1 else 2
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
n = 100_000_000
tile_rows, nbits, chunk_rows, agg_rows, shift = 512, 7, 4, 128, 13
st = MT * tile_rows
B = 1 << nbits

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
keys = jax.random.randint(k1, (n,), 0, K, dtype=jnp.int32)
vals = jax.random.normal(k2, (n,), dtype=jnp.float32)
data, nt = _prep_data(keys, vals, st)


def timeit(label, fn, fold, iters=4):
    out = fn()
    float(fold(out))

    def chain(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn()
        float(fold(o))
        return time.perf_counter() - t0

    ts = min(chain(1) for _ in range(3))
    tl = min(chain(1 + iters) for _ in range(3))
    dt = max((tl - ts) / iters, 1e-9)
    print(f"MT={MT} {label}: {dt*1e3:.1f} ms ({n/dt/1e6:.0f} Mrows/s)",
          flush=True)
    return out


hist = timeit("A hist(st)",
              lambda: digit_histogram(data, nbits, shift, st),
              lambda h: jnp.sum(h))
z = jnp.zeros((nt,), jnp.int32)
tabs, base = layout_device(hist, z, 1, st, chunk_rows, agg_rows)
total_rows = int(base[-1])
print(f"MT={MT} total_rows={total_rows} "
      f"inflation={total_rows*LANES/n:.3f}", flush=True)
srt = timeit("B1 tile_sort_data",
              lambda: tile_sort_data(data, tile_rows=tile_rows,
                                     alternate=True),
              lambda o: jnp.sum(o[0, :8]))
pdata = timeit("B2 merge_scatter",
               lambda: merge_scatter(srt, tabs, nbits, st,
                                     tile_rows, chunk_rows, total_rows),
               lambda o: jnp.sum(o[0, :8]) + jnp.sum(o[1, :8]))
step_tab = step_table_device(base, total_rows, agg_rows)
timeit("C agg",
       lambda: bucket_aggregate(pdata, step_tab, B, shift, agg_rows),
       lambda a: jnp.sum(a))
