"""J1 big-join phase timings on real TPU (do NOT co-run with pytest).

Breaks radix_join_inner_unique's 1e8 x 1e8 shape into its dispatch
phases to find where the 1490ms (67 Mrows/s, BENCH round-3) actually
goes: partition passes, host syncs, build aggregate, probe.

Usage:  python tools/bench_join_phases.py [n=100_000_000]
(run from anywhere: the repo root is bootstrapped onto sys.path —
 do NOT use PYTHONPATH, it breaks the axon tunnel shim's child env)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cudf_tpu.kernels.radix_partition import (
    HI, LANES, SENTINEL, WINDOW_BITS, bucket_aggregate, digit_histogram,
    layout_device, merge_scatter, probe_tables, radix_join_inner_unique,
    radix_partition, step_table_device, window_probe, _prep_data,
    _sorted_scatter,
)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
build_rows = n
domain_bits = max(int(np.ceil(np.log2(max(build_rows, 2)))), 1)
tile_rows, chunk_rows, agg_rows, merge_tiles = 512, 4, 128, 4

k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(3), 4)
rk = jax.random.permutation(k1, build_rows).astype(jnp.int32)
rv = jax.random.normal(k2, (build_rows,), jnp.float32)
lk = jax.random.randint(k3, (n,), 0, build_rows, dtype=jnp.int32)
lv = jnp.arange(n, dtype=jnp.int32)
jax.block_until_ready((rk, rv, lk, lv))


def t(label, fn, warm=True):
    if warm:
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt*1e3:7.1f} ms", flush=True)
    return out


def profile_partition(keys, vals, tag):
    """Mirror radix_partition's two-pass path with per-phase syncs."""
    st = merge_tiles * tile_rows
    print(f"[{tag}] two-pass partition, domain_bits={domain_bits}",
          flush=True)
    data, nst = t(f"{tag} prep_data",
                  lambda: _prep_data(keys, vals, st))
    zeros = jnp.zeros((nst,), jnp.int32)
    nbits1 = domain_bits - WINDOW_BITS - 7
    hist1 = t(f"{tag} hist1", lambda: digit_histogram(
        data, nbits1, WINDOW_BITS + 7, st))
    tabs1, base1 = t(f"{tag} layout1", lambda: layout_device(
        hist1, zeros, 1, st, chunk_rows, st))
    t0 = time.perf_counter()
    rows1 = int(base1[-1])
    print(f"  {tag} SYNC rows1: {(time.perf_counter()-t0)*1e3:7.1f} ms"
          f" (rows1={rows1}, inflation={rows1*LANES/n:.3f})", flush=True)
    data1 = t(f"{tag} scatter1", lambda: _sorted_scatter(
        data, tabs1, nbits1, tile_rows, merge_tiles, chunk_rows, rows1))
    nt2 = rows1 // st
    region_of_tile = (jnp.searchsorted(
        base1[1:], jnp.arange(nt2) * st, side="right").astype(jnp.int32))
    hist2 = t(f"{tag} hist2", lambda: digit_histogram(
        data1, 7, WINDOW_BITS, st))
    tabs2, base2 = t(f"{tag} layout2", lambda: layout_device(
        hist2, region_of_tile, 1 << nbits1, st, chunk_rows, agg_rows))
    t0 = time.perf_counter()
    rows2 = int(base2[-1])
    print(f"  {tag} SYNC rows2: {(time.perf_counter()-t0)*1e3:7.1f} ms"
          f" (rows2={rows2}, inflation={rows2*LANES/n:.3f})", flush=True)
    pdata = t(f"{tag} scatter2", lambda: _sorted_scatter(
        data1, tabs2, 7, tile_rows, merge_tiles, chunk_rows, rows2,
        mask_bits=WINDOW_BITS + 7))
    return pdata, base2, 1 << (nbits1 + 7)


# ---- build side -----------------------------------------------------
rid1 = jnp.arange(1, build_rows + 1, dtype=jnp.int32)
pdata_r, base_r, G = profile_partition(rk, [rid1, rv], "build")
rows_r = int(base_r[-1])
step_r = t("build step_table", lambda: step_table_device(
    base_r, rows_r, agg_rows))
acc = t("build bucket_aggregate(idpay)", lambda: bucket_aggregate(
    pdata_r, step_r, G, WINDOW_BITS, agg_rows, mode="idpay"))
from cudf_tpu.kernels.radix_partition import zero_empty_windows
acc = t("build zero_empty_windows", lambda: zero_empty_windows(acc, base_r))
t0 = time.perf_counter()
tables, unique = probe_tables(acc)
jax.block_until_ready(tables)
print(f"  probe_tables+unique SYNC: {(time.perf_counter()-t0)*1e3:7.1f} ms"
      f" (unique={unique}, tables {tables.shape}, "
      f"{tables.nbytes/1e9:.2f} GB)", flush=True)

# ---- probe side -----------------------------------------------------
pdata_l, base_l, G2 = profile_partition(lk, lv, "probe")
rows_l = int(base_l[-1])
step_l = t("probe step_table", lambda: step_table_device(
    base_l, rows_l, agg_rows))
probed = t("window_probe(pay)", lambda: window_probe(
    pdata_l, tables, step_l, WINDOW_BITS, agg_rows))
bid, pay = probed
res = t("final fold", lambda: (jnp.sum(pay), jnp.sum(bid >= 0)))

# ---- end-to-end for reference ---------------------------------------
def full():
    pkl2, pvl2, bid2, mval2, uniq = radix_join_inner_unique(
        lk, lv, rk, build_rows, rv=rv)
    return jnp.sum(mval2), jnp.sum(bid2 >= 0)

t("END-TO-END radix_join_inner_unique", full)
t("END-TO-END again", full, warm=False)
print(f"done; end-to-end rows/s at last timing printed above", flush=True)
