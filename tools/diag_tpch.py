"""Diagnose TPC-H SPMD phases on the real TPU at small scale.

Usage: python tools/diag_tpch.py [scale] [queries...]
Prints per-query generate/collect wall times with CUDF_TPU_SPMD_DEBUG
phase breakdown (lower_py/trace/compile/exec) from evaluate_spmd.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CUDF_TPU_SPMD_DEBUG", "1")

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks import tpch
from cudf_tpu.parallel.mesh import make_mesh


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    queries = sys.argv[2:] or ["q1"]
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    t0 = time.perf_counter()
    tables = tpch.generate_device(scale)
    for t in tables.values():
        for c in t._table.columns:
            jax.block_until_ready(c.data)
    print(f"generate_device(sf={scale}): {time.perf_counter()-t0:.2f}s",
          flush=True)
    mesh = make_mesh(1)
    for qn in queries:
        fn = getattr(tpch, qn)
        t0 = time.perf_counter()
        r = fn(tables, mesh=mesh)
        print(f"{qn} cold: {time.perf_counter()-t0:.2f}s", flush=True)
        t0 = time.perf_counter()
        fn(tables, mesh=mesh)
        print(f"{qn} warm: {time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
