"""Unified typed option registry with env-var mirroring.

Replaces the reference's three config tiers (getenv_or C++ env vars,
cudf Python options.py:46-97, cudf-polars CUDF_POLARS__* dataclasses —
SURVEY.md §5 'Config / flag system') with one registry.  Every option is
env-overridable as ``CUDF_TPU__<UPPER_NAME>``.
"""

from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional


@dataclass
class _Option:
    name: str
    default: Any
    description: str
    validator: Callable[[Any], bool]
    value: Any = None


_registry: Dict[str, _Option] = {}


def _register(name: str, default: Any, description: str,
              validator: Callable[[Any], bool] = lambda v: True) -> None:
    env = os.environ.get("CUDF_TPU__" + name.upper().replace(".", "__"))
    value = default
    if env is not None:
        if isinstance(default, bool):
            value = env.lower() in ("1", "true", "yes", "on")
        elif isinstance(default, int):
            value = int(env)
        elif isinstance(default, float):
            value = float(env)
        else:
            value = env
    _registry[name] = _Option(name, default, description, validator, value)


def get_option(name: str) -> Any:
    return _registry[name].value


def set_option(name: str, value: Any) -> None:
    opt = _registry[name]
    if not opt.validator(value):
        raise ValueError(f"invalid value {value!r} for option {name!r}")
    opt.value = value


def describe_option(name: Optional[str] = None) -> None:
    names = [name] if name else sorted(_registry)
    for n in names:
        o = _registry[n]
        print(f"{o.name}: {o.description} (default {o.default!r}, current {o.value!r})")


@contextlib.contextmanager
def option_context(*args):
    if len(args) % 2:
        raise ValueError("option_context takes name/value pairs")
    pairs = list(zip(args[::2], args[1::2]))
    saved = [(n, get_option(n)) for n, _ in pairs]
    try:
        for n, v in pairs:
            set_option(n, v)
        yield
    finally:
        for n, v in saved:
            set_option(n, v)


_register("mode.pandas_compatible", True, "strict pandas semantics where they cost performance")
_register("display.max_rows", 60, "rows shown in repr", lambda v: isinstance(v, int) and v > 0)
_register("default_integer_bitwidth", 64, "default int width", lambda v: v in (32, 64))
_register("default_float_bitwidth", 64, "default float width", lambda v: v in (32, 64))
_register("spill", False, "enable HBM->host spilling of cold buffers")
_register("spill.device_limit_fraction", 0.85, "fraction of HBM before spilling")
_register("spill.device_limit_bytes", 0,
          "absolute device budget for executor auto-spill (0 = use fraction)")
_register("io.parquet.chunk_read_limit", 0, "bytes per parquet pass (0 = whole file)")
_register("io.parquet.device_decode", False,
          "decode RLE/dictionary pages on device (VPU expand + gather); "
          "page assembly still host-side — experimental")
_register("io.orc.native_writer", True,
          "write flat-schema ORC with the self-contained writer "
          "(orc_writer.py: RLEv1 streams, zlib/snappy framing); "
          "pyarrow tier for nested/temporal shapes")
_register("io.orc.native_reader", True,
          "read flat-schema ORC with the self-contained reader "
          "(orc_native.py); pyarrow tier for nested types")
_register("io.json.device_tokenizer", True,
          "parse JSON-lines (flat objects) with the device escape-aware "
          "tokenizer (io/json_device.py); host tier for nested shapes")
_register("io.csv.device_tokenizer", True,
          "parse CSV with the device quote-state tokenizer "
          "(io/csv_device.py); pyarrow tier on unsupported shapes")
_register("io.parquet.native_writer", True,
          "write flat-schema parquet with the self-contained writer "
          "(dictionary pages, snappy/gzip/zstd, v1/v2 data pages); "
          "pyarrow tier for nested/indexed frames")
_register("io.parquet.native_reader", True,
          "use the self-contained thrift+decode reader (parquet_native) "
          "with row-group stats + page-index + bloom pushdown; pyarrow "
          "tier on unsupported shapes (always-on like the reference's "
          "own reader, cpp/src/io/parquet/reader_impl.cpp)")
_register("io.parquet.hybrid_scan", True,
          "filter-column-first two-pass scan when a page index is "
          "present: decode filter columns, evaluate predicates exactly, "
          "then decode payload pages holding matches only "
          "(experimental/hybrid_scan.cpp role)")
_register("executor.spmd_lowering", True,
          "compile LazyFrame plans over a Mesh into one jitted shard_map "
          "program (engine/spmd.py); falls back to the partition-list "
          "executor on unsupported plan shapes")
_register("executor.fallback_mode", "warn",
          "what to do when a Mesh plan can't lower to the SPMD compiler "
          "and falls back to the partition-list executor: 'warn' emits "
          "a PerformanceWarning with the blocking node, 'raise' "
          "surfaces the Unlowerable error, 'silent' just counts it "
          "(engine.streaming.get_fallback_stats) — the cudf-polars "
          "fallback_mode contract (utils/config.py:115-129)")
_register("executor.target_partition_size", 1 << 28, "bytes per partition in distributed exec")
_register("executor.broadcast_limit", 1 << 25, "max bytes for broadcast-join small side")
_register("strings.host_fallback", True, "allow host fallback for regex/non-ASCII string ops")
_register("join.radix_fast_path", True,
          "radix-partition + MXU window-probe tier for single-int-key "
          "inner joins with a unique build side (exact semantics, "
          "left-row order)")
_register("join.fast_path_min_rows", 1 << 16,
          "minimum probe rows before joins dispatch to the kernel tier")
_register("join.kernel_interpret", False,
          "run the join kernel tier in Pallas interpret mode on CPU "
          "(testing only)")
_register("join.multi_fan_out_max", 4,
          "max build-side duplicates per key served by the stacked-table "
          "kernel join tier (0 disables; larger fan-out takes the "
          "sort-merge tier)")
_register("join.dense_fast_path", True,
          "direct-address inner join when the single-int build side is "
          "unique over a dense domain (exact semantics, left-row order)")
_register("groupby.onehot_fast_path", True,
          "dispatch groupby aggs to the Pallas MXU kernel tiers "
          "(bit-exact for int values via chunked double-float "
          "accumulation; ~1e-9 relative for floats)")
_register("groupby.fast_path_min_rows", 1 << 16,
          "minimum rows before groupby dispatches to the kernel tier "
          "(small frames stay on the lax.sort tier, which is cheaper "
          "to launch and exactly matches pandas for floats too)")
_register("groupby.kernel_interpret", False,
          "run the groupby kernel tier in Pallas interpret mode on CPU "
          "(testing only)")
