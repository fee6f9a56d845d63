"""cudf_tpu.pandas — zero-code-change pandas accelerator.

TPU-native equivalent of cudf.pandas (reference:
python/cudf/cudf/pandas/ — ModuleAccelerator meta-path hook
module_accelerator.py:95-582, fast/slow proxy fast_slow_proxy.py:622-1061).

``install()`` replaces ``sys.modules['pandas']`` with a proxy module.
DataFrame/Series results are fast/slow proxies: operations run on the TPU
(cudf_tpu) first and transparently fall back to real pandas per call when
unsupported — the reference's resilience model exactly.

Usage:
    python -m cudf_tpu.pandas script.py
    # or
    import cudf_tpu.pandas; cudf_tpu.pandas.install()
    import pandas as pd   # now accelerated
"""

from __future__ import annotations

import importlib
import sys
import types

from cudf_tpu.pandas.proxy import (
    ProxyDataFrame,
    ProxySeries,
    make_proxy_module,
    profiler_stats,
)

_installed = False


def install():
    global _installed
    if _installed:
        return sys.modules["pandas"]
    real_pandas = importlib.import_module("pandas")
    # keep the real module importable under a private name
    sys.modules["_slow_pandas"] = real_pandas
    proxy = make_proxy_module(real_pandas)
    sys.modules["pandas"] = proxy
    _installed = True
    return proxy


def uninstall():
    global _installed
    if "_slow_pandas" in sys.modules:
        sys.modules["pandas"] = sys.modules.pop("_slow_pandas")
    _installed = False


class Profiler:
    """Fast/slow call attribution (reference: pandas/profiler.py:74)."""

    def __enter__(self):
        profiler_stats.clear()
        profiler_stats.update({"fast": 0, "slow": 0, "calls": {}})
        profiler_stats["active"] = True
        return self

    def __exit__(self, *a):
        profiler_stats["active"] = False

    @property
    def stats(self):
        return dict(profiler_stats)

    def print_per_function_stats(self):
        print(f"fast (TPU) calls: {profiler_stats.get('fast', 0)}")
        print(f"slow (CPU pandas) fallbacks: {profiler_stats.get('slow', 0)}")
        for name, (f, s) in sorted(profiler_stats.get("calls", {}).items()):
            print(f"  {name}: fast={f} slow={s}")


def load_ipython_extension(ipython):
    """`%load_ext cudf_tpu.pandas` (the reference's `%load_ext
    cudf.pandas` magic, pandas/magics.py)."""
    install()


def unload_ipython_extension(ipython):
    uninstall()
