"""Query engine: logical IR + expression tree + executors + LazyFrame.

TPU-native equivalent of cudf-polars (reference:
python/cudf_polars/cudf_polars/ — dsl/ir.py 23 IR nodes, dsl/expressions,
streaming/parallel.py lowering).  The polars Rust optimizer is replaced by
a small in-repo optimizer (projection + predicate pushdown); the execution
model is the same: post-order IR evaluation over columnar tables, with a
partitioned lowering for multi-chip.
"""

from cudf_tpu.engine.expr import (
    Expr,
    col,
    lit,
)
from cudf_tpu.engine.lazy import LazyFrame, scan_parquet, scan_csv, from_dataframe


def get_fallback_stats():
    from cudf_tpu.engine.streaming import get_fallback_stats as _g

    return _g()


def reset_fallback_stats():
    from cudf_tpu.engine.streaming import reset_fallback_stats as _r

    return _r()


__all__ = ["Expr", "col", "lit", "LazyFrame", "scan_parquet", "scan_csv",
           "from_dataframe", "get_fallback_stats", "reset_fallback_stats"]
