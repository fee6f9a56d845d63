"""Columnar kernel library (TPU-native replacement for libcudf cpp/src)."""

from cudf_tpu.ops import (  # noqa: F401
    binaryop,
    copying,
    datetime,
    dictionary,
    groupby,
    join,
    partitioning,
    reductions,
    replace,
    row_ops,
    scan,
    search,
    sort,
    stream_compaction,
    strings,
    unary,
)
