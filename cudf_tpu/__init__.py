"""cudf_tpu — a TPU-native columnar DataFrame & query engine.

Brand-new framework with the capabilities of rapidsai/cudf, designed for
TPU hardware from scratch on JAX/XLA/Pallas rather than ported from CUDA.

Architecture (see SURVEY.md for the reference layer map this mirrors):

- ``cudf_tpu.core``     — Arrow-layout columnar substrate: ``Column``/``Table``
  pytrees over flat ``jnp`` HBM buffers (data, validity, offsets, dictionary
  codes).  TPU-native replacement for libcudf's ``column``/``table``
  (reference: cpp/include/cudf/column/column.hpp, table/table.hpp).
- ``cudf_tpu.ops``      — the columnar kernel library: copying, binaryop,
  reductions, scans, sort, groupby, join, stream compaction, strings,
  partitioning.  Tier-1 ops are pure XLA; hot paths get Pallas kernels.
  TPU-native replacement for libcudf's CUDA kernels (cpp/src/*).
- ``cudf_tpu.frame``    — pandas-API DataFrame/Series/Index layer
  (reference: python/cudf/cudf/core/).
- ``cudf_tpu.io``       — CSV/Parquet/JSON readers & writers
  (reference: cpp/src/io/).
- ``cudf_tpu.parallel`` — multi-chip scale-out: hash-partition shuffle over
  ICI via ``shard_map`` collectives, distributed groupby/join
  (reference: cudf-polars streaming executor + rapidsmpf).

TPU-first design choices (vs the CUDA reference):
- int64 is the pandas-default dtype, so x64 is enabled process-wide at import.
- Validity masks are byte-wide ``bool`` vectors in HBM (VPU-friendly, fuse
  into every op), packed to Arrow bitmasks only at the interop boundary —
  unlike libcudf's 32-bit-word bitmasks which exist for warp ballot ops.
- Variable-size outputs (filter/join/distinct) use the reference's own
  two-phase count→allocate→retrieve pattern (e.g. inner_join_size.cu →
  inner_join_retrieve.cu), which maps exactly onto XLA's static-shape model:
  device count, host sync, shaped retrieve.
"""

import jax as _jax

# Must run before any jax computation: pandas semantics require int64/float64.
_jax.config.update("jax_enable_x64", True)

from cudf_tpu.core.dtypes import DType, dtype  # noqa: E402
from cudf_tpu.core.column import Column  # noqa: E402
from cudf_tpu.core.table import Table  # noqa: E402
from cudf_tpu.frame.series import Series  # noqa: E402
from cudf_tpu.frame.dataframe import DataFrame  # noqa: E402
from cudf_tpu.frame.index import Index, RangeIndex  # noqa: E402
from cudf_tpu.frame.reshape import concat, merge, get_dummies, melt, crosstab, pivot_table  # noqa: E402
from cudf_tpu.frame.asof import merge_asof  # noqa: E402
from cudf_tpu.frame.tools import (  # noqa: E402
    to_datetime,
    to_numeric,
    cut,
    qcut,
    date_range,
    factorize,
    unique,
    isna,
    isnull,
    notna,
    notnull,
)
from cudf_tpu.io.csv import read_csv  # noqa: E402
from cudf_tpu.io.parquet import read_parquet  # noqa: E402
from cudf_tpu.io.json import read_json  # noqa: E402
from cudf_tpu.io.feather import read_feather  # noqa: E402
from cudf_tpu.io.orc import read_orc  # noqa: E402
from cudf_tpu.io.avro import read_avro  # noqa: E402
from cudf_tpu.io.tpudf_file import read_tpudf  # noqa: E402
from cudf_tpu.io.text import read_text  # noqa: E402
from cudf_tpu.utils.config import get_option, set_option, describe_option, option_context  # noqa: E402
from cudf_tpu.utils.missing import NA, NaT  # noqa: E402
from cudf_tpu.interop import from_pandas, from_arrow, from_dlpack  # noqa: E402

from cudf_tpu import engine  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "DType",
    "dtype",
    "Column",
    "Table",
    "Series",
    "DataFrame",
    "Index",
    "RangeIndex",
    "concat",
    "merge",
    "merge_asof",
    "engine",
    "get_dummies",
    "melt",
    "crosstab",
    "pivot_table",
    "to_datetime",
    "to_numeric",
    "cut",
    "qcut",
    "date_range",
    "factorize",
    "unique",
    "isna",
    "isnull",
    "notna",
    "notnull",
    "read_csv",
    "read_parquet",
    "read_json",
    "read_feather",
    "read_orc",
    "read_avro",
    "read_tpudf",
    "read_text",
    "get_option",
    "set_option",
    "describe_option",
    "option_context",
    "NA",
    "NaT",
    "from_pandas",
    "from_arrow",
    "from_dlpack",
]
