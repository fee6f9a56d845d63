from cudf_tpu.core.dtypes import DType, TypeId, dtype
from cudf_tpu.core.column import Column, as_column
from cudf_tpu.core.table import Table

__all__ = ["DType", "TypeId", "dtype", "Column", "as_column", "Table"]
