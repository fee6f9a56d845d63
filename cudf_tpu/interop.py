"""Interop: pandas / Arrow / DLPack (reference: cpp/src/interop/,
to_arrow_device.cu, from_arrow_host.cu, dlpack.cpp)."""

from __future__ import annotations

import numpy as np


def from_pandas(obj):
    import pandas as pd

    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.series import Series
    from cudf_tpu.frame.index import Index
    from cudf_tpu.core.column import as_column

    if isinstance(obj, pd.DataFrame):
        return DataFrame.from_pandas(obj)
    if isinstance(obj, pd.Series):
        idx = None
        if not isinstance(obj.index, pd.RangeIndex):
            idx = Index(as_column(pd.Series(obj.index)), name=obj.index.name)
        import pyarrow as pa

        col = as_column(pa.Array.from_pandas(obj))
        return Series(col, index=idx, name=obj.name)
    if isinstance(obj, pd.Index):
        return Index(as_column(pd.Series(obj)), name=obj.name)
    raise TypeError(type(obj))


def from_arrow(obj):
    import pyarrow as pa

    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.series import Series
    from cudf_tpu.core.column import Column

    if isinstance(obj, pa.Table):
        return DataFrame.from_arrow(obj)
    if isinstance(obj, (pa.Array, pa.ChunkedArray)):
        return Series(Column.from_arrow(obj))
    raise TypeError(type(obj))


def from_dlpack(capsule):
    import jax
    import jax.numpy as jnp

    from cudf_tpu.frame.series import Series
    from cudf_tpu.core.column import Column

    arr = jnp.from_dlpack(capsule)
    if arr.ndim == 1:
        return Series(Column.from_jnp(arr))
    from cudf_tpu.frame.dataframe import DataFrame

    return DataFrame({i: Column.from_jnp(arr[:, i]) for i in range(arr.shape[1])})


def to_dlpack(obj):
    return obj._column.data.__dlpack__()
