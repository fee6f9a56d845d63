"""Feather/Arrow IPC reader/writer (reference: cudf/io/feather.py)."""

from __future__ import annotations

from cudf_tpu.core.table import Table
from cudf_tpu.frame.dataframe import DataFrame
from cudf_tpu.frame.index import default_index


def read_feather(path, columns=None) -> DataFrame:
    import pyarrow.feather as pf

    tbl = pf.read_table(path, columns=list(columns) if columns else None)
    t = Table.from_arrow(tbl)
    return DataFrame._from(t, default_index(t.num_rows))


def write_feather(df: DataFrame, path, **kw):
    import pyarrow.feather as pf

    pf.write_feather(df._table.to_arrow(), path)
