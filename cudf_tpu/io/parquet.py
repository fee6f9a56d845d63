"""Parquet reader/writer.

Round-1 tiering (reference: cpp/src/io/parquet/, 47+ CUDA files):
- Host tier (this file): pyarrow parses footers/pages and decodes to Arrow
  buffers, which transfer once to HBM — this is the 'datasource + host
  decode' path, functionally complete: row-group/column projection,
  predicate filters, chunked iteration.
- Device tier (cudf_tpu/io/parquet_device.py, upcoming): Pallas decode
  pipeline (RLE/bit-pack → dictionary → plain; snappy) writing columns
  straight to HBM, replacing page_data.cu / rle_stream.cuh / unsnap.cu.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from cudf_tpu.core.table import Table
from cudf_tpu.frame.dataframe import DataFrame
from cudf_tpu.frame.index import default_index


def read_parquet(
    path,
    columns: Optional[Sequence[str]] = None,
    filters=None,
    row_groups: Optional[Sequence[int]] = None,
    **kw,
) -> DataFrame:
    from cudf_tpu.utils.config import get_option

    if get_option("io.parquet.native_reader") and isinstance(path, str) \
            and not kw and not _has_pandas_ext_metadata(path):
        try:
            from cudf_tpu.io.parquet_native import read_parquet_native

            flt = filters
            if flt and isinstance(flt[0], list):
                flt = flt[0] if len(flt) == 1 else None  # AND-list only
            df = read_parquet_native(
                path, columns=list(columns) if columns else None,
                filters=flt if flt and isinstance(flt[0], tuple) else None,
                row_groups=list(row_groups) if row_groups is not None else None)
            if flt and isinstance(flt[0], tuple):
                # stats pruning is row-group granular; apply the exact
                # residual predicate (predicate_pushdown.cpp does the same)
                df = _apply_residual_filters(df, flt)
            return df
        except Exception:
            pass                          # pyarrow tier below
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    if row_groups is not None:
        tbl = f.read_row_groups(list(row_groups), columns=list(columns) if columns else None)
    elif filters is not None:
        import pyarrow.dataset as ds

        dataset = ds.dataset(path, format="parquet")
        tbl = dataset.to_table(columns=list(columns) if columns else None,
                               filter=_filters_to_expression(filters))
    else:
        tbl = f.read(columns=list(columns) if columns else None)
    t = Table.from_arrow(tbl)
    return DataFrame._from(t, default_index(t.num_rows))


def _has_pandas_ext_metadata(path: str) -> bool:
    """Files carrying pandas schema metadata (categoricals, tz-aware
    timestamps, extension dtypes) need the pyarrow tier's metadata-aware
    reconstruction — the footer key_value 'pandas' entry names them."""
    try:
        from cudf_tpu.io import thrift

        md = thrift.read_file_metadata(path)
        for k, v in (md.key_value or []):
            if k == b"pandas" and (b'"pandas_type": "categorical"' in v
                                   or b"datetimetz" in v
                                   or b'"numpy_type": "object"' in v
                                   or b"Int64" in v or b"Float64" in v
                                   or b"boolean" in v):
                return True
    except Exception:
        return False
    return False


def _apply_residual_filters(df: DataFrame, filters) -> DataFrame:
    """Row-level filter after row-group pruning (native-reader path)."""
    import operator

    ops = {
        "=": operator.eq, "==": operator.eq, "!=": operator.ne,
        "<": operator.lt, ">": operator.gt, "<=": operator.le,
        ">=": operator.ge,
    }
    mask = None
    for col, op, val in filters:
        if op == "in":
            m = df[col].isin(val)
        elif op == "not in":
            m = ~df[col].isin(val)
        else:
            m = ops[op](df[col], val)
        mask = m if mask is None else (mask & m)
    return df[mask].reset_index(drop=True) if mask is not None else df


def _filters_to_expression(filters):
    import pyarrow.dataset as ds
    import pyarrow.compute as pc

    if hasattr(filters, "equals"):  # already an expression
        return filters
    # list of (col, op, val) tuples (DNF outer list optional)
    if filters and isinstance(filters[0], tuple):
        filters = [filters]
    import operator

    ops = {
        "=": operator.eq, "==": operator.eq, "!=": operator.ne,
        "<": operator.lt, ">": operator.gt, "<=": operator.le, ">=": operator.ge,
    }
    disjunction = None
    for conj in filters:
        expr = None
        for col, op, val in conj:
            field = ds.field(col)
            if op == "in":
                e = field.isin(val)
            elif op == "not in":
                e = ~field.isin(val)
            else:
                e = ops[op](field, val)
            expr = e if expr is None else (expr & e)
        disjunction = expr if disjunction is None else (disjunction | expr)
    return disjunction


def write_parquet(df: DataFrame, path, compression="snappy", index=None, **kw):
    from cudf_tpu.utils.config import get_option

    if get_option("io.parquet.native_writer") and (
            index is False or (index is None and _is_default_index(df))):
        from cudf_tpu.io.parquet_writer import _CODECS, write_parquet_native

        comp = (compression or "uncompressed").lower()
        if comp in _CODECS and all(
                c.dtype.is_numeric or c.dtype.is_bool or c.dtype.is_string
                or c.dtype.is_dictionary or c.dtype.is_temporal
                for c in df._table.columns):
            write_parquet_native(df, path, compression=comp,
                                 **{k: v for k, v in kw.items()
                                    if k in ("row_group_size",
                                             "use_dictionary",
                                             "data_page_version")})
            return
    import pyarrow.parquet as pq

    tbl = df._table.to_arrow()
    if index or (index is None and not _is_default_index(df)):
        import pyarrow as pa

        idx_name = df._index.name or "__index_level_0__"
        tbl = tbl.append_column(idx_name, df._index._column.to_arrow())
    pq.write_table(tbl, path, compression=compression)


def _is_default_index(df: DataFrame) -> bool:
    from cudf_tpu.frame.index import RangeIndex

    idx = df._index
    return isinstance(idx, RangeIndex) and idx.start == 0 and idx.step == 1


class ParquetReader:
    """Chunked reader (reference: chunked pass/subpass reader,
    reader_impl_chunking.cu) — iterates row groups under a memory budget."""

    def __init__(self, path, columns=None, chunk_read_limit: int = 0):
        import pyarrow.parquet as pq

        self._f = pq.ParquetFile(path)
        self._columns = list(columns) if columns else None
        self._limit = chunk_read_limit
        self._rg = 0

    @property
    def num_row_groups(self) -> int:
        return self._f.num_row_groups

    def has_next(self) -> bool:
        return self._rg < self._f.num_row_groups

    def read_chunk(self) -> DataFrame:
        groups = [self._rg]
        size = self._f.metadata.row_group(self._rg).total_byte_size
        self._rg += 1
        while self._limit and self._rg < self._f.num_row_groups:
            nxt = self._f.metadata.row_group(self._rg).total_byte_size
            if size + nxt > self._limit:
                break
            groups.append(self._rg)
            size += nxt
            self._rg += 1
        tbl = self._f.read_row_groups(groups, columns=self._columns)
        t = Table.from_arrow(tbl)
        return DataFrame._from(t, default_index(t.num_rows))

    def __iter__(self):
        while self.has_next():
            yield self.read_chunk()


class ParquetWriter:
    """Chunked writer (reference: ChunkedParquetWriter, io/parquet.py:1948)."""

    def __init__(self, path, compression="snappy"):
        self._path = path
        self._compression = compression
        self._writer = None

    def write_table(self, df: DataFrame):
        import pyarrow.parquet as pq

        tbl = df._table.to_arrow()
        if self._writer is None:
            self._writer = pq.ParquetWriter(self._path, tbl.schema,
                                            compression=self._compression)
        self._writer.write_table(tbl)

    def close(self):
        if self._writer is not None:
            self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_parquet_metadata(path):
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    return md
