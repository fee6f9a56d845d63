"""CSV reader/writer.

Round-1: pyarrow's multithreaded host CSV parser → one transfer to HBM
(reference: cpp/src/io/csv/csv_gpu.cu block-parallel parse; a device
tokenizer is a later-round kernel).  Options mirror cudf.read_csv.
"""

from __future__ import annotations

import io as _io
from typing import Optional, Sequence

from cudf_tpu.core.table import Table
from cudf_tpu.frame.dataframe import DataFrame
from cudf_tpu.frame.index import default_index


def read_csv(
    filepath_or_buffer,
    sep: str = ",",
    delimiter: Optional[str] = None,
    header="infer",
    names: Optional[Sequence[str]] = None,
    usecols: Optional[Sequence[str]] = None,
    dtype=None,
    skiprows: int = 0,
    nrows: Optional[int] = None,
    na_values=None,
    parse_dates=None,
    **kw,
) -> DataFrame:
    import pyarrow.csv as pacsv

    sep = delimiter or sep
    # device tokenizer tier (csv_gpu.cu role): engages for the plain
    # shape — single-byte delimiter, no skiprows/na/dates surface
    from cudf_tpu.utils.config import get_option

    if (get_option("io.csv.device_tokenizer") and len(sep) == 1
            and names is None and header == "infer" and skiprows == 0
            and nrows is None and na_values is None and not parse_dates):
        try:
            from cudf_tpu.io.csv_device import read_csv_device

            df = read_csv_device(
                filepath_or_buffer if not hasattr(filepath_or_buffer, "read")
                else filepath_or_buffer.read(),
                delimiter=sep, header=True,
                usecols=list(usecols) if usecols else None,
                dtypes=dtype if isinstance(dtype, dict) else None)
            if dtype is not None and not isinstance(dtype, dict):
                df = df.astype(dtype)
            return df
        except (ValueError, NotImplementedError):
            pass
    read_opts = pacsv.ReadOptions(skip_rows=skiprows)
    if names is not None:
        read_opts.column_names = list(names)
        read_opts.autogenerate_column_names = False
    elif header is None:
        read_opts.autogenerate_column_names = True
    parse_opts = pacsv.ParseOptions(delimiter=sep)
    conv = {}
    if dtype is not None and isinstance(dtype, dict):
        import pyarrow as pa
        import numpy as np

        conv = {k: pa.from_numpy_dtype(np.dtype(v)) for k, v in dtype.items()
                if str(v) not in ("str", "object", "category")}
    convert_opts = pacsv.ConvertOptions(
        column_types=conv or None,
        null_values=list(na_values) if na_values else None,
        include_columns=list(usecols) if usecols else None,
        strings_can_be_null=True,
    )
    if isinstance(filepath_or_buffer, str) and "\n" in filepath_or_buffer:
        src = _io.BytesIO(filepath_or_buffer.encode())
    elif isinstance(filepath_or_buffer, (bytes, bytearray)):
        src = _io.BytesIO(filepath_or_buffer)
    elif hasattr(filepath_or_buffer, "read"):
        data = filepath_or_buffer.read()
        src = _io.BytesIO(data.encode() if isinstance(data, str) else data)
    else:
        src = filepath_or_buffer
    tbl = pacsv.read_csv(src, read_options=read_opts, parse_options=parse_opts,
                         convert_options=convert_opts)
    if nrows is not None:
        tbl = tbl.slice(0, nrows)
    t = Table.from_arrow(tbl)
    df = DataFrame._from(t, default_index(t.num_rows))
    if dtype is not None and not isinstance(dtype, dict):
        df = df.astype(dtype)
    if parse_dates:
        from cudf_tpu.frame.tools import to_datetime

        for c in parse_dates:
            df[c] = to_datetime(df[c])
    return df


def write_csv(df: DataFrame, path=None, sep=",", header=True, index=True, **kw):
    pdf = df.to_pandas()
    return pdf.to_csv(path, sep=sep, header=header, index=index, **kw)
