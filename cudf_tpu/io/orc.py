"""ORC reader/writer (reference: cpp/src/io/orc/ stripe kernels).

Round-2: self-contained reader (io/orc_native.py — protobuf metadata,
chunked-framing decompress, RLEv1/v2 stripe decode) for flat schemas.
Round-3: self-contained writer (io/orc_writer.py — RLEv1 encode, stripe
layout, protobuf footer, zlib/snappy framing); pyarrow tier only for
nested/temporal shapes."""

from __future__ import annotations

from cudf_tpu.core.table import Table
from cudf_tpu.frame.dataframe import DataFrame
from cudf_tpu.frame.index import default_index


def read_orc(path, columns=None, stripes=None, **kw) -> DataFrame:
    from cudf_tpu.utils.config import get_option

    if stripes is None and get_option("io.orc.native_reader"):
        try:
            from cudf_tpu.io.orc_native import read_orc_native

            return read_orc_native(path, columns=list(columns)
                                   if columns else None)
        except (NotImplementedError, ValueError):
            pass
    import pyarrow.orc as po

    f = po.ORCFile(path)
    if stripes is not None:
        import pyarrow as pa

        parts = [f.read_stripe(i, columns=list(columns) if columns else None)
                 for i in stripes]
        tbl = pa.Table.from_batches(parts)
    else:
        tbl = f.read(columns=list(columns) if columns else None)
    t = Table.from_arrow(tbl)
    return DataFrame._from(t, default_index(t.num_rows))


def write_orc(df: DataFrame, path, compression=None, **kw):
    from cudf_tpu.utils.config import get_option

    if get_option("io.orc.native_writer"):
        from cudf_tpu.io.orc_writer import _COMP_IDS, write_orc_native

        comp = compression.lower() if isinstance(compression, str) \
            else compression
        if comp in _COMP_IDS and all(
                c.dtype.is_numeric or c.dtype.is_bool or c.dtype.is_string
                or c.dtype.is_dictionary
                for c in df._table.columns):
            write_orc_native(df, path, compression=comp,
                             **{k: v for k, v in kw.items()
                                if k in ("stripe_size",)})
            return
    import pyarrow.orc as po

    po.write_table(df._table.to_arrow(), path)
