"""JSON reader/writer (reference: cpp/src/io/json/ GPU FST pipeline).

Round-1 host tier: pyarrow/pandas parse → device columns.  The device
finite-state-transducer tokenizer (io/fst/) is a later-round Pallas kernel.
"""

from __future__ import annotations

import io as _io

from cudf_tpu.core.table import Table
from cudf_tpu.frame.dataframe import DataFrame
from cudf_tpu.frame.index import default_index


def read_json(path_or_buf, lines: bool = False, orient=None, **kw) -> DataFrame:
    if lines:
        from cudf_tpu.utils.config import get_option

        if get_option("io.json.device_tokenizer"):
            try:
                from cudf_tpu.io.json_device import read_json_lines_device

                src = path_or_buf
                if isinstance(src, str) and ("\n" in src
                                             or src.lstrip().startswith("{")):
                    src = src.encode()
                elif hasattr(src, "read"):
                    d = src.read()
                    src = d.encode() if isinstance(d, str) else d
                return read_json_lines_device(src)
            except (ValueError, NotImplementedError):
                pass
        import pyarrow.json as pajson

        if isinstance(path_or_buf, str) and ("\n" in path_or_buf or path_or_buf.lstrip().startswith(("{", "["))):
            src = _io.BytesIO(path_or_buf.encode())
        elif hasattr(path_or_buf, "read"):
            data = path_or_buf.read()
            src = _io.BytesIO(data.encode() if isinstance(data, str) else data)
        else:
            src = path_or_buf
        tbl = pajson.read_json(src)
        t = Table.from_arrow(tbl)
        return DataFrame._from(t, default_index(t.num_rows))
    import pandas as pd

    pdf = pd.read_json(path_or_buf, orient=orient, lines=lines)
    return DataFrame.from_pandas(pdf)


def write_json(df: DataFrame, path=None, orient="records", lines=False, **kw):
    return df.to_pandas().to_json(path, orient=orient, lines=lines)
