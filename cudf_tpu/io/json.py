"""JSON reader/writer (reference: cpp/src/io/json/ GPU FST pipeline).

Round-1 host tier: pyarrow/pandas parse → device columns.  The device
finite-state-transducer tokenizer (io/fst/) is a later-round Pallas kernel.
"""

from __future__ import annotations

import io as _io

import numpy as np

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
    if orient in (None, "records"):
        from cudf_tpu.utils.config import get_option

        if get_option("io.json.device_tokenizer"):
            try:
                from cudf_tpu.io.json_device import read_json_records_device

                src = path_or_buf
                if isinstance(src, str) and src.lstrip().startswith("["):
                    src = src.encode()
                elif hasattr(src, "read"):
                    d = src.read()
                    src = d.encode() if isinstance(d, str) else d
                elif isinstance(src, str):
                    with open(src, "rb") as f:
                        src = f.read()
                return read_json_records_device(src)
            except (ValueError, NotImplementedError):
                pass
    import pandas as pd

    pdf = pd.read_json(path_or_buf, orient=orient, lines=lines)
    return DataFrame.from_pandas(pdf)


_JSON_ESC = {i: f"\\u{i:04x}" for i in range(0x20)}
_JSON_ESC.update({ord('"'): '\\"', ord("\\"): "\\\\",
                  ord("\n"): "\\n", ord("\t"): "\\t", ord("\r"): "\\r",
                  ord("\b"): "\\b", ord("\f"): "\\f"})


def _json_scalar(v, is_float: bool) -> str:
    if v is None:
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if is_float:
        if v != v:
            return "null"
        # pandas to_json double_precision=10 discipline: up to 10
        # decimals, trailing zeros stripped
        s = f"{v:.10f}".rstrip("0").rstrip(".")
        return s if s not in ("", "-") else "0"
    if isinstance(v, str):
        return '"' + v.translate(_JSON_ESC) + '"'
    return str(v)


def write_json(df: DataFrame, path=None, orient="records", lines=False, **kw):
    """Self-contained columnar JSON writer (write_json.cu role): host
    string assembly over the column buffers — no pandas round-trip for
    records/lines orients (others delegate)."""
    if orient != "records":
        return df.to_pandas().to_json(path, orient=orient, lines=lines)
    names = list(df._table.names)
    cols = []
    for n in names:
        col = df._table[n]
        is_float = col.dtype.is_float
        vals = col.to_pylist()
        key = '"' + str(n).translate(_JSON_ESC) + '":'
        cols.append([key + _json_scalar(v, is_float) for v in vals])
    rows = ["{" + ",".join(parts) + "}" for parts in zip(*cols)] \
        if cols else []
    if lines:
        out = "\n".join(rows)
    else:
        out = "[" + ",".join(rows) + "]"
    if path is None:
        return out
    if hasattr(path, "write"):
        path.write(out)
        return None
    with open(path, "w") as f:
        f.write(out)
    return None
