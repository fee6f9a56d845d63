"""Reshape: concat, merge (module-level), get_dummies, melt, pivot, crosstab.

TPU-native equivalent of cudf-python reshape
(reference: python/cudf/cudf/core/reshape.py, transform one_hot_encode
cpp/src/transform/one_hot_encode.cu).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, as_column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying
from cudf_tpu.frame.index import Index, MultiIndex, RangeIndex, default_index
from cudf_tpu.frame.series import Series
from cudf_tpu.frame.dataframe import DataFrame
from cudf_tpu.frame.join import merge  # re-export


def concat(objs, axis=0, ignore_index=False, join="outer", **kw):
    objs = [o for o in objs if o is not None]
    if not objs:
        raise ValueError("nothing to concatenate")
    if axis in (1, "columns"):
        out_cols = {}
        index = None
        for o in objs:
            if isinstance(o, Series):
                name = o.name if o.name is not None else len(out_cols)
                out_cols[name] = o._column
                index = o._index if index is None else index
            else:
                for n, c in o._table.items():
                    out_cols[n] = c
                index = o._index if index is None else index
        return DataFrame._from(Table(out_cols), index)
    if all(isinstance(o, Series) for o in objs):
        col = copying.concatenate([o._column for o in objs])
        if ignore_index:
            idx = default_index(col.length)
        else:
            idx = objs[0]._index
            for o in objs[1:]:
                idx = idx.append(o._index)
        return Series._from(col, idx, objs[0].name)
    objs = [o.to_frame() if isinstance(o, Series) else o for o in objs]
    if join == "outer":
        all_names: List = []
        for o in objs:
            for n in o._table.names:
                if n not in all_names:
                    all_names.append(n)
    else:
        all_names = [n for n in objs[0]._table.names if all(n in o._table for o in objs)]
    cols = {}
    for n in all_names:
        parts = []
        for o in objs:
            if n in o._table:
                parts.append(o._table[n])
            else:
                d = None
                for oo in objs:
                    if n in oo._table:
                        d = oo._table[n].dtype
                        break
                parts.append(Column.full(len(o), None, dtype=d))
        cols[n] = copying.concatenate(parts)
    if ignore_index:
        idx = default_index(sum(len(o) for o in objs))
    else:
        idx = objs[0]._index
        for o in objs[1:]:
            idx = idx.append(o._index)
    return DataFrame._from(Table(cols), idx)


def get_dummies(data, prefix=None, prefix_sep="_", columns=None, dtype="bool", drop_first=False):
    """One-hot encode (cudf::one_hot_encode equivalent; a single
    comparison-broadcast per category, fused by XLA)."""
    if isinstance(data, Series):
        df = data.to_frame()
        columns = list(df._table.names)
        single = True
    else:
        df = data
        single = False
        if columns is None:
            columns = [n for n in df._table.names
                       if df._table[n].dtype.is_string or df._table[n].dtype.is_dictionary]
    out_cols = {}
    for n in df._table.names:
        if n not in columns:
            out_cols[n] = df._table[n]
    from cudf_tpu.ops.dictionary import factorize
    from cudf_tpu.ops.binaryop import binary_operation

    target = dt.dtype(dtype)
    for n in columns:
        col = df._table[n]
        codes, keys = factorize(col, sort=True)
        cats = keys.to_pylist()
        pfx = (prefix if isinstance(prefix, str) else n) if not single else (prefix or (data.name if data.name else ""))
        start = 1 if drop_first else 0
        codes_j = jnp.asarray(codes)
        for ci in range(start, len(cats)):
            onehot = codes_j == ci
            if col.validity is not None:
                onehot = onehot & col.validity
            name = f"{pfx}{prefix_sep}{cats[ci]}" if pfx != "" else str(cats[ci])
            out_cols[name] = Column(dt.BOOL8, col.length, data=onehot)
            if target != dt.BOOL8:
                from cudf_tpu.ops.unary import cast

                out_cols[name] = cast(out_cols[name], target)
    return DataFrame._from(Table(out_cols), df._index)


def melt(frame: DataFrame, id_vars=None, value_vars=None, var_name=None, value_name="value"):
    id_vars = [id_vars] if isinstance(id_vars, str) else list(id_vars or [])
    if value_vars is None:
        value_vars = [n for n in frame._table.names if n not in id_vars]
    value_vars = [value_vars] if isinstance(value_vars, str) else list(value_vars)
    k = len(value_vars)
    n = len(frame)
    out = {}
    for iv in id_vars:
        out[iv] = copying.tile(frame._table[iv], k)
    var_col = Column.from_strings([v for v in value_vars for _ in range(n)])
    out[var_name or "variable"] = var_col
    out[value_name] = copying.concatenate([frame._table[v] for v in value_vars])
    return DataFrame._from(Table(out), default_index(n * k))


def pivot_table(frame: DataFrame, values=None, index=None, columns=None, aggfunc="mean",
                fill_value=None):
    index = [index] if isinstance(index, str) else list(index)
    columns = [columns] if isinstance(columns, str) else list(columns or [])
    if values is None:
        values = [n for n in frame._table.names
                  if n not in index + columns and frame._table[n].dtype.is_numeric]
    values = [values] if isinstance(values, str) else list(values)
    gb = frame.groupby(index + columns)
    agg = gb.agg({v: aggfunc for v in values})
    # unstack the columns levels → host pivot of the (small) aggregated frame
    import pandas as pd

    pdf = agg.reset_index().to_pandas()
    out = pdf.pivot_table(values=values if len(values) > 1 else values[0],
                          index=index, columns=columns, aggfunc="first",
                          fill_value=fill_value)
    return DataFrame.from_pandas(out.reset_index()) if isinstance(out, pd.DataFrame) else out


def pivot(frame: DataFrame, index=None, columns=None, values=None):
    import pandas as pd

    return DataFrame.from_pandas(
        frame.to_pandas().pivot(index=index, columns=columns, values=values).reset_index()
    )


def crosstab(index, columns, rownames=None, colnames=None):
    idx_s = index if isinstance(index, Series) else Series(index)
    col_s = columns if isinstance(columns, Series) else Series(columns)
    df = DataFrame({"__r": idx_s, "__c": col_s, "__v": Series(np.ones(len(idx_s), np.int64))})
    out = pivot_table(df, values="__v", index="__r", columns="__c", aggfunc="sum", fill_value=0)
    return out


def unstack(frame, level=-1):
    import pandas as pd

    return DataFrame.from_pandas(frame.to_pandas().unstack(level).reset_index())
