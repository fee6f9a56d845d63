"""Time-series resampling (reference: python/cudf/cudf/core/resample.py).

Downsampling = floor timestamps to the frequency grid → groupby on the
floored bins (a device-side datetime.floor + the standard sort-groupby).
Empty bins are filled in to match pandas (bins are a regular grid).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops import datetime as dt_ops

_FREQ_ALIASES = {"T": "min", "S": "s", "H": "h", "L": "ms", "U": "us", "N": "ns"}


def _parse_rule(rule: str):
    """'5min' → (5, 'min')."""
    i = 0
    while i < len(rule) and (rule[i].isdigit() or rule[i] == "."):
        i += 1
    mult = int(rule[:i]) if i else 1
    unit = rule[i:].strip()
    unit = _FREQ_ALIASES.get(unit, unit)
    return mult, unit


class Resampler:
    def __init__(self, obj, rule: str, on: Optional[str] = None):
        from cudf_tpu.frame.series import Series

        self._obj = obj
        self._rule = rule
        self._on = on
        if on is not None:
            ts_col = obj._table[on]
        elif isinstance(obj, Series):
            ts_col = obj._index._column
        else:
            ts_col = obj._index._column
        if not ts_col.dtype.is_timestamp:
            raise TypeError("resample requires a datetime index or 'on' column")
        self._ts = ts_col

    def _bins(self):
        mult, unit = _parse_rule(self._rule)
        from cudf_tpu.ops.datetime import _freq_ticks

        step = _freq_ticks(unit, self._ts.dtype.time_unit or "s") * mult
        t = self._ts.data.astype(jnp.int64)
        binned = jnp.floor_divide(t, step) * step
        return Column(self._ts.dtype, self._ts.length, data=binned,
                      validity=self._ts.validity), step

    def _agg(self, agg: str):
        from cudf_tpu.core.table import Table
        from cudf_tpu.frame.dataframe import DataFrame
        from cudf_tpu.frame.index import Index
        from cudf_tpu.frame.series import Series
        from cudf_tpu.ops import groupby as gb

        bins, step = self._bins()
        keys = Table({"__bin": bins})
        if isinstance(self._obj, Series):
            value_cols = [(self._obj.name or 0, self._obj._column)]
        else:
            skip = {self._on} if self._on else set()
            value_cols = [
                (n, c) for n, c in self._obj._table.items()
                if n not in skip and (c.dtype.is_numeric or c.dtype.is_bool)
            ]
        specs = [(str(n), c, agg) for n, c in value_cols]
        gk, ga = gb.groupby_agg(keys, specs)
        # fill the regular grid (pandas emits empty bins)
        present = gk["__bin"].data.astype(jnp.int64)
        if present.shape[0] == 0:
            idx = Index(column=gk["__bin"])
            cols = dict(ga.items())
        else:
            lo = int(present[0])
            hi = int(present[-1])
            grid = jnp.arange(lo, hi + step, step, dtype=jnp.int64)
            pos = jnp.searchsorted(present, grid)
            exact = jnp.take(present, jnp.clip(pos, 0, present.shape[0] - 1)) == grid
            src = jnp.where(exact, jnp.clip(pos, 0, present.shape[0] - 1), -1)
            from cudf_tpu.ops import copying

            cols = {}
            for n, c in ga.items():
                filled = copying.gather(c, src, bounds_check=True)
                if agg in ("count", "size"):
                    from cudf_tpu.ops.replace import replace_nulls_scalar

                    filled = replace_nulls_scalar(filled, 0)
                cols[n] = filled
            idx = Index(column=Column(self._ts.dtype, grid.shape[0], data=grid),
                        name=self._on if self._on else self._obj._index.name)
        if isinstance(self._obj, Series):
            col = next(iter(cols.values()))
            return Series._from(col, idx, self._obj.name)
        return DataFrame._from(Table(cols), idx)

    def sum(self):
        return self._agg("sum")

    def mean(self):
        return self._agg("mean")

    def min(self):
        return self._agg("min")

    def max(self):
        return self._agg("max")

    def count(self):
        return self._agg("count")

    def first(self):
        return self._agg("first")

    def last(self):
        return self._agg("last")

    def std(self):
        return self._agg("std")

    def var(self):
        return self._agg("var")

    def median(self):
        return self._agg("median")

    def size(self):
        return self._agg("size")

    def agg(self, func):
        if isinstance(func, str):
            return self._agg(func)
        raise NotImplementedError("resample.agg with non-string spec")
