"""Rolling windows and EWM.

TPU-native equivalent of libcudf rolling (reference: cpp/src/rolling/).
Fixed windows lower to shifted-cumsum differences / strided segment
reductions — O(n) fused VPU passes instead of per-window loops; min/max use
the sliding-window sparse table (log-depth, still O(n log w) vectorized).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.frame.series import Series


class Rolling:
    def __init__(self, obj, window, min_periods=None, center=False):
        self._obj = obj
        if isinstance(window, str):
            # offset window over a datetime index (pandas rolling("2h"))
            self._time_window = window
            self._window = None
            self._min_periods = int(min_periods) if min_periods is not None else 1
        else:
            self._time_window = None
            self._window = int(window)
            self._min_periods = int(min_periods) if min_periods is not None else int(window)
        self._center = center

    def _apply(self, fn_name: str):
        from cudf_tpu.frame.dataframe import DataFrame

        if isinstance(self._obj, Series):
            return self._apply_series(self._obj, fn_name)
        cols = {}
        for n in self._obj._table.names:
            s = self._obj[n]
            if s.dtype.is_numeric or s.dtype.is_bool:
                cols[n] = self._apply_series(s, fn_name)._column
        from cudf_tpu.core.table import Table

        return DataFrame._from(Table(cols), self._obj._index)

    def _apply_series(self, s: Series, fn_name: str) -> Series:
        if self._time_window is not None:
            return self._apply_series_time(s, fn_name)
        col = s._column
        n = col.length
        w = self._window
        x = col.data.astype(jnp.float64)
        valid = jnp.ones((n,), jnp.bool_)
        if col.validity is not None:
            valid = col.validity
        if col.dtype.is_float:
            valid = valid & ~jnp.isnan(col.data)
        xz = jnp.where(valid, x, 0.0)
        cnt_prefix = jnp.concatenate([jnp.zeros((1,), jnp.float64),
                                      jnp.cumsum(valid.astype(jnp.float64))])
        cnt = _window_diff(cnt_prefix, w)
        if fn_name in ("sum", "mean", "var", "std"):
            pref = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(xz)])
            total = _window_diff(pref, w)
            if fn_name == "sum":
                out = total
            elif fn_name == "mean":
                out = total / jnp.maximum(cnt, 1.0)
            else:
                pref2 = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(xz * xz)])
                tot2 = _window_diff(pref2, w)
                mu = total / jnp.maximum(cnt, 1.0)
                var = (tot2 - cnt * mu * mu) / jnp.maximum(cnt - 1.0, 1.0)
                var = jnp.maximum(var, 0.0)
                out = var if fn_name == "var" else jnp.sqrt(var)
                out = jnp.where(cnt >= 2, out, jnp.nan)
        elif fn_name in ("min", "max"):
            out = _sliding_minmax(xz, valid, w, fn_name)
        elif fn_name == "count":
            out = cnt
        else:
            raise NotImplementedError(fn_name)
        ok = cnt >= self._min_periods
        out = jnp.where(ok, out, jnp.nan)
        if self._center:
            shift = (w - 1) // 2
            rolled = jnp.concatenate([out[shift:], jnp.full((shift,), jnp.nan)])
            out = rolled
        return Series._from(Column(dt.FLOAT64, n, data=out), s._index, s.name)

    def _apply_series_time(self, s: Series, fn_name: str) -> Series:
        """Offset windows: per-row window start via searchsorted on the
        (sorted) datetime index, then prefix-sum differences — the range
        window path (reference: rolling range windows)."""
        from cudf_tpu.ops.datetime import _freq_ticks
        from cudf_tpu.frame.resample import _parse_rule

        idx_col = s._index._column
        if not idx_col.dtype.is_timestamp:
            raise TypeError("time-based rolling requires a datetime index")
        mult, unit = _parse_rule(self._time_window)
        delta = _freq_ticks(unit, idx_col.dtype.time_unit or "s") * mult
        t = idx_col.data.astype(jnp.int64)
        n = s._column.length
        # first row with time > t_i - delta (index assumed monotone, like pandas)
        from cudf_tpu.ops._utils import searchsorted_fast

        lo = searchsorted_fast(t, t - jnp.int64(delta - 1), "left")
        col = s._column
        x = col.data.astype(jnp.float64)
        valid = jnp.ones((n,), jnp.bool_) if col.validity is None else col.validity
        if col.dtype.is_float:
            valid = valid & ~jnp.isnan(col.data)
        xz = jnp.where(valid, x, 0.0)
        csum = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(xz)])
        ccnt = jnp.concatenate([jnp.zeros((1,), jnp.float64),
                                jnp.cumsum(valid.astype(jnp.float64))])
        pos = jnp.arange(n, dtype=jnp.int64)
        total = jnp.take(csum, pos + 1) - jnp.take(csum, lo)
        cnt = jnp.take(ccnt, pos + 1) - jnp.take(ccnt, lo)
        if fn_name == "sum":
            out = total
        elif fn_name == "mean":
            out = total / jnp.maximum(cnt, 1.0)
        elif fn_name == "count":
            out = cnt
        elif fn_name in ("min", "max", "var", "std"):
            data = _range_prefix_reduce(col.data, valid, lo, fn_name, self._min_periods)
            return Series._from(Column(dt.FLOAT64, n, data=data), s._index, s.name)
        else:
            raise NotImplementedError(fn_name)
        out = jnp.where(cnt >= self._min_periods, out, jnp.nan)
        return Series._from(Column(dt.FLOAT64, n, data=out), s._index, s.name)

    def sum(self):
        return self._apply("sum")

    def mean(self):
        return self._apply("mean")

    def min(self):
        return self._apply("min")

    def max(self):
        return self._apply("max")

    def var(self):
        return self._apply("var")

    def std(self):
        return self._apply("std")

    def count(self):
        return self._apply("count")

    def apply(self, func, raw=False):
        # device tier only for raw=True: jax windows have ndarray
        # semantics (NaN propagates); raw=False hands pandas Series
        # whose reductions skip NaN
        dev = self._try_device_apply(func) if raw else None
        if dev is not None:
            return dev
        import pandas as pd

        pdf = self._obj.to_pandas()
        res = pdf.rolling(self._window, min_periods=self._min_periods,
                          center=self._center).apply(func, raw=raw)
        if isinstance(self._obj, Series):
            return Series(res.values, index=self._obj._index, name=self._obj.name)
        from cudf_tpu.frame.dataframe import DataFrame

        return DataFrame.from_pandas(res)

    def _try_device_apply(self, func):
        """Device rolling UDF: vmap the user function over gathered
        [n-w+1, w] windows — the JIT-window-UDF capability of the
        reference (cpp/src/rolling/jit/kernel.cu), with jax.vmap in the
        NVRTC role.  Requires a jax-traceable scalar-returning func and
        the default full-window min_periods; anything else (python
        control flow, np.* host calls, partial windows) falls back to
        the host tier via the trace exception."""
        w = self._window
        if w is None or self._center or self._min_periods != w:
            return None
        from cudf_tpu.frame.dataframe import DataFrame

        if isinstance(self._obj, Series):
            out = self._device_apply_series(self._obj, func, w)
            return out
        cols = {}
        for n in self._obj._table.names:
            s = self._obj[n]
            if not (s.dtype.is_numeric or s.dtype.is_bool):
                continue
            r = self._device_apply_series(s, func, w)
            if r is None:
                return None
            cols[n] = r._column
        from cudf_tpu.core.table import Table

        return DataFrame._from(Table(cols), self._obj._index)

    def _device_apply_series(self, s: Series, func, w: int):
        col = s._column
        n = col.length
        if n < w or w < 1:
            return None
        x = col.data.astype(jnp.float64)
        if col.validity is not None:
            x = jnp.where(col.validity, x, jnp.nan)
        try:
            shaped = jax.eval_shape(func, jax.ShapeDtypeStruct((w,), x.dtype))
            if shaped.shape != ():
                return None
            idx = jnp.arange(n - w + 1)[:, None] + jnp.arange(w)[None, :]
            out = jax.jit(jax.vmap(func))(x[idx]).astype(jnp.float64)
        except Exception:
            return None
        # pandas: a window with fewer than min_periods (== w here)
        # non-NaN observations is NaN WITHOUT calling func
        ok = ~jnp.any(jnp.isnan(x[idx]), axis=1)
        out = jnp.where(ok, out, jnp.nan)
        head = jnp.full((w - 1,), jnp.nan, jnp.float64)
        full = jnp.concatenate([head, out])
        return Series(Column.from_jnp(full), index=s._index, name=s.name)


def _window_diff(prefix: jnp.ndarray, w: int) -> jnp.ndarray:
    """rolling sum over trailing window w from an inclusive prefix array."""
    n = prefix.shape[0] - 1
    hi = prefix[1:]
    lo_idx = jnp.maximum(jnp.arange(1, n + 1) - w, 0)
    lo = jnp.take(prefix, lo_idx)
    return hi - lo


def _sliding_minmax(x: jnp.ndarray, valid: jnp.ndarray, w: int, which: str) -> jnp.ndarray:
    """Sliding-window min/max via log-stride doubling (sparse-table style)."""
    fill = jnp.inf if which == "min" else -jnp.inf
    fn = jnp.minimum if which == "min" else jnp.maximum
    cur = jnp.where(valid, x, fill)
    n = cur.shape[0]
    # build answer over trailing window w: combine powers of two
    result = cur
    span = 1
    levels = [cur]
    while span < w:
        prev = levels[-1]
        shifted = jnp.concatenate([jnp.full((min(span, n),), fill), prev[:-span] if span < n else prev[:0]])
        levels.append(fn(prev, shifted))
        span *= 2
    # trailing window of size w = combine level k (2^k) at pos i and pos i-(w-2^k)
    k = max(w.bit_length() - 1, 0)
    big = levels[min(k, len(levels) - 1)]
    off = w - (1 << k)
    if off > 0:
        shifted = jnp.concatenate([jnp.full((min(off, n),), fill), big[:-off] if off < n else big[:0]])
        result = fn(big, shifted)
    else:
        result = big
    return jnp.where(jnp.isfinite(result), result, jnp.nan)


class EWM:
    def __init__(self, obj, alpha: float, adjust: bool = True, ignore_na: bool = False):
        self._obj = obj
        self._alpha = float(alpha)
        self._adjust = adjust
        self._ignore_na = ignore_na

    def mean(self):
        from cudf_tpu.ops.scan import ewm_mean
        from cudf_tpu.ops.replace import nans_to_nulls

        if isinstance(self._obj, Series):
            col = self._obj._column
            if col.dtype.is_float:
                col = nans_to_nulls(col)
            out = ewm_mean(col, self._alpha, self._adjust, ignore_na=self._ignore_na)
            return Series._from(out, self._obj._index, self._obj.name)
        from cudf_tpu.frame.dataframe import DataFrame
        from cudf_tpu.core.table import Table

        cols = {}
        for n in self._obj._table.names:
            s = self._obj[n]
            if s.dtype.is_numeric:
                cols[n] = EWM(s, self._alpha, self._adjust, self._ignore_na).mean()._column
        return DataFrame._from(Table(cols), self._obj._index)


# ---------------------------------------------------------------------------
# Variable-start ("range") windows: each row i reduces x[lo[i] .. i].
# Powers the time-offset windows and grouped rolling (reference:
# cpp/src/rolling/grouped_rolling.cu range-window path) — per-row window
# starts instead of a constant width, still O(n log n) vectorized.
# ---------------------------------------------------------------------------

def _range_prefix_reduce(x, valid, lo, fn_name, min_periods):
    """Reduce x[lo[i]..i] for every i given per-row window starts lo.

    sum/mean/count/var/std via inclusive-prefix differences (two gathers);
    min/max via a sparse table (log-depth doubling + one stacked gather).
    Returns float64 with NaN where count < min_periods.
    """
    n = x.shape[0]
    xf = x.astype(jnp.float64)
    valid = valid & ~jnp.isnan(xf) if x.dtype in (jnp.float32, jnp.float64) else valid
    xz = jnp.where(valid, xf, 0.0)
    pos = jnp.arange(n, dtype=jnp.int64)

    def pref(a):
        return jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(a)])

    ccnt = pref(valid.astype(jnp.float64))
    cnt = jnp.take(ccnt, pos + 1) - jnp.take(ccnt, lo)
    if fn_name in ("sum", "mean", "var", "std"):
        csum = pref(xz)
        total = jnp.take(csum, pos + 1) - jnp.take(csum, lo)
        if fn_name == "sum":
            out = total
        elif fn_name == "mean":
            out = total / jnp.maximum(cnt, 1.0)
        else:
            csq = pref(xz * xz)
            sq = jnp.take(csq, pos + 1) - jnp.take(csq, lo)
            m = total / jnp.maximum(cnt, 1.0)
            var = (sq - cnt * m * m) / jnp.maximum(cnt - 1.0, 1.0)
            var = jnp.where(cnt > 1, jnp.maximum(var, 0.0), jnp.nan)
            out = jnp.sqrt(var) if fn_name == "std" else var
    elif fn_name == "count":
        out = cnt
    elif fn_name in ("min", "max"):
        fill = jnp.inf if fn_name == "min" else -jnp.inf
        fn = jnp.minimum if fn_name == "min" else jnp.maximum
        base = jnp.where(valid, xf, fill)
        levels = [base]
        span = 1
        while span < n:
            prev = levels[-1]
            shifted = jnp.concatenate(
                [jnp.full((min(span, n),), fill), prev[:max(n - span, 0)]])
            levels.append(fn(prev, shifted))
            span *= 2
        sp = jnp.stack(levels)  # [L, n]; level j = reduce over (i-2^j, i]
        length = (pos - lo + 1).astype(jnp.float64)
        j = jnp.floor(jnp.log2(jnp.maximum(length, 1.0))).astype(jnp.int64)
        j = jnp.clip(j, 0, len(levels) - 1)
        flat = sp.reshape(-1)
        a = jnp.take(flat, j * n + pos)
        b_pos = lo + (jnp.int64(1) << j) - 1
        b = jnp.take(flat, j * n + jnp.clip(b_pos, 0, n - 1))
        out = fn(a, b)
        out = jnp.where(jnp.isfinite(out), out, jnp.nan)
    else:
        raise NotImplementedError(fn_name)
    return jnp.where(cnt >= min_periods, out, jnp.nan)


class RollingGroupby:
    """df.groupby(keys).rolling(window) — grouped trailing windows.

    Windows never cross group boundaries: rows are stably ordered by
    group, each row's window start is clamped to its group's first row,
    then everything lowers to `_range_prefix_reduce`.  Matches pandas'
    result shape: MultiIndex (keys..., original row label), group-major.
    """

    def __init__(self, gb, window: int, min_periods: Optional[int] = None):
        self._gb = gb
        self._window = int(window)
        self._min_periods = int(min_periods) if min_periods is not None else int(window)

    def _reduce(self, fn_name: str):
        from cudf_tpu.core.table import Table
        from cudf_tpu.frame.dataframe import DataFrame
        from cudf_tpu.frame.index import Index, MultiIndex
        from cudf_tpu.ops import copying
        from cudf_tpu.ops.row_ops import equality_keys, lex_sort_indices

        gb = self._gb
        keys = gb._key_cols
        obj = gb._obj
        order = lex_sort_indices(keys, stable=True)
        n = keys[0].length
        pos = jnp.arange(n, dtype=jnp.int64)
        sorted_keys = [copying.gather(k, order, bounds_check=False) for k in keys]
        new_seg = jnp.zeros((n,), jnp.bool_)
        for k in sorted_keys:
            for opnd in equality_keys(k):
                new_seg = new_seg | jnp.concatenate(
                    [jnp.ones((1,), jnp.bool_), opnd[1:] != opnd[:-1]])
        seg_start = jax.lax.cummax(jnp.where(new_seg, pos, 0))
        lo = jnp.maximum(pos - self._window + 1, seg_start)

        if isinstance(obj, Series):
            value_names = [obj.name or "value"]
            value_cols = [obj._column]
        else:
            value_names = [nm for nm in obj._table.names
                           if nm not in gb._key_names and obj._table[nm].dtype.is_numeric]
            value_cols = [obj._table[nm] for nm in value_names]
        out_cols = {}
        for nm, c in zip(value_names, value_cols):
            cs = copying.gather(c, order, bounds_check=False)
            valid = (cs.validity if cs.validity is not None
                     else jnp.ones((n,), jnp.bool_))
            data = _range_prefix_reduce(cs.data, valid, lo, fn_name, self._min_periods)
            out_cols[nm] = Column(dt.FLOAT64, n, data=data)

        orig_idx = obj._index.take(order)
        idx = MultiIndex(
            [*sorted_keys, orig_idx._column],
            [*gb._key_names, getattr(obj._index, "name", None)],
        )
        if isinstance(obj, Series):
            return Series._from(out_cols[value_names[0]], idx, obj.name)
        return DataFrame._from(Table(out_cols), idx)

    def sum(self):
        return self._reduce("sum")

    def mean(self):
        return self._reduce("mean")

    def min(self):
        return self._reduce("min")

    def max(self):
        return self._reduce("max")

    def count(self):
        return self._reduce("count")

    def var(self):
        return self._reduce("var")

    def std(self):
        return self._reduce("std")
