"""GroupBy objects for DataFrame/Series.

TPU-native equivalent of cudf-python groupby
(reference: python/cudf/cudf/core/groupby/groupby.py:446-1044) over the
ops/groupby sort-based segment machinery.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, as_column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying, groupby as gb_ops, sort as sort_ops
from cudf_tpu.frame.index import Index, MultiIndex, default_index
from cudf_tpu.frame.series import Series
from cudf_tpu.frame.dataframe import DataFrame

_SIMPLE_AGGS = (
    "sum", "mean", "min", "max", "count", "size", "var", "std", "prod",
    "product", "any", "all", "first", "last", "nunique", "median",
    "idxmin", "idxmax",
)


def _retag_masked_agg(in_dtype: dt.DType, out: Column, agg: str) -> Column:
    """Propagate pandas masked/arrow extension dtypes through groupby aggs
    (pandas rules: sum/prod/min/max/first/last keep the input dtype —
    except boolean sum/prod → Int64; mean/std/var/median/sem/skew →
    Float64 for int/bool inputs, FloatN preserved; count → Int64;
    any/all → boolean; nunique stays plain int64)."""
    if not (in_dtype.nullable or in_dtype.arrow):
        return out
    from cudf_tpu.ops.unary import cast

    flags = dict(nullable=in_dtype.nullable, arrow=in_dtype.arrow)

    def to(tid):
        target = dt.DType(tid, **flags)
        return cast(out, target) if out.dtype != target else out

    if agg in ("any", "all"):
        return to(dt.TypeId.BOOL8)
    if agg in ("count", "size"):
        return to(dt.TypeId.INT64)
    if agg == "nunique":
        return out
    if agg in ("mean", "std", "var", "median", "sem", "skew", "quantile"):
        return to(in_dtype.id if in_dtype.is_float else dt.TypeId.FLOAT64)
    if agg in ("sum", "prod", "product"):
        return to(dt.TypeId.INT64 if in_dtype.is_bool else in_dtype.id)
    if agg in ("min", "max", "first", "last", "nth", "idxmin", "idxmax"):
        if agg in ("idxmin", "idxmax"):
            return out
        return to(in_dtype.id)
    return out


class _GroupByBase:
    def __init__(self, obj, by, level=None, sort=False, dropna=True,
                 as_index=True, group_keys=True, observed=False):
        self._obj = obj
        self._group_keys = group_keys
        self._observed = observed
        self._sort = sort
        self._dropna = dropna
        self._as_index = as_index
        # resolve key columns
        if level is not None:
            idx = obj._index
            if isinstance(idx, MultiIndex):
                levels = [level] if not isinstance(level, (list, tuple)) else level
                self._key_names = [
                    idx.names[l] if isinstance(l, int) else l for l in levels
                ]
                self._key_cols = [
                    idx._columns[l if isinstance(l, int) else idx.names.index(l)]
                    for l in levels
                ]
            else:
                self._key_names = [idx.name if idx.name is not None else "index"]
                self._key_cols = [idx._column]
            self._keys_from_index = True
        else:
            by_list = [by] if isinstance(by, str) or isinstance(by, Series) else list(by)
            self._key_names = []
            self._key_cols = []
            self._external_keys = set()
            for b in by_list:
                if isinstance(b, Series):
                    # external key Series: its name does NOT shadow a
                    # frame column (pandas keeps all columns as values)
                    self._key_names.append(b.name if b.name is not None else "key")
                    self._external_keys.add(self._key_names[-1])
                    self._key_cols.append(b._column)
                else:
                    self._key_names.append(b)
                    self._key_cols.append(self._lookup_key(b))
            self._keys_from_index = False
        # masked/arrow KEYS: group on the flag-stripped column (same
        # buffers — validity already carries NA-group membership) and
        # re-tag the result index with the extension dtype afterwards
        self._key_ext = [kc.dtype if (kc.dtype.nullable or kc.dtype.arrow)
                         else None for kc in self._key_cols]
        self._key_cols = [
            Column(dt.DType(kc.dtype.id, tz=kc.dtype.tz), kc.length,
                   data=kc.data, validity=kc.validity, offsets=kc.offsets,
                   children=kc.children)
            if ext is not None else kc
            for kc, ext in zip(self._key_cols, self._key_ext)]
        self._grouper = None

    def _lookup_key(self, name) -> Column:
        raise NotImplementedError

    @property
    def grouper(self):
        if self._grouper is None:
            self._grouper = gb_ops.make_grouper(self._key_cols, dropna=self._dropna)
        return self._grouper

    def _result_index(self):
        g = self.grouper
        key_rows = g.key_rows
        if g.row_mask is not None:
            from cudf_tpu.ops.stream_compaction import filter_indices

            keep = filter_indices(g.row_mask)
            key_rows = jnp.take(keep, key_rows)
        cols = [copying.gather(c, key_rows, bounds_check=False) for c in self._original_key_cols()]
        if len(cols) == 1:
            return Index(column=cols[0], name=self._key_names[0])
        return MultiIndex(cols, self._key_names)

    def _original_key_cols(self):
        # re-tag extension-dtype keys (see __init__) so result indexes
        # round-trip as pandas nullable/arrow extension arrays
        return [Column(ext, kc.length, data=kc.data, validity=kc.validity,
                       offsets=kc.offsets, children=kc.children)
                if ext is not None else kc
                for kc, ext in zip(self._key_cols,
                                   getattr(self, "_key_ext",
                                           [None] * len(self._key_cols)))]

    def ngroups(self):
        return self.grouper.num_groups

    def rolling(self, window, min_periods=None):
        """Grouped trailing windows (cudf grouped_rolling_window,
        cpp/src/rolling/grouped_rolling.cu)."""
        from cudf_tpu.frame.window import RollingGroupby

        return RollingGroupby(self, window, min_periods)

    def size(self) -> Series:
        col = gb_ops.group_size(self.grouper)
        return Series._from(col, self._result_index(), None)

    @property
    def groups(self):
        """dict: key -> index labels (pandas GroupBy.groups)."""
        import numpy as np

        g = self.grouper
        out = {}
        order = np.asarray(g.sorted_order)
        offs = np.asarray(g.group_offsets)
        keys_idx = self._result_index()
        idx_labels = self._obj._index
        for i in range(g.num_groups):
            rows = order[offs[i]:offs[i + 1]]
            key = keys_idx[i] if not isinstance(keys_idx, MultiIndex) else tuple(
                c[int(g.key_rows[i])] for c in self._original_key_cols()
            )
            out[key] = [idx_labels[int(r)] for r in rows]
        return out

    def ngroup(self) -> Series:
        """Per-row dense group number (pandas GroupBy.ngroup)."""
        g = self.grouper
        col = Column(dt.INT64, len(self._obj), data=g.group_ids) if g.row_mask is None else None
        if col is None:
            import jax.numpy as _jnp

            from cudf_tpu.ops.stream_compaction import filter_indices

            keep = filter_indices(g.row_mask)
            full = Column.full(len(self._obj), None, dtype=dt.INT64)
            col = copying.scatter(Column(dt.INT64, int(keep.shape[0]), data=g.group_ids),
                                  keep, full)
        return Series._from(col, self._obj._index, None)

    def describe(self):
        import pandas as pd

        parts = []
        for agg in ("count", "mean", "std", "min", "max"):
            parts.append(self._apply_simple(agg).to_pandas().add_suffix(f"_{agg}"))
        return pd.concat(parts, axis=1)

    def __iter__(self):
        g = self.grouper
        import numpy as np

        gid = np.asarray(g.group_ids)
        order = np.asarray(g.sorted_order)
        offs = np.asarray(g.group_offsets)
        keys_idx = self._result_index()
        for i in range(g.num_groups):
            rows = order[offs[i]:offs[i + 1]]
            key = keys_idx[i] if not isinstance(keys_idx, MultiIndex) else tuple(
                c[int(g.key_rows[i])] for c in self._original_key_cols()
            )
            yield key, self._take_rows(jnp.asarray(rows))

    def _take_rows(self, rows):
        raise NotImplementedError


class DataFrameGroupBy(_GroupByBase):
    def _lookup_key(self, name) -> Column:
        return self._obj._table[name]

    def _take_rows(self, rows):
        return self._obj.take(rows)

    def __getitem__(self, key):
        if isinstance(key, str):
            sgb = SeriesGroupBy.__new__(SeriesGroupBy)
            sgb._obj = self._obj[key]
            sgb._sort = self._sort
            sgb._dropna = self._dropna
            sgb._as_index = self._as_index
            sgb._key_names = self._key_names
            sgb._key_cols = self._key_cols
            sgb._keys_from_index = self._keys_from_index
            sgb._grouper = self._grouper
            return sgb
        sub = DataFrameGroupBy.__new__(DataFrameGroupBy)
        sub.__dict__.update(self.__dict__) if hasattr(self, "__dict__") else None
        sub._obj = self._obj[list(key) + [n for n in self._key_names if n in self._obj._table and n not in key]]
        sub._sort = self._sort
        sub._dropna = self._dropna
        sub._as_index = self._as_index
        sub._key_names = self._key_names
        sub._key_cols = self._key_cols
        sub._keys_from_index = self._keys_from_index
        sub._grouper = self._grouper
        sub._value_subset = list(key)
        return sub

    def _value_names(self) -> List[str]:
        subset = getattr(self, "_value_subset", None)
        if subset is not None:
            return subset
        skip = set(self._key_names) if not self._keys_from_index else set()
        skip -= getattr(self, "_external_keys", set())
        return [n for n in self._obj._table.names if n not in skip]

    def agg(self, func=None, **named):
        """func: 'sum' | list | {col: agg or [aggs]} | named aggs."""
        specs: List = []  # (out_name, col_name, agg)
        if named and func is None:
            for out_name, (col_name, agg) in {
                k: (v[0], v[1]) if isinstance(v, tuple) else (v.column, v.aggfunc)
                for k, v in named.items()
            }.items():
                specs.append((out_name, col_name, _norm_agg(agg), None))
        elif isinstance(func, str):
            if hasattr(self, func):
                return getattr(self, func)()
            return self._apply_simple(func)
        elif func in (list, set):          # pandas agg(list) / agg(set)
            return self._apply_simple(_norm_agg(func))
        elif isinstance(func, dict):
            # pandas: if ANY dict value is a list, the result columns are
            # a (column, agg) MultiIndex — including the scalar entries
            multi = any(isinstance(v, (list, tuple)) for v in func.values())
            for col_name, aggs in func.items():
                aggs_l = [aggs] if isinstance(aggs, (str, type)) or callable(aggs) \
                    else list(aggs)
                for a in aggs_l:
                    a = _norm_agg(a)
                    out = (col_name, a) if multi else col_name
                    specs.append((out, col_name, a, None))
        elif isinstance(func, (list, tuple)):
            for col_name in self._value_names():
                col = self._obj._table[col_name]
                for a in func:
                    a = _norm_agg(a)
                    if not _agg_supported(col, a):
                        continue
                    specs.append(((col_name, a), col_name, a, None))
        else:
            raise TypeError(f"unsupported agg spec {func!r}")
        return self._run_aggs(specs)

    aggregate = agg

    def _try_kernel_aggs(self, specs) -> Optional[DataFrame]:
        """Route through ops.groupby's kernel-tier dispatcher (one-hot
        MXU / radix partition, default-ON at scale) when the shape
        qualifies: single key column, sorted-key output order (int codes
        are emitted ascending, which IS the sorted group order)."""
        if len(self._key_cols) != 1:
            return None
        key_col = self._key_cols[0]
        if key_col.dtype.is_dictionary:
            return None               # code order != sorted key order
        vals = []
        for out_name, col_name, agg, extra in specs:
            if extra is not None:
                return None
            col = self._obj._table[col_name]
            if col.dtype.nullable or col.dtype.arrow:
                return None       # masked outputs need the retagging tier
            vals.append((out_name, col, agg))
        res = gb_ops._try_onehot_fast_path(
            Table({"__key__": key_col}), vals, self._dropna)
        if res is None:
            return None
        gk, ga = res
        index = Index(column=gk.column(0), name=self._key_names[0])
        df = DataFrame._from(ga, index)
        if not self._as_index:
            df = df.reset_index()
        return df

    def _run_aggs(self, specs) -> DataFrame:
        fast = self._try_kernel_aggs(specs)
        if fast is not None:
            return fast
        g = self.grouper
        out_cols: Dict[str, Column] = {}
        for out_name, col_name, agg, _ in specs:
            col = self._obj._table[col_name]
            fn = gb_ops._AGG_DISPATCH[agg]
            out_cols[out_name] = _retag_masked_agg(col.dtype, fn(col, g), agg)
        index = self._result_index()
        df = DataFrame._from(Table(out_cols), index)
        if self._sort:
            df = df.sort_index() if False else df  # groups already in sorted key order
        if not self._as_index:
            df = df.reset_index()
        return df

    def _apply_simple(self, agg: str, numeric_only=False) -> DataFrame:
        specs = []
        for n in self._value_names():
            col = self._obj._table[n]
            if not _agg_supported(col, agg):
                continue
            specs.append((n, n, agg, None))
        return self._run_aggs(specs)

    def apply(self, func, *args, **kw):
        """Host-fallback per-group apply (JIT groupby-apply is a later round;
        reference: numba groupby-apply engine, core/udf/groupby_*.py)."""
        results = []
        keys = []
        for key, grp in self:
            results.append(func(grp, *args, **kw))
            keys.append(key)
        import pandas as pd

        if all(np.isscalar(r) or r is None for r in results):
            return Series(results, index=Index(keys, name=self._key_names[0] if len(self._key_names) == 1 else None))
        pd_res = pd.concat([r.to_pandas() if hasattr(r, "to_pandas") else r for r in results],
                           keys=keys)
        return DataFrame.from_pandas(pd_res) if pd_res.ndim == 2 else pd_res

    # transforms -------------------------------------------------------
    def cumsum(self):
        g = self.grouper
        cols = {}
        for n in self._value_names():
            c = self._obj._table[n]
            if c.dtype.is_numeric or c.dtype.is_bool:
                cols[n] = gb_ops.group_cumsum(c, g)
        return DataFrame._from(Table(cols), self._obj._index)

    def cumcount(self):
        return Series._from(gb_ops.group_cumcount(self.grouper), self._obj._index, None)

    def shift(self, periods=1):
        g = self.grouper
        cols = {n: gb_ops.group_shift(self._obj._table[n], g, periods)
                for n in self._value_names()}
        return DataFrame._from(Table(cols), self._obj._index)

    def nth(self, n: int):
        g = self.grouper
        cols = {nm: gb_ops.group_nth(self._obj._table[nm], g, n) for nm in self._value_names()}
        return DataFrame._from(Table(cols), self._result_index())

    def head(self, n: int = 5):
        g = self.grouper
        cc = gb_ops.group_cumcount(g)
        mask = cc.data < n
        from cudf_tpu.ops.stream_compaction import filter_indices

        return self._obj.take(filter_indices(mask))

    def transform(self, func):
        """Broadcast a group aggregate back to the original rows
        (pandas GroupBy.transform with a named agg)."""
        if not isinstance(func, str):
            raise NotImplementedError("transform expects an agg name")
        g = self.grouper
        cols = {}
        for n in self._value_names():
            agg_col = gb_ops._AGG_DISPATCH[func](self._obj._table[n], g)
            bcast = copying.gather(agg_col, g.group_ids, bounds_check=False)
            if g.row_mask is not None:
                from cudf_tpu.ops.stream_compaction import filter_indices

                keep = filter_indices(g.row_mask)
                full = Column.full(len(self._obj), None, dtype=agg_col.dtype)
                bcast = copying.scatter(bcast, keep, full)
            cols[n] = bcast
        return DataFrame._from(Table(cols), self._obj._index)

    def filter(self, func):
        """Keep rows of groups where func(group_frame) is True."""
        keep_keys = []
        for key, grp in self:
            if func(grp):
                keep_keys.append(key)
        import numpy as np

        mask = np.zeros(len(self._obj), bool)
        kk = set(keep_keys)
        key_vals = [c.to_pylist() for c in self._key_cols]
        for i in range(len(self._obj)):
            k = key_vals[0][i] if len(key_vals) == 1 else tuple(kv[i] for kv in key_vals)
            mask[i] = k in kk
        return self._obj.take(jnp.asarray(np.nonzero(mask)[0]))

    def rank(self, method="average", ascending=True):
        from cudf_tpu.ops.sort import segmented_sort_indices

        g = self.grouper
        cols = {}
        for n in self._value_names():
            col = self._obj._table[n]
            if not (col.dtype.is_numeric or col.dtype.is_temporal):
                continue
            # rank within groups: dense ordering via segmented sort
            order = segmented_sort_indices(g.group_ids, [col], [ascending])
            from cudf_tpu.ops._utils import inverse_permutation

            pos_in_sorted = inverse_permutation(order)
            starts = copying.gather(
                Column(dt.INT64, g.num_groups, data=g.group_offsets[:-1]),
                g.group_ids, bounds_check=False,
            )
            ranks = (pos_in_sorted - starts.data + 1).astype(jnp.float64)
            cols[n] = Column(dt.FLOAT64, col.length, data=ranks, validity=col.validity)
        return DataFrame._from(Table(cols), self._obj._index)

    def get_group(self, key):
        from cudf_tpu.ops.binaryop import binary_operation
        from cudf_tpu.ops.stream_compaction import filter_indices

        keys = key if isinstance(key, tuple) else (key,)
        mask = None
        for c, k in zip(self._key_cols, keys):
            eq = binary_operation(c, k, "eq")
            m = eq.data
            if eq.validity is not None:
                m = m & eq.validity
            mask = m if mask is None else (mask & m)
        return self._obj.take(filter_indices(mask))


for _agg in _SIMPLE_AGGS:
    if _agg == "size":
        continue

    def _mk(agg=_agg):
        def f(self, *a, **k):
            return self._apply_simple(agg)
        return f

    setattr(DataFrameGroupBy, _agg, _mk())


def _pairwise_group_stat(self, which: str, ddof: int = 1) -> DataFrame:
    """pandas-layout groupby cov/corr: MultiIndex (keys..., column) rows ×
    numeric columns (reference: group_correlation.cu; cudf GroupBy.corr)."""
    g = self.grouper
    names = [n for n in self._value_names()
             if self._obj._table[n].dtype.is_numeric]
    L = len(names)
    G = g.num_groups
    cols_in = {n: self._obj._table[n] for n in names}
    out_cols: Dict[str, Column] = {}
    for c2 in names:
        per_c1 = []
        for c1 in names:
            if which == "cov":
                r = gb_ops.group_cov(cols_in[c1], cols_in[c2], g, ddof=ddof)
            else:
                r = gb_ops.group_corr(cols_in[c1], cols_in[c2], g)
            data = r.data
            if r.validity is not None:
                data = jnp.where(r.validity, data, jnp.nan)
            per_c1.append(data)
        # rows are group-major then c1: [g0c0, g0c1, ..., g1c0, ...]
        stacked = jnp.stack(per_c1, axis=1).reshape(G * L)
        out_cols[c2] = Column(dt.FLOAT64, G * L, data=stacked)
    # index: group keys repeated L times + the column-name level
    key_rows = g.key_rows
    if g.row_mask is not None:
        from cudf_tpu.ops.stream_compaction import filter_indices

        keep = filter_indices(g.row_mask)
        key_rows = jnp.take(keep, key_rows)
    rep_rows = jnp.repeat(key_rows, L)
    key_cols = [copying.gather(c, rep_rows, bounds_check=False)
                for c in self._original_key_cols()]
    name_col = Column.from_numpy(np.asarray(names * G, dtype=object))
    idx = MultiIndex([*key_cols, name_col], [*self._key_names, None])
    return DataFrame._from(Table(out_cols), idx)


DataFrameGroupBy.cov = lambda self, ddof=1, **kw: _pairwise_group_stat(
    self, "cov", ddof=ddof)
DataFrameGroupBy.corr = lambda self, method="pearson", **kw: \
    _pairwise_group_stat(self, "corr")


class _GroupbyEWM:
    """df.groupby(k)[v].ewm(...).mean() — per-group EWMA scan
    (aggregation.hpp EWMA; group order, pandas layout)."""

    def __init__(self, sgb, alpha, adjust, ignore_na):
        self._sgb = sgb
        self._alpha = alpha
        self._adjust = adjust
        self._ignore_na = ignore_na

    def mean(self):
        sgb = self._sgb
        g = sgb.grouper
        out = gb_ops.group_ewma(sgb._obj._column, g, self._alpha,
                                adjust=self._adjust,
                                ignore_na=self._ignore_na)
        # pandas returns rows in group-sorted order with a
        # (keys..., original label) MultiIndex
        data = jnp.take(out.data, g.sorted_order)
        rows = g.sorted_order
        if g.row_mask is not None:
            from cudf_tpu.ops.stream_compaction import filter_indices

            keep = filter_indices(g.row_mask)
            rows = jnp.take(keep, rows)
        key_cols = [copying.gather(c, rows, bounds_check=False)
                    for c in sgb._original_key_cols()]
        label_col = copying.gather(sgb._obj._index._column, rows,
                                   bounds_check=False)
        idx = MultiIndex([*key_cols, label_col], [*sgb._key_names, None])
        return Series._from(Column(dt.FLOAT64, rows.shape[0], data=data),
                            idx, sgb._obj.name)


class SeriesGroupBy(_GroupByBase):
    def __init__(self, obj: Series, by, level=None, sort=False, dropna=True, as_index=True):
        if by is None and level is None:
            level = 0
        super().__init__(obj, by, level=level, sort=sort, dropna=dropna, as_index=as_index)

    def _lookup_key(self, name) -> Column:
        raise KeyError(f"SeriesGroupBy key {name!r} must be a Series or level")

    def _take_rows(self, rows):
        return self._obj.take(rows)

    def _apply_simple(self, agg: str) -> Series:
        g = self.grouper
        fn = gb_ops._AGG_DISPATCH[agg]
        col = fn(self._obj._column, g)
        return Series._from(col, self._result_index(), self._obj.name)

    def agg(self, func):
        func = _norm_agg(func)
        if isinstance(func, str):
            return self._apply_simple(func)
        if isinstance(func, (list, tuple)):
            cols = {a: gb_ops._AGG_DISPATCH[_norm_agg(a)](
                self._obj._column, self.grouper) for a in func}
            return DataFrame._from(Table(cols), self._result_index())
        raise TypeError(func)

    def ewm(self, com=None, span=None, halflife=None, alpha=None,
            adjust=True, ignore_na=False):
        if alpha is None:
            if com is not None:
                alpha = 1.0 / (1.0 + com)
            elif span is not None:
                alpha = 2.0 / (span + 1.0)
            elif halflife is not None:
                alpha = 1.0 - 0.5 ** (1.0 / halflife)
            else:
                raise ValueError("must pass one of com/span/halflife/alpha")
        return _GroupbyEWM(self, alpha, adjust, ignore_na)

    def unique(self):
        return self._apply_simple("unique")

    aggregate = agg

    def cumsum(self):
        return Series._from(
            gb_ops.group_cumsum(self._obj._column, self.grouper), self._obj._index, self._obj.name
        )

    def cumcount(self):
        return Series._from(gb_ops.group_cumcount(self.grouper), self._obj._index, None)

    def shift(self, periods=1):
        return Series._from(
            gb_ops.group_shift(self._obj._column, self.grouper, periods),
            self._obj._index, self._obj.name,
        )

    def quantile(self, q=0.5, interpolation="linear"):
        col = gb_ops.group_quantile(self._obj._column, self.grouper, q, interpolation)
        return Series._from(col, self._result_index(), self._obj.name)

    def apply(self, func, *args, **kw):
        results = []
        keys = []
        for key, grp in self:
            results.append(func(grp, *args, **kw))
            keys.append(key)
        return Series(results, index=Index(keys, name=self._key_names[0] if len(self._key_names) == 1 else None),
                      name=self._obj.name)


for _agg in _SIMPLE_AGGS:
    if _agg == "size":
        continue

    def _mks(agg=_agg):
        def f(self, *a, **k):
            return self._apply_simple(agg)
        return f

    setattr(SeriesGroupBy, _agg, _mks())


def _norm_agg(a):
    """Normalize builtin/callable agg specs to dispatch names
    (pandas accepts agg(list), agg(set), agg(sum), ...)."""
    if a is list:
        return "list"
    if a is set:
        return "unique"
    if callable(a) and getattr(a, "__name__", None) in (
            "sum", "min", "max", "len"):
        return {"len": "size"}.get(a.__name__, a.__name__)
    return a


def _agg_supported(col: Column, agg: str) -> bool:
    if col.dtype.is_string or col.dtype.is_dictionary:
        return agg in ("count", "size", "nunique", "first", "last", "min",
                       "max", "collect", "list", "unique", "collect_set",
                       "histogram")
    if col.dtype.is_temporal:
        return agg not in ("sum", "prod", "product", "var", "std", "any", "all")
    return True
