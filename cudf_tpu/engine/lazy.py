"""LazyFrame — the polars-flavored lazy query API.

TPU-native equivalent of the cudf-polars entry surface
(reference: LazyFrame.collect(engine=GPUEngine) → execute_with_cudf,
callback.py:325).  Builds the engine IR, optimizes, executes in-memory
(``collect``) or distributed over a mesh (``collect(mesh=...)`` via
engine/streaming.py lowering).
"""

from __future__ import annotations

from typing import Optional, Sequence

from cudf_tpu.core.table import Table
from cudf_tpu.engine import ir as IRs
from cudf_tpu.engine.expr import Agg, Col, Expr, col, lit
from cudf_tpu.engine.optimizer import optimize


class LazyFrame:
    def __init__(self, node: IRs.IR):
        self._node = node

    # sources ---------------------------------------------------------
    @staticmethod
    def from_dataframe(df) -> "LazyFrame":
        return LazyFrame(IRs.DataFrameScan(df._table))

    # transformations -------------------------------------------------
    def select(self, *exprs) -> "LazyFrame":
        return LazyFrame(IRs.Select(self._node, [_as_expr(e) for e in _flatten(exprs)]))

    def with_columns(self, *exprs) -> "LazyFrame":
        return LazyFrame(IRs.HStack(self._node, [_as_expr(e) for e in _flatten(exprs)]))

    def filter(self, predicate: Expr) -> "LazyFrame":
        return LazyFrame(IRs.Filter(self._node, predicate))

    def group_by(self, *keys) -> "_LazyGroupBy":
        return _LazyGroupBy(self, [k if isinstance(k, str) else k.name for k in _flatten(keys)])

    groupby = group_by

    def join(self, other: "LazyFrame", on=None, left_on=None, right_on=None,
             how: str = "inner", suffix: str = "_right") -> "LazyFrame":
        if on is not None:
            on = [on] if isinstance(on, str) else list(on)
            left_on = right_on = on
        else:
            left_on = [left_on] if isinstance(left_on, str) else list(left_on)
            right_on = [right_on] if isinstance(right_on, str) else list(right_on)
        return LazyFrame(IRs.Join(self._node, other._node, left_on, right_on, how, suffix))

    def sort(self, by, descending=False, nulls_last: bool = True) -> "LazyFrame":
        by = [by] if isinstance(by, str) else list(by)
        desc = [descending] * len(by) if isinstance(descending, bool) else list(descending)
        return LazyFrame(IRs.Sort(self._node, by, desc, nulls_last))

    def unique(self, subset=None, keep: str = "first") -> "LazyFrame":
        subset = [subset] if isinstance(subset, str) else subset
        return LazyFrame(IRs.Distinct(self._node, subset, keep))

    def head(self, n: int = 5) -> "LazyFrame":
        return LazyFrame(IRs.Slice(self._node, 0, n))

    def tail(self, n: int = 5) -> "LazyFrame":
        return LazyFrame(IRs.Slice(self._node, -n, None))

    def slice(self, offset: int, length: Optional[int] = None) -> "LazyFrame":
        return LazyFrame(IRs.Slice(self._node, offset, length))

    def drop(self, *columns) -> "LazyFrame":
        cols = [c for c in self._node.schema() if c not in set(_flatten(columns))]
        return LazyFrame(IRs.Projection(self._node, cols))

    def rename(self, mapping: dict) -> "LazyFrame":
        exprs = [col(n).alias(mapping.get(n, n)) for n in self._node.schema()]
        return LazyFrame(IRs.Select(self._node, exprs))

    def map_batches(self, fn, name: str = "map") -> "LazyFrame":
        return LazyFrame(IRs.MapFunction(self._node, fn, name))

    def sink_parquet(self, path: str) -> "LazyFrame":
        return LazyFrame(IRs.Sink(self._node, "parquet", path))

    def sink_csv(self, path: str) -> "LazyFrame":
        return LazyFrame(IRs.Sink(self._node, "csv", path))

    def cache(self) -> "LazyFrame":
        return LazyFrame(IRs.Cache(self._node))

    def concat(self, *others: "LazyFrame") -> "LazyFrame":
        return LazyFrame(IRs.Union(self._node, *[o._node for o in others]))

    # aggregation without keys ---------------------------------------
    def agg(self, *aggs) -> "LazyFrame":
        return LazyFrame(IRs.Reduce(self._node, [_as_expr(a) for a in _flatten(aggs)]))

    # execution -------------------------------------------------------
    def optimized(self) -> IRs.IR:
        return optimize(self._node)

    def explain(self, optimized: bool = True) -> str:
        node = self.optimized() if optimized else self._node
        return node.explain()

    def collect(self, mesh=None, no_optimization: bool = False, streaming=False):
        """mesh: int partition count, a jax Mesh, or "auto" (HBM-budget
        pass governance picks the partition count); streaming=True is
        shorthand for mesh="auto"."""
        from cudf_tpu.frame.dataframe import DataFrame
        from cudf_tpu.frame.index import default_index

        node = self._node if no_optimization else self.optimized()
        if streaming and mesh is None:
            mesh = "auto"
        if mesh is not None:
            from cudf_tpu.engine.streaming import evaluate_streaming

            t = evaluate_streaming(node, mesh)
        else:
            t = node.evaluate({})
        return DataFrame._from(t, default_index(t.num_rows))

    @property
    def columns(self):
        return self._node.schema()

    def __repr__(self):
        return f"LazyFrame\n{self._node.explain()}"


class _LazyGroupBy:
    def __init__(self, lf: LazyFrame, keys: Sequence[str]):
        self._lf = lf
        self._keys = list(keys)

    def agg(self, *aggs) -> LazyFrame:
        agg_list = []
        for a in _flatten(aggs):
            e = _as_expr(a)
            IRs.unwrap_agg(e)  # validates Agg or Alias(Agg)
            agg_list.append(e)
        return LazyFrame(IRs.GroupBy(self._lf._node, self._keys, agg_list))


def _flatten(items):
    out = []
    for it in items:
        if isinstance(it, (list, tuple)):
            out.extend(it)
        else:
            out.append(it)
    return out


def _as_expr(e) -> Expr:
    if isinstance(e, Expr):
        return e
    if isinstance(e, str):
        return col(e)
    return lit(e)


def scan_parquet(path, columns=None) -> LazyFrame:
    paths = [path] if isinstance(path, str) else list(path)
    return LazyFrame(IRs.Scan("parquet", paths, columns))


def scan_csv(path, columns=None) -> LazyFrame:
    paths = [path] if isinstance(path, str) else list(path)
    return LazyFrame(IRs.Scan("csv", paths, columns))


def from_dataframe(df) -> LazyFrame:
    return LazyFrame.from_dataframe(df)
