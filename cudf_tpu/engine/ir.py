"""Logical IR node set + in-memory executor.

TPU-native equivalent of cudf-polars' DSL IR
(reference: python/cudf_polars/cudf_polars/dsl/ir.py:337-3666 — the 23-node
inventory: Scan, DataFrameScan, Select, Reduce, GroupBy, Join,
ConditionalJoin, HStack, Distinct, Sort, Slice, Filter, Projection,
MergeSorted, MapFunction, Union, HConcat, Empty, Cache, Sink, ErrorNode).

Every node has a static ``do_evaluate`` over child results and a cached
``evaluate`` (ir.py:288,534 pattern).  The multi-chip lowering in
engine/streaming.py rewrites this same graph with partitioning info.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.core import dtypes as dt
from cudf_tpu.engine.expr import Agg, Col, Expr


class IR:
    children: Tuple["IR", ...] = ()

    def schema(self) -> List[str]:
        raise NotImplementedError

    def do_evaluate(self, *child_tables: Table) -> Table:
        raise NotImplementedError

    def evaluate(self, cache: Optional[Dict[int, Table]] = None) -> Table:
        cache = cache if cache is not None else {}
        key = id(self)
        if key in cache:
            return cache[key]
        out = self.do_evaluate(*[c.evaluate(cache) for c in self.children])
        cache[key] = out
        return out

    def explain(self, depth: int = 0) -> str:
        pad = "  " * depth
        lines = [f"{pad}{self.__class__.__name__}{self._explain_args()}"]
        for c in self.children:
            lines.append(c.explain(depth + 1))
        return "\n".join(lines)

    def _explain_args(self) -> str:
        return ""


class DataFrameScan(IR):
    """In-memory table source (ir.py DataFrameScan)."""

    def __init__(self, table: Table, projection: Optional[Sequence[str]] = None):
        self.table = table
        self.projection = list(projection) if projection is not None else None

    def schema(self):
        return self.projection or list(self.table.names)

    def do_evaluate(self) -> Table:
        return self.table.select(self.projection) if self.projection else self.table

    def _explain_args(self):
        return f"(cols={self.schema()})"


class Scan(IR):
    """File source with projection + predicate pushdown (ir.py Scan)."""

    def __init__(self, fmt: str, paths: Sequence[str],
                 projection: Optional[Sequence[str]] = None,
                 predicate: Optional[Expr] = None):
        self.fmt = fmt
        self.paths = list(paths)
        self.projection = list(projection) if projection is not None else None
        self.predicate = predicate

    def schema(self):
        if self.projection:
            return list(self.projection)
        df = self._read_one(self.paths[0], head=True)
        return list(df._table.names)

    def _read_cols(self):
        """Columns to physically read: projection ∪ predicate references."""
        if self.projection is None:
            return None
        cols = list(self.projection)
        if self.predicate is not None:
            for r in sorted(self.predicate.references()):
                if r not in cols:
                    cols.append(r)
        return cols

    def _read_one(self, path, head=False):
        if self.fmt == "parquet":
            from cudf_tpu.io.parquet import read_parquet

            filters = _predicate_to_filters(self.predicate) if self.predicate else None
            return read_parquet(path, columns=self._read_cols(), filters=filters)
        if self.fmt == "csv":
            from cudf_tpu.io.csv import read_csv

            return read_csv(path, usecols=self._read_cols())
        raise ValueError(self.fmt)

    def do_evaluate(self) -> Table:
        from cudf_tpu.ops.copying import concatenate_tables

        tables = [self._read_one(p)._table for p in self.paths]
        t = tables[0] if len(tables) == 1 else concatenate_tables(tables)
        if self.predicate is not None:
            t = _filter_table(t, self.predicate)
        if self.projection is not None:
            t = t.select(self.projection)
        return t

    def _explain_args(self):
        return f"({self.fmt}, {len(self.paths)} file(s), cols={self.projection}, pred={self.predicate!r})"


class Select(IR):
    """Projection + expression evaluation (ir.py Select)."""

    def __init__(self, child: IR, exprs: Sequence[Expr]):
        self.children = (child,)
        self.exprs = list(exprs)

    def schema(self):
        return [e.output_name for e in self.exprs]

    def do_evaluate(self, t: Table) -> Table:
        return Table.from_pairs(
            [e.output_name for e in self.exprs],
            [e.evaluate(t) for e in self.exprs],
        )

    def _explain_args(self):
        return f"({[e.output_name for e in self.exprs]})"


class HStack(IR):
    """with_columns: append computed columns (ir.py HStack)."""

    def __init__(self, child: IR, exprs: Sequence[Expr]):
        self.children = (child,)
        self.exprs = list(exprs)

    def schema(self):
        base = self.children[0].schema()
        return base + [e.output_name for e in self.exprs if e.output_name not in base]

    def do_evaluate(self, t: Table) -> Table:
        out = t
        for e in self.exprs:
            out = out.insert(e.output_name, e.evaluate(t))
        return out


class Filter(IR):
    def __init__(self, child: IR, predicate: Expr):
        self.children = (child,)
        self.predicate = predicate

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, t: Table) -> Table:
        return _filter_table(t, self.predicate)

    def _explain_args(self):
        return f"({self.predicate!r})"


class GroupBy(IR):
    def __init__(self, child: IR, keys: Sequence[str], aggs: Sequence[Agg]):
        self.children = (child,)
        self.keys = list(keys)
        self.aggs = list(aggs)

    def schema(self):
        return self.keys + [a.output_name for a in self.aggs]

    def do_evaluate(self, t: Table) -> Table:
        from cudf_tpu.ops import groupby as gb

        specs = []
        for a in self.aggs:
            name, inner, kind = unwrap_agg(a)
            specs.append((name, inner.evaluate(t), kind))
        keys_t = t.select(self.keys)
        out_keys, out_aggs = gb.groupby_agg(keys_t, specs)
        cols = dict(out_keys.items())
        cols.update(dict(out_aggs.items()))
        return Table(cols)

    def _explain_args(self):
        return f"(keys={self.keys}, aggs={[repr(a) for a in self.aggs]})"


class Reduce(IR):
    """Whole-table aggregation → 1-row table (ir.py Reduce)."""

    def __init__(self, child: IR, aggs: Sequence[Agg]):
        self.children = (child,)
        self.aggs = list(aggs)

    def schema(self):
        return [a.output_name for a in self.aggs]

    def do_evaluate(self, t: Table) -> Table:
        return Table.from_pairs(
            [a.output_name for a in self.aggs], [a.evaluate(t) for a in self.aggs]
        )


class Join(IR):
    def __init__(self, left: IR, right: IR, left_on: Sequence[str],
                 right_on: Sequence[str], how: str = "inner",
                 suffix: str = "_right"):
        self.children = (left, right)
        self.left_on = list(left_on)
        self.right_on = list(right_on)
        self.how = how
        self.suffix = suffix

    def schema(self):
        ls = self.children[0].schema()
        rs = [n for n in self.children[1].schema() if n not in self.right_on]
        return ls + [n + self.suffix if n in ls else n for n in rs]

    def do_evaluate(self, lt: Table, rt: Table) -> Table:
        from cudf_tpu.ops import copying, join as join_ops

        lk = [lt[k] for k in self.left_on]
        rk = [rt[k] for k in self.right_on]
        # nulls_equal=False: the polars ``join_nulls=False`` default
        # (null keys never match in the lazy engine; DataFrame.merge
        # keeps the pandas/cudf null_equality::EQUAL semantic)
        if self.how == "inner":
            li, ri = join_ops.inner_join(lk, rk, nulls_equal=False)
        elif self.how == "left":
            li, ri = join_ops.left_join(lk, rk, nulls_equal=False)
        elif self.how in ("outer", "full"):
            li, ri = join_ops.full_join(lk, rk, nulls_equal=False)
        elif self.how == "cross":
            li, ri = join_ops.cross_join(lt.num_rows, rt.num_rows)
        elif self.how == "semi":
            idx = join_ops.semi_join(lk, rk, nulls_equal=False)
            return copying.gather_table(lt, idx, bounds_check=False)
        elif self.how == "anti":
            idx = join_ops.anti_join(lk, rk, nulls_equal=False)
            return copying.gather_table(lt, idx, bounds_check=False)
        else:
            raise ValueError(self.how)
        cols = {}
        for n in lt.names:
            col = copying.gather(lt[n], li, bounds_check=True)
            if n in self.left_on and self.how in ("outer", "full") and n in self.right_on:
                from cudf_tpu.ops.replace import replace_nulls_column

                rcol = copying.gather(rt[n], ri, bounds_check=True)
                col = replace_nulls_column(col, rcol)
            cols[n] = col
        for n in rt.names:
            if n in self.right_on:
                continue
            name = n + self.suffix if n in cols else n
            cols[name] = copying.gather(rt[n], ri, bounds_check=True)
        return Table(cols)

    def _explain_args(self):
        return f"(how={self.how}, on={list(zip(self.left_on, self.right_on))})"


class ConditionalJoin(IR):
    """Join on an arbitrary predicate (reference: conditional_join.cu).

    Round-1 strategy: block-nested-loop via cross ranges — only for small
    inputs; hash/sort paths handle equality joins.
    """

    def __init__(self, left: IR, right: IR, predicate, how: str = "inner"):
        self.children = (left, right)
        self.predicate = predicate  # callable (lt, rt, li, ri) -> bool mask
        self.how = how

    def schema(self):
        return self.children[0].schema() + self.children[1].schema()

    def do_evaluate(self, lt: Table, rt: Table) -> Table:
        from cudf_tpu.ops import copying, join as join_ops
        from cudf_tpu.ops.stream_compaction import filter_indices
        import jax.numpy as jnp

        li, ri = join_ops.cross_join(lt.num_rows, rt.num_rows)
        lg = copying.gather_table(lt, li, bounds_check=False)
        rg = copying.gather_table(rt, ri, bounds_check=False)
        mask_col = self.predicate(lg, rg)
        m = mask_col.data.astype(jnp.bool_)
        if mask_col.validity is not None:
            m = m & mask_col.validity
        keep = filter_indices(m)
        cols = dict(copying.gather_table(lg, keep, bounds_check=False).items())
        for n, c in copying.gather_table(rg, keep, bounds_check=False).items():
            cols[n if n not in cols else n + "_right"] = c
        return Table(cols)


class Sort(IR):
    def __init__(self, child: IR, by: Sequence[str], descending: Sequence[bool] = (),
                 nulls_last: bool = True):
        self.children = (child,)
        self.by = list(by)
        self.descending = list(descending) or [False] * len(self.by)
        self.nulls_last = nulls_last

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, t: Table) -> Table:
        from cudf_tpu.ops import copying, sort as sort_ops

        order = sort_ops.sorted_order(
            [t[k] for k in self.by],
            [not d for d in self.descending],
            "last" if self.nulls_last else "first",
        )
        return copying.gather_table(t, order, bounds_check=False)

    def _explain_args(self):
        return f"(by={self.by}, desc={self.descending})"


class Distinct(IR):
    def __init__(self, child: IR, subset: Optional[Sequence[str]] = None, keep: str = "first"):
        self.children = (child,)
        self.subset = list(subset) if subset else None
        self.keep = keep

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, t: Table) -> Table:
        from cudf_tpu.ops import stream_compaction as sc

        return sc.distinct(t, self.subset, self.keep)


class Slice(IR):
    def __init__(self, child: IR, offset: int, length: Optional[int]):
        self.children = (child,)
        self.offset = offset
        self.length = length

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, t: Table) -> Table:
        from cudf_tpu.ops import copying

        start = self.offset if self.offset >= 0 else t.num_rows + self.offset
        stop = t.num_rows if self.length is None else start + self.length
        return Table.from_pairs(t.names, [copying.slice(c, start, stop) for c in t.columns])


class Projection(IR):
    def __init__(self, child: IR, columns: Sequence[str]):
        self.children = (child,)
        self.columns = list(columns)

    def schema(self):
        return list(self.columns)

    def do_evaluate(self, t: Table) -> Table:
        return t.select(self.columns)

    def _explain_args(self):
        return f"({self.columns})"


class Union(IR):
    """Vertical concat (ir.py Union)."""

    def __init__(self, *children: IR):
        self.children = tuple(children)

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, *tables: Table) -> Table:
        from cudf_tpu.ops.copying import concatenate_tables

        return concatenate_tables(list(tables))


class HConcat(IR):
    def __init__(self, *children: IR):
        self.children = tuple(children)

    def schema(self):
        out = []
        for c in self.children:
            out.extend(c.schema())
        return out

    def do_evaluate(self, *tables: Table) -> Table:
        cols = {}
        for t in tables:
            for n, c in t.items():
                cols[n] = c
        return Table(cols)


class MergeSorted(IR):
    """k-way merge of pre-sorted inputs (ir.py MergeSorted / merge.cu)."""

    def __init__(self, by: str, *children: IR):
        self.children = tuple(children)
        self.by = by

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, *tables: Table) -> Table:
        from cudf_tpu.ops import copying, join as join_ops

        order = join_ops.merge_sorted([[t[self.by]] for t in tables])
        merged = copying.concatenate_tables(list(tables))
        return copying.gather_table(merged, order, bounds_check=False)


class MapFunction(IR):
    """Escape hatch: arbitrary Table→Table function (ir.py MapFunction)."""

    def __init__(self, child: IR, fn, name: str = "map"):
        self.children = (child,)
        self.fn = fn
        self.name = name

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, t: Table) -> Table:
        return self.fn(t)

    def _explain_args(self):
        return f"({self.name})"


class Rolling(IR):
    """Windowed aggregation over a sorted column (ir.py Rolling).

    exprs: list of (output_name, value_column, agg, window) specs.
    """

    def __init__(self, child: IR, index_col: str, period: int,
                 aggs: Sequence):
        self.children = (child,)
        self.index_col = index_col
        self.period = period
        self.aggs = list(aggs)  # (out_name, col_name, agg)

    def schema(self):
        return [self.index_col] + [a[0] for a in self.aggs]

    def do_evaluate(self, t: Table) -> Table:
        from cudf_tpu.frame.window import Rolling as FrameRolling
        from cudf_tpu.frame.series import Series
        from cudf_tpu.frame.index import default_index

        cols = {self.index_col: t[self.index_col]}
        for out_name, col_name, agg in self.aggs:
            s = Series._from(t[col_name], default_index(t.num_rows), col_name)
            r = getattr(FrameRolling(s, self.period), agg)()
            cols[out_name] = r._column
        return Table(cols)


class PythonScan(IR):
    """Source backed by an arbitrary python callable returning a Table /
    DataFrame (ir.py PythonScan — the polars python-source escape hatch)."""

    def __init__(self, fn, schema_hint: Sequence[str] = ()):
        self.fn = fn
        self._schema = list(schema_hint)

    def schema(self):
        return self._schema or list(self.do_evaluate().names)

    def do_evaluate(self) -> Table:
        out = self.fn()
        return out._table if hasattr(out, "_table") else out


class Empty(IR):
    def __init__(self, names: Sequence[str] = ()):
        self.names = list(names)

    def schema(self):
        return list(self.names)

    def do_evaluate(self) -> Table:
        return Table({n: Column.empty(dt.FLOAT64) for n in self.names})


class Cache(IR):
    """Explicit subplan caching (ir.py Cache) — evaluate() already memoizes
    by node identity; Cache marks shared subtrees so the optimizer keeps
    them shared."""

    def __init__(self, child: IR):
        self.children = (child,)

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, t: Table) -> Table:
        return t


class Sink(IR):
    """Write the result to a file (ir.py Sink)."""

    def __init__(self, child: IR, fmt: str, path: str):
        self.children = (child,)
        self.fmt = fmt
        self.path = path

    def schema(self):
        return self.children[0].schema()

    def do_evaluate(self, t: Table) -> Table:
        from cudf_tpu.frame.dataframe import DataFrame
        from cudf_tpu.frame.index import default_index

        df = DataFrame._from(t, default_index(t.num_rows))
        if self.fmt == "parquet":
            df.to_parquet(self.path)
        elif self.fmt == "csv":
            df.to_csv(self.path, index=False)
        else:
            raise ValueError(self.fmt)
        return t


class ErrorNode(IR):
    def __init__(self, message: str):
        self.message = message

    def schema(self):
        return []

    def do_evaluate(self) -> Table:
        raise RuntimeError(self.message)


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------

def unwrap_agg(e: Expr):
    """(output_name, inner_expr, agg_kind) from Agg or Alias(Agg)."""
    from cudf_tpu.engine.expr import Alias

    name = e.output_name
    while isinstance(e, Alias):
        e = e.children[0]
    if not isinstance(e, Agg):
        raise TypeError(f"expected an aggregation expression, got {e!r}")
    return name, e.children[0], e.agg


def _filter_table(t: Table, predicate: Expr) -> Table:
    import jax.numpy as jnp

    from cudf_tpu.ops.stream_compaction import apply_boolean_mask_table

    mask = predicate.evaluate(t)
    return apply_boolean_mask_table(t, mask)


def _predicate_to_filters(pred: Expr):
    """Lower simple predicates to parquet row-group filters
    (predicate pushdown, reference: predicate_pushdown.cpp)."""
    from cudf_tpu.engine.expr import BinOp, Col, Literal

    def conj(e) -> Optional[list]:
        if isinstance(e, BinOp) and e.op == "and":
            a = conj(e.children[0])
            b = conj(e.children[1])
            return a + b if a is not None and b is not None else None
        if isinstance(e, BinOp) and e.op in ("eq", "ne", "lt", "gt", "le", "ge"):
            l, r = e.children
            if isinstance(l, Col) and isinstance(r, Literal):
                op = {"eq": "==", "ne": "!=", "lt": "<", "gt": ">", "le": "<=", "ge": ">="}[e.op]
                return [(l.name, op, r.value)]
        return None

    return conj(pred)
