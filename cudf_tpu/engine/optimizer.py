"""Plan optimizer: projection pushdown + predicate pushdown into scans.

Replaces the polars Rust optimizer the reference piggybacks on
(reference: callback.py:249 receives an already-optimized plan; here the
optimizer is in-repo).  Rules are conservative rewrites over the IR.
"""

from __future__ import annotations

from typing import Optional, Sequence, Set

from cudf_tpu.engine import ir as IRs
from cudf_tpu.engine.expr import Agg, Col, Expr


def optimize(node: IRs.IR) -> IRs.IR:
    node = push_predicates(node)
    node = push_projections(node, needed=None)
    node = cse(node)
    return node


# ----------------------------------------------------------------------
# common-subplan elimination: structurally-equal subtrees collapse to ONE
# shared node, so IR.evaluate's id-keyed cache computes them once
# (reference: cudf-polars Cache insertion, dsl/ir.py Cache / CSE in the
# polars optimizer the reference piggybacks on)
# ----------------------------------------------------------------------

def cse(node: IRs.IR) -> IRs.IR:
    seen = {}

    def fingerprint(n: IRs.IR, child_fps) -> str:
        parts = [type(n).__name__]
        for k, v in sorted(vars(n).items()):
            if k == "children":
                continue
            if isinstance(v, (str, int, float, bool, type(None))):
                parts.append(f"{k}={v!r}")
            elif isinstance(v, (list, tuple)):
                parts.append(f"{k}={[repr(x) for x in v]}")
            else:
                # tables/columns/expressions: identity-keyed (conservative)
                parts.append(f"{k}@{id(v)}")
        parts.extend(child_fps)
        return "|".join(parts)

    def walk(n: IRs.IR):
        child_results = [walk(c) for c in n.children]
        fps = [fp for fp, _ in child_results]
        new_children = tuple(c for _, c in child_results)
        if any(a is not b for a, b in zip(new_children, n.children)):
            import copy

            n = copy.copy(n)
            n.children = new_children
        fp = fingerprint(n, fps)
        if fp in seen:
            return fp, seen[fp]
        seen[fp] = n
        return fp, n

    return walk(node)[1]


# ----------------------------------------------------------------------
# predicate pushdown: Filter(Scan) → Scan(predicate)
# ----------------------------------------------------------------------

def push_predicates(node: IRs.IR) -> IRs.IR:
    node = _rewrite_children(node, push_predicates)
    if isinstance(node, IRs.Filter):
        child = node.children[0]
        if isinstance(child, IRs.Scan) and child.predicate is None:
            return IRs.Scan(child.fmt, child.paths, child.projection, node.predicate)
        if isinstance(child, IRs.Filter):
            # fuse adjacent filters
            combined = child.predicate & node.predicate
            return push_predicates(IRs.Filter(child.children[0], combined))
    return node


# ----------------------------------------------------------------------
# projection pushdown: only read columns the plan actually uses
# ----------------------------------------------------------------------

def push_projections(node: IRs.IR, needed: Optional[Set[str]]) -> IRs.IR:
    if isinstance(node, IRs.Scan):
        if needed is not None and node.projection is None:
            avail = _scan_schema(node)
            cols = [c for c in avail if c in needed] if avail else sorted(needed)
            return IRs.Scan(node.fmt, node.paths, cols, node.predicate)
        return node
    if isinstance(node, IRs.DataFrameScan):
        if needed is not None and node.projection is None:
            avail = [n for n in node.table.names if n in needed]
            return IRs.DataFrameScan(node.table, avail)
        return node
    if isinstance(node, IRs.Select):
        child_needed = set()
        for e in node.exprs:
            child_needed |= e.references()
        return IRs.Select(push_projections(node.children[0], child_needed), node.exprs)
    if isinstance(node, IRs.HStack):
        child_needed = None
        if needed is not None:
            child_needed = set(needed)
            for e in node.exprs:
                child_needed |= e.references()
        return IRs.HStack(push_projections(node.children[0], child_needed), node.exprs)
    if isinstance(node, IRs.Filter):
        child_needed = None
        if needed is not None:
            child_needed = set(needed) | node.predicate.references()
        return IRs.Filter(push_projections(node.children[0], child_needed), node.predicate)
    if isinstance(node, IRs.GroupBy):
        child_needed = set(node.keys)
        for a in node.aggs:
            child_needed |= a.references()
        return IRs.GroupBy(push_projections(node.children[0], child_needed),
                           node.keys, node.aggs)
    if isinstance(node, IRs.Reduce):
        child_needed = set()
        for a in node.aggs:
            child_needed |= a.references()
        return IRs.Reduce(push_projections(node.children[0], child_needed), node.aggs)
    if isinstance(node, IRs.Join):
        ln = None
        rn = None
        if needed is not None:
            ln = set(node.left_on) | {n for n in needed}
            rn = set(node.right_on) | {n for n in needed}
        return IRs.Join(
            push_projections(node.children[0], ln),
            push_projections(node.children[1], rn),
            node.left_on, node.right_on, node.how, node.suffix,
        )
    if isinstance(node, IRs.Sort):
        child_needed = None if needed is None else set(needed) | set(node.by)
        return IRs.Sort(push_projections(node.children[0], child_needed),
                        node.by, node.descending, node.nulls_last)
    if isinstance(node, IRs.Projection):
        return IRs.Projection(
            push_projections(node.children[0], set(node.columns)), node.columns
        )
    # default: recurse without narrowing
    return _rewrite_children(node, lambda c: push_projections(c, None))


def _scan_schema(node: "IRs.Scan"):
    """Column names available in the scanned file (metadata-only read)."""
    try:
        if node.fmt == "parquet":
            import pyarrow.parquet as pq

            return list(pq.ParquetFile(node.paths[0]).schema_arrow.names)
        if node.fmt == "csv":
            import pyarrow.csv as pacsv

            # read a tiny prefix for the header
            with open(node.paths[0], "rb") as f:
                head = f.readline().decode()
            return [c.strip() for c in head.rstrip("\n").split(",")]
    except Exception:
        return None
    return None


def _rewrite_children(node: IRs.IR, fn) -> IRs.IR:
    if not node.children:
        return node
    new_children = tuple(fn(c) for c in node.children)
    if all(a is b for a, b in zip(new_children, node.children)):
        return node
    import copy

    out = copy.copy(node)
    out.children = new_children
    return out
