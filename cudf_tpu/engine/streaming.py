"""Partitioned (streaming) executor: lower an IR plan to partition-wise
execution with shuffle/broadcast/tree-reduction decompositions.

TPU-native equivalent of cudf-polars' streaming lowering
(reference: streaming/parallel.py lower_ir_graph:128-190, pointwise rule
:315, streaming/groupby.py partial-agg decomposition, streaming/join.py
broadcast-vs-shuffle decision :58-266).

Execution model: a plan evaluates to a *list of Tables* (one per
partition).  Pointwise nodes map over partitions; GroupBy lowers to
local-partial-agg → hash-repartition-by-key → merge; Join lowers to
broadcast (small build side) or hash-shuffle both sides; Sort lowers to
key-rank range partitioning + independent local sorts (sample-sort
shape, streaming/sort.py).  On a multi-chip mesh each partition is
device_put on its own chip so partition-wise ops run chip-local and the
repartition step is the only cross-chip traffic (over ICI).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from cudf_tpu.core.table import Table
from cudf_tpu.engine import ir as IRs
from cudf_tpu.engine.expr import Agg
from cudf_tpu.utils.config import get_option

_POINTWISE = (IRs.Select, IRs.HStack, IRs.Filter, IRs.Projection)


class PerformanceWarning(UserWarning):
    """A Mesh plan fell back from the compiled SPMD path."""


# ----------------------------------------------------------------------
# fallback accounting (the reference's unsupported-node counting +
# fallback_mode contract: dsl/translate.py:146-166, utils/config.py:115)
# ----------------------------------------------------------------------
_FALLBACK_STATS = {"count": 0, "reasons": {}}


def get_fallback_stats() -> dict:
    """{"count": total SPMD→partition-list fallbacks, "reasons":
    {reason: hits}} since the last reset."""
    return {"count": _FALLBACK_STATS["count"],
            "reasons": dict(_FALLBACK_STATS["reasons"])}


def reset_fallback_stats() -> None:
    _FALLBACK_STATS["count"] = 0
    _FALLBACK_STATS["reasons"] = {}


def _record_fallback(exc: Exception) -> None:
    import warnings

    reason = str(exc) or type(exc).__name__
    _FALLBACK_STATS["count"] += 1
    _FALLBACK_STATS["reasons"][reason] = \
        _FALLBACK_STATS["reasons"].get(reason, 0) + 1
    mode = get_option("executor.fallback_mode")
    if mode == "raise":
        raise exc
    if mode == "warn":
        warnings.warn(
            f"SPMD lowering fell back to the partition-list executor: "
            f"{reason}", PerformanceWarning, stacklevel=3)


# ----------------------------------------------------------------------
# executor-hooked automatic spilling (spill_manager.py:202-351 role):
# produced-but-not-yet-consumed partitions spill coldest-first to the
# device budget; consumers unspill one partition at a time
# ----------------------------------------------------------------------

def _spill_budget() -> int:
    explicit = int(get_option("spill.device_limit_bytes") or 0)
    if explicit:
        return explicit
    frac = float(get_option("spill.device_limit_fraction"))
    try:
        import jax

        hbm = jax.devices()[0].memory_stats().get("bytes_limit", 0)
    except Exception:
        hbm = 0
    return int(hbm * frac) if hbm else (1 << 62)


def _auto_spill(t: Table) -> None:
    if not get_option("spill"):
        return
    from cudf_tpu.utils.spill import get_spill_manager

    mgr = get_spill_manager()
    for c in t.columns:
        mgr.register(c)
    mgr.spill_to_budget(_spill_budget())


def _unspill(t: Table) -> Table:
    if not get_option("spill"):
        return t
    from cudf_tpu.utils.spill import get_spill_manager

    mgr = get_spill_manager()
    for c in t.columns:
        mgr.ensure_on_device(c)
    return t


def estimate_source_bytes(node: IRs.IR) -> int:
    """Rough working-set estimate for pass governance: bytes of the plan's
    sources (in-memory tables by nbytes, file scans by on-disk size)."""
    import os

    if isinstance(node, IRs.DataFrameScan):
        return node.do_evaluate().nbytes
    if isinstance(node, IRs.Scan):
        total = 0
        for p in node.paths:
            try:
                total += os.path.getsize(p)
            except OSError:
                total += 1 << 24
        return total
    kids = getattr(node, "children", ())
    return sum(estimate_source_bytes(c) for c in kids) if kids else 0


def choose_partitions(node: IRs.IR) -> int:
    """HBM-budget pass governance: pick partition count so each pass's
    working set stays under executor.target_partition_size (the analogue
    of cudf-polars' target_partition_size / out-of-core chunking)."""
    budget = int(get_option("executor.target_partition_size"))
    est = estimate_source_bytes(node)
    return max(1, min(-(-est // max(budget, 1)), 512))


def evaluate_streaming(node: IRs.IR, mesh_or_nparts=None) -> Table:
    if mesh_or_nparts is None or mesh_or_nparts == "auto":
        n_parts = choose_partitions(node)
    else:
        if not isinstance(mesh_or_nparts, int):
            # a real Mesh: compile the plan into ONE jitted SPMD program
            # whose collectives ride the mesh axis (engine/spmd.py — the
            # lower_ir_graph role); unsupported plan shapes fall through
            # to the partition-list executor below
            from cudf_tpu.engine.spmd import Unlowerable, evaluate_spmd

            if get_option("executor.spmd_lowering"):
                try:
                    return evaluate_spmd(node, mesh_or_nparts)
                except Unlowerable as exc:
                    _record_fallback(exc)
        n_parts = (
            mesh_or_nparts
            if isinstance(mesh_or_nparts, int)
            else int(np.prod(list(mesh_or_nparts.shape.values())))
        )
    parts = [_unspill(p) for p in _eval(node, n_parts)]
    from cudf_tpu.ops.copying import concatenate_tables

    parts = [p for p in parts if p.num_rows > 0] or parts[:1]
    return concatenate_tables(parts)


def _partition_table(t: Table, n: int) -> List[Table]:
    from cudf_tpu.ops import copying

    rows = t.num_rows
    per = -(-rows // n) if rows else 0
    out = []
    for i in range(n):
        lo, hi = i * per, min((i + 1) * per, rows)
        out.append(Table.from_pairs(t.names, [copying.slice(c, lo, max(lo, hi)) for c in t.columns]))
    return out


def _eval(node: IRs.IR, n: int) -> List[Table]:
    # sources ---------------------------------------------------------
    if isinstance(node, IRs.DataFrameScan):
        return _partition_table(node.do_evaluate(), n)
    if isinstance(node, IRs.Scan):
        if len(node.paths) > 1:
            # one partition per file (the reference's per-file scan tasks)
            parts = []
            for p in node.paths:
                sub = IRs.Scan(node.fmt, [p], node.projection, node.predicate)
                parts.append(sub.do_evaluate())
            return parts
        return _partition_table(node.do_evaluate(), n)
    # pointwise: map over partitions ---------------------------------
    if isinstance(node, _POINTWISE):
        parts = _eval(node.children[0], n)
        okeys = _over_keys(node)
        if okeys:
            # window exprs need each key group co-located: repartition by
            # the over-keys first (cudf-polars streaming/over.py role)
            parts = _repartition_by_hash(
                [_unspill(p) for p in parts], okeys, n)
        out = []
        for p in parts:
            r = node.do_evaluate(_unspill(p))
            _auto_spill(r)
            out.append(r)
        return out
    if isinstance(node, IRs.Union):
        out: List[Table] = []
        for c in node.children:
            out.extend(_eval(c, n))
        return out
    # groupby: partial agg → repartition by key hash → merge ---------
    if isinstance(node, IRs.GroupBy):
        return _eval_groupby(node, n)
    # join: broadcast or shuffle -------------------------------------
    if isinstance(node, IRs.Join):
        return _eval_join(node, n)
    # sort: range-partition by KEY rank, then independent local sorts
    # (streaming/sort.py sample-sort role — the global phase touches only
    # the key columns, never gathers the full-width table; round-1's
    # concat-and-resort was flagged as non-scalable)
    if isinstance(node, IRs.Sort):
        parts = [_unspill(p) for p in _eval(node.children[0], n)
                 if p.num_rows > 0]
        if not parts:
            return _eval(node.children[0], 1)
        from cudf_tpu.ops import copying, row_ops
        import jax
        import jax.numpy as jnp

        key_cols = [
            copying.concatenate([p[k] for p in parts])
            for k in node.by
        ]
        total = key_cols[0].length
        order = row_ops.lex_sort_indices(
            key_cols,
            [not d for d in node.descending],
            "last" if node.nulls_last else "first",
        )
        # tie-aware range pids: a key run never straddles partitions, so
        # per-partition stable sorts compose to the exact global order
        neq = None
        for col in key_cols:
            for kk in row_ops.equality_keys(col):
                s = jnp.take(kk, order)
                d = jnp.concatenate(
                    [jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
                neq = d if neq is None else (neq | d)
        pos = jnp.arange(total, dtype=jnp.int64)
        run_start = jax.lax.cummax(jnp.where(neq, pos, jnp.int64(0)))
        pid_sorted = (run_start * n) // max(total, 1)
        from cudf_tpu.ops._utils import inverse_permutation

        pid = np.asarray(jnp.take(pid_sorted, inverse_permutation(order)))
        out_parts: List[List[Table]] = [[] for _ in range(n)]
        row0 = 0
        for p in parts:
            ppid = pid[row0:row0 + p.num_rows]
            row0 += p.num_rows
            for i in np.unique(ppid):
                rows = np.nonzero(ppid == i)[0]
                out_parts[int(i)].append(
                    copying.gather_table(p, jnp.asarray(rows),
                                         bounds_check=False))
        result = []
        for pieces in out_parts:
            if not pieces:
                continue
            t = pieces[0] if len(pieces) == 1 else \
                copying.concatenate_tables(pieces)
            result.append(node.do_evaluate(t))
        return result or [node.do_evaluate(parts[0])]
    if isinstance(node, IRs.Distinct):
        parts = [_unspill(p) for p in _eval(node.children[0], n)]
        # local distinct → repartition by key hash → global distinct
        local = [node.do_evaluate(p) for p in parts]
        keys = node.subset or local[0].names
        shuffled = _repartition_by_hash(local, list(keys), n)
        return [node.do_evaluate(p) for p in shuffled]
    # default: gather to one partition and evaluate singly -----------
    from cudf_tpu.ops.copying import concatenate_tables

    child_tables = []
    for c in node.children:
        parts = [_unspill(p) for p in _eval(c, n) if p.num_rows > 0]
        child_tables.append(concatenate_tables(parts) if parts else _eval(c, 1)[0])
    return [node.do_evaluate(*child_tables)]


def _repartition_by_hash(parts: List[Table], keys: List[str], n: int) -> List[Table]:
    """Hash-shuffle partitions so equal keys land in the same partition
    (the Shuffle IR node, streaming/shuffle.py:25)."""
    from cudf_tpu.ops import copying
    from cudf_tpu.ops.partitioning import hash_partition

    buckets: List[List[Table]] = [[] for _ in range(n)]
    for p in parts:
        if p.num_rows == 0:
            continue
        reordered, offsets = hash_partition(p, keys, n)
        offs = np.asarray(offsets)
        for i in range(n):
            lo, hi = int(offs[i]), int(offs[i + 1])
            if hi > lo:
                buckets[i].append(
                    Table.from_pairs(
                        reordered.names,
                        [copying.slice(c, lo, hi) for c in reordered.columns],
                    )
                )
    out = []
    for i in range(n):
        if buckets[i]:
            out.append(copying.concatenate_tables(buckets[i]))
        else:
            out.append(Table.from_pairs(parts[0].names,
                                        [copying.slice(c, 0, 0) for c in parts[0].columns]))
    return out


def _over_keys(node) -> List[str]:
    """Union of .over() partition keys appearing in a pointwise node's
    expressions (empty = no window exprs)."""
    from cudf_tpu.engine.expr import Over

    keys: List[str] = []

    def walk(e):
        if isinstance(e, Over):
            for k in e.keys:
                if k not in keys:
                    keys.append(k)
        for c in getattr(e, "children", ()):
            walk(c)

    for e in getattr(node, "exprs", ()):
        walk(e)
    pred = getattr(node, "predicate", None)
    if pred is not None:
        walk(pred)
    return keys


_MERGEABLE = {"sum": "sum", "count": "sum", "min": "min", "max": "max", "size": "sum"}


def _eval_groupby(node: IRs.GroupBy, n: int) -> List[Table]:
    from cudf_tpu.engine.expr import Agg as AggE, Col
    from cudf_tpu.ops import groupby as gb

    parts = [_unspill(p) for p in _eval(node.children[0], n)]
    specs = [IRs.unwrap_agg(a) for a in node.aggs]

    # decompose: which partial columns does each agg need?
    partial_specs = []  # (partial_name, inner_expr, partial_agg)
    finals = []         # (out_name, kind, partial names...)
    for name, inner, kind in specs:
        if kind in ("sum", "min", "max", "count", "size"):
            partial_specs.append((name, inner, kind))
            finals.append((name, "direct", [name], _MERGEABLE[kind]))
        elif kind == "mean":
            partial_specs.append((f"__{name}_sum", inner, "sum"))
            partial_specs.append((f"__{name}_cnt", inner, "count"))
            finals.append((name, "mean", [f"__{name}_sum", f"__{name}_cnt"], None))
        elif kind in ("var", "std"):
            # (sum, sum-of-squares, count) partials merge by sum — the
            # M2/MERGE_M2 decomposition (streaming_groupby.cpp role)
            from cudf_tpu.engine.expr import BinOp

            sq = BinOp(inner, inner, "mul")
            partial_specs.append((f"__{name}_sum", inner, "sum"))
            partial_specs.append((f"__{name}_ssq", sq, "sum"))
            partial_specs.append((f"__{name}_cnt", inner, "count"))
            finals.append((name, kind,
                           [f"__{name}_sum", f"__{name}_ssq",
                            f"__{name}_cnt"], None))
        else:
            # non-decomposable (median, nunique, …): fall back to global
            return _groupby_global(node, parts)

    # local partial aggregation per partition
    partials: List[Table] = []
    for p in parts:
        if p.num_rows == 0:
            continue
        sp = [(pn, ie.evaluate(p), pa) for pn, ie, pa in partial_specs]
        k, a = gb.groupby_agg(p.select(node.keys), sp)
        cols = dict(k.items())
        cols.update(dict(a.items()))
        partials.append(Table(cols))
    if not partials:
        return [node.do_evaluate(parts[0])]

    # shuffle partials by key hash, merge per partition
    shuffled = _repartition_by_hash(partials, node.keys, n)
    out_parts = []
    for sp_table in shuffled:
        merge_specs = []
        for pn, _, pa in partial_specs:
            merge_specs.append((pn, sp_table[pn], _MERGEABLE[pa]))
        k, a = gb.groupby_agg(sp_table.select(node.keys), merge_specs)
        cols = dict(k.items())
        from cudf_tpu.ops.binaryop import binary_operation

        merged = dict(a.items())
        for name, how, pnames, _ in finals:
            if how == "direct":
                cols[name] = merged[pnames[0]]
            elif how == "mean":
                cols[name] = binary_operation(merged[pnames[0]], merged[pnames[1]], "truediv")
            else:  # var/std: (ssq - sum^2/n) / (n - 1)
                s_, ssq, cnt = (merged[p] for p in pnames)
                mean_sq = binary_operation(
                    binary_operation(s_, s_, "mul"), cnt, "truediv")
                num = binary_operation(ssq, mean_sq, "sub")
                from cudf_tpu.core.column import as_column

                denom = binary_operation(
                    cnt, as_column([1] * cnt.length), "sub")
                var = binary_operation(num, denom, "truediv")
                if how == "std":
                    from cudf_tpu.ops.unary import unary_operation

                    var = unary_operation(var, "sqrt")
                cols[name] = var
        out_parts.append(Table(cols))
    return out_parts


def _groupby_global(node: IRs.GroupBy, parts: List[Table]) -> List[Table]:
    from cudf_tpu.ops.copying import concatenate_tables

    nonempty = [p for p in parts if p.num_rows > 0]
    t = concatenate_tables(nonempty) if nonempty else parts[0]
    return [node.do_evaluate(t)]


def _eval_join(node: IRs.Join, n: int) -> List[Table]:
    from cudf_tpu.ops.copying import concatenate_tables

    left_parts = [_unspill(p) for p in _eval(node.children[0], n)]
    right_parts = [_unspill(p) for p in _eval(node.children[1], n)]
    right_bytes = sum(p.nbytes for p in right_parts)
    limit = get_option("executor.broadcast_limit")
    if right_bytes <= limit and node.how in ("inner", "left", "semi", "anti"):
        # broadcast join: small build side replicated to every partition
        # (_should_bcast_join, streaming/join.py:95-135)
        nonempty = [p for p in right_parts if p.num_rows > 0]
        right_all = concatenate_tables(nonempty) if nonempty else right_parts[0]
        return [node.do_evaluate(p, right_all) for p in left_parts]
    # shuffle join: repartition both sides on key hash; for inner/semi,
    # a bloom filter built from the (smaller) right side pre-filters left
    # partitions BEFORE the all-to-all, cutting shuffle volume on ICI
    # (reference: join-filter pushdown in cudf-polars' runtime filters)
    if node.how in ("inner", "semi") and right_bytes <= 8 * limit:
        from cudf_tpu.ops.bloom import BloomFilter
        from cudf_tpu.ops.stream_compaction import filter_indices
        from cudf_tpu.ops import copying as _cp

        bf = BloomFilter(num_bits=1 << 22)
        for p in right_parts:
            if p.num_rows:
                bf.add([p[k] for k in node.right_on])
        filtered = []
        for p in left_parts:
            if p.num_rows == 0:
                filtered.append(p)
                continue
            keep = filter_indices(bf.maybe_contains([p[k] for k in node.left_on]))
            filtered.append(_cp.gather_table(p, keep, bounds_check=False))
        left_parts = filtered
    ls = _repartition_by_hash([p for p in left_parts], node.left_on, n)
    rs = _repartition_by_hash([p for p in right_parts], node.right_on, n)
    return [node.do_evaluate(l, r) for l, r in zip(ls, rs)]
