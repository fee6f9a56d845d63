"""SPMD lowering: compile a LazyFrame IR plan into ONE jitted shard_map
program over a jax Mesh whose collectives ride the mesh axis.

TPU-native equivalent of cudf-polars' distributed lowering + SPMD engine
(reference: python/cudf_polars/cudf_polars/streaming/parallel.py
lower_ir_graph:128-190, engine/spmd.py:255-826).  Where the reference
rewrites each IR node into a rapidsmpf actor sub-network, here each node
lowers to a shard-local closure composed of jnp ops and the composable
shard bodies from parallel/dist.py (shuffle_by_keys, dist_groupby_agg_
shard, _dist_join_shard, _dist_sort_shard); the whole plan traces into a
single XLA program under shard_map, so the only host round trip is the
final collect.

Coverage: numeric/dictionary/nullable columns (per-column validity masks
flow through the traced program — the null_mask.hpp role), pointwise
Select/HStack/Filter/Projection, GroupBy over decomposable aggs
(sum/count/size/mean/min/max/var/std, null-aware), inner/left/full/
semi/anti joins (broadcast or shuffle; left/full surface unmatched rows
as nulls via masks, join.hpp semantics), single- and multi-key Sort
(bounded keys mixed-radix-pack; unbounded keys chain per-column order
encodings through the multi-key sample sort), Distinct over int
columns, Union, Reduce, and a top-level Slice.  Anything else raises
Unlowerable and the caller (evaluate_streaming) falls back to the
partition-list executor with fallback accounting — the reference's
translate-time unsupported-node discipline (dsl/translate.py:146,
utils/config.py:115-129 fallback_mode).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.engine import ir as IRs
from cudf_tpu.engine.expr import Agg, Over


class Unlowerable(Exception):
    """Plan shape not supported by the SPMD compiler (fallback signal)."""


_POINTWISE = (IRs.Select, IRs.HStack, IRs.Filter, IRs.Projection)
_MERGE_OP = {"sum": "sum", "count": "sum", "size": "sum",
             "min": "min", "max": "max"}


class _Stream:
    """Shard-local value flowing between lowered nodes inside the traced
    program: named arrays + a row-validity mask (padded static shapes).

    ``over`` is an int64[1] per-shard count of rows dropped by any static
    output budget upstream (join expansion, shuffle capacity, sort
    capacity).  evaluate_spmd checks it after the run and re-lowers with
    a larger budget factor — the count-then-allocate discipline of
    inner_join_size.cu amortized to the rare-overflow case, with NO
    silent truncation.

    ``masks`` carries PER-COLUMN validity (bool arrays, True = non-null)
    for nullable columns only — the null_mask.hpp role inside the traced
    program.  Row padding/compaction stays in ``valid``; a column absent
    from ``masks`` is all-valid.  Left/full joins introduce masks for
    the non-preserved side's payload; nullable sources carry theirs in.
    """

    def __init__(self, cols: Dict[str, "jnp.ndarray"], valid, over=None,
                 tok=None, masks: Optional[Dict[str, "jnp.ndarray"]] = None):
        import jax.numpy as jnp

        self.cols = cols
        self.valid = valid
        self.over = over if over is not None else jnp.zeros((1,), jnp.int64)
        # collective-ordering token (see _Lowering._after): None except on
        # the CPU backend, where it chains otherwise-independent
        # collectives into program order
        self.tok = tok
        self.masks = masks or {}

    def table(self, dtypes: Dict[str, dt.DType], dicts=None) -> Table:
        n = next(iter(self.cols.values())).shape[0]
        cols = {}
        for name, arr in self.cols.items():
            d = dtypes[name]
            kids = ()
            if d.is_dictionary and dicts and name in dicts:
                # the dictionary itself enters the trace as a constant,
                # so string expressions over dict columns lower to
                # device-tier chunk compares
                kids = [dicts[name]]
            cols[name] = Column(d, n, data=arr, children=kids,
                                validity=self.masks.get(name))
        return Table(cols)


class _Lowering:
    """Host-side compile pass: walks the IR once, evaluates sources,
    registers their sharded arrays, and builds the composed shard-local
    program (a closure tree over _Stream)."""

    def __init__(self, mesh, axis: str = "x", out_factor: int = 1):
        import jax

        self.mesh = mesh
        self.axis = axis
        self.out_factor = int(out_factor)   # static-budget growth on retry
        self.num_parts = int(mesh.shape[axis])
        self.sources: List = []      # flat list of sharded source arrays
        self.dicts: Dict[str, Column] = {}   # output name -> dictionary
        # XLA's CPU thunk executor deadlocks when per-device threads reach
        # INDEPENDENT collectives of one module in different orders (each
        # blocks at a different rendezvous; observed on q5/q9/q10 at the
        # 8-virtual-device mesh).  On the CPU backend every collective
        # node threads an ordering token (lax.optimization_barrier) so
        # the module's collectives form one chain.  TPU keeps collective
        # overlap (its runtime orders collectives itself).
        self.serialize_collectives = (
            mesh.devices.flat[0].platform == "cpu")

    # -- source registration (host side) ------------------------------
    def _register_source(self, table: Table):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = table.num_rows
        per = -(-max(n, 1) // self.num_parts)
        total = per * self.num_parts
        sharding = NamedSharding(self.mesh, P(self.axis))
        idxs: Dict[str, int] = {}
        midxs: Dict[str, int] = {}    # name -> source index of its mask
        dtypes: Dict[str, dt.DType] = {}
        raw: List = []
        for name in table.names:
            col = table[name]
            if col.dtype.is_string:
                from cudf_tpu.ops.dictionary import encode as dict_encode

                col = dict_encode(col)
            if col.validity is not None:
                # nullable source: the byte-wide validity rides as one
                # more sharded array and becomes the column's in-program
                # mask (null_mask.hpp role)
                midxs[name] = len(self.sources) + len(raw)
                raw.append(col.validity)
            if col.dtype.is_dictionary:
                # capture the dictionary with NUMPY buffers: inside
                # shard_map, closed-over jax arrays become tracers, but
                # numpy constants stay python-concrete so string ops can
                # still take host metadata decisions (max length etc.).
                # Column.__init__ coerces to jax arrays, so override the
                # buffers on a shallow copy.
                import copy as _copy

                k = _copy.copy(col.children[0])
                if k.data is not None:
                    k.data = np.asarray(k.data)
                if k.offsets is not None:
                    k.offsets = np.asarray(k.offsets)
                if k.validity is not None:
                    k.validity = np.asarray(k.validity)
                self.dicts[name] = k
            elif not (col.dtype.is_numeric or col.dtype.is_bool
                      or col.dtype.is_temporal):
                raise Unlowerable(f"source column {name!r}: {col.dtype}")
            idxs[name] = len(self.sources) + len(raw)
            raw.append(col.data)
            dtypes[name] = col.dtype
        # ONE jitted pad+shard dispatch for the whole table: the tunnel
        # charges a host round-trip per dispatch, so per-column
        # concatenate+device_put registration measured 2.2 s/column on
        # TPC-H q1 (lower_py 120 s) — batching makes it one RPC.
        # When no padding is needed (total == n; always true on a
        # 1-device mesh) skip the compiled program entirely: device_put
        # with the target sharding is a pure placement (no XLA compile —
        # each small compile costs seconds over the axon tunnel).
        if total == n:
            placed = [jax.device_put(x, sharding) for x in raw]
            placed.append(jax.device_put(
                np.ones((total,), np.bool_), sharding))
        else:
            shapes = tuple((x.shape, np.dtype(x.dtype).str) for x in raw)
            placed = _pad_shard(self.mesh, self.axis, shapes, n, total)(*raw)
        self.sources.extend(placed[:-1])
        vidx = len(self.sources)
        self.sources.append(placed[-1])

        def fn(srcs, tok=None):
            return _Stream({name: srcs[i] for name, i in idxs.items()},
                           srcs[vidx], tok=tok,
                           masks={name: srcs[i]
                                  for name, i in midxs.items()})

        return fn, dtypes, set(midxs)

    # -- collective ordering (CPU backend only; see __init__) -----------
    def _after(self, x, tok):
        """x, data-dependent on tok (so x's consumer collective schedules
        after tok's producer collective)."""
        if tok is None or not self.serialize_collectives:
            return x
        import jax

        return jax.lax.optimization_barrier((x, tok))[0]

    def _mark(self, x, tok):
        """Fresh ordering token derived from a collective output ``x``."""
        if not self.serialize_collectives:
            return None
        import jax

        t = x.reshape(-1)[:1]
        return t if tok is None else jax.lax.optimization_barrier(
            (t, tok))[0]

    def _group_cap(self, n: int) -> int:
        """Static group-cardinality budget for groupby/distinct outputs.

        Group streams are usually far smaller than their inputs; packing
        partials to this cap (dist.pack_valid) makes every post-agg stage
        run at group scale.  The out_factor retry ladder (1, 8, 64)
        widens it to the lossless n on skewed/high-cardinality plans —
        overflow is counted in-band, never silent."""
        return int(min(max(n, 16),
                       max(1 << 16, n >> 4) * self.out_factor))

    @staticmethod
    def _key_cast(arr):
        """Group/join keys sort in their own width: int32 lanes are the
        TPU's native word — only genuinely 64-bit keys (temporal ticks,
        int64 data) pay for emulated 64-bit compares.  Float keys take
        the order-preserving int64 encode (equality-preserving: ±0.0
        coalesce, all NaNs coalesce — hashing.cu key normalization)."""
        import jax.numpy as jnp

        if jnp.issubdtype(arr.dtype, jnp.floating):
            return _order_encode(arr, False)
        if arr.dtype.itemsize <= 4:
            return arr.astype(jnp.int32)
        return arr.astype(jnp.int64)

    # -- expression helpers (run inside the trace) ---------------------
    @staticmethod
    def _check_exprs(exprs):
        def walk(e):
            if isinstance(e, (Agg, Over)):
                raise Unlowerable(f"expr {e!r} not shard-local")
            for c in getattr(e, "children", ()):
                walk(c)
        for e in exprs:
            walk(e)

    def _probe_meta(self, expr, probe: Table):
        """(dtype, has_mask) of ``expr`` over ``probe`` (a zero-row
        table whose nullable columns carry zero-row validity).

        Runs under jax.eval_shape so no device dispatch/compile happens —
        over the axon tunnel each tiny zero-row compile costs seconds and
        q1's ~20 probe evals dominated lower_py (measured 168-276 s).
        Ops that force concretization fall back to a real zero-row eval.
        """
        import jax

        try:
            out = jax.eval_shape(lambda: expr.evaluate(probe))
        except Exception:
            out = expr.evaluate(probe)
        return out.dtype, out.validity is not None

    def _make_probe(self, cdt, masked):
        return Table({
            n: Column(d, 0, data=np.zeros((0,), d.storage),
                      validity=(np.zeros((0,), np.bool_)
                                if n in masked else None),
                      children=[self.dicts[n]] if (
                          d.is_dictionary and n in self.dicts) else ())
            for n, d in cdt.items()})

    def _eval_expr(self, expr, stream: _Stream, dtypes):
        """(data, mask_or_None, dtype): mask is COLUMN validity only
        (independent of the stream's row-padding mask)."""
        col = expr.evaluate(stream.table(dtypes, self.dicts))
        if col.dtype.is_string:
            raise Unlowerable(f"string-typed expr result {expr!r}")
        return col.data, col.validity, col.dtype

    # -- node lowering --------------------------------------------------
    def lower(self, node) -> Tuple[callable, Dict[str, dt.DType]]:
        import jax
        import jax.numpy as jnp

        if isinstance(node, (IRs.DataFrameScan, IRs.Scan)):
            return self._register_source(node.do_evaluate())

        if isinstance(node, _POINTWISE):
            cfn, cdt, cmask = self.lower(node.children[0])
            if isinstance(node, IRs.Projection):
                names = list(node.schema())

                def fn(srcs, tok=None, _cfn=cfn, _names=names):
                    s = _cfn(srcs, tok)
                    return _Stream({n: s.cols[n] for n in _names}, s.valid,
                                   s.over, tok=s.tok,
                                   masks={n: m for n, m in s.masks.items()
                                          if n in _names})

                return (fn, {n: cdt[n] for n in names},
                        cmask & set(names))
            if isinstance(node, IRs.Filter):
                self._check_exprs([node.predicate])

                def fn(srcs, tok=None, _cfn=cfn, _cdt=cdt,
                       _pred=node.predicate):
                    s = _cfn(srcs, tok)
                    data, mask, _ = self._eval_expr(_pred, s, _cdt)
                    keep = s.valid & data.astype(jnp.bool_)
                    if mask is not None:
                        keep = keep & mask     # null predicate → drop row
                    return _Stream(s.cols, keep, s.over, tok=s.tok,
                                   masks=dict(s.masks))

                return fn, dict(cdt), set(cmask)
            # Select / HStack: dtypes need a host-side probe (zero-row eval)
            if any(_over_spec(e) is not None for e in node.exprs):
                return self._lower_pointwise_over(node, cfn, cdt, cmask)
            self._check_exprs(node.exprs)
            probe = self._make_probe(cdt, cmask)
            hstack = isinstance(node, IRs.HStack)
            out_dt = dict(cdt) if hstack else {}
            out_mask = set(cmask) if hstack else set()
            for e in node.exprs:
                try:
                    d_, m_ = self._probe_meta(e, probe)
                except Exception as exc:
                    raise Unlowerable(f"expr probe failed: {e!r}: {exc}")
                out_dt[e.output_name] = d_
                out_mask.discard(e.output_name)
                if m_:
                    out_mask.add(e.output_name)
                # dictionary propagation: only bare column refs keep codes
                src = _col_ref(e)
                if src is not None and src in self.dicts:
                    self.dicts[e.output_name] = self.dicts[src]

            def fn(srcs, tok=None, _cfn=cfn, _cdt=cdt,
                   _exprs=list(node.exprs), _hstack=hstack):
                s = _cfn(srcs, tok)
                cols = dict(s.cols) if _hstack else {}
                masks = dict(s.masks) if _hstack else {}
                for e in _exprs:
                    data, mask, _ = self._eval_expr(e, s, _cdt)
                    cols[e.output_name] = data
                    masks.pop(e.output_name, None)
                    if mask is not None:
                        masks[e.output_name] = mask
                return _Stream(cols, s.valid, s.over, tok=s.tok,
                               masks=masks)

            return fn, out_dt, out_mask

        if isinstance(node, IRs.GroupBy):
            return self._lower_groupby(node)
        if isinstance(node, IRs.Join):
            return self._lower_join(node)
        if isinstance(node, IRs.Sort):
            return self._lower_sort(node)
        if isinstance(node, IRs.Distinct):
            return self._lower_distinct(node)
        if isinstance(node, IRs.Union):
            kids = [self.lower(c) for c in node.children]
            cdt = kids[0][1]
            umask = set()
            for k in kids:
                umask |= k[2]

            def fn(srcs, tok=None, _kids=kids, _names=list(cdt),
                   _umask=sorted(umask)):
                streams = []
                for k in _kids:       # children chained through the token
                    st = k[0](srcs, tok)
                    tok = st.tok
                    streams.append(st)
                cols = {n: jnp.concatenate([s.cols[n] for s in streams])
                        for n in _names}
                valid = jnp.concatenate([s.valid for s in streams])
                masks = {n: jnp.concatenate(
                    [s.masks.get(n, jnp.ones(s.valid.shape, jnp.bool_))
                     for s in streams]) for n in _umask}
                over = streams[0].over
                for st in streams[1:]:
                    over = over + st.over
                return _Stream(cols, valid, over, tok=tok, masks=masks)

            return fn, dict(cdt), umask
        if isinstance(node, IRs.Reduce):
            return self._lower_reduce(node)
        raise Unlowerable(f"node {type(node).__name__}")

    # -- relational nodes ------------------------------------------------
    _OVER_OPS = ("sum", "count", "size", "mean", "min", "max")

    def _lower_pointwise_over(self, node, cfn, cdt, cmask):
        """Select/HStack whose exprs contain TOP-LEVEL ``.over(keys)``
        window aggregates (optionally under Alias): shuffle the stream
        by the partition keys, evaluate shard-local (local_over_shard),
        then restore global row order by a hidden row-id sample sort —
        the streaming/over.py co-location discipline."""
        import jax
        import jax.numpy as jnp
        from cudf_tpu.parallel.dist import (_dist_sort_shard,
                                            local_over_shard)
        from cudf_tpu.parallel.shuffle import shuffle_by_keys

        hstack = isinstance(node, IRs.HStack)
        specs = []          # (output_name, None | (kind, inner), expr)
        okeys = None
        for e in node.exprs:
            ov = _over_spec(e)
            if ov is None:
                self._check_exprs([e])
                specs.append((e.output_name, None, e))
                continue
            kind, inner, keys = ov
            if kind not in self._OVER_OPS:
                raise Unlowerable(f"over agg {kind}")
            self._check_exprs([inner])
            if okeys is None:
                okeys = list(keys)
            elif list(keys) != okeys:
                raise Unlowerable("mixed over() key sets")
            specs.append((e.output_name, (kind, inner), e))
        for k in okeys:
            if k not in cdt:
                raise Unlowerable(f"over key {k} not in schema")
            if k in cmask:
                raise Unlowerable(f"over key {k} is nullable")
        probe = self._make_probe(cdt, cmask)
        out_dt = dict(cdt) if hstack else {}
        out_mask = set(cmask) if hstack else set()
        for name, ov, e in specs:
            if ov is None:
                d_, m_ = self._probe_meta(e, probe)
                out_dt[name] = d_
                out_mask.discard(name)
                if m_:
                    out_mask.add(name)
                src = _col_ref(e)
                if src is not None and src in self.dicts:
                    self.dicts[name] = self.dicts[src]
            else:
                kind, inner = ov
                in_dt, in_masked = self._probe_meta(inner, probe)
                if kind in ("count", "size"):
                    out_dt[name] = dt.INT64
                elif kind == "mean":
                    out_dt[name] = dt.FLOAT64
                elif kind == "sum":
                    out_dt[name] = dt.INT64 if (in_dt.is_integer
                                                or in_dt.is_bool) \
                        else dt.FLOAT64
                else:
                    out_dt[name] = in_dt
                out_mask.discard(name)
                if kind in ("mean", "min", "max"):
                    out_mask.add(name)   # empty/all-null group → null
        # the restore sort carries every output column + mask
        out_names = list(out_dt)
        out_mnames = sorted(out_mask)

        def fn(srcs, tok=None, _cfn=cfn, _cdt=cdt, _specs=specs,
               _okeys=list(okeys), _hstack=hstack):
            s = _cfn(srcs, tok)
            n = s.valid.shape[0]
            karr = [self._key_cast(s.cols[k]) for k in _okeys]
            karr[0] = self._after(karr[0], s.tok)
            gid = jax.lax.axis_index(self.axis).astype(jnp.int64) \
                * jnp.int64(n) + jnp.arange(n, dtype=jnp.int64)
            in_names = list(s.cols)
            in_mnames = sorted(s.masks)
            if self.num_parts == 1:
                # groups are already co-located on the single shard:
                # no shuffle, and row order is untouched
                krecv, mask2, gid2 = karr, s.valid, gid
                cols2, masks2 = dict(s.cols), dict(s.masks)
                drop = jnp.zeros((1,), jnp.int64)
                tok2 = s.tok
            else:
                pays = [s.cols[c] for c in in_names] \
                    + [s.masks[c] for c in in_mnames] + [gid]
                cap = int(min(n * 2 * self.out_factor,
                              max(n * self.num_parts, 16)))
                krecv, precv, mask2, drop = shuffle_by_keys(
                    karr, pays, s.valid, self.num_parts, cap, self.axis)
                cols2 = dict(zip(in_names, precv))
                masks2 = dict(zip(in_mnames, precv[len(in_names):]))
                gid2 = precv[-1]
                tok2 = self._mark(mask2, s.tok)
            s2 = _Stream(cols2, mask2, s.over, tok=tok2, masks=masks2)
            out_cols = dict(cols2) if _hstack else {}
            out_ms = dict(masks2) if _hstack else {}
            for name, ov, e in _specs:
                if ov is None:
                    data, m, _ = self._eval_expr(e, s2, _cdt)
                    out_cols[name] = data
                    out_ms.pop(name, None)
                    if m is not None:
                        out_ms[name] = m
                else:
                    kind, inner = ov
                    vdata, vmask, _ = self._eval_expr(inner, s2, _cdt)
                    red, ok = local_over_shard(krecv, vdata, mask2, kind,
                                               vmask=vmask)
                    out_cols[name] = red
                    out_ms.pop(name, None)
                    if kind in ("mean", "min", "max"):
                        out_ms[name] = ok
            if self.num_parts == 1:
                masks = {c: out_ms.get(c, jnp.ones_like(mask2))
                         for c in out_mnames}
                return _Stream(dict(out_cols), mask2, s.over, tok=tok2,
                               masks=masks)
            # restore global row order: sample-sort by the hidden row id
            sort_pays = [out_cols[c] for c in out_names] \
                + [out_ms.get(c, jnp.ones_like(mask2)) for c in out_mnames]
            capacity = max(int(cap * 2) * self.out_factor, 16)
            gkey = self._after(gid2, tok2)
            _, pays_out, mask_out, dropped = _dist_sort_shard(
                gkey, sort_pays, mask2, num_parts=self.num_parts,
                capacity=capacity, descending=False, axis=self.axis)
            cols = {c: pays_out[i] for i, c in enumerate(out_names)}
            masks = {c: pays_out[len(out_names) + i]
                     for i, c in enumerate(out_mnames)}
            return _Stream(cols, mask_out,
                           s.over + drop.astype(jnp.int64).reshape(1)
                           + dropped,
                           tok=self._mark(mask_out, tok2), masks=masks)

        return fn, out_dt, out_mask

    def _lower_groupby(self, node):
        import jax.numpy as jnp
        from cudf_tpu.parallel.dist import dist_groupby_agg_shard

        cfn, cdt, cmask = self.lower(node.children[0])
        for k in node.keys:
            if not (cdt[k].is_integer or cdt[k].is_dictionary
                    or cdt[k].is_bool or cdt[k].is_temporal
                    or cdt[k].is_float):
                raise Unlowerable(f"groupby key {k}: {cdt[k]}")
            if k in cmask:
                raise Unlowerable(f"groupby key {k} is nullable")
        float_keys = {k for k in node.keys if cdt[k].is_float}
        specs = [IRs.unwrap_agg(a) for a in node.aggs]
        self._check_exprs([inner for _, inner, _ in specs])
        probe = self._make_probe(cdt, cmask)
        # decompose into mergeable partials (streaming/groupby.py role).
        # Nullable inputs: sums zero-fill nulls; count/mean/var count the
        # VALID mask, not rows (groupby.hpp null-exclusion semantics);
        # min/max over nullable inputs can't represent all-null groups
        # in the padded stream → Unlowerable (partition-list fallback).
        partials = []   # (inner_expr, op, masked)
        finals = []     # (out_name, kind, partial indices, agg kind)
        for name, inner, kind in specs:
            try:
                in_dt, in_masked = self._probe_meta(inner, probe)
            except Exception as exc:
                raise Unlowerable(f"agg probe failed: {inner!r}: {exc}")
            if kind in ("sum", "min", "max"):
                if in_masked and kind in ("min", "max"):
                    raise Unlowerable(f"agg {kind} over nullable input")
                finals.append((name, "direct", [len(partials)], kind))
                partials.append((inner, kind, in_masked))
            elif kind in ("count", "size"):
                if kind == "count" and in_masked:
                    finals.append((name, "countv", [len(partials)], kind))
                    partials.append((inner, "countv", True))
                else:
                    finals.append((name, "count", [], kind))
            elif kind == "mean":
                if in_masked:
                    finals.append((name, "mean_v",
                                   [len(partials), len(partials) + 1],
                                   None))
                    partials.append((inner, "sum", True))
                    partials.append((inner, "countv", True))
                else:
                    finals.append((name, "mean", [len(partials)], None))
                    partials.append((inner, "sum", False))
            elif kind in ("var", "std"):
                from cudf_tpu.engine.expr import BinOp

                sq = BinOp(inner, inner, "mul")
                if in_masked:
                    finals.append((name, kind + "_v",
                                   [len(partials), len(partials) + 1,
                                    len(partials) + 2], None))
                    partials.append((inner, "sum", True))
                    partials.append((sq, "sum", True))
                    partials.append((inner, "countv", True))
                else:
                    finals.append((name, kind,
                                   [len(partials), len(partials) + 1],
                                   None))
                    partials.append((inner, "sum", False))
                    partials.append((sq, "sum", False))
            else:
                raise Unlowerable(f"agg {kind}")
        out_dt = {k: cdt[k] for k in node.keys}
        out_mask = set()
        for name, how, pidx, kind in finals:
            if how == "direct":
                in_dt, _ = self._probe_meta(
                    specs[[f[0] for f in finals].index(name)][1], probe)
                if kind == "sum":
                    out_dt[name] = dt.INT64 if (in_dt.is_integer
                                                or in_dt.is_bool) else dt.FLOAT64
                else:
                    out_dt[name] = in_dt
            elif how in ("count", "countv"):
                out_dt[name] = dt.INT64
            else:
                out_dt[name] = dt.FLOAT64
                if how in ("mean_v", "var_v", "std_v"):
                    out_mask.add(name)   # all-null group → null result

        def fn(srcs, tok=None, _cfn=cfn, _cdt=cdt, _keys=list(node.keys),
               _partials=partials, _finals=finals):
            s = _cfn(srcs, tok)
            keys = [self._key_cast(s.cols[k]) for k in _keys]
            keys[0] = self._after(keys[0], s.tok)
            n = keys[0].shape[0]
            vals_ops = []
            for inner, op, masked in _partials:
                data, mask, _ = self._eval_expr(inner, s, _cdt)
                if op == "countv":
                    cv = mask if mask is not None \
                        else jnp.ones(s.valid.shape, jnp.bool_)
                    vals_ops.append((cv.astype(jnp.int64), "sum"))
                elif masked and mask is not None:
                    vals_ops.append((jnp.where(mask, data,
                                               jnp.zeros((), data.dtype)),
                                     op))
                else:
                    vals_ops.append((data, op))
            m_keys, outs, cnt, m_valid, dropped = dist_groupby_agg_shard(
                keys, vals_ops, s.valid,
                num_parts=self.num_parts, capacity=self._group_cap(n),
                axis=self.axis)
            cols = {k: (_order_decode(m_keys[i], _cdt[k].storage)
                        if k in float_keys else m_keys[i])
                    for i, k in enumerate(_keys)}
            masks = {}
            fcnt = cnt.astype(jnp.float64)
            for name, how, pidx, kind in _finals:
                if how == "direct":
                    cols[name] = outs[pidx[0]]
                elif how == "count":
                    cols[name] = cnt
                elif how == "countv":
                    cols[name] = outs[pidx[0]]
                elif how == "mean":
                    cols[name] = outs[pidx[0]].astype(jnp.float64) \
                        / jnp.maximum(fcnt, 1.0)
                elif how == "mean_v":
                    cv = outs[pidx[1]].astype(jnp.float64)
                    cols[name] = outs[pidx[0]].astype(jnp.float64) \
                        / jnp.maximum(cv, 1.0)
                    masks[name] = outs[pidx[1]] > 0
                elif how in ("var_v", "std_v"):
                    s_ = outs[pidx[0]].astype(jnp.float64)
                    ssq = outs[pidx[1]].astype(jnp.float64)
                    cv = outs[pidx[2]].astype(jnp.float64)
                    num = ssq - s_ * s_ / jnp.maximum(cv, 1.0)
                    v = num / jnp.maximum(cv - 1.0, 1.0)
                    cols[name] = jnp.sqrt(v) if how == "std_v" else v
                    masks[name] = outs[pidx[2]] > 0
                else:  # var/std
                    s_ = outs[pidx[0]].astype(jnp.float64)
                    ssq = outs[pidx[1]].astype(jnp.float64)
                    num = ssq - s_ * s_ / jnp.maximum(fcnt, 1.0)
                    v = num / jnp.maximum(fcnt - 1.0, 1.0)
                    cols[name] = jnp.sqrt(v) if how == "std" else v
            return _Stream(cols, m_valid, s.over + dropped,
                           tok=self._mark(m_valid, s.tok), masks=masks)

        return fn, out_dt, out_mask

    def _lower_join(self, node):
        import jax.numpy as jnp
        from cudf_tpu.parallel.dist import (_bcast_join_shard_multi,
                                            _dist_join_shard)
        from cudf_tpu.utils.config import get_option

        if node.how not in ("inner", "left", "full", "semi", "anti"):
            raise Unlowerable(f"join how={node.how}")
        bcast_limit = int(get_option("executor.broadcast_limit"))
        lfn, ldt, lmask = self.lower(node.children[0])
        rfn, rdt, rmask = self.lower(node.children[1])
        for k in node.left_on:
            if k in lmask:
                raise Unlowerable(f"join key {k} is nullable")
        for k in node.right_on:
            if k in rmask:
                raise Unlowerable(f"join key {k} is nullable")
        lpay_names = [n for n in ldt if n not in node.left_on]
        rpay_names = [n for n in rdt if n not in node.right_on]
        out_dt = {**{k: ldt[k] for k in node.left_on},
                  **{n: ldt[n] for n in lpay_names}}
        out_mask = set(n for n in lpay_names if n in lmask)
        rname_of = {}
        if node.how in ("inner", "left", "full"):
            for n in rpay_names:
                oname = n + node.suffix if n in out_dt else n
                rname_of[n] = oname
                out_dt[oname] = rdt[n]
                if n in self.dicts and oname not in self.dicts:
                    self.dicts[oname] = self.dicts[n]
                if n in rmask:
                    out_mask.add(oname)
        if node.how in ("left", "full"):
            # unmatched build rows surface the other side's payload as
            # NULL (join.hpp left/full semantics) — masks carry it
            out_mask |= set(rname_of.values())
            if node.how == "full":
                out_mask |= set(lpay_names)
        how = node.how

        def fn(srcs, tok=None, _lfn=lfn, _rfn=rfn, _lon=list(node.left_on),
               _ron=list(node.right_on), _lp=lpay_names, _rp=rpay_names,
               _how=how, _rname=dict(rname_of)):
            ls = _lfn(srcs, tok)
            rs = _rfn(srcs, ls.tok)      # right subtree after the left's
            lkeys = [self._key_cast(ls.cols[k]) for k in _lon]
            lkeys[0] = self._after(lkeys[0], rs.tok)
            rkeys = [self._key_cast(rs.cols[k]) for k in _ron]
            nl = lkeys[0].shape[0]
            nr = rkeys[0].shape[0]
            # per-column masks ride as extra payloads through every path
            lp_masked = sorted(n for n in _lp if n in ls.masks)
            rp_masked = sorted(n for n in _rp if n in rs.masks)
            lpays = [ls.cols[n] for n in _lp] + \
                [ls.masks[n] for n in lp_masked]
            rpays = [rs.cols[n] for n in _rp] + \
                [rs.masks[n] for n in rp_masked]
            # broadcast-vs-shuffle (streaming/join.py:95 role), decided
            # STATICALLY from the padded shard shapes: all_gather a small
            # side and join locally — no shuffle of the big side, far
            # smaller static output budgets, and 2 fewer all-to-alls.
            # full joins always shuffle (a broadcast build side would
            # emit its unmatched rows once per shard).
            bytes_l = self.num_parts * nl * 8 * (len(_lon) + len(_lp) + 1)
            bytes_r = self.num_parts * nr * 8 * (len(_ron) + len(_rp) + 1)
            lpres = rpres = None
            if (_how == "inner" and bytes_l <= bcast_limit
                    and bytes_l <= bytes_r):
                # broadcast the LEFT side (inner is symmetric: swap)
                out_keys, out_r, out_l, ovalid, rmatch, dropped = \
                    _bcast_join_shard_multi(
                        rkeys, rpays, rs.valid, lkeys, lpays, ls.valid,
                        how="inner",
                        max_out=(nr + self.num_parts * nl)
                        * self.out_factor, axis=self.axis)
            elif bytes_r <= bcast_limit and _how != "full":
                out_keys, out_l, out_r, ovalid, rmatch, dropped = \
                    _bcast_join_shard_multi(
                        lkeys, lpays, ls.valid, rkeys, rpays, rs.valid,
                        how=_how,
                        max_out=(nl + self.num_parts * nr)
                        * self.out_factor, axis=self.axis)
            elif _how == "full":
                out_keys, out_l, out_r, ovalid, lpres, rpres, dropped = \
                    _dist_join_shard(
                        lkeys, lpays, ls.valid,
                        rkeys, rpays, rs.valid,
                        how="full", num_parts=self.num_parts,
                        cap_l=nl, cap_r=nr,
                        max_out=self.num_parts * (nl + nr) * 2
                        * self.out_factor, axis=self.axis)
                rmatch = rpres
            else:
                out_keys, out_l, out_r, ovalid, rmatch, dropped = \
                    _dist_join_shard(
                        lkeys, lpays, ls.valid,
                        rkeys, rpays, rs.valid,
                        how=_how, num_parts=self.num_parts,
                        cap_l=nl, cap_r=nr,
                        # static budget nl+nr covers FK-shaped joins at
                        # factor 1 (inner output <= probe matches); the
                        # overflow ladder widens on skew — halving the
                        # buffers keeps SF1 multi-join programs inside
                        # the TPU compiler's envelope
                        max_out=self.num_parts * (nl + nr)
                        * self.out_factor, axis=self.axis)
            over = ls.over + rs.over + dropped
            otok = self._mark(ovalid, rs.tok)
            cols = {k: out_keys[i] for i, k in enumerate(_lon)}
            cols.update({n: out_l[i] for i, n in enumerate(_lp)})
            masks = {}
            lmask_out = {n: out_l[len(_lp) + i]
                         for i, n in enumerate(lp_masked)}
            if _how in ("semi", "anti"):
                # out_l holds the (shuffled) left payloads; rmatch is the
                # selection mask folded into row validity
                masks.update(lmask_out)
                return _Stream(cols, ovalid & rmatch, over, tok=otok,
                               masks=masks)
            for n in lp_masked:
                masks[n] = lmask_out[n]
            if lpres is not None:           # full join: left side nullable
                for n in _lp:
                    masks[n] = masks.get(n, jnp.ones_like(lpres)) & lpres
            for i, n in enumerate(_rp):
                cols[_rname[n]] = out_r[i]
            for i, n in enumerate(rp_masked):
                masks[_rname[n]] = out_r[len(_rp) + i]
            if _how in ("left", "full"):
                for n in _rp:
                    on = _rname[n]
                    masks[on] = masks.get(on, jnp.ones_like(rmatch)) \
                        & rmatch
            return _Stream(cols, ovalid, over, tok=otok, masks=masks)

        return fn, out_dt, out_mask

    def _lower_sort(self, node):
        import jax.numpy as jnp
        from cudf_tpu.parallel.dist import (_dist_sort_multi_shard,
                                            _dist_sort_shard)

        cfn, cdt, cmask = self.lower(node.children[0])
        names = [n for n in cdt]
        masked = sorted(cmask)
        nulls_last = bool(getattr(node, "nulls_last", True))
        # null sort keys take a sentinel just below the padding value
        # (ties with the NaN key slot; stable order breaks the tie) —
        # nulls_last puts them at the tail in EITHER direction, matching
        # polars' null ordering (descending is folded into the encoding
        # BEFORE the sentinel applies)
        null_sent = (2**63 - 2) if nulls_last else -(2**63 - 2)

        def _null_key(key, b, s):
            import jax.numpy as _jnp

            if b in s.masks:
                return _jnp.where(s.masks[b], key, _jnp.int64(null_sent))
            return key

        def _pays(s):
            return ([s.cols[n_] for n_ in names]
                    + [s.masks[n_] for n_ in masked])

        def _stream_out(pays_out, mask_out, s, dropped):
            cols = {n_: pays_out[i] for i, n_ in enumerate(names)}
            masks = {n_: pays_out[len(names) + i]
                     for i, n_ in enumerate(masked)}
            return _Stream(cols, mask_out, s.over + dropped,
                           tok=self._mark(mask_out, s.tok), masks=masks)

        if len(node.by) != 1:
            # composite key.  Bounded code ranges (dictionary / bool)
            # pack into ONE int64 via mixed radix (cheapest); unbounded
            # dtypes lexicographically chain per-column order encodings
            # through the multi-key sample sort (_dist_sort_multi_shard,
            # the streaming/sort.py composite-key role).
            sizes = []
            for b in node.by:
                if b in cmask:
                    sizes = None        # nullable key → generic path
                    break
                if cdt[b].is_dictionary and b in self.dicts:
                    sizes.append(self.dicts[b].length + 1)
                elif cdt[b].is_bool:
                    sizes.append(3)
                else:
                    sizes = None
                    break
            by_cols = list(node.by)
            descs = list(node.descending)
            if sizes is None:
                def fn(srcs, tok=None, _cfn=cfn, _by=by_cols,
                       _descs=descs):
                    s = _cfn(srcs, tok)
                    keys = [_null_key(_order_encode(s.cols[b], d), b, s)
                            for b, d in zip(_by, _descs)]
                    keys[0] = self._after(keys[0], s.tok)
                    n = keys[0].shape[0]
                    capacity = n if self.num_parts == 1 else \
                        max(int(n * 2.0) * self.out_factor, 16)
                    pays_out, mask_out, dropped = _dist_sort_multi_shard(
                        keys, _pays(s), s.valid,
                        num_parts=self.num_parts, capacity=capacity,
                        axis=self.axis)
                    return _stream_out(pays_out, mask_out, s, dropped)

                return fn, dict(cdt), set(cmask)

            def fn(srcs, tok=None, _cfn=cfn, _by=by_cols, _sizes=sizes,
                   _descs=descs):
                s = _cfn(srcs, tok)
                key = jnp.zeros(s.valid.shape, jnp.int64)
                for b, sz, d in zip(_by, _sizes, _descs):
                    c = s.cols[b].astype(jnp.int64)
                    if d:
                        c = (sz - 1) - c
                    key = key * sz + c
                n = key.shape[0]
                capacity = n if self.num_parts == 1 else \
                    max(int(n * 2.0) * self.out_factor, 16)
                key = self._after(key, s.tok)
                k_out, pays_out, mask_out, dropped = _dist_sort_shard(
                    key, _pays(s), s.valid, num_parts=self.num_parts,
                    capacity=capacity, descending=False, axis=self.axis)
                return _stream_out(pays_out, mask_out, s, dropped)

            return fn, dict(cdt), set(cmask)
        by = node.by[0]
        desc = bool(node.descending[0])

        def fn(srcs, tok=None, _cfn=cfn, _by=by, _desc=desc):
            s = _cfn(srcs, tok)
            key = self._after(
                _null_key(_order_encode(s.cols[_by], _desc), _by, s),
                s.tok)
            n = key.shape[0]
            capacity = n if self.num_parts == 1 else \
                max(int(n * 2.0) * self.out_factor, 16)
            k_out, pays_out, mask_out, dropped = _dist_sort_shard(
                key, _pays(s), s.valid, num_parts=self.num_parts,
                capacity=capacity, descending=False, axis=self.axis)
            return _stream_out(pays_out, mask_out, s, dropped)

        return fn, dict(cdt), set(cmask)

    def _lower_distinct(self, node):
        import jax.numpy as jnp
        from cudf_tpu.parallel.dist import _dist_distinct_shard

        cfn, cdt, cmask = self.lower(node.children[0])
        names = list(cdt)
        if node.subset and set(node.subset) != set(names):
            raise Unlowerable("distinct over a column subset")
        if cmask:
            raise Unlowerable("distinct over nullable columns")
        for n in names:
            if not (cdt[n].is_integer or cdt[n].is_dictionary
                    or cdt[n].is_bool or cdt[n].is_temporal):
                raise Unlowerable(f"distinct column {n}: {cdt[n]}")

        def fn(srcs, tok=None, _cfn=cfn, _names=names):
            s = _cfn(srcs, tok)
            keys = [self._key_cast(s.cols[n]) for n in _names]
            keys[0] = self._after(keys[0], s.tok)
            n = keys[0].shape[0]
            m_keys, m_valid, dropped = _dist_distinct_shard(
                keys, s.valid, num_parts=self.num_parts,
                capacity=self._group_cap(n), axis=self.axis)
            return _Stream({n_: m_keys[i] for i, n_ in enumerate(_names)},
                           m_valid, s.over + dropped,
                           tok=self._mark(m_valid, s.tok))

        return fn, dict(cdt), set()

    def _lower_reduce(self, node):
        import jax
        import jax.numpy as jnp

        cfn, cdt, cmask = self.lower(node.children[0])
        specs = [IRs.unwrap_agg(a) for a in node.aggs]
        self._check_exprs([inner for _, inner, _ in specs])
        out_dt = {}
        for name, inner, kind in specs:
            if kind not in ("sum", "count", "size", "min", "max", "mean"):
                raise Unlowerable(f"reduce agg {kind}")
            out_dt[name] = dt.FLOAT64 if kind == "mean" else dt.INT64 \
                if kind in ("count", "size") else dt.FLOAT64

        def fn(srcs, tok=None, _cfn=cfn, _cdt=cdt, _specs=specs):
            s = _cfn(srcs, tok)
            tok = s.tok
            n = s.valid.shape[0]

            def chained(op, loc):
                nonlocal tok
                tot = op(self._after(loc, tok), self.axis)
                tok = self._mark(jnp.reshape(tot, (1,)), tok)
                return tot

            cols = {}
            for name, inner, kind in _specs:
                if kind == "size":
                    loc = jnp.sum(s.valid.astype(jnp.int64))
                    tot = chained(jax.lax.psum, loc)
                else:
                    data, mask, _ = self._eval_expr(inner, s, _cdt)
                    eff = s.valid if mask is None else (s.valid & mask)
                    if kind == "count":
                        tot = chained(jax.lax.psum,
                                      jnp.sum(eff.astype(jnp.int64)))
                        cols[name] = jnp.broadcast_to(tot, (n,))
                        continue
                    x = data.astype(jnp.float64)
                    if kind in ("sum", "mean"):
                        loc = jnp.sum(jnp.where(eff, x, 0.0))
                        tot = chained(jax.lax.psum, loc)
                        if kind == "mean":
                            c = chained(jax.lax.psum,
                                        jnp.sum(eff.astype(jnp.int64)))
                            tot = tot / jnp.maximum(c, 1).astype(jnp.float64)
                    elif kind == "min":
                        loc = jnp.min(jnp.where(eff, x, jnp.inf))
                        tot = chained(jax.lax.pmin, loc)
                    else:
                        loc = jnp.max(jnp.where(eff, x, -jnp.inf))
                        tot = chained(jax.lax.pmax, loc)
                cols[name] = jnp.broadcast_to(tot, (n,))
            shard0 = jax.lax.axis_index(self.axis) == 0
            valid = (jnp.arange(n) == 0) & shard0
            return _Stream(cols, valid, s.over, tok=tok)

        return fn, out_dt, set()


def _over_spec(e):
    """(agg_kind, inner_expr, keys) when ``e`` is a top-level
    ``agg().over(keys)`` (optionally under Alias), else None."""
    from cudf_tpu.engine.expr import Alias, Over

    while isinstance(e, Alias):
        e = e.children[0]
    if isinstance(e, Over):
        agg = e.children[0]
        return agg.agg, agg.children[0], list(e.keys)
    return None


def _col_ref(e) -> Optional[str]:
    """name of the bare column an expr forwards (Col or Alias(Col))."""
    from cudf_tpu.engine.expr import Alias, Col

    while isinstance(e, Alias):
        e = e.children[0]
    return e.name if isinstance(e, Col) else None


def _order_encode(arr, descending: bool):
    """Order-preserving int64 encoding of a numeric sort key, with
    descending folded in as a bitwise NOT so _dist_sort_shard never needs
    its negation path (which would overflow at INT64_MIN).

    Floats: the TPU X64-rewrite pass cannot compile a 64-bit
    bitcast_convert_type (measured: f64->s64, f64->u32-pairs, AND
    jnp.frexp — whose lowering bitcasts f64->s64 — all fail to
    compile).  On CPU (real f64) the IEEE magnitude is rebuilt
    ARITHMETICALLY from frexp: mag = (e+1022)*2^52 + fraction bits —
    exactly the biased-exponent/mantissa split of the f64 bit pattern —
    then sign-mirrored (key = -mag for negatives) — the classic
    radix-sortable float transform.  Every backend with real f64 uses
    the exact 64-bit bitcast form (`_order_encode_exact`; arithmetic
    reconstructions like frexp are NOT viable here — this XLA CPU
    build both DAZ-flushes subnormal arithmetic and mis-lowers
    jnp.frexp on subnormal inputs, measured constant (0.5, -1074)).
    Only the TPU backend — where the emulated f64 is a double-float
    (hi, lo) f32 pair and 64-bit bitcast lowerings fail to compile —
    packs the pair with 32-bit bitcasts (`_order_encode_pair`):
    key = (u32(hi)-2^31)*2^32 + u32(lo), where u32 maps f32 bits onto
    [0, 2^32) in value order.  (hi, lo) is lexicographically monotone
    in x because f64->f32 rounding is monotone and lo orders ties
    exactly (double-float precision; f64 values beyond f32 range
    saturate to the +/-inf key)."""
    import jax

    return _order_encode_pair(arr, descending) \
        if jax.default_backend() == "tpu" \
        else _order_encode_exact(arr, descending)


def _order_encode_exact(arr, descending: bool):
    """Exact IEEE-754 total-order key via 64-bit bitcast (non-TPU
    backends).  mag IS the f64 bit pattern's low 63 bits — exact for
    normals, subnormals, zeros and infs by construction; sign-mirroring
    gives the total order with -0.0 == +0.0 (both key as 0)."""
    import jax
    import jax.numpy as jnp

    if jnp.issubdtype(arr.dtype, jnp.floating):
        x = arr.astype(jnp.float64)
        b = jax.lax.bitcast_convert_type(x, jnp.int64)
        mag = b & jnp.int64(0x7FFFFFFFFFFFFFFF)
        key = jnp.where(b < 0, -mag, mag)
        # all NaNs (either sign, any payload) key just above +inf
        key = jnp.where(jnp.isnan(x),
                        jnp.int64(2047) * jnp.int64(2**52) + 1, key)
    else:
        key = arr.astype(jnp.int64)
    if descending:
        key = jnp.int64(-1) - key
    return key


def _order_encode_pair(arr, descending: bool):
    """Double-float (hi, lo) f32-pair key — the TPU f64-emulation path."""
    import jax
    import jax.numpy as jnp

    if jnp.issubdtype(arr.dtype, jnp.floating):
        x = arr.astype(jnp.float64)

        def u32(f):
            # f32 bits -> [0, 2^32) in value order (int64 math)
            b = jax.lax.bitcast_convert_type(
                f, jnp.int32).astype(jnp.int64)
            return jnp.where(b >= 0, b + jnp.int64(2**31), -b - 1)

        hi = x.astype(jnp.float32)
        resid = (x - hi.astype(jnp.float64)).astype(jnp.float32)
        resid = jnp.where(jnp.isfinite(x), resid, jnp.float32(0))
        key = ((u32(hi) - jnp.int64(2**31)) * jnp.int64(2**32)
               + u32(resid))
        key = jnp.where(x == 0, jnp.int64(2**31), key)  # -0.0 == +0.0
        # (2^31 is +0.0's natural key: hi bucket 0, resid +0.0)
        # NaN key sits strictly above key(+inf) but BELOW 2^63-1, which
        # _dist_sort_shard uses as its invalid-row padding sentinel —
        # valid keys must never collide with it (dist.py sentinel).
        key = jnp.where(jnp.isnan(x),
                        jnp.int64(2**63 - 2), key)  # NaN > +inf
    else:
        key = arr.astype(jnp.int64)
    if descending:
        key = jnp.int64(-1) - key
    return key


def _order_decode(key, storage):
    """Inverse of ``_order_encode(arr, descending=False)`` back to the
    float ``storage`` dtype — lets float groupby keys ride the int64
    key path and reconstruct exactly at the output (bit-inverse of the
    radix-sortable float transform; ±0.0 → +0.0, NaNs → one NaN)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        nan_key = jnp.int64(2**63 - 2)

        def inv(u):
            b = jnp.where(u >= jnp.int64(2**31),
                          u - jnp.int64(2**31), -(u + 1))
            return jax.lax.bitcast_convert_type(
                b.astype(jnp.int32), jnp.float32)

        u_hi = (key >> 32) + jnp.int64(2**31)
        u_lo = key & jnp.int64(0xFFFFFFFF)
        x = inv(u_hi).astype(jnp.float64) + inv(u_lo).astype(jnp.float64)
        x = jnp.where(key == nan_key, jnp.nan, x)
        return x.astype(storage)
    nan_bits = jnp.int64(2047) << 52
    b = jnp.where(key < 0, (-key) | jnp.int64(-2**63), key)
    b = jnp.where(key == (jnp.int64(2047) * jnp.int64(2**52) + 1),
                  nan_bits | 1, b)
    return jax.lax.bitcast_convert_type(b, jnp.float64).astype(storage)


# ----------------------------------------------------------------------
# compiled-program cache
# ----------------------------------------------------------------------
# jax.jit caches on the identity of the python callable; evaluate_spmd
# builds a fresh closure per call, so without this cache every collect()
# of the same plan re-traces and re-compiles the whole SPMD program
# (measured 62 s/call for TPC-H q1 at SF1).  The reference has the same
# need and answers it with build-once hash_join objects and polars' plan
# caching; the JAX-native answer is one compiled executable per
# (plan structure, source schema, mesh, out_factor).
#
# Correctness: everything the lowering BAKES into the traced program
# must be in the key —
#   * IR topology + per-node statics + full expr trees incl. literal
#     values (_plan_key walks them),
#   * source column names/dtypes/padded lengths (shapes are static),
#   * dictionary contents (captured as numpy constants): keyed by
#     BUFFER IDENTITY, with the buffer objects pinned in the cache
#     entry so their id()s cannot be recycled while the entry lives,
#   * mesh shape/devices, axis name, out_factor.
# Non-dictionary source VALUES are jit arguments, not baked, so value
# changes hit the cache (that is the point).
_PROGRAM_CACHE: "dict" = {}
_PROGRAM_CACHE_CAP = 32


def _source_key(table: Table, pins: list):
    toks = []
    for name in table.names:
        col = table[name]
        tok = [name, str(col.dtype), table.num_rows,
               col.validity is not None]
        if col.dtype.is_string or col.dtype.is_dictionary:
            # dictionary contents get baked as numpy constants; pin the
            # UNDERLYING buffers so id() stays unambiguous.  A string
            # column re-encodes deterministically from the same buffers.
            for buf in (col.data, col.offsets,
                        *(c.data for c in col.children or ()),
                        *(c.offsets for c in col.children or ())):
                if buf is not None:
                    pins.append(buf)
                    tok.append(id(buf))
        toks.append(tuple(tok))
    return tuple(toks)


def _plan_key(node, pins: list):
    if isinstance(node, IRs.DataFrameScan):
        return ("dfscan", _source_key(node.do_evaluate(), pins))
    if isinstance(node, IRs.Scan):
        import os as _os

        # file sources: key on path + mtime/size so a rewritten file
        # recompiles (the baked dictionary would otherwise go stale)
        sig = []
        for p in node.paths:
            try:
                st = _os.stat(p)
                sig.append((p, st.st_mtime_ns, st.st_size))
            except OSError:
                sig.append((p, 0, 0))
        return ("scan", node.fmt, tuple(sig),
                tuple(node.projection or ()), repr(node.predicate))
    cls = type(node).__name__
    statics = []
    for attr in ("exprs", "predicate", "aggs", "keys", "by", "descending",
                 "left_on", "right_on", "how", "suffix", "subset", "keep",
                 "columns", "offset", "length", "name"):
        if hasattr(node, attr):
            v = getattr(node, attr)
            statics.append((attr, repr(v) if not isinstance(
                v, (list, tuple)) else tuple(repr(x) for x in v)))
    return (cls, tuple(statics),
            tuple(_plan_key(c, pins) for c in node.children))


def spmd_cache_clear():
    _PROGRAM_CACHE.clear()
    _PAD_SHARD_CACHE.clear()
    _COMPACT_CACHE.clear()


_PAD_SHARD_CACHE: dict = {}
_COMPACT_CACHE: dict = {}
_AUX_CACHE_CAP = 64


def _pad_shard(mesh, axis, shapes, n, total):
    """One jitted pad+shard dispatch for a whole source table (keyed on
    mesh/geometry).  Returns fn(*cols) -> (*padded_cols, validity)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (mesh, axis, shapes, n, total)
    fn = _PAD_SHARD_CACHE.get(key)
    if fn is None:
        sharding = NamedSharding(mesh, P(axis))

        def pad(*xs):
            outs = []
            for x in xs:
                if total > x.shape[0]:
                    x = jnp.concatenate(
                        [x, jnp.zeros((total - x.shape[0],), x.dtype)])
                outs.append(x)
            outs.append(jnp.arange(total, dtype=jnp.int64) < n)
            return tuple(outs)

        fn = jax.jit(pad, out_shardings=(sharding,) * (len(shapes) + 1))
        while len(_PAD_SHARD_CACHE) >= _AUX_CACHE_CAP:
            _PAD_SHARD_CACHE.pop(next(iter(_PAD_SHARD_CACHE)))
        _PAD_SHARD_CACHE[key] = fn
    return fn


def _pull_compacted(arrs, cnts):
    """Pull only the VALID prefix of every shard to host.

    The SPMD program compacts each shard's valid rows to the shard front
    (stable, so global row order is preserved) and returns per-shard
    counts; here each shard's prefix is sliced ON ITS OWN DEVICE (one
    cached jit per pow-2 length bucket) and only those rows transfer.
    Replaces np.asarray(full)[mask] — at ~12 MB/s tunnel throughput the
    full-capacity pull dominated query wall time (q1 SF1: 25 s).

    All output columns of a shard are PACKED into one uint8 buffer on
    device (bitcast + concat) so the host pull is ONE transfer per
    shard, not one per column — each device→host round trip costs
    0.2-1.4 s over the axon tunnel (measured; 10-column q1 paid ~14 s).

    Device-side note: this must NOT be a global jitted gather — XLA
    lowers nonzero/gather on GSPMD-sharded operands through cross-module
    collectives that deadlock on the forced-host-platform CPU mesh
    (observed rendezvous stall); per-shard packing needs no collectives.
    """
    import jax
    import jax.numpy as jnp

    cnts = np.asarray(cnts)
    parts: List[list] = [[] for _ in arrs]
    shards = [sorted(a.addressable_shards, key=lambda s: s.index[0].start
                     if s.index and s.index[0].start is not None else 0)
              for a in arrs]
    np_dtypes = [np.dtype(a.dtype) for a in arrs]
    n_shards = len(shards[0]) if arrs else 0
    for i in range(n_shards):
        k_i = int(cnts[i]) if i < len(cnts) else 0
        if k_i == 0:
            continue
        rows = shards[0][i].data.shape[0]
        kp = min(1 << (k_i - 1).bit_length(), rows)
        sig = (kp, rows, tuple(d.str for d in np_dtypes))
        fn = _COMPACT_CACHE.get(sig)
        if fn is None:
            def packer(*xs, _kp=kp):
                # wire format = one int32-word buffer + separate f64
                # tails.  The TPU X64-rewrite pass cannot lower ANY
                # 64-bit bitcast (measured: s64→s32 pairs, f64→s64 both
                # fail to compile), so int64 splits into lo/hi words
                # ARITHMETICALLY and float64 arrays skip the packed
                # buffer entirely (their prefix slices transfer as-is —
                # the runtime moves emulated f64 natively)
                words, f64s = [], []
                for x in xs:
                    y = x[:_kp]
                    d = np.dtype(y.dtype)
                    if d.kind == "f" and d.itemsize == 8:
                        f64s.append(y)
                        continue
                    if d.itemsize == 8:                   # int64/uint64
                        lo = (y & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
                        hi = ((y >> 32) & jnp.int64(0xFFFFFFFF)) \
                            .astype(jnp.uint32)
                        w = jnp.stack([lo, hi], axis=-1).reshape(-1)
                        words.append(jax.lax.bitcast_convert_type(
                            w, jnp.int32))
                        continue
                    if d.itemsize < 4:
                        y = y.astype(jnp.float32 if d.kind == "f"
                                     else jnp.int32)
                    words.append(jax.lax.bitcast_convert_type(
                        y, jnp.int32).reshape(-1))
                return (jnp.concatenate(words) if words
                        else jnp.zeros((0,), jnp.int32), *f64s)

            fn = jax.jit(packer)
            while len(_COMPACT_CACHE) >= _AUX_CACHE_CAP:
                _COMPACT_CACHE.pop(next(iter(_COMPACT_CACHE)))
            _COMPACT_CACHE[sig] = fn
        outs = fn(*[sh[i].data for sh in shards])
        buf = np.asarray(outs[0])
        f64_iter = iter(outs[1:])
        off = 0
        for p, d in zip(parts, np_dtypes):
            if d.kind == "f" and d.itemsize == 8:
                p.append(np.asarray(next(f64_iter))[:k_i])
            elif d.itemsize == 8:
                p.append(buf[off:off + 2 * kp].view(d)[:k_i])
                off += 2 * kp
            elif d.itemsize < 4:
                wide = np.dtype(np.float32 if d.kind == "f" else np.int32)
                p.append(buf[off:off + kp].view(wide).astype(d)[:k_i])
                off += kp
            else:
                p.append(buf[off:off + kp].view(d)[:k_i])
                off += kp
    return [np.concatenate(p) if p else np.zeros((0,), d)
            for p, d in zip(parts, np_dtypes)]


def _host_decode_dict(dict_col: Column, codes: np.ndarray) -> Column:
    """Vectorized numpy dictionary decode: codes + host key-set buffers →
    a STRING column with host buffers (cudf::dictionary::decode role for
    the collect epilogue; zero device traffic)."""
    chars = np.asarray(dict_col.data)
    offs = np.asarray(dict_col.offsets)
    lens = offs[1:] - offs[:-1]
    out_lens = lens[codes]
    out_offs = np.zeros(codes.shape[0] + 1, np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    total = int(out_offs[-1])
    starts = np.repeat(offs[:-1][codes], out_lens)
    ramp = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1],
                                                        out_lens)
    return Column(dt.STRING, codes.shape[0], data=chars[starts + ramp],
                  offsets=out_offs)


# phase timings of the most recent evaluate_spmd call (seconds):
# {"lower", "exec", "pull", "factor", "cache_hit"} — read by bench.py to
# make TPC-H timeouts diagnosable (VERDICT r4 weak #1)
LAST_RUN_PHASES: dict = {}


def evaluate_spmd(node, mesh, axis: str = "x") -> Table:
    """Compile + run an IR plan as one jitted SPMD program over ``mesh``.

    Raises Unlowerable when the plan shape isn't supported; callers fall
    back to the partition-list executor (evaluate_streaming's tiered
    dispatch).  Output row order: sorted plans preserve the global sort
    order; group/join outputs are hash-distributed (unspecified order,
    polars maintain_order=False semantics).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # top-level Slice is applied host-side after collect
    head = None
    if isinstance(node, IRs.Slice):
        head = (node.offset, node.length)
        node = node.children[0]

    from jax import shard_map

    spec = P(axis)
    # static-budget retry: joins/sorts/shuffles run with fixed output
    # buffers; `over` counts rows a budget dropped.  Rare skewed plans
    # re-lower at a larger factor (the count-then-allocate shape of
    # inner_join_size.cu, amortized to the overflow case) — never a
    # silent truncation.
    import os
    import time as _time

    dbg = os.environ.get("CUDF_TPU_SPMD_DEBUG")
    pins: list = []
    from cudf_tpu.utils.config import get_option as _get_opt

    base_key = (_plan_key(node, pins), axis,
                tuple(sorted(mesh.shape.items())),
                tuple(str(d) for d in mesh.devices.flat),
                int(_get_opt("executor.broadcast_limit")))
    for out_factor in (1, 8, 64):
        t0 = _time.perf_counter()
        low = _Lowering(mesh, axis, out_factor=out_factor)
        prog, out_dt, out_masked = low.lower(node)
        names = list(out_dt)
        mask_names = sorted(out_masked)
        key = (base_key, out_factor)
        hit = _PROGRAM_CACHE.pop(key, None)
        if hit is not None:
            jitted = hit[0]
            _PROGRAM_CACHE[key] = hit  # reinsert at the fresh end (LRU)
        else:
            def run(srcs):
                s = prog(srcs)
                # per-shard stable compaction: valid rows to the shard
                # front (original order kept), so the host pulls only
                # each shard's prefix (_pull_compacted).  Runs INSIDE
                # shard_map — no GSPMD collectives (see _pull_compacted).
                # int32 sort operands: argsort over int64 pays emulated
                # 64-bit compares on TPU for no benefit.
                nrow = s.valid.shape[0]
                it = jnp.int32 if nrow < 2**31 else jnp.int64
                _, order = jax.lax.sort(
                    [(~s.valid).astype(jnp.int32),
                     jnp.arange(nrow, dtype=it)],
                    num_keys=1, is_stable=True)
                cnt = jnp.sum(s.valid.astype(jnp.int64))[None]
                return ([jnp.take(s.cols[n], order) for n in names],
                        [jnp.take(s.masks[n], order)
                         for n in mask_names],
                        cnt, s.over)

            sharded = shard_map(
                run, mesh=mesh,
                in_specs=([spec] * len(low.sources),),
                out_specs=spec,
            )
            jitted = jax.jit(sharded)
            while len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_CAP:
                _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
            _PROGRAM_CACHE[key] = (jitted, pins)
        if dbg:
            t1 = _time.perf_counter()
            lowered = jitted.lower(low.sources)
            t2 = _time.perf_counter()
            compiled = lowered.compile()
            t3 = _time.perf_counter()
            (arrs, marrs, cnts, over) = compiled(low.sources)
            jax.block_until_ready(cnts)
            t4 = _time.perf_counter()
            print(f"[spmd f={out_factor} hit={hit is not None}] "
                  f"lower_py={t1-t0:.2f}s trace={t2-t1:.2f}s "
                  f"compile={t3-t2:.2f}s exec={t4-t3:.2f}s", flush=True)
            t1 = t3   # shared phase accounting sees compile+exec as exec
        else:
            t1 = _time.perf_counter()
            (arrs, marrs, cnts, over) = jitted(low.sources)
        over_total = int(np.asarray(over).sum())
        t2 = _time.perf_counter()
        LAST_RUN_PHASES.update(
            lower=round(t1 - t0, 3), exec=round(t2 - t1, 3),
            factor=out_factor, cache_hit=hit is not None)
        if over_total == 0:
            break
    else:
        raise Unlowerable("static output budget exceeded at factor 64")
    t_pull = _time.perf_counter()
    pulled = _pull_compacted(list(arrs) + list(marrs), cnts)
    LAST_RUN_PHASES["pull"] = round(_time.perf_counter() - t_pull, 3)
    masks = dict(zip(mask_names, pulled[len(names):]))
    cols = {}
    for n, vals in zip(names, pulled[:len(names)]):
        d = out_dt[n]
        validity = masks.get(n)
        if validity is not None:
            validity = validity.astype(np.bool_)
            if validity.all():
                validity = None
        if n in low.dicts and (d.is_string or d.is_dictionary):
            dict_col = low.dicts[n]
            if dict_col.dtype.is_string:
                # HOST-side dictionary decode: the result is group-key
                # sized and the dictionary buffers are host constants —
                # a device string-gather here costs compiles + round
                # trips (measured 8.8 s on a 4-row q1 result)
                codes = vals.astype(np.int64)
                if validity is not None:
                    codes = np.where(validity, codes, 0)
                cols[n] = _host_decode_dict(dict_col, codes)
                if validity is not None:
                    cols[n] = cols[n].with_validity(validity)
            else:
                codes = Column(dt.dictionary_dtype(dict_col.dtype),
                               len(vals),
                               data=jnp.asarray(vals.astype(np.int32)),
                               children=[dict_col],
                               validity=validity)
                cols[n] = codes.decode_dictionary()
        else:
            # keep result buffers on HOST: consumers are to_pandas-bound
            # and a device push per column is another tunnel RPC
            cols[n] = Column(d, len(vals),
                             data=vals.astype(d.storage, copy=False),
                             validity=validity)
    t = Table(cols)
    if head is not None:
        from cudf_tpu.ops import copying

        off, length = head
        lo = off if off >= 0 else max(t.num_rows + off, 0)
        hi = t.num_rows if length is None else min(lo + length, t.num_rows)
        t = Table({n: copying.slice(c, lo, hi) for n, c in t.items()})
    return t
