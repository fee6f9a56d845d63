"""Expression tree for the query engine.

TPU-native equivalent of cudf-polars' Expr nodes
(reference: python/cudf_polars/cudf_polars/dsl/expressions/ — Agg, BinOp,
Boolean, Literal, Selection, Sorting, String, Ternary, Unary).

Each Expr evaluates against a ``core.Table`` and returns a Column; every
node is a fused XLA op over HBM — there is no interpreter overhead at run
time beyond the Python walk (jit caches per-dtype kernels).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import numpy as np

from cudf_tpu.core.column import Column, _is_null
from cudf_tpu.core.table import Table
from cudf_tpu.core import dtypes as dt


class Expr:
    """Base expression.  Immutable; hashable by identity of repr."""

    def evaluate(self, table: Table) -> Column:
        raise NotImplementedError

    # named ops -----------------------------------------------------------
    def alias(self, name: str) -> "Expr":
        return Alias(self, name)

    @property
    def output_name(self) -> str:
        return getattr(self, "_name", repr(self))

    def cast(self, dtype_) -> "Expr":
        return Cast(self, dt.dtype(dtype_))

    def is_null(self) -> "Expr":
        return Unary(self, "is_null")

    def is_not_null(self) -> "Expr":
        return Unary(self, "is_not_null")

    def abs(self):
        return Unary(self, "abs")

    def floor(self):
        return Unary(self, "floor")

    def ceil(self):
        return Unary(self, "ceil")

    def round(self, decimals=0):
        return Round(self, decimals)

    def fill_null(self, value):
        return FillNull(self, value)

    def is_in(self, values):
        return IsIn(self, list(values))

    def is_between(self, lo, hi, closed="both"):
        left = self >= lo if closed in ("both", "left") else self > lo
        right = self <= hi if closed in ("both", "right") else self < hi
        return left & right

    # aggregations --------------------------------------------------------
    def sum(self):
        return Agg(self, "sum")

    def mean(self):
        return Agg(self, "mean")

    def min(self):
        return Agg(self, "min")

    def max(self):
        return Agg(self, "max")

    def count(self):
        return Agg(self, "count")

    def n_unique(self):
        return Agg(self, "nunique")

    def first(self):
        return Agg(self, "first")

    def last(self):
        return Agg(self, "last")

    def median(self):
        return Agg(self, "median")

    def std(self, ddof=1):
        return Agg(self, "std")

    def var(self, ddof=1):
        return Agg(self, "var")

    # operators -----------------------------------------------------------
    def _bin(self, other, op):
        return BinOp(self, _wrap(other), op)

    def __add__(self, o):
        return self._bin(o, "add")

    def __radd__(self, o):
        return BinOp(_wrap(o), self, "add")

    def __sub__(self, o):
        return self._bin(o, "sub")

    def __rsub__(self, o):
        return BinOp(_wrap(o), self, "sub")

    def __mul__(self, o):
        return self._bin(o, "mul")

    def __rmul__(self, o):
        return BinOp(_wrap(o), self, "mul")

    def __truediv__(self, o):
        return self._bin(o, "truediv")

    def __rtruediv__(self, o):
        return BinOp(_wrap(o), self, "truediv")

    def __floordiv__(self, o):
        return self._bin(o, "floordiv")

    def __mod__(self, o):
        return self._bin(o, "mod")

    def __pow__(self, o):
        return self._bin(o, "pow")

    def __eq__(self, o):  # type: ignore[override]
        return self._bin(o, "eq")

    def __ne__(self, o):  # type: ignore[override]
        return self._bin(o, "ne")

    def __lt__(self, o):
        return self._bin(o, "lt")

    def __gt__(self, o):
        return self._bin(o, "gt")

    def __le__(self, o):
        return self._bin(o, "le")

    def __ge__(self, o):
        return self._bin(o, "ge")

    def __and__(self, o):
        return self._bin(o, "and")

    def __or__(self, o):
        return self._bin(o, "or")

    def __invert__(self):
        return Unary(self, "not")

    def __hash__(self):
        return hash(repr(self))

    # helper: names this expr reads
    def references(self) -> set:
        out = set()
        for ch in getattr(self, "children", ()):  # type: ignore[attr-defined]
            out |= ch.references()
        if isinstance(self, Col):
            out.add(self.name)
        return out


def _wrap(v) -> Expr:
    if isinstance(v, Expr):
        return v
    return Literal(v)


class Col(Expr):
    def __init__(self, name: str):
        self.name = name
        self._name = name
        self.children: Tuple[Expr, ...] = ()

    def evaluate(self, table: Table) -> Column:
        return table[self.name]

    def __repr__(self):
        return f"col({self.name!r})"


class Literal(Expr):
    def __init__(self, value):
        self.value = value
        self._name = "literal"
        self.children: Tuple[Expr, ...] = ()

    def evaluate(self, table: Table) -> Column:
        n = table.num_rows
        return Column.full(n, self.value)

    def __repr__(self):
        return f"lit({self.value!r})"


class Alias(Expr):
    def __init__(self, child: Expr, name: str):
        self.children = (child,)
        self._name = name

    def evaluate(self, table: Table) -> Column:
        return self.children[0].evaluate(table)

    def __repr__(self):
        return f"{self.children[0]!r}.alias({self._name!r})"


class BinOp(Expr):
    def __init__(self, left: Expr, right: Expr, op: str):
        self.children = (left, right)
        self.op = op
        self._name = left.output_name

    def evaluate(self, table: Table) -> Column:
        from cudf_tpu.ops.binaryop import binary_operation

        l = self.children[0]
        r = self.children[1]
        lv = None if isinstance(l, Literal) else l.evaluate(table)
        rv = None if isinstance(r, Literal) else r.evaluate(table)
        if lv is None and rv is None:
            lv = l.evaluate(table)
        if lv is None:
            lv = l.value  # type: ignore[union-attr]
        if rv is None:
            rv = r.value  # type: ignore[union-attr]
        return binary_operation(lv, rv, self.op)

    def __repr__(self):
        return f"({self.children[0]!r} {self.op} {self.children[1]!r})"


class Unary(Expr):
    def __init__(self, child: Expr, op: str):
        self.children = (child,)
        self.op = op
        self._name = child.output_name

    def evaluate(self, table: Table) -> Column:
        from cudf_tpu.ops import unary

        v = self.children[0].evaluate(table)
        if self.op in ("is_null", "is_not_null"):
            import jax.numpy as jnp

            from cudf_tpu.ops._utils import materialize_validity

            valid = materialize_validity(v)
            data = ~valid
            if v.dtype.is_float:
                data = data | jnp.isnan(jnp.where(valid, v.data, 0.0))
            if self.op == "is_not_null":
                data = ~data
            return Column(dt.BOOL8, v.length, data=data)
        if self.op == "not":
            return unary.unary_operation(v, "not")
        return unary.unary_operation(v, self.op)

    def __repr__(self):
        return f"{self.op}({self.children[0]!r})"


class Cast(Expr):
    def __init__(self, child: Expr, dtype_: dt.DType):
        self.children = (child,)
        self.dtype = dtype_
        self._name = child.output_name

    def evaluate(self, table: Table) -> Column:
        from cudf_tpu.ops.unary import cast

        return cast(self.children[0].evaluate(table), self.dtype)

    def __repr__(self):
        return f"cast({self.children[0]!r}, {self.dtype!r})"


class Round(Expr):
    def __init__(self, child: Expr, decimals: int):
        self.children = (child,)
        self.decimals = decimals
        self._name = child.output_name

    def evaluate(self, table: Table) -> Column:
        from cudf_tpu.ops.unary import round as _round

        return _round(self.children[0].evaluate(table), self.decimals)

    def __repr__(self):
        return f"round({self.children[0]!r}, {self.decimals})"


class FillNull(Expr):
    def __init__(self, child: Expr, value):
        self.children = (child,)
        self.value = value
        self._name = child.output_name

    def evaluate(self, table: Table) -> Column:
        from cudf_tpu.ops.replace import replace_nulls_scalar

        return replace_nulls_scalar(self.children[0].evaluate(table), self.value)

    def __repr__(self):
        return f"fill_null({self.children[0]!r}, {self.value!r})"


class IsIn(Expr):
    def __init__(self, child: Expr, values: list):
        self.children = (child,)
        self.values = values
        self._name = child.output_name

    def evaluate(self, table: Table) -> Column:
        import jax.numpy as jnp

        from cudf_tpu.core.column import as_column
        from cudf_tpu.ops.search import contains

        v = self.children[0].evaluate(table)
        km = self._dict_key_mask(v)
        if km is not None:
            # membership once per DICTIONARY entry (pure numpy — inside
            # the SPMD shard_map trace every jnp value is a tracer, so
            # the key-set decision must stay off-device), then integer
            # code compares on device — never a row-wise decode.  The
            # reference evaluates dictionary predicates over the key set
            # the same way (cpp/src/search/contains_column.cu).
            codes = v.data.astype(jnp.int32)
            matched = np.flatnonzero(km)
            if matched.size == 0:
                mask = jnp.zeros((v.length,), jnp.bool_)
            elif matched.size <= 16:
                mask = jnp.zeros((v.length,), jnp.bool_)
                for c in matched.tolist():
                    mask = mask | (codes == c)
            else:
                mask = jnp.take(jnp.asarray(km), jnp.clip(codes, 0, None))
            if v.validity is not None:
                mask = mask & v.validity
            return Column(dt.BOOL8, v.length, data=mask)
        mask = contains(as_column(self.values), v)
        return Column(dt.BOOL8, v.length, data=mask)

    def _dict_key_mask(self, v: Column):
        """bool[n_keys] numpy membership of each dictionary entry in
        self.values, or None when v is not a dictionary column with
        host-readable key buffers / plain literal values."""
        if not (v.dtype.is_dictionary and v.children):
            return None
        if any(x is None or (isinstance(x, float) and x != x)
               for x in self.values):
            return None                      # null semantics: generic path
        keys = v.children[0]
        try:
            if keys.dtype.is_string:
                offs = np.asarray(keys.offsets)
                buf = (np.asarray(keys.data) if keys.data is not None
                       and keys.data.shape[0] else np.zeros(0, np.uint8))
                vals = {str(x) for x in self.values}
                return np.array([
                    bytes(buf[offs[i]:offs[i + 1]].tolist())
                    .decode("utf-8", "surrogateescape") in vals
                    for i in range(keys.length)], dtype=bool)
            if keys.dtype.is_numeric:
                return np.isin(np.asarray(keys.data),
                               np.asarray(list(self.values)))
        except Exception:
            return None                      # traced buffers: generic path
        return None

    def __repr__(self):
        return f"{self.children[0]!r}.is_in({self.values!r})"


class Agg(Expr):
    """Aggregation marker — consumed by GroupBy / Reduce IR nodes."""

    def __init__(self, child: Expr, agg: str):
        self.children = (child,)
        self.agg = agg
        self._name = child.output_name

    def evaluate(self, table: Table) -> Column:
        # whole-table reduction (Reduce node)
        from cudf_tpu.ops import reductions

        v = self.children[0].evaluate(table)
        fn = getattr(reductions, self.agg if self.agg != "nunique" else "nunique")
        return Column.full(1, fn(v))

    def __repr__(self):
        return f"{self.children[0]!r}.{self.agg}()"

    def over(self, *keys) -> "Over":
        """Window variant: per-group aggregate broadcast back to rows
        (polars .over(); cudf-polars streaming/over.py role)."""
        flat = []
        for k in keys:
            if isinstance(k, (list, tuple)):
                flat.extend(k)
            else:
                flat.append(k)
        return Over(self, [k if isinstance(k, str) else k.output_name
                           for k in flat])


class Over(Expr):
    """Per-row windowed aggregate: agg within partition-by keys,
    broadcast to every member row (SQL `agg() OVER (PARTITION BY k)`)."""

    def __init__(self, agg: "Agg", keys):
        self.children = (agg,)
        self.keys = list(keys)
        self._name = agg.output_name

    def evaluate(self, table: Table) -> Column:
        import jax.numpy as jnp

        from cudf_tpu.ops import copying
        from cudf_tpu.ops import groupby as gb

        agg = self.children[0]
        value = agg.children[0].evaluate(table)
        grouper = gb.make_grouper([table[k] for k in self.keys],
                                  dropna=False)
        fn = gb._AGG_DISPATCH[agg.agg]
        per_group = fn(value, grouper)
        return copying.gather(per_group, grouper.group_ids,
                              bounds_check=False)

    def references(self):
        return self.children[0].references() | set(self.keys)

    def __repr__(self):
        return f"{self.children[0]!r}.over({self.keys})"


class Ternary(Expr):
    """when(cond).then(a).otherwise(b)."""

    def __init__(self, cond: Expr, then: Expr, otherwise: Expr):
        self.children = (cond, then, otherwise)
        self._name = then.output_name

    def evaluate(self, table: Table) -> Column:
        from cudf_tpu.ops.copying import copy_if_else

        c = self.children[0].evaluate(table)
        t = self.children[1].evaluate(table)
        o = self.children[2].evaluate(table)
        import jax.numpy as jnp

        m = c.data.astype(jnp.bool_)
        if c.validity is not None:
            m = m & c.validity
        return copy_if_else(m, t, o)

    def __repr__(self):
        return f"when({self.children[0]!r}).then({self.children[1]!r}).otherwise({self.children[2]!r})"


class _When:
    def __init__(self, cond: Expr):
        self._cond = cond

    def then(self, value) -> "_Then":
        return _Then(self._cond, _wrap(value))


class _Then:
    def __init__(self, cond: Expr, then: Expr):
        self._cond = cond
        self._then = then

    def otherwise(self, value) -> Ternary:
        return Ternary(self._cond, self._then, _wrap(value))


def when(cond: Expr) -> _When:
    return _When(cond)


def col(name: str) -> Col:
    return Col(name)


def lit(value) -> Literal:
    return Literal(value)
