"""Unary ops: cast, null predicates, math, rounding.

TPU-native equivalent of libcudf's unary/round kernels
(reference: cpp/src/unary/, cpp/src/round/).  All tier-1 XLA: each op is a
single fused elementwise pass over HBM on the VPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops._utils import materialize_validity

_UNIT_TICKS = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def cast(col: Column, target: dt.DType) -> Column:
    """cudf::cast (cpp/src/unary/cast_ops.cu)."""
    target = dt.dtype(target)
    if col.dtype == target:
        return col
    if col.dtype.is_dictionary:
        return cast(col.decode_dictionary(), target)
    if target.is_dictionary:
        from cudf_tpu.ops.dictionary import encode

        return encode(cast(col, target.value_type) if target.value_type else col)
    if target.is_decimal:
        from cudf_tpu.ops.decimal import cast_to_decimal

        return cast_to_decimal(col, target)
    if col.dtype.is_decimal:
        from cudf_tpu.ops.decimal import cast_from_decimal

        return cast_from_decimal(col, target)
    if col.dtype.is_string:
        from cudf_tpu.ops import strings as str_ops

        if target.is_numeric or target.is_bool:
            return str_ops.to_numbers(col, target)
        if target.is_timestamp:
            return str_ops.to_timestamps(col, target)
        raise TypeError(f"cannot cast string to {target}")
    if target.is_string:
        from cudf_tpu.ops import strings as str_ops

        return str_ops.from_column(col)
    if col.dtype.is_temporal and target.is_temporal:
        fa = _UNIT_TICKS[col.dtype.time_unit or "s"]
        fb = _UNIT_TICKS[target.time_unit or "s"]
        data = col.data.astype(jnp.int64)
        data = data * (fb // fa) if fb >= fa else _floordiv_ticks(data, fa // fb)
        return Column(target, col.length, data=data, validity=col.validity)
    if col.dtype.is_temporal and (target.is_numeric or target.is_bool):
        data = col.data.astype(target.storage)
        return Column(target, col.length, data=data, validity=col.validity)
    if target.is_temporal and (col.dtype.is_numeric or col.dtype.is_bool):
        data = col.data.astype(target.storage)
        validity = col.validity
        if col.dtype.is_integer:
            # iNaT (INT64_MIN) ticks are NaT (pandas M8 sentinel)
            nat = data == jnp.iinfo(jnp.int64).min
            try:
                if bool(jnp.any(nat)):
                    ok = ~nat
                    validity = ok if validity is None else (validity & ok)
            except Exception:
                pass                     # under jit tracing: keep as-is
        return Column(target, col.length, data=data, validity=validity)
    # numeric <-> numeric / bool
    data = col.data.astype(target.storage)
    validity = col.validity
    if col.dtype.is_float and not target.is_float:
        # NaNs become nulls on float->int cast? libcudf keeps UB; pandas raises.
        # We match pandas .astype: values cast directly; NaN handling is at the
        # frame layer.  Nulls propagate unchanged.
        pass
    if (target.nullable or target.arrow) and col.dtype.is_float \
            and not (col.dtype.nullable or col.dtype.arrow):
        # pandas-3 nan_is_na: casting plain float to a masked dtype turns
        # NaN into NA (BaseMaskedArray semantics)
        nan = jnp.isnan(col.data)
        if bool(jnp.any(nan)):
            ok = ~nan
            validity = ok if validity is None else (validity & ok)
            if not target.is_float:
                data = jnp.where(nan, 0, col.data).astype(target.storage)
    return Column(target, col.length, data=data, validity=validity)


def _floordiv_ticks(data, factor):
    # temporal downscale truncates toward negative infinity (pandas semantics)
    return jnp.floor_divide(data, factor)


def is_null(col: Column) -> Column:
    v = materialize_validity(col)
    return Column(dt.BOOL8, col.length, data=~v)


def is_valid(col: Column) -> Column:
    return Column(dt.BOOL8, col.length, data=materialize_validity(col))


def is_nan(col: Column) -> Column:
    if not col.dtype.is_float:
        return Column(dt.BOOL8, col.length, data=jnp.zeros((col.length,), jnp.bool_))
    return Column(dt.BOOL8, col.length, data=jnp.isnan(col.data), validity=col.validity)


_UNARY_FNS = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "arcsin": jnp.arcsin, "arccos": jnp.arccos, "arctan": jnp.arctan,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "arcsinh": jnp.arcsinh, "arccosh": jnp.arccosh, "arctanh": jnp.arctanh,
    "exp": jnp.exp, "log": jnp.log, "log2": jnp.log2, "log10": jnp.log10,
    "log1p": jnp.log1p, "expm1": jnp.expm1,
    "sqrt": jnp.sqrt, "cbrt": jnp.cbrt,
    "ceil": jnp.ceil, "floor": jnp.floor, "rint": jnp.rint,
    "abs": jnp.abs, "negate": jnp.negative, "sign": jnp.sign,
    "bit_invert": jnp.invert, "not": jnp.logical_not,
}


def unary_operation(col: Column, op: str) -> Column:
    """cudf::unary_operation (unary_ops.cu)."""
    fn = _UNARY_FNS[op]
    if op in ("exp", "log", "sqrt", "sin", "cos", "tan", "log2", "log10",
              "log1p", "expm1", "cbrt", "arcsin", "arccos", "arctan",
              "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh") and col.dtype.is_integer:
        data = fn(col.data.astype(jnp.float64))
        out_dtype = dt.FLOAT64
    elif op == "not":
        data = fn(col.data.astype(jnp.bool_))
        out_dtype = dt.BOOL8
    else:
        data = fn(col.data)
        out_dtype = col.dtype
    return Column(out_dtype, col.length, data=data.astype(out_dtype.storage), validity=col.validity)


def round(col: Column, decimals: int = 0, how: str = "half_even") -> Column:  # noqa: A001
    """cudf::round (cpp/src/round/round.cu).  half_even matches pandas."""
    if col.dtype.is_integer and decimals >= 0:
        return col
    x = col.data
    scale = 10.0 ** decimals
    if how == "half_even":
        data = jnp.round(x * scale) / scale
    else:  # half_up
        data = jnp.floor(jnp.abs(x) * scale + 0.5) / scale * jnp.sign(x)
    if col.dtype.is_integer:
        iscale = 10 ** (-decimals)
        half = iscale // 2
        q = jnp.floor_divide(x + jnp.sign(x) * half, iscale) * iscale
        data = q
    return Column(col.dtype, col.length, data=data.astype(col.dtype.storage), validity=col.validity)
