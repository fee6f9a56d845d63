"""Fixed-point decimal arithmetic on integer representations.

TPU-native equivalent of libcudf's fixed_point support
(reference: cpp/include/cudf/fixed_point/fixed_point.hpp:37 scale
semantics, cpp/src/binaryop/compiled/fixed_point.cu scale-matching
rules).  A decimal column stores ``rep`` integers with logical value
``rep * 10**scale`` (scale is usually negative: scale=-2 → cents).

TPU note: jnp has no int128, so DECIMAL128 columns are stored as int64
reps (precision ≤ 18).  That covers Arrow/Spark decimal(p≤18) data; a
two-limb Pallas path for full 128-bit precision is a later extension.

Scale rules (matching libcudf's binary_operation_fixed_point_scale):
  add/sub/mod : result scale = min(ls, rs)    (operands rescaled up)
  mul         : result scale = ls + rs
  div         : result scale = ls - rs        (truncating integer div)
  comparisons : compare at min(ls, rs)
"""

from __future__ import annotations

import decimal as _pydec
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import bitmask as bm
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, _is_null

__all__ = [
    "rescale", "decimal_binary_operation", "from_decimals", "to_decimals",
    "cast_to_decimal", "cast_from_decimal", "round_decimal",
]

_REP = jnp.int64


def _pow10(k: int) -> int:
    return 10 ** int(k)


def _wider(a: dt.DType, b: dt.DType) -> int:
    bits = {dt.TypeId.DECIMAL32: 32, dt.TypeId.DECIMAL64: 64,
            dt.TypeId.DECIMAL128: 128}
    wa = bits.get(a.id, 64)
    wb = bits.get(b.id, 64)
    return max(wa, wb)


def rescale(col: Column, new_scale: int) -> Column:
    """Change a decimal column's scale, preserving logical value.

    Lowering the scale (finer resolution) multiplies the rep; raising it
    divides with truncation toward zero (fixed_point.hpp rescaled()).
    """
    if not col.dtype.is_decimal:
        raise TypeError("rescale expects a decimal column")
    old = col.dtype.scale
    new_scale = int(new_scale)
    if new_scale == old:
        return col
    rep = col.data.astype(_REP)
    if new_scale < old:
        rep = rep * _pow10(old - new_scale)
    else:
        f = _pow10(new_scale - old)
        # trunc-toward-zero division (jnp floor_divide floors)
        q = jnp.sign(rep) * (jnp.abs(rep) // f)
        rep = q.astype(_REP)
    bits = {dt.TypeId.DECIMAL32: 32, dt.TypeId.DECIMAL64: 64,
            dt.TypeId.DECIMAL128: 128}[col.dtype.id]
    out_dtype = dt.decimal_dtype(scale=new_scale, bits=bits)
    return Column(out_dtype, col.length, data=rep.astype(col.dtype.storage),
                  validity=col.validity)


def _scalar_to_fixed(x) -> Tuple[int, int]:
    """Python scalar → (rep, scale)."""
    if isinstance(x, _pydec.Decimal):
        sign, digits, exp = x.as_tuple()
        rep = int("".join(map(str, digits)) or "0")
        return (-rep if sign else rep), int(exp)
    if isinstance(x, (int, np.integer)):
        return int(x), 0
    if isinstance(x, (float, np.floating)):
        return _scalar_to_fixed(_pydec.Decimal(str(x)))
    raise TypeError(f"cannot interpret {type(x).__name__} as decimal")


def _operands(lhs, rhs, n):
    """Normalize (Column|scalar, Column|scalar) to rep arrays + scales."""
    def one(x):
        if isinstance(x, Column):
            if not x.dtype.is_decimal:
                if x.dtype.is_integer:
                    return x.data.astype(_REP), 0, x.validity, x.dtype
                raise TypeError(f"cannot mix decimal with {x.dtype!r}")
            return x.data.astype(_REP), x.dtype.scale, x.validity, x.dtype
        if _is_null(x):
            return jnp.zeros((n,), _REP), 0, jnp.zeros((n,), jnp.bool_), None
        rep, scale = _scalar_to_fixed(x)
        return jnp.full((n,), rep, _REP), scale, None, None

    ld, ls, lv, ldt = one(lhs)
    rd, rs, rv, rdt = one(rhs)
    return ld, ls, lv, ldt, rd, rs, rv, rdt


def decimal_binary_operation(lhs, rhs, op: str) -> Column:
    """Binary op where at least one side is a decimal column."""
    n = lhs.length if isinstance(lhs, Column) else rhs.length
    ld, ls, lv, ldt, rd, rs, rv, rdt = _operands(lhs, rhs, n)
    validity = bm.and_masks(lv, rv)
    bits = _wider(ldt or dt.decimal_dtype(bits=64), rdt or dt.decimal_dtype(bits=64))

    if op in ("eq", "ne", "lt", "gt", "le", "ge"):
        common = min(ls, rs)
        la = ld * _pow10(ls - common)
        ra = rd * _pow10(rs - common)
        fn = {"eq": jnp.equal, "ne": jnp.not_equal, "lt": jnp.less,
              "gt": jnp.greater, "le": jnp.less_equal, "ge": jnp.greater_equal}[op]
        return Column(dt.BOOL8, n, data=fn(la, ra), validity=validity)

    if op in ("add", "sub", "min", "max", "mod"):
        out_scale = min(ls, rs)
        la = ld * _pow10(ls - out_scale)
        ra = rd * _pow10(rs - out_scale)
        if op == "mod":
            rz = ra == 0
            data = jnp.where(rz, 0, jnp.mod(la, jnp.where(rz, 1, ra)))
            validity = bm.and_masks(validity, ~rz) if bool(jnp.any(rz)) else validity
        else:
            fn = {"add": jnp.add, "sub": jnp.subtract,
                  "min": jnp.minimum, "max": jnp.maximum}[op]
            data = fn(la, ra)
    elif op == "mul":
        out_scale = ls + rs
        data = ld * rd
    elif op in ("truediv", "div", "floordiv"):
        out_scale = ls - rs
        rz = rd == 0
        safe = jnp.where(rz, 1, rd)
        q = jnp.sign(ld) * jnp.sign(safe) * (jnp.abs(ld) // jnp.abs(safe))
        data = jnp.where(rz, 0, q)
        validity = bm.and_masks(validity, ~rz) if bool(jnp.any(rz)) else validity
        if op == "floordiv":
            # floordiv result is integral in the logical domain: rescale to 0
            if out_scale < 0:
                data = jnp.sign(data) * (jnp.abs(data) // _pow10(-out_scale))
                out_scale = 0
    else:
        raise TypeError(f"binary op {op!r} not supported for decimals")

    out_dtype = dt.decimal_dtype(scale=out_scale, bits=bits)
    return Column(out_dtype, n, data=data.astype(out_dtype.storage),
                  validity=validity)


def from_decimals(values, scale: Optional[int] = None, bits: int = 64) -> Column:
    """Build a decimal column from python Decimals / ints / floats."""
    reps_scales = []
    valid = []
    for v in values:
        if _is_null(v):
            valid.append(False)
            reps_scales.append((0, 0))
        else:
            valid.append(True)
            reps_scales.append(_scalar_to_fixed(v))
    if scale is None:
        scale = min((s for (_, s), ok in zip(reps_scales, valid) if ok), default=0)
    reps = [r * _pow10(s - scale) if s >= scale else
            int(_pydec.Decimal(r).scaleb(s - scale).to_integral_value(
                rounding=_pydec.ROUND_HALF_EVEN))
            for (r, s) in reps_scales]
    dtype = dt.decimal_dtype(scale=scale, bits=bits)
    validity = None if all(valid) else jnp.asarray(np.asarray(valid))
    data = jnp.asarray(np.asarray(reps, dtype=dtype.storage))
    return Column(dtype, len(reps), data=data, validity=validity)


def to_decimals(col: Column) -> list:
    """Decimal column → list of python decimal.Decimal (None for nulls)."""
    reps = np.asarray(col.data).tolist()
    s = col.dtype.scale
    mask = (np.asarray(col.validity).tolist() if col.validity is not None
            else [True] * col.length)
    return [(_pydec.Decimal(r).scaleb(s) if ok else None)
            for r, ok in zip(reps, mask)]


def cast_to_decimal(col: Column, target: dt.DType) -> Column:
    """int/float/decimal column → decimal(target.scale)."""
    if col.dtype.is_decimal:
        out = rescale(col, target.scale)
        return Column(target, out.length, data=out.data.astype(target.storage),
                      validity=out.validity)
    if col.dtype.is_integer or col.dtype.is_bool:
        src = Column(dt.decimal_dtype(scale=0, bits=64), col.length,
                     data=col.data.astype(_REP), validity=col.validity)
        return cast_to_decimal(src, target)
    if col.dtype.is_float:
        scaled = col.data.astype(jnp.float64) * float(_pow10(-target.scale))
        rep = jnp.round(scaled).astype(target.storage)
        return Column(target, col.length, data=rep, validity=col.validity)
    if col.dtype.is_string:
        vals = [(_pydec.Decimal(s) if s is not None else None)
                for s in col.to_pylist()]
        bits = {dt.TypeId.DECIMAL32: 32, dt.TypeId.DECIMAL64: 64,
                dt.TypeId.DECIMAL128: 128}[target.id]
        return rescale(from_decimals(vals, bits=bits), target.scale)
    raise TypeError(f"cannot cast {col.dtype!r} to decimal")


def cast_from_decimal(col: Column, target: dt.DType) -> Column:
    """decimal → int/float."""
    s = col.dtype.scale
    if target.is_float:
        # divide for negative scales: 1999/100.0 rounds correctly where
        # 1999*0.01 compounds the inexact 0.01 representation
        f = col.data.astype(jnp.float64)
        data = f / float(_pow10(-s)) if s < 0 else f * float(_pow10(s))
        return Column(target, col.length, data=data.astype(target.storage),
                      validity=col.validity)
    if target.is_integer or target.is_bool:
        as_int = rescale(col, 0)
        return Column(target, col.length, data=as_int.data.astype(target.storage),
                      validity=col.validity)
    if target.is_string:
        from cudf_tpu.core.column import Column as C
        return C.from_strings([(str(d) if d is not None else None)
                               for d in to_decimals(col)])
    raise TypeError(f"cannot cast decimal to {target!r}")


def round_decimal(col: Column, decimals: int = 0) -> Column:
    """Half-even round to ``decimals`` fractional digits (scale=-decimals)."""
    target_scale = -int(decimals)
    old = col.dtype.scale
    if target_scale <= old:
        return rescale(col, target_scale)
    f = _pow10(target_scale - old)
    rep = col.data.astype(_REP)
    q, r = jnp.divmod(jnp.abs(rep), f)
    half = f // 2
    round_up = (r > half) | ((r == half) & (q % 2 == 1))
    q = jnp.where(round_up, q + 1, q)
    rep = jnp.sign(rep) * q
    bits = {dt.TypeId.DECIMAL32: 32, dt.TypeId.DECIMAL64: 64,
            dt.TypeId.DECIMAL128: 128}[col.dtype.id]
    out_dtype = dt.decimal_dtype(scale=target_scale, bits=bits)
    return Column(out_dtype, col.length, data=rep.astype(out_dtype.storage),
                  validity=col.validity)
