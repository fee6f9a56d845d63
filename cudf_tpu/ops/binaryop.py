"""Binary operations with null propagation and type promotion.

TPU-native equivalent of libcudf's binaryop
(reference: cpp/src/binaryop/, compiled kernel table binaryop.cpp:53).

Where the reference dispatches to pre-compiled CUDA kernels or NVRTC-JIT,
here every (op, lhs dtype, rhs dtype) combination traces once through jnp
and lands in the XLA jit cache — runtime JIT is the *default* compilation
model on TPU, not a special path.  Null semantics: output row is null iff
either input row is null (except the NULL_* ops and Kleene logicals).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import bitmask as bm
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, _is_null
from cudf_tpu.ops._utils import materialize_validity, segment_expand

ColumnOrScalar = Union[Column, int, float, bool, str, np.generic]

_COMPARISONS = {"eq", "ne", "lt", "gt", "le", "ge"}
_LOGICAL = {"and", "or"}

_ARITH_FNS = {
    "add": jnp.add,
    "sub": jnp.subtract,
    "mul": jnp.multiply,
    "truediv": jnp.true_divide,
    "floordiv": jnp.floor_divide,
    "mod": jnp.mod,            # python/numpy sign-of-divisor (PYMOD in libcudf)
    "cmod": jnp.fmod,          # C-style sign-of-dividend (MOD in libcudf)
    "pow": jnp.power,
    "atan2": jnp.arctan2,
    "logbase": lambda a, b: jnp.log(a) / jnp.log(b),
    "bitand": jnp.bitwise_and,
    "bitor": jnp.bitwise_or,
    "bitxor": jnp.bitwise_xor,
    "shiftleft": jnp.left_shift,
    "shiftright": jnp.right_shift,
    "min": jnp.minimum,
    "max": jnp.maximum,
}
_CMP_FNS = {
    "eq": jnp.equal,
    "ne": jnp.not_equal,
    "lt": jnp.less,
    "gt": jnp.greater,
    "le": jnp.less_equal,
    "ge": jnp.greater_equal,
}


def binary_operation(lhs: ColumnOrScalar, rhs: ColumnOrScalar, op: str) -> Column:
    """Evaluate ``lhs <op> rhs`` elementwise.

    Mirror of cudf::binary_operation (cpp/include/cudf/binaryop.hpp).
    """
    lhs_col = isinstance(lhs, Column)
    rhs_col = isinstance(rhs, Column)
    if not lhs_col and not rhs_col:
        raise TypeError("at least one operand must be a Column")
    n = lhs.length if lhs_col else rhs.length

    if op in ("truediv", "floordiv", "pow"):
        def _is_bool(x):
            return (x.dtype.is_bool if isinstance(x, Column)
                    else isinstance(x, (bool, np.bool_)))

        if _is_bool(lhs) and _is_bool(rhs):
            # pandas raises for bool//bool etc. (core/ops/array_ops.py
            # _BOOL_OP_NOT_ALLOWED)
            raise NotImplementedError(
                f"operator '{op}' not implemented for bool dtypes")

    # scalar null → all-null result.  Exemption (both operand orders): a
    # float NaN scalar compared against a float column is a real float
    # comparison (pandas: NaN == x is False, not null).
    def _nan_cmp_exempt(scalar, other):
        return (isinstance(scalar, float) and scalar != scalar
                and isinstance(other, Column) and other.dtype.is_float
                and op in _COMPARISONS)

    if (not lhs_col and _is_null(lhs) and not _nan_cmp_exempt(lhs, rhs)) or (
        not rhs_col and _is_null(rhs) and not _nan_cmp_exempt(rhs, lhs)
    ):
        if _is_null(lhs if not lhs_col else rhs):
            out_dtype = dt.BOOL8 if op in _COMPARISONS or op in _LOGICAL else (
                lhs.dtype if lhs_col else rhs.dtype
            )
            return Column.full(n, None, dtype=out_dtype)

    # ---- strings ------------------------------------------------------
    l_str = lhs_col and lhs.dtype.is_string or isinstance(lhs, str)
    r_str = rhs_col and rhs.dtype.is_string or isinstance(rhs, str)
    if l_str or r_str:
        return _string_binary(lhs, rhs, op, n)

    # fixed-point decimals: integer-rep arithmetic with scale matching
    if (lhs_col and lhs.dtype.is_decimal) or (rhs_col and rhs.dtype.is_decimal):
        from cudf_tpu.ops.decimal import decimal_binary_operation

        return decimal_binary_operation(lhs, rhs, op)

    # dictionary: decode then operate
    if lhs_col and lhs.dtype.is_dictionary:
        return binary_operation(lhs.decode_dictionary(), rhs, op)
    if rhs_col and rhs.dtype.is_dictionary:
        return binary_operation(lhs, rhs.decode_dictionary(), op)

    l_data, l_valid, l_dtype = _operand(lhs, n)
    r_data, r_valid, r_dtype = _operand(rhs, n)

    # ---- temporal arithmetic -------------------------------------------
    out_dtype = _result_dtype(l_dtype, r_dtype, op)

    if op in _COMPARISONS:
        if l_dtype.is_temporal or r_dtype.is_temporal:
            common = dt.common_dtype(l_dtype, r_dtype)
            l_data = _rescale_ticks(l_data, l_dtype, common)
            r_data = _rescale_ticks(r_data, r_dtype, common)
        data = _CMP_FNS[op](l_data, r_data)
        validity = bm.and_masks(l_valid, r_valid)
        return Column(dt.BOOL8, n, data=data, validity=validity)

    if op in _LOGICAL:
        lb = l_data.astype(jnp.bool_)
        rb = r_data.astype(jnp.bool_)
        data = jnp.logical_and(lb, rb) if op == "and" else jnp.logical_or(lb, rb)
        validity = bm.and_masks(l_valid, r_valid)
        return Column(dt.BOOL8, n, data=data, validity=validity)

    if op == "null_equals":
        lv = l_valid if l_valid is not None else jnp.ones((n,), jnp.bool_)
        rv = r_valid if r_valid is not None else jnp.ones((n,), jnp.bool_)
        both_valid = lv & rv
        eq = jnp.equal(l_data, r_data)
        data = jnp.where(both_valid, eq, lv == rv)
        return Column(dt.BOOL8, n, data=data)

    if op in ("null_max", "null_min"):
        fn = jnp.maximum if op == "null_max" else jnp.minimum
        lv = l_valid if l_valid is not None else jnp.ones((n,), jnp.bool_)
        rv = r_valid if r_valid is not None else jnp.ones((n,), jnp.bool_)
        st = out_dtype.storage
        lval = l_data.astype(st)
        rval = r_data.astype(st)
        data = jnp.where(lv & rv, fn(lval, rval), jnp.where(lv, lval, rval))
        validity = lv | rv
        if bool(jnp.all(validity)):
            validity = None
        return Column(out_dtype, n, data=data, validity=validity)

    # plain arithmetic
    if l_dtype.is_temporal or r_dtype.is_temporal:
        data, out_dtype = _temporal_arith(l_data, l_dtype, r_data, r_dtype, op, out_dtype)
    else:
        st = out_dtype.storage
        fn = _ARITH_FNS[op]
        if op == "truediv":
            data = fn(l_data.astype(st), r_data.astype(st))
        elif op in ("floordiv", "mod", "cmod") and out_dtype.is_integer:
            # guard div-by-zero on int (XLA int div by 0 is undefined)
            rz = r_data == 0
            has_zero = False
            if op != "cmod":
                try:
                    has_zero = bool(jnp.any(rz))
                except Exception:
                    pass              # under jit tracing: keep int guard
            if has_zero:
                # pandas: int // 0 → float ±inf (nan for 0//0), x % 0 →
                # nan — the result dtype becomes float64
                lf = l_data.astype(jnp.float64)
                rf = jnp.where(rz, 1.0, r_data.astype(jnp.float64))
                if op == "floordiv":
                    data = jnp.where(
                        rz,
                        jnp.where(lf > 0, jnp.inf,
                                  jnp.where(lf < 0, -jnp.inf, jnp.nan)),
                        jnp.floor_divide(lf, rf))
                else:
                    data = jnp.where(rz, jnp.nan, jnp.mod(lf, rf))
                out_dtype = dt.FLOAT64
            else:
                safe_r = jnp.where(rz, 1, r_data)
                data = fn(l_data.astype(st), safe_r.astype(st))
                data = jnp.where(rz, 0, data)
        elif op == "pow" and out_dtype.is_integer:
            data = jnp.power(l_data.astype(st), r_data.astype(st))
        else:
            data = fn(l_data.astype(st), r_data.astype(st))
        data = data.astype(out_dtype.storage)
    validity = bm.and_masks(l_valid, r_valid)
    return Column(out_dtype, n, data=data, validity=validity)


def _operand(x, n):
    if isinstance(x, Column):
        return x.data, x.validity, x.dtype
    if isinstance(x, (np.datetime64, np.timedelta64)):
        kind = "M" if isinstance(x, np.datetime64) else "m"
        unit = np.datetime_data(x.dtype)[0]
        if unit == "D":
            x = x.astype(f"{x.dtype.kind and (('datetime64[s]') if kind=='M' else 'timedelta64[s]')}")
            unit = "s"
        d = dt.unit_dtype(kind, unit)
        return jnp.asarray(x.astype(np.int64)), None, d
    npv = np.asarray(x)
    return jnp.asarray(npv), None, dt.dtype(npv.dtype)


def _result_dtype(a: dt.DType, b: dt.DType, op: str) -> dt.DType:
    if op in _COMPARISONS or op in _LOGICAL or op == "null_equals":
        return dt.BOOL8
    if op == "truediv" and not (a.is_temporal or b.is_temporal):
        return dt.FLOAT64 if not (a.is_float or b.is_float) else dt.common_dtype(a, b)
    if op in ("atan2", "logbase"):
        return dt.FLOAT64
    if a.is_temporal or b.is_temporal:
        return _temporal_result_dtype(a, b, op)
    if a.is_bool and b.is_bool and op in ("add", "mul", "min", "max"):
        return dt.BOOL8
    return dt.common_dtype(a, b)


def _temporal_result_dtype(a, b, op):
    if op == "sub":
        if a.is_timestamp and b.is_timestamp:
            u = dt.common_dtype(a, b).time_unit or "s"
            return dt.unit_dtype("m", u)
        if a.is_timestamp:
            return dt.common_dtype(a, dt.unit_dtype("M", b.time_unit or "s"))
        if a.is_duration and b.is_duration:
            return dt.common_dtype(a, b)
    if op == "add":
        if a.is_timestamp and b.is_duration:
            return dt.common_dtype(a, dt.unit_dtype("M", b.time_unit or "s"))
        if a.is_duration and b.is_timestamp:
            return dt.common_dtype(dt.unit_dtype("M", a.time_unit or "s"), b)
        if a.is_duration and b.is_duration:
            return dt.common_dtype(a, b)
    if op in ("mul", "truediv", "floordiv", "mod"):
        if a.is_duration and b.is_numeric:
            if op == "truediv" and b.is_duration:
                return dt.FLOAT64
            return a
        if a.is_numeric and b.is_duration:
            return b
        if a.is_duration and b.is_duration:
            return dt.FLOAT64 if op == "truediv" else a
    if op in ("min", "max", "null_max", "null_min"):
        return dt.common_dtype(a, b)
    raise TypeError(f"unsupported temporal op {op} between {a} and {b}")


_TICKS = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _rescale_ticks(data, from_dtype, to_dtype):
    if not from_dtype.is_temporal:
        return data
    fa = _TICKS[from_dtype.time_unit or "s"]
    fb = _TICKS[to_dtype.time_unit or "s"]
    if fa == fb:
        return data.astype(jnp.int64)
    if fb > fa:
        return data.astype(jnp.int64) * (fb // fa)
    return jnp.floor_divide(data.astype(jnp.int64), fa // fb)


def _temporal_arith(l_data, l_dtype, r_data, r_dtype, op, out_dtype):
    if op == "truediv" and l_dtype.is_duration and r_dtype.is_duration:
        common = dt.common_dtype(l_dtype, r_dtype)
        lv = _rescale_ticks(l_data, l_dtype, common).astype(jnp.float64)
        rv = _rescale_ticks(r_data, r_dtype, common).astype(jnp.float64)
        return lv / rv, dt.FLOAT64
    if l_dtype.is_temporal and r_dtype.is_temporal:
        tgt_unit = out_dtype.time_unit or "s"
        tgt = dt.unit_dtype("m", tgt_unit)
        lv = _rescale_ticks(l_data, l_dtype, tgt)
        rv = _rescale_ticks(r_data, r_dtype, tgt)
        fn = _ARITH_FNS[op]
        return fn(lv, rv).astype(jnp.int64), out_dtype
    # duration * / numeric
    dur, num = (l_data, r_data) if l_dtype.is_temporal else (r_data, l_data)
    dur = dur.astype(jnp.int64)
    if op == "mul":
        return (dur * num.astype(jnp.int64)), out_dtype
    if op in ("truediv", "floordiv"):
        if l_dtype.is_temporal:
            return jnp.floor_divide(dur, num.astype(jnp.int64)), out_dtype
        raise TypeError("cannot divide numeric by duration")
    raise TypeError(f"unsupported temporal op {op}")


# ----------------------------------------------------------------------
# strings
# ----------------------------------------------------------------------

def _as_string_column(x, n) -> Column:
    if isinstance(x, Column):
        return x
    return Column.from_strings([x] * n)


def _string_binary(lhs, rhs, op, n) -> Column:
    # decode-free dictionary-vs-scalar compares: evaluate the comparison
    # once per DICTIONARY value, then gather the boolean by code — no
    # count-then-allocate string gather, so the path stays jit-traceable
    # (the engine's SPMD compiler relies on this) and O(dict) instead of
    # O(rows) on the string side (cudf dictionary search semantics)
    for a, b, flip in ((lhs, rhs, False), (rhs, lhs, True)):
        if (isinstance(a, Column) and a.dtype.is_dictionary
                and not isinstance(b, Column)
                and op in _COMPARISONS and op != "null_equals"):
            keys = a.children[0]
            # host-buffer literal column: inside shard_map all jax-array
            # constants become tracers, so keep the scalar side in numpy
            # (matching the numpy-buffer dictionary the SPMD lowering
            # captures) — the comparison then traces cleanly
            import copy as _copy

            import numpy as _np

            sb = str(b).encode()
            lit_col = _copy.copy(Column.from_strings([str(b)]))
            lit_col.data = _np.frombuffer(sb, _np.uint8) if sb else \
                _np.zeros(0, _np.uint8)
            lit_col.offsets = _np.asarray([0, len(sb)], _np.int64)
            lit_col.length = 1
            reps = keys.length
            # broadcast by comparing each dictionary entry against the
            # single literal row (lengths differ; compare elementwise by
            # tiling the literal's padded bytes)
            cmp = _compare_strings_broadcast(keys, lit_col)  # [dict]
            if flip:
                cmp = -cmp
            per_code = _CMP_FNS[op](cmp, 0)
            codes = jnp.clip(a.data.astype(jnp.int64), 0,
                             max(keys.length - 1, 0))
            data = jnp.take(per_code, codes) if keys.length else \
                jnp.zeros((n,), jnp.bool_)
            return Column(dt.BOOL8, n, data=data, validity=a.validity)
    l = _as_string_column(lhs, n)
    r = _as_string_column(rhs, n)
    if l.dtype.is_dictionary:
        l = l.decode_dictionary()
    if r.dtype.is_dictionary:
        r = r.decode_dictionary()
    if op == "add":
        return _concat_strings(l, r)
    if op in _COMPARISONS or op == "null_equals":
        cmp = _compare_strings(l, r)  # int8 in {-1,0,1}
        fn = _CMP_FNS[op if op != "null_equals" else "eq"]
        data = fn(cmp, 0)
        if op == "null_equals":
            lv = materialize_validity(l)
            rv = materialize_validity(r)
            data = jnp.where(lv & rv, data, lv == rv)
            return Column(dt.BOOL8, n, data=data)
        validity = bm.and_masks(l.validity, r.validity)
        return Column(dt.BOOL8, n, data=data, validity=validity)
    raise TypeError(f"unsupported string op {op}")


def _compare_strings_broadcast(l: Column, r1: Column) -> jnp.ndarray:
    """3-way compare of every row of l against the SINGLE row of r1
    (numpy-buffer columns stay host-concrete; see _string_binary)."""
    max_len = int(max(1, _column_max_len(l), _column_max_len(r1)))
    lm = _padded_bytes(l, max_len).astype(jnp.int16)
    rm = _padded_bytes(r1, max_len).astype(jnp.int16)   # [1, w]
    diff = jnp.sign(lm - rm)
    nz = diff != 0
    first = jnp.argmax(nz, axis=1)
    any_nz = jnp.any(nz, axis=1)
    picked = jnp.take_along_axis(diff, first[:, None], axis=1)[:, 0]
    return jnp.where(any_nz, picked, 0).astype(jnp.int8)


def _column_max_len(c: Column) -> int:
    # host metadata must stay in NUMPY: inside shard_map even jnp ops on
    # closed-over constants become tracers
    if not c.length:
        return 0
    import numpy as _np

    offs = c.offsets
    if isinstance(offs, _np.ndarray):
        return int((offs[1:] - offs[:-1]).max())
    return int(jnp.max(offs[1:] - offs[:-1]))


def _padded_bytes(col: Column, width: int) -> jnp.ndarray:
    """[n, width] uint8 matrix, rows zero-padded (0 sorts before any utf-8 byte)."""
    n = col.length
    starts = col.offsets[:-1]
    lens = col.offsets[1:] - starts
    pos = jnp.arange(width, dtype=jnp.int64)
    idx = starts[:, None] + pos[None, :]
    valid = pos[None, :] < lens[:, None]
    idx = jnp.where(valid, idx, 0)
    chars = col.data if col.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    mat = jnp.take(chars, jnp.clip(idx, 0, chars.shape[0] - 1))
    return jnp.where(valid, mat, jnp.uint8(0))


def _compare_strings(l: Column, r: Column) -> jnp.ndarray:
    """Lexicographic 3-way compare → int8[n] in {-1,0,1}.

    TPU-first design: rather than byte-at-a-time device loops (hostile to
    the VPU), materialize fixed-width padded tiles and reduce — one wide
    vectorized pass.  Long-string columns should be dictionary-encoded
    before comparison (the idiomatic path for joins/sorts).
    """
    max_len = int(max(1, _column_max_len(l), _column_max_len(r)))
    lm = _padded_bytes(l, max_len).astype(jnp.int16)
    rm = _padded_bytes(r, max_len).astype(jnp.int16)
    diff = jnp.sign(lm - rm)  # [n, w] in {-1,0,1}
    # first nonzero byte decides: weight earlier positions higher via argmax trick
    nz = diff != 0
    first = jnp.argmax(nz, axis=1)
    any_nz = jnp.any(nz, axis=1)
    picked = jnp.take_along_axis(diff, first[:, None], axis=1)[:, 0]
    return jnp.where(any_nz, picked, 0).astype(jnp.int8)


def _concat_strings(l: Column, r: Column) -> Column:
    n = l.length
    ll = l.offsets[1:] - l.offsets[:-1]
    rl = r.offsets[1:] - r.offsets[:-1]
    lengths = ll + rl
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lengths)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    from_l = within < jnp.take(ll, row)
    l_src = jnp.take(l.offsets[:-1], row) + within
    r_src = jnp.take(r.offsets[:-1], row) + (within - jnp.take(ll, row))
    lc = l.data if l.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    rc = r.data if r.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    chars = jnp.where(
        from_l,
        jnp.take(lc, jnp.clip(l_src, 0, lc.shape[0] - 1)),
        jnp.take(rc, jnp.clip(r_src, 0, rc.shape[0] - 1)),
    )
    validity = bm.and_masks(l.validity, r.validity)
    return Column(dt.STRING, n, data=chars, offsets=offsets, validity=validity)


def _select_strings(mask: jnp.ndarray, l: Column, r: Column) -> Column:
    """Rowwise select between two string columns (copy_if_else for strings)."""
    n = l.length
    ll = l.offsets[1:] - l.offsets[:-1]
    rl = r.offsets[1:] - r.offsets[:-1]
    lengths = jnp.where(mask, ll, rl)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(lengths)])
    total = int(offsets[-1])
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    use_l = jnp.take(mask, row)
    l_src = jnp.take(l.offsets[:-1], row) + within
    r_src = jnp.take(r.offsets[:-1], row) + within
    lc = l.data if l.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    rc = r.data if r.data.shape[0] else jnp.zeros((1,), jnp.uint8)
    chars = jnp.where(
        use_l,
        jnp.take(lc, jnp.clip(l_src, 0, lc.shape[0] - 1)),
        jnp.take(rc, jnp.clip(r_src, 0, rc.shape[0] - 1)),
    )
    validity = None
    if l.validity is not None or r.validity is not None:
        validity = jnp.where(mask, materialize_validity(l), materialize_validity(r))
    return Column(dt.STRING, n, data=chars, offsets=offsets, validity=validity)
