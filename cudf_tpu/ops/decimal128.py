"""Two-limb DECIMAL128: emulated int128 arithmetic on (hi, lo) columns.

TPU-native equivalent of libcudf's __int128 fixed_point
(reference: cpp/include/cudf/fixed_point/fixed_point.hpp:37-38 —
fixed_point<__int128_t, Radix>; the CUDA code gets __int128 from the
compiler, XLA has no i128, so limbs are explicit).

Representation: value = hi * 2^64 + lo (two's complement over the pair:
hi int64 carries the sign, lo uint64).  A DECIMAL128 column stores
``data = lo`` (uint64) with ``children = (hi int64 column,)``.

Covers the full 38-digit precision for add/sub/neg/compare/rescale and
multiply (64x64→128 via 32-bit limb products); divide-by-power-of-ten
implements rescale-up.  Values with precision ≤ 18 keep the single-limb
int64 fast path in ops/decimal.py.
"""

from __future__ import annotations

import decimal as _pydec
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column

_MASK32 = jnp.uint64(0xFFFFFFFF)
_CTX = _pydec.Context(prec=60)   # 38-digit reps never round


def make_decimal128(hi: jnp.ndarray, lo: jnp.ndarray, scale: int,
                    validity=None) -> Column:
    n = lo.shape[0]
    hi_col = Column(dt.INT64, n, data=hi.astype(jnp.int64))
    return Column(dt.decimal_dtype(scale, bits=128), n,
                  data=lo.astype(jnp.uint64), children=(hi_col,),
                  validity=validity)


def limbs(col: Column) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hi int64, lo uint64); single-limb decimal128 promotes."""
    if col.children:
        return col.children[0].data.astype(jnp.int64), col.data.astype(jnp.uint64)
    rep = col.data.astype(jnp.int64)
    return jnp.where(rep < 0, jnp.int64(-1), jnp.int64(0)), \
        jnp.asarray(rep).view(jnp.uint64) if hasattr(rep, "view") else \
        jnp.asarray(np.asarray(rep).view(np.uint64))


def _bitcast_u(x):
    import jax

    return jax.lax.bitcast_convert_type(x, jnp.uint64)


def _bitcast_s(x):
    import jax

    return jax.lax.bitcast_convert_type(x, jnp.int64)


def i128_add(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint64)
    hi = _bitcast_s(_bitcast_u(ah) + _bitcast_u(bh) + carry)
    return hi, lo


def i128_neg(h, l):
    nl = (~l) + jnp.uint64(1)
    borrow = (nl == 0).astype(jnp.uint64)       # carry out of low limb
    nh = _bitcast_s(~_bitcast_u(h) + borrow)
    return nh, nl


def i128_sub(ah, al, bh, bl):
    nh, nl = i128_neg(bh, bl)
    return i128_add(ah, al, nh, nl)


def i128_cmp(ah, al, bh, bl):
    """int8: -1 / 0 / 1 (signed comparison)."""
    lt = (ah < bh) | ((ah == bh) & (al < bl))
    gt = (ah > bh) | ((ah == bh) & (al > bl))
    return jnp.where(lt, -1, jnp.where(gt, 1, 0)).astype(jnp.int8)


def _mulu64(a: jnp.ndarray, b: jnp.ndarray):
    """(hi, lo) of unsigned 64x64 multiply via 32-bit limb products."""
    a0 = a & _MASK32
    a1 = a >> jnp.uint64(32)
    b0 = b & _MASK32
    b1 = b >> jnp.uint64(32)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> jnp.uint64(32)) + (p01 & _MASK32) + (p10 & _MASK32)
    lo = (p00 & _MASK32) | (mid << jnp.uint64(32))
    hi = p11 + (p01 >> jnp.uint64(32)) + (p10 >> jnp.uint64(32)) \
        + (mid >> jnp.uint64(32))
    return hi, lo


def i128_mul(ah, al, bh, bl):
    """Low 128 bits of the product (overflow beyond 128 wraps — callers
    keep precision ≤ 38 like the reference)."""
    hi_u, lo = _mulu64(al, bl)
    hi = _bitcast_s(hi_u + al * _bitcast_u(bh) + _bitcast_u(ah) * bl)
    return hi, lo


def i128_mul_small(h, l, k: int):
    """Multiply by a small positive int64 constant."""
    kk = jnp.uint64(k)
    hi_u, lo = _mulu64(l, jnp.broadcast_to(kk, l.shape))
    hi = _bitcast_s(hi_u + _bitcast_u(h) * kk)
    return hi, lo


def i128_div_small(h, l, k: int):
    """Truncating signed division by small positive k (rescale-up)."""
    neg = h < 0
    nh, nl = i128_neg(h, l)
    uh = jnp.where(neg, _bitcast_u(nh), _bitcast_u(h))
    ul = jnp.where(neg, nl, l)
    kk = jnp.uint64(k)
    # long division over 32-bit limbs, most significant first
    limbs32 = [uh >> jnp.uint64(32), uh & _MASK32,
               ul >> jnp.uint64(32), ul & _MASK32]
    rem = jnp.zeros_like(uh)
    qs = []
    for limb in limbs32:
        cur = (rem << jnp.uint64(32)) | limb      # rem < k <= 2^31 → fits
        qs.append(cur // kk)
        rem = cur % kk
    qh = (qs[0] << jnp.uint64(32)) | qs[1]
    ql = (qs[2] << jnp.uint64(32)) | qs[3]
    oh, ol = i128_neg(_bitcast_s(qh), ql)
    return (jnp.where(neg, oh, _bitcast_s(qh)),
            jnp.where(neg, ol, ql))


def rescale128(col: Column, new_scale: int) -> Column:
    """Preserve logical value across a scale change (rescaled())."""
    old = col.dtype.scale
    h, l = limbs(col)
    k = 10 ** abs(new_scale - old)
    if new_scale == old:
        return col
    if new_scale < old:        # finer resolution → multiply rep
        while k > (1 << 31) - 1:
            h, l = i128_mul_small(h, l, 10 ** 9)
            k //= 10 ** 9
        if k > 1:
            h, l = i128_mul_small(h, l, k)
    else:                      # coarser → truncating divide
        while k > (1 << 31) - 1:
            h, l = i128_div_small(h, l, 10 ** 9)
            k //= 10 ** 9
        if k > 1:
            h, l = i128_div_small(h, l, k)
    return make_decimal128(h, l, new_scale, col.validity)


def from_decimals128(values, scale: Optional[int] = None) -> Column:
    """Python Decimals → two-limb DECIMAL128 column."""
    decs = [None if v is None else _pydec.Decimal(v) for v in values]
    if scale is None:
        scale = min((int(d.as_tuple().exponent) for d in decs
                     if d is not None), default=0)
    his, los, mask = [], [], []
    for d in decs:
        if d is None:
            his.append(0)
            los.append(0)
            mask.append(False)
            continue
        rep = int(d.scaleb(-scale, _CTX))
        his.append((rep >> 64) & 0xFFFFFFFFFFFFFFFF)
        los.append(rep & 0xFFFFFFFFFFFFFFFF)
        mask.append(True)
    hi = np.array([(h - (1 << 64)) if h >= (1 << 63) else h for h in his],
                  np.int64)
    lo = np.array(los, np.uint64)
    validity = None if all(mask) else jnp.asarray(np.array(mask))
    return make_decimal128(jnp.asarray(hi), jnp.asarray(lo), scale, validity)


def to_decimals128(col: Column) -> List[Optional[_pydec.Decimal]]:
    h = np.asarray(col.children[0].data).astype(object)
    l = np.asarray(col.data).astype(object)
    scale = col.dtype.scale
    valid = None if col.validity is None else np.asarray(col.validity)
    out = []
    for i in range(col.length):
        if valid is not None and not valid[i]:
            out.append(None)
            continue
        rep = int(h[i]) * (1 << 64) + int(l[i])
        out.append(_pydec.Decimal(rep).scaleb(scale, _CTX))
    return out


def binary128(lhs: Column, rhs: Column, op: str) -> Column:
    """add/sub/mul/eq/lt/le/gt/ge/ne with libcudf scale rules."""
    ls, rs = lhs.dtype.scale, rhs.dtype.scale
    if op in ("add", "sub"):
        s = min(ls, rs)
        a = rescale128(lhs, s)
        b = rescale128(rhs, s)
        fn = i128_add if op == "add" else i128_sub
        h, l = fn(*limbs(a), *limbs(b))
        from cudf_tpu.core.bitmask import and_masks

        return make_decimal128(h, l, s, and_masks(lhs.validity, rhs.validity))
    if op == "mul":
        h, l = i128_mul(*limbs(lhs), *limbs(rhs))
        from cudf_tpu.core.bitmask import and_masks

        return make_decimal128(h, l, ls + rs,
                               and_masks(lhs.validity, rhs.validity))
    # comparisons at the finer scale
    s = min(ls, rs)
    a = rescale128(lhs, s)
    b = rescale128(rhs, s)
    c = i128_cmp(*limbs(a), *limbs(b))
    table = {"eq": c == 0, "ne": c != 0, "lt": c < 0, "le": c <= 0,
             "gt": c > 0, "ge": c >= 0}
    from cudf_tpu.core.bitmask import and_masks

    return Column(dt.BOOL8, lhs.length, data=table[op],
                  validity=and_masks(lhs.validity, rhs.validity))
