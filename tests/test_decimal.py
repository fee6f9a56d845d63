"""Fixed-point decimal columns (reference: cudf decimal32/64/128,
cpp/include/cudf/fixed_point/fixed_point.hpp scale semantics)."""

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

import cudf_tpu as ct
from cudf_tpu.core.column import Column
from cudf_tpu.core import dtypes as dt
from cudf_tpu.ops import binaryop, unary
from cudf_tpu.ops import decimal as dec


def col(*vals, scale=None):
    return dec.from_decimals([Decimal(v) if v is not None else None for v in vals],
                             scale=scale)


def test_from_sequence_infers_decimal():
    c = Column.from_sequence([Decimal("1.25"), Decimal("-0.50"), None])
    assert c.dtype.is_decimal and c.dtype.scale == -2
    assert c.to_pylist() == [Decimal("1.25"), Decimal("-0.50"), None]


def test_rescale_truncates_toward_zero():
    c = col("1.29", "-1.29")
    r = dec.rescale(c, -1)
    assert r.to_pylist() == [Decimal("1.2"), Decimal("-1.2")]
    f = dec.rescale(r, -3)  # finer: exact
    assert f.to_pylist() == [Decimal("1.200"), Decimal("-1.200")]


def test_add_sub_scale_matching():
    a = col("1.5", "2.25", scale=-2)
    b = col("0.125", "0.125", scale=-3)
    s = binaryop.binary_operation(a, b, "add")
    assert s.dtype.scale == -3
    assert s.to_pylist() == [Decimal("1.625"), Decimal("2.375")]
    d = binaryop.binary_operation(a, b, "sub")
    assert d.to_pylist() == [Decimal("1.375"), Decimal("2.125")]


def test_mul_div_scales():
    a = col("1.5", "3.0")      # scale -1
    b = col("0.5", "1.5")      # scale -1
    m = binaryop.binary_operation(a, b, "mul")
    assert m.dtype.scale == -2
    assert m.to_pylist() == [Decimal("0.75"), Decimal("4.50")]
    q = binaryop.binary_operation(a, b, "truediv")
    assert q.dtype.scale == 0          # ls - rs
    assert q.to_pylist() == [Decimal("3"), Decimal("2")]


def test_div_by_zero_is_null():
    a = col("1.0", "2.0")
    b = col("0.5", "0.0")
    q = binaryop.binary_operation(a, b, "truediv")
    assert q.to_pylist()[1] is None


def test_comparisons_cross_scale():
    a = col("1.50", scale=-2)
    b = col("1.5", scale=-1)
    assert binaryop.binary_operation(a, b, "eq").to_pylist() == [True]
    assert binaryop.binary_operation(a, b, "lt").to_pylist() == [False]


def test_scalar_operand():
    a = col("1.25", "2.00")
    s = binaryop.binary_operation(a, Decimal("0.75"), "add")
    assert s.to_pylist() == [Decimal("2.00"), Decimal("2.75")]
    s2 = binaryop.binary_operation(a, 2, "mul")
    assert s2.to_pylist() == [Decimal("2.50"), Decimal("4.00")]


def test_null_propagation():
    a = col("1.00", None)
    b = col("0.50", "0.50")
    assert binaryop.binary_operation(a, b, "add").to_pylist() == [Decimal("1.50"), None]


def test_casts():
    c = col("1.25", "-2.50")
    f = unary.cast(c, dt.FLOAT64)
    np.testing.assert_allclose(np.asarray(f.data), [1.25, -2.5])
    i = unary.cast(c, dt.INT64)
    assert i.to_pylist() == [1, -2]
    back = unary.cast(f, dt.decimal_dtype(scale=-2))
    assert back.to_pylist() == [Decimal("1.25"), Decimal("-2.50")]
    from_int = unary.cast(Column.from_sequence([3, 4]), dt.decimal_dtype(scale=-1))
    assert from_int.to_pylist() == [Decimal("3.0"), Decimal("4.0")]
    s = unary.cast(c, dt.STRING)
    assert s.to_pylist() == ["1.25", "-2.50"]
    parsed = unary.cast(Column.from_strings(["7.125", "-0.25"]),
                        dt.decimal_dtype(scale=-3))
    assert parsed.to_pylist() == [Decimal("7.125"), Decimal("-0.250")]


def test_arrow_roundtrip():
    arr = pa.array([Decimal("12.34"), None, Decimal("-0.01")], pa.decimal128(9, 2))
    c = Column.from_arrow(arr)
    assert c.dtype.is_decimal and c.dtype.scale == -2
    assert c.to_pylist() == [Decimal("12.34"), None, Decimal("-0.01")]
    rt = c.to_arrow()
    assert rt.to_pylist() == arr.to_pylist()


def test_round_half_even():
    c = col("1.25", "1.35", "-1.25")
    r = dec.round_decimal(c, 1)
    assert r.to_pylist() == [Decimal("1.2"), Decimal("1.4"), Decimal("-1.2")]


def test_series_level():
    s = ct.Series([Decimal("1.10"), Decimal("2.20")])
    assert s.dtype.is_decimal
    out = (s + s).to_pandas().tolist()
    assert out == [Decimal("2.20"), Decimal("4.40")]


# ----------------------------------------------------------------------
# round-2: two-limb DECIMAL128 (full 38-digit precision)
# ----------------------------------------------------------------------

def test_decimal128_two_limb_roundtrip_and_arith():
    import decimal as D

    from cudf_tpu.ops import decimal128 as d128

    ctx = D.Context(prec=60)
    vals = ["12345678901234567890123456.78", "-9999999999999999999999.99",
            "0.01", "-0.01", None, "170141183460469231731687303715.88"]
    a = d128.from_decimals128(vals, scale=-2)
    exp = [None if v is None else D.Decimal(v) for v in vals]
    assert d128.to_decimals128(a) == exp
    bv = ["1.5", "2.25", "-3.125", "100", None, "0.12"]
    b = d128.from_decimals128(bv, scale=-3)
    bd = [D.Decimal(v) for v in ["1.5", "2.25", "-3.125", "100", "0", "0.12"]]
    got_add = d128.to_decimals128(d128.binary128(a, b, "add"))
    got_sub = d128.to_decimals128(d128.binary128(a, b, "sub"))
    for g, s, x, y in zip(got_add, got_sub, exp, bd):
        if x is None:
            assert g is None and s is None
        else:
            assert g == ctx.add(x, y)
            assert s == ctx.subtract(x, y)
    # comparisons at full precision (index 4 is null — value undefined)
    ltc = d128.binary128(a, b, "lt")
    lt = np.asarray(ltc.data).tolist()
    assert [lt[i] for i in (0, 1, 2, 3, 5)] == [False, True, False, True,
                                                False]
    assert not bool(np.asarray(ltc.validity)[4])
    # 128-bit multiply exactness beyond int64
    m1 = d128.from_decimals128(["123456789012345.6789", "-2.5"], scale=-4)
    m2 = d128.from_decimals128(["1000000.01", "4.2"], scale=-2)
    mm = d128.to_decimals128(d128.binary128(m1, m2, "mul"))
    assert mm[0] == ctx.multiply(D.Decimal("123456789012345.6789"),
                                 D.Decimal("1000000.01"))
    assert mm[1] == D.Decimal("-10.50")
    # truncating rescale toward zero across > 2^63 reps
    r = d128.to_decimals128(d128.rescale128(a, 0))
    assert r[0] == D.Decimal("12345678901234567890123456")
    assert r[1] == D.Decimal("-9999999999999999999999")
