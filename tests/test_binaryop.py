import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


@pytest.mark.parametrize("op", ["add", "sub", "mul", "truediv", "floordiv", "mod", "pow"])
@pytest.mark.parametrize("dtype", ["int64", "float64", "int32"])
def test_arith_vs_pandas(op, dtype, rng):
    a = pd.Series(rng.integers(1, 50, 200).astype(dtype))
    b = pd.Series(rng.integers(1, 50, 200).astype(dtype))
    ga, gb = ct.Series(a), ct.Series(b)
    assert_eq(getattr(ga, op)(gb), getattr(a, op)(b))


@pytest.mark.parametrize("op", ["eq", "ne", "lt", "gt", "le", "ge"])
def test_cmp_vs_pandas(op, rng):
    a = pd.Series(rng.integers(0, 10, 200))
    b = pd.Series(rng.integers(0, 10, 200))
    assert_eq(getattr(ct.Series(a), op)(ct.Series(b)), getattr(a, op)(b))


def test_null_propagation():
    a = ct.Series([1, None, 3])
    b = ct.Series([10, 20, None])
    assert (a + b).tolist() == [11, None, None]
    assert (a * 2).tolist() == [2, None, 6]


def test_scalar_broadcast(rng):
    a = pd.Series(rng.normal(size=100))
    assert_eq(ct.Series(a) + 2.5, a + 2.5)
    assert_eq(2.5 - ct.Series(a), 2.5 - a)


def test_string_ops():
    # pandas object-dtype comparisons: missing compares False, never null
    a = ct.Series(["a", "bb", None])
    assert (a == "a").tolist() == [True, False, False]
    assert (a + "_x").tolist() == ["a_x", "bb_x", None]
    assert (a < "b").tolist() == [True, False, False]


def test_nan_scalar_comparisons():
    # ADVICE r1: NaN-scalar comparisons must be symmetric and pandas-exact
    p = pd.Series([1.0, np.nan, 3.0])
    a = ct.Series(p)
    assert (a == np.nan).tolist() == (p == np.nan).tolist()
    assert (np.nan == a).tolist() == (p == np.nan).tolist()
    assert (a != np.nan).tolist() == (p != np.nan).tolist()
    assert (a == 1.0).tolist() == (p == 1.0).tolist()


def test_bool_logic():
    a = ct.Series([True, False, True])
    b = ct.Series([True, True, False])
    assert (a & b).tolist() == [True, False, False]
    assert (a | b).tolist() == [True, True, True]
    assert (~a).tolist() == [False, True, False]


def test_temporal_arith():
    ts = pd.Series(pd.to_datetime(["2021-01-01", "2021-06-15"]))
    td = pd.Series(pd.to_timedelta(["1 days", "2 hours"]))
    gts, gtd = ct.Series(ts.to_numpy()), ct.Series(td.to_numpy())
    assert_eq(gts + gtd, ts + td, check_index=False)
    assert_eq(gts - gts, ts - ts, check_index=False)


def test_div_by_zero_int():
    # pandas: int // 0 upcasts to float64 with ±inf (nan for 0//0)
    a = ct.Series([1, 2, -3, 0])
    b = ct.Series([0, 1, 0, 0])
    import numpy as np
    import pandas as pd

    out = (a // b).to_pandas()
    exp = pd.Series([1, 2, -3, 0]) // pd.Series([0, 1, 0, 0])
    assert str(out.dtype) == str(exp.dtype) == "float64"
    np.testing.assert_array_equal(out.to_numpy(), exp.to_numpy())


def test_float_div_by_zero():
    a = ct.Series([1.0, -1.0])
    b = ct.Series([0.0, 0.0])
    out = (a / b).to_numpy()
    assert np.isinf(out).all()
