"""pandas nullable extension dtype round-trip (Int64/UInt8/boolean/Float64
provenance through Column validity — reference: cudf keeps nullable
fidelity via its masked columns + to_pandas(nullable=True))."""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.core import dtypes as dt


@pytest.mark.parametrize("name", ["Int8", "Int64", "UInt8", "UInt32", "Float64"])
def test_roundtrip(name):
    s = pd.Series([1, None, 3], dtype=name)
    g = ct.Series(s)
    assert repr(g.dtype) == name and g.dtype.nullable
    back = g.to_pandas()
    assert str(back.dtype) == name
    assert back.isna().tolist() == [False, True, False]
    assert back.dropna().tolist() == [1, 3]


def test_boolean_roundtrip():
    s = pd.Series([True, None, False], dtype="boolean")
    back = ct.Series(s).to_pandas()
    assert str(back.dtype) == "boolean"
    assert back.tolist()[0] is True and back.isna().tolist() == [False, True, False]


def test_string_dtype_name_construction():
    g = ct.Series([np.nan, 1.0, 2.0], dtype="UInt8")
    assert repr(g.dtype) == "UInt8"
    out = g.clip(upper=1).to_pandas()
    assert str(out.dtype) == "UInt8"
    assert out.fillna(0).tolist() == [0, 1, 1]


def test_ops_preserving_dtype():
    s = pd.Series([5, None, 9], dtype="Int64")
    g = ct.Series(s)
    assert str(g.head(2).to_pandas().dtype) == "Int64"
    assert str(g.fillna(0).to_pandas().dtype) == "Int64"
    assert str(g.sort_values().to_pandas().dtype) == "Int64"


def test_dtype_kind_duck_typing():
    assert dt.dtype("Int64").kind == "i"
    assert dt.dtype("UInt8").kind == "u"
    assert dt.STRING.kind == "O"
    assert dt.TIMESTAMP_NS.kind == "M"
    assert dt.dtype("Int64").name == "Int64"


# ---------------------------------------------------------------------
# round-4 additions: extension-dtype GROUP KEYS + construction fidelity
# (reference: cudf groupby keeps masked key dtypes on the result index)
# ---------------------------------------------------------------------

def test_dataframe_from_pd_array_dict():
    df = ct.DataFrame({"k": pd.array([1, None, 1], dtype="Int64"),
                       "v": [1.0, 2.0, 3.0]})
    assert repr(df._table["k"].dtype) == "Int64"
    s = ct.Series(pd.array([1, None, 3], dtype="Int32"))
    back = s.to_pandas()
    assert str(back.dtype) == "Int32" and back[0] == 1 and pd.isna(back[1])


@pytest.mark.parametrize("dropna", [True, False])
def test_nullable_int_group_keys(dropna):
    pdf = pd.DataFrame({"k": pd.array([1, None, 1, 2, None], dtype="Int64"),
                        "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    got = ct.DataFrame(pdf).groupby("k", dropna=dropna).agg({"v": "sum"}).to_pandas()
    exp = pdf.groupby("k", dropna=dropna).agg({"v": "sum"})
    pd.testing.assert_frame_equal(got, exp)


def test_all_null_nullable_key():
    e = ct.DataFrame({"k": pd.array([None, None], dtype="Int64"),
                      "v": [1.0, 2.0]})
    assert e.groupby("k", dropna=True).agg({"v": "sum"}).to_pandas().shape == (0, 1)


def test_string_dtype_group_keys():
    pdf = pd.DataFrame({"k": pd.array(["a", "b", None, "a"], dtype="string"),
                        "v": [1, 2, 3, 4]})
    got = ct.DataFrame(pdf).groupby("k").agg({"v": "sum"}).to_pandas()
    pd.testing.assert_frame_equal(got, pdf.groupby("k").agg({"v": "sum"}))


def test_frame_roundtrip_mixed_extension_dtypes():
    pdf = pd.DataFrame({"a": pd.array([1, None], dtype="Int64"),
                        "b": pd.array([1.5, None], dtype="Float64"),
                        "c": pd.array([True, None], dtype="boolean"),
                        "d": ["x", None],
                        "e": np.array([1, 2], dtype="int32"),
                        "f": pd.array([7, None], dtype="int64[pyarrow]"),
                        "g": pd.array(["s", None], dtype="string")})
    pd.testing.assert_frame_equal(ct.DataFrame(pdf).to_pandas(), pdf)
