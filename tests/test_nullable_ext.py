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
