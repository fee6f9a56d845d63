"""List & struct column tests (reference: cpp/tests/lists, structs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import cudf_tpu as ct
from cudf_tpu.core.column import Column


def test_list_roundtrip():
    data = [[1, 2], [3], None, [], [4, 5, 6]]
    s = ct.Series(data)
    assert s.tolist() == data


def test_list_accessor():
    s = ct.Series([[1, 2], [3], None, [4, 5, 6]])
    assert s.list.len().tolist() == [2, 1, None, 3]
    assert s.list.get(0).tolist() == [1, 3, None, 4]
    assert s.list.get(-1).tolist() == [2, 3, None, 6]
    assert s.list.contains(3).tolist() == [False, True, None, False]
    assert s.list.index(3).tolist() == [-1, 0, None, -1]


def test_list_sort_unique_concat():
    s = ct.Series([[3, 1, 2], [9, 8]])
    assert s.list.sort_values().tolist() == [[1, 2, 3], [8, 9]]
    s2 = ct.Series([[3, 1, 3, 1], [2, 2]])
    assert s2.list.unique().tolist() == [[1, 3], [2]]
    a = ct.Series([[1], [2, 3]])
    b = ct.Series([[10], []])
    assert a.list.concat(b).tolist() == [[1, 10], [2, 3]]


def test_explode_series_vs_pandas():
    data = [[1, 2], [], None, [3]]
    ps = pd.Series(data)
    gs = ct.Series(data)
    got = gs.explode()
    expect = ps.explode()
    assert got.tolist() == [None if pd.isna(v) else v for v in expect.tolist()]
    assert got.index.to_pylist() == list(expect.index)


def test_explode_dataframe():
    pdf = pd.DataFrame({"k": [1, 2], "l": [[10, 20], [30]]})
    gdf = ct.DataFrame.from_pandas(pdf)
    got = gdf.explode("l").to_pandas()
    expect = pdf.explode("l")
    assert got["k"].tolist() == expect["k"].tolist()
    assert [int(v) for v in got["l"]] == [int(v) for v in expect["l"]]


def test_list_arrow_roundtrip():
    arr = pa.array([[1.5, 2.5], None, []])
    col = Column.from_arrow(arr)
    assert col.to_arrow().to_pylist() == arr.to_pylist()


def test_sequences():
    from cudf_tpu.ops.lists import sequences

    starts = Column.from_sequence([0, 10])
    sizes = Column.from_sequence([3, 2])
    out = sequences(starts, sizes)
    assert out.to_pylist() == [[0, 1, 2], [10, 11]]


def test_struct_roundtrip():
    data = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}, None]
    s = ct.Series(data)
    assert s.tolist() == data


def test_struct_accessor():
    s = ct.Series([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    assert s.struct.field("a").tolist() == [1, 2]
    assert s.struct.field("b").tolist() == ["x", "y"]
    df = s.struct.explode()
    assert list(df.columns) == ["a", "b"]


def test_struct_arrow_roundtrip():
    arr = pa.array([{"x": 1, "y": 2.5}, None])
    col = Column.from_arrow(arr)
    assert col.to_arrow().to_pylist() == arr.to_pylist()
