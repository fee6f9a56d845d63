import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import cudf_tpu as ct
from cudf_tpu.core.column import Column
from cudf_tpu.core import dtypes as dt


@pytest.mark.parametrize("data,dtype", [
    ([1, 2, 3], "int64"),
    ([1.5, 2.5], "float64"),
    ([True, False], "bool"),
    (["a", "bb", ""], "str"),
])
def test_from_sequence_roundtrip(data, dtype):
    col = Column.from_sequence(data)
    assert col.to_pylist() == data


def test_nulls_roundtrip():
    col = Column.from_sequence([1, None, 3])
    assert col.null_count == 1
    assert col.to_pylist() == [1, None, 3]


def test_arrow_roundtrip_numeric():
    arr = pa.array([1, 2, None, 4])
    col = Column.from_arrow(arr)
    assert col.to_arrow().equals(arr)


def test_arrow_roundtrip_strings():
    arr = pa.array(["x", None, "zzz", ""])
    col = Column.from_arrow(arr)
    assert col.to_arrow().to_pylist() == arr.to_pylist()


def test_temporal_storage():
    arr = np.array(["2021-01-01", "NaT"], dtype="datetime64[ns]")
    col = Column.from_numpy(arr)
    assert col.dtype == dt.TIMESTAMP_NS
    assert col.null_count == 1
    out = col.to_numpy()
    assert np.isnat(out[1]) and out[0] == arr[0]


def test_dictionary_roundtrip():
    from cudf_tpu.ops.dictionary import encode

    col = Column.from_strings(["b", "a", "b", None])
    enc = encode(col)
    assert enc.dtype.is_dictionary
    assert enc.decode_dictionary().to_pylist() == ["b", "a", "b", None]


def test_pytree_roundtrip():
    import jax

    col = Column.from_sequence([1.0, None, 3.0])
    leaves, treedef = jax.tree_util.tree_flatten(col)
    col2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert col2.to_pylist() == col.to_pylist()
    assert col2.dtype == col.dtype


def test_column_through_jit():
    import jax

    col = Column.from_sequence([1.0, 2.0, 3.0])

    @jax.jit
    def double(c):
        return Column(c.dtype, c.length, data=c.data * 2, validity=c.validity)

    out = double(col)
    assert out.to_pylist() == [2.0, 4.0, 6.0]


def test_getitem_and_slice():
    col = Column.from_sequence([10, None, 30, 40])
    assert col[0] == 10
    assert col[1] is None
    assert col[-1] == 40
    assert col[1:3].to_pylist() == [None, 30]
