"""Arrow C Data Interface tests — capsule export/import vs pyarrow.

pyarrow (>=14) is the independent oracle: it consumes our PyCapsules via
``pa.array``/``pa.table`` and produces capsules we re-import, so both
directions cross a real third-party C-ABI boundary with no pyarrow objects
on our conversion path (reference parity: cpp/tests/interop/*_test.cpp).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import cudf_tpu
from cudf_tpu import arrow_cdata
from cudf_tpu.core.column import Column
from cudf_tpu.core import dtypes as dt


def _roundtrip_series(data, dtype=None):
    s = cudf_tpu.Series(data, dtype=dtype)
    arr = pa.array(s)  # consumes __arrow_c_array__
    return s, arr


class TestExport:
    @pytest.mark.parametrize("np_dtype", [
        np.int8, np.int16, np.int32, np.int64,
        np.uint8, np.uint32, np.float32, np.float64,
    ])
    def test_primitive(self, np_dtype):
        vals = np.arange(10).astype(np_dtype)
        s, arr = _roundtrip_series(vals)
        assert arr.to_pylist() == vals.tolist()
        assert arr.type == pa.from_numpy_dtype(np_dtype)

    def test_nulls(self):
        s = cudf_tpu.Series([1.5, None, 3.0, None, 5.0])
        arr = pa.array(s)
        assert arr.null_count == 2
        assert arr.to_pylist() == [1.5, None, 3.0, None, 5.0]

    def test_bool_bitpacked(self):
        s = cudf_tpu.Series([True, False, None, True])
        arr = pa.array(s)
        assert arr.type == pa.bool_()
        assert arr.to_pylist() == [True, False, None, True]

    def test_string_large_utf8(self):
        s = cudf_tpu.Series(["ab", None, "", "δσ"])
        arr = pa.array(s)
        assert arr.type == pa.large_utf8()
        assert arr.to_pylist() == ["ab", None, "", "δσ"]

    def test_timestamp(self):
        ts = pd.to_datetime(["2021-01-01", "2022-06-15"])
        s = cudf_tpu.Series(ts)
        arr = pa.array(s)
        assert pa.types.is_timestamp(arr.type)
        assert arr.to_pylist() == list(ts)

    def test_dictionary(self):
        s = cudf_tpu.Series(["a", "b", "a", None, "c"]).astype("category")
        arr = pa.array(s)
        assert pa.types.is_dictionary(arr.type)
        assert arr.to_pylist() == ["a", "b", "a", None, "c"]

    def test_table_array_and_stream(self):
        df = cudf_tpu.DataFrame({"x": [1, 2, 3], "y": ["a", "b", None]})
        t = pa.table(df)  # consumes __arrow_c_stream__
        assert t.column_names == ["x", "y"]
        assert t.column("x").to_pylist() == [1, 2, 3]
        assert t.column("y").to_pylist() == ["a", "b", None]
        # record-batch (array) form
        sc_cap, ar_cap = df.__arrow_c_array__()
        batch = pa.record_batch(df)
        assert batch.num_rows == 3

    def test_release_frees_holder(self):
        live_before = len(arrow_cdata._LIVE)
        s = cudf_tpu.Series(np.arange(100.0))
        arr = pa.array(s)
        del arr
        import gc
        gc.collect()
        assert len(arrow_cdata._LIVE) <= live_before + 1


class TestImport:
    @pytest.mark.parametrize("pa_arr", [
        pa.array([1, 2, None, 4], type=pa.int32()),
        pa.array([1.5, None, 2.5], type=pa.float64()),
        pa.array([True, None, False]),
        pa.array(["x", None, "yz"], type=pa.utf8()),
        pa.array(["x", None, "yz"], type=pa.large_utf8()),
        pa.array([[1, 2], None, [], [3]], type=pa.large_list(pa.int64())),
        pa.array([{"a": 1, "b": "u"}, None, {"a": 2, "b": None}],
                 type=pa.struct([("a", pa.int64()), ("b", pa.utf8())])),
        pa.array(pd.Categorical(["p", "q", "p", None])),
        pa.array([1, None, 3], type=pa.timestamp("us")),
    ])
    def test_from_pyarrow(self, pa_arr):
        col = arrow_cdata.from_c_array(pa_arr)
        assert col.length == len(pa_arr)
        if pa.types.is_struct(pa_arr.type):
            # compare children + top-level validity (null rows carry
            # arbitrary child payloads in Arrow)
            valid = [col.validity is None or bool(col.validity[i])
                     for i in range(col.length)]
            assert valid == pa_arr.is_valid().to_pylist()
            for i, f in enumerate(pa_arr.type):
                got_c = col.children[i].to_pylist()
                want_c = pa_arr.field(f.name).to_pylist()
                for g, w, v in zip(got_c, want_c, valid):
                    if v:
                        assert g == w
            return
        assert col.to_pylist() == pa_arr.to_pylist()

    def test_sliced_array_offset(self):
        base = pa.array(list(range(100)), type=pa.int64())
        sl = base.slice(37, 20)
        col = arrow_cdata.from_c_array(sl)
        assert col.to_pylist() == list(range(37, 57))

    def test_sliced_string_offset(self):
        base = pa.array([f"s{i}" for i in range(50)])
        sl = base.slice(10, 5)
        col = arrow_cdata.from_c_array(sl)
        assert col.to_pylist() == [f"s{i}" for i in range(10, 15)]

    def test_table_from_stream(self):
        t = pa.table({"a": [1, 2, 3], "b": ["x", None, "z"]})
        batches = arrow_cdata.from_c_stream(t)
        assert len(batches) >= 1
        tbl = arrow_cdata.import_table_from_obj = None  # placeholder no-op
        # struct batch carries both fields
        b0 = batches[0]
        assert [f[0] for f in b0.dtype.fields] == ["a", "b"]

    def test_decimal(self):
        pa_arr = pa.array([None, 1, -250], type=pa.decimal128(9, 2))
        col = arrow_cdata.from_c_array(pa_arr)
        assert col.dtype.scale == -2


class TestRoundTrip:
    def test_df_through_pyarrow_and_back(self):
        pdf = pd.DataFrame({
            "i": np.arange(20, dtype=np.int64),
            "f": np.linspace(0, 1, 20),
            "s": [f"row{i}" if i % 3 else None for i in range(20)],
        })
        df = cudf_tpu.DataFrame(pdf)
        t = pa.table(df)
        back = arrow_cdata.from_c_stream(t)[0]
        names = [f[0] for f in back.dtype.fields]
        assert names == ["i", "f", "s"]
        got = {n: c.to_pylist() for n, c in zip(names, back.children)}
        assert got["i"] == pdf["i"].tolist()
        assert got["s"] == [None if pd.isna(v) else v for v in pdf["s"]]
