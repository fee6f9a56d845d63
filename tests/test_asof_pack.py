"""merge_asof + pack/contiguous_split tests."""

import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.frame.asof import merge_asof
from cudf_tpu.ops.pack import contiguous_split, pack, unpack


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_merge_asof_vs_pandas(direction, rng):
    lt = pd.DataFrame({"t": np.sort(rng.integers(0, 1000, 200)), "lv": np.arange(200)})
    rt = pd.DataFrame({"t": np.sort(rng.integers(0, 1000, 50)), "rv": np.arange(50)})
    rt = rt.drop_duplicates("t").reset_index(drop=True)
    got = merge_asof(ct.DataFrame.from_pandas(lt), ct.DataFrame.from_pandas(rt),
                     on="t", direction=direction).to_pandas()
    expect = pd.merge_asof(lt, rt, on="t", direction=direction)
    pd.testing.assert_series_equal(got["rv"], expect["rv"], check_dtype=False)


def test_merge_asof_by():
    lt = pd.DataFrame({"g": [0, 1, 0, 1], "t": [1, 1, 5, 5], "lv": [1, 2, 3, 4]})
    rt = pd.DataFrame({"g": [0, 1], "t": [3, 4], "rv": [100, 200]})
    got = merge_asof(ct.DataFrame.from_pandas(lt), ct.DataFrame.from_pandas(rt),
                     on="t", by="g").to_pandas()
    expect = pd.merge_asof(lt, rt, on="t", by="g")
    pd.testing.assert_series_equal(got["rv"], expect["rv"], check_dtype=False)


def test_merge_asof_tolerance():
    lt = pd.DataFrame({"t": [1, 10, 20], "lv": [1, 2, 3]})
    rt = pd.DataFrame({"t": [2, 9], "rv": [10, 20]})
    got = merge_asof(ct.DataFrame.from_pandas(lt), ct.DataFrame.from_pandas(rt),
                     on="t", direction="backward", tolerance=3).to_pandas()
    expect = pd.merge_asof(lt, rt, on="t", tolerance=3)
    pd.testing.assert_series_equal(got["rv"], expect["rv"], check_dtype=False)


def test_pack_roundtrip_all_types():
    df = ct.DataFrame({
        "i": [1, 2, None],
        "f": [1.5, None, 3.5],
        "s": ["x", None, "zzz"],
        "b": [True, False, True],
        "l": [[1, 2], [3], None],
        "d": np.array(["2021-01-01", "2021-06-01", "NaT"], dtype="datetime64[ns]"),
    })
    t2 = unpack(pack(df._table))
    for n in df._table.names:
        assert t2[n].to_pylist() == df._table[n].to_pylist(), n


def test_contiguous_split():
    df = ct.DataFrame({"a": list(range(10)), "s": [str(i) for i in range(10)]})
    pieces = contiguous_split(df._table, [3, 7])
    sizes = [unpack(p).num_rows for p in pieces]
    assert sizes == [3, 4, 3]
    assert unpack(pieces[1])["a"].to_pylist() == [3, 4, 5, 6]


def test_pack_single_buffer():
    df = ct.DataFrame({"a": [1, 2, 3]})
    p = pack(df._table)
    assert p.gpu_data.dtype.name == "uint8"
    assert p.gpu_data.ndim == 1
