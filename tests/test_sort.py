import numpy as np
import pandas as pd
import pytest

import cudf_tpu as ct
from cudf_tpu.utils.testing import assert_eq


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("dtype", ["int64", "float64", "uint32", "int8"])
def test_sort_values_vs_pandas(ascending, dtype, rng):
    a = pd.Series(rng.integers(0, 100, 300).astype(dtype))
    assert_eq(
        ct.Series(a).sort_values(ascending=ascending, ignore_index=True),
        a.sort_values(ascending=ascending, ignore_index=True),
    )


@pytest.mark.parametrize("na_position", ["first", "last"])
def test_sort_nulls(na_position):
    a = pd.Series([3.0, None, 1.0, None, 2.0])
    assert_eq(
        ct.Series(a).sort_values(na_position=na_position, ignore_index=True),
        a.sort_values(na_position=na_position, ignore_index=True),
    )


def test_sort_nan_as_null():
    a = pd.Series([3.0, np.nan, 1.0])
    assert_eq(ct.Series(a).sort_values(ignore_index=True),
              a.sort_values(ignore_index=True))
    assert_eq(ct.Series(a).sort_values(ascending=False, ignore_index=True),
              a.sort_values(ascending=False, ignore_index=True))


def test_multi_key_sort(frames):
    gdf, pdf = frames
    assert_eq(
        gdf.sort_values(["k", "i64", "f64"], ascending=[True, False, True], ignore_index=True),
        pdf.sort_values(["k", "i64", "f64"], ascending=[True, False, True], ignore_index=True),
    )


def test_string_sort():
    a = pd.Series(["banana", "", "apple", None, "cherry", "app"])
    assert_eq(ct.Series(a).sort_values(ignore_index=True),
              a.sort_values(ignore_index=True))
    assert_eq(ct.Series(a).sort_values(ascending=False, ignore_index=True),
              a.sort_values(ascending=False, ignore_index=True))


def test_sort_stability():
    pdf = pd.DataFrame({"k": [1, 1, 1, 0, 0], "v": [10, 20, 30, 40, 50]})
    gdf = ct.DataFrame.from_pandas(pdf)
    assert_eq(gdf.sort_values("k", ignore_index=True),
              pdf.sort_values("k", kind="stable", ignore_index=True))


@pytest.mark.parametrize("method", ["average", "min", "max", "first", "dense"])
def test_rank(method, rng):
    a = pd.Series(rng.integers(0, 20, 100).astype("float64"))
    a[::9] = np.nan
    assert_eq(ct.Series(a).rank(method=method), a.rank(method=method))


def test_nlargest_nsmallest(rng):
    a = pd.Series(rng.normal(size=100))
    assert_eq(ct.Series(a).nlargest(5), a.nlargest(5))
    assert_eq(ct.Series(a).nsmallest(5), a.nsmallest(5))


def test_is_sorted():
    from cudf_tpu.ops.sort import is_sorted
    from cudf_tpu.core.column import Column

    assert is_sorted([Column.from_sequence([1, 2, 2, 3])])
    assert not is_sorted([Column.from_sequence([1, 3, 2])])


def test_searchsorted():
    s = ct.Series([1, 3, 5, 7])
    assert s.searchsorted(4) == 2
    assert list(s.searchsorted([0, 3, 8])) == [0, 1, 4]
