"""Self-contained parquet decode path vs pyarrow (differential)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cudf_tpu.io.parquet_native import read_parquet_native
from cudf_tpu.io.thrift import read_file_metadata


@pytest.fixture
def pdf(rng):
    df = pd.DataFrame({
        "i": rng.integers(-1000, 1000, 3000),
        "i32": rng.integers(0, 100, 3000).astype(np.int32),
        "f": rng.normal(size=3000),
        "f32": rng.normal(size=3000).astype(np.float32),
        "s": rng.choice(["alpha", "beta", "gamma", ""], 3000),
        "b": rng.integers(0, 2, 3000).astype(bool),
    })
    df.loc[::7, "f"] = None
    return df


@pytest.mark.parametrize("compression", ["snappy", "none", "zstd"])
def test_native_reader_matches_pandas(tmp_path, pdf, compression):
    path = str(tmp_path / "t.pq")
    pq.write_table(pa.Table.from_pandas(pdf), path, compression=compression)
    got = read_parquet_native(path).to_pandas()
    for c in ["i", "i32", "f", "f32", "b"]:
        np.testing.assert_allclose(
            got[c].fillna(-9e9).to_numpy(dtype=float),
            pdf[c].fillna(-9e9).to_numpy(dtype=float), rtol=1e-6,
        )
    assert (got["s"] == pdf["s"]).all()


def test_native_reader_multi_rowgroup(tmp_path, pdf):
    path = str(tmp_path / "m.pq")
    pq.write_table(pa.Table.from_pandas(pdf), path, row_group_size=500)
    md = read_file_metadata(path)
    assert len(md.row_groups) == 6
    got = read_parquet_native(path, columns=["i", "f"]).to_pandas()
    assert len(got) == len(pdf)
    np.testing.assert_allclose(got["i"].to_numpy(float), pdf["i"].to_numpy(float))


def test_native_reader_plain_encoding(tmp_path, pdf):
    path = str(tmp_path / "p.pq")
    pq.write_table(pa.Table.from_pandas(pdf), path, use_dictionary=False,
                   compression="snappy")
    got = read_parquet_native(path).to_pandas()
    np.testing.assert_allclose(got["f"].fillna(-9e9).to_numpy(float),
                               pdf["f"].fillna(-9e9).to_numpy(float))
    assert (got["s"] == pdf["s"]).all()


def test_footer_metadata(tmp_path, pdf):
    path = str(tmp_path / "f.pq")
    pq.write_table(pa.Table.from_pandas(pdf), path)
    md = read_file_metadata(path)
    assert md.num_rows == len(pdf)
    names = [s.name for s in md.schema[1:]]
    assert names == list(pdf.columns)
