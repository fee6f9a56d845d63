"""Native C++ host IO kernels vs python/pyarrow references."""

import numpy as np
import pytest

from cudf_tpu import native


def test_native_builds():
    mod = native.load_native()
    assert mod is not None, "C extension failed to build (g++ expected in image)"


def test_multibyte_split():
    data = b"abc\ndef\n\nxyz"
    offs = native.multibyte_split(data, b"\n")
    assert offs.tolist() == [0, 4, 8, 9, 12]
    # multi-byte delimiter
    offs2 = native.multibyte_split(b"a||bb||c", b"||")
    assert offs2.tolist() == [0, 3, 7, 8]


def test_bitunpack32():
    # values [1, 2, 3, 4, 5] at bit_width=3 → packed little-endian
    vals = [1, 2, 3, 4, 5]
    packed = 0
    for i, v in enumerate(vals):
        packed |= v << (3 * i)
    data = packed.to_bytes(2, "little")
    out = native.bitunpack32(data, 3, 5)
    assert out.tolist() == vals


def test_rle_decode32():
    # RLE run: header = run<<1 (even), value byte
    # 10 copies of value 7 at bit_width 3 → header=20, value=7
    data = bytes([20, 7])
    out = native.rle_decode32(data, 3, 10)
    assert out.tolist() == [7] * 10


def test_snappy_roundtrip():
    try:
        import snappy  # noqa

        have_ref = True
    except ImportError:
        have_ref = False
    # hand-built snappy block: len=11, literal "hello" then copy of "hello " ... keep simple:
    # literal-only block
    payload = b"hello world"
    block = bytes([len(payload)]) + bytes([(len(payload) - 1) << 2]) + payload
    assert native.snappy_decompress(block) == payload


def test_snappy_with_copies():
    # "abcabcabc": literal "abc" + copy(offset=3, len=6)
    payload_len = 9
    block = bytes([payload_len])
    block += bytes([(3 - 1) << 2]) + b"abc"
    # copy with 1-byte offset: tag type=1, len=6 → ((6-4)&7)<<2 | 1, offset=3
    block += bytes([((6 - 4) << 2) | 1 | ((3 >> 8) << 5), 3])
    out = native.snappy_decompress(block)
    assert out == b"abcabcabc"


def test_parquet_real_snappy_page(tmp_path):
    """Differential: decode a real snappy-compressed parquet data page."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "s.pq")
    table = pa.table({"x": pa.array(list(range(1000)) * 3, type=pa.int64())})
    pq.write_table(table, path, compression="snappy", use_dictionary=False)
    f = pq.ParquetFile(path)
    md = f.metadata.row_group(0).column(0)
    assert md.compression == "SNAPPY"
    with open(path, "rb") as fh:
        raw = fh.read()
    start = md.data_page_offset
    # parse the thrift page header minimally: scan for the snappy payload by
    # using total_compressed_size and decompressing the tail after header.
    # Instead, exercise via our own reader path below (header parse in
    # io/parquet_device.py when it lands).  For now decompress page bytes:
    import struct

    # cheap approach: pyarrow reads it fine; our snappy just needs to match
    # on a synthetic buffer compressed by cramjam if available
    pytest.skip("full page-header parse lands with the device decode pipeline")
