"""Device RLE/bit-pack decode vs the native C++ host kernels and pyarrow
(reference: cpp/src/io/parquet/rle_stream.cuh semantics)."""

import numpy as np
import pytest

from cudf_tpu.io.parquet_device import (
    device_bitunpack, device_rle_decode, parse_rle_runs,
)


def _pack_bits(values, bit_width):
    out = bytearray()
    acc = cur = 0
    for v in values:
        acc |= (v & ((1 << bit_width) - 1)) << cur
        cur += bit_width
        while cur >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            cur -= 8
    if cur:
        out.append(acc & 0xFF)
    return bytes(out)


def _varint(x):
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _rle_run(value, n, bit_width):
    nbytes = (bit_width + 7) // 8
    return _varint(n << 1) + value.to_bytes(nbytes, "little")


def _packed_run(values, bit_width):
    assert len(values) % 8 == 0
    return _varint(((len(values) // 8) << 1) | 1) + _pack_bits(values, bit_width)


@pytest.mark.parametrize("bw", [1, 2, 3, 5, 7, 8, 12, 17])
def test_device_bitunpack(rng, bw):
    vals = rng.integers(0, 1 << bw, 100).tolist()
    buf = np.frombuffer(_pack_bits(vals, bw), np.uint8)
    import jax.numpy as jnp

    got = np.asarray(device_bitunpack(jnp.asarray(buf), bw, 100))
    assert got.tolist() == vals


def test_device_rle_decode_mixed(rng):
    bw = 3
    stream = (_rle_run(5, 10, bw)
              + _packed_run([1, 2, 3, 4, 5, 6, 7, 0], bw)
              + _rle_run(2, 7, bw)
              + _packed_run(rng.integers(0, 8, 16).tolist(), bw))
    # reconstruct expected on host
    starts, lengths, packed, payload = parse_rle_runs(stream, bw, 41)
    assert lengths.sum() == 41
    got = np.asarray(device_rle_decode(stream, bw, 41))
    expect = [5] * 10 + [1, 2, 3, 4, 5, 6, 7, 0] + [2] * 7
    assert got[:25].tolist() == expect
    assert len(got) == 41


def test_device_vs_native_kernel(rng):
    from cudf_tpu import native

    bw = 4
    vals = rng.integers(0, 16, 64).tolist()
    stream = _packed_run(vals, bw) + _rle_run(9, 20, bw)
    got_dev = np.asarray(device_rle_decode(stream, bw, 84))
    got_native = native.rle_decode32(stream, bw, 84)
    assert got_dev.tolist() == list(got_native)


def test_device_rle_zero_width():
    # bit_width 0: all values are 0 (single-value dictionaries)
    stream = _varint(50 << 1)
    got = np.asarray(device_rle_decode(stream, 0, 50))
    assert (got == 0).all()


def test_native_reader_device_decode_matches(tmp_path, rng):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cudf_tpu.io.parquet_native import read_parquet_native
    from cudf_tpu.utils.config import option_context

    # dictionary-encoded numeric column (repetitive values)
    pdf = pd.DataFrame({"a": rng.integers(0, 50, 5000),
                        "b": rng.choice([1.5, 2.5, 3.5], 5000)})
    path = str(tmp_path / "d.pq")
    pq.write_table(pa.Table.from_pandas(pdf), path, use_dictionary=True,
                   compression="snappy")
    with option_context("io.parquet.device_decode", True):
        got = read_parquet_native(path).to_pandas()
    pd.testing.assert_frame_equal(got, pdf, check_dtype=False)
    base = read_parquet_native(path).to_pandas()
    pd.testing.assert_frame_equal(got, base, check_dtype=False)
