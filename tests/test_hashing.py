"""Spec-exactness tests for ops/hashing.py against independent pure-python
reference implementations of MurmurHash3_x86_32 and XXH64."""

import hashlib

import numpy as np
import pytest

from cudf_tpu.core.column import Column
from cudf_tpu.ops import hashing


# ---- pure-python references (from the published specs) -------------------

def _rotl32(x, r):
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def py_murmur3_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = _rotl32(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks * 4:]
    if tail:
        k = int.from_bytes(tail.ljust(4, b"\0"), "little")
        k = (k * c1) & 0xFFFFFFFF
        k = _rotl32(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _rotl64(x, r):
    return ((x << r) | (x >> (64 - r))) & 0xFFFFFFFFFFFFFFFF


P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)
M = 0xFFFFFFFFFFFFFFFF


def py_xxh64(data: bytes, seed: int = 0) -> int:
    # small-input path only (len < 32), matching the device tier
    assert len(data) < 32
    acc = (seed + P5 + len(data)) & M
    i = 0
    while i + 8 <= len(data):
        k = int.from_bytes(data[i:i + 8], "little")
        k = _rotl64((k * P2) & M, 31) * P1 & M
        acc = (_rotl64(acc ^ k, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= len(data):
        k = int.from_bytes(data[i:i + 4], "little")
        acc = (_rotl64(acc ^ ((k * P1) & M), 23) * P2 + P3) & M
        i += 4
    while i < len(data):
        acc = (_rotl64(acc ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & M
    acc ^= acc >> 29
    acc = (acc * P3) & M
    acc ^= acc >> 32
    return acc


# ---- device vs reference --------------------------------------------------

def test_murmur3_int64(rng):
    vals = rng.integers(-(2**62), 2**62, 20)
    c = Column.from_numpy(vals)
    got = np.asarray(hashing.murmurhash3_x86_32([c]).data)
    for i, v in enumerate(vals):
        assert got[i] == py_murmur3_32(int(v).to_bytes(8, "little", signed=True))


def test_murmur3_float64_and_seed(rng):
    vals = rng.normal(size=10)
    c = Column.from_numpy(vals)
    got = np.asarray(hashing.murmurhash3_x86_32([c], seed=42).data)
    for i, v in enumerate(vals):
        assert got[i] == py_murmur3_32(np.float64(v).tobytes(), seed=42)


def test_murmur3_strings():
    strs = ["", "a", "abcd", "hello world", "tpu-native-framework", "héllo"]
    c = Column.from_strings(strs)
    got = np.asarray(hashing.murmurhash3_x86_32([c]).data)
    for i, s in enumerate(strs):
        assert got[i] == py_murmur3_32(s.encode("utf-8")), s


def test_xxhash64_int64(rng):
    vals = rng.integers(-(2**62), 2**62, 20)
    c = Column.from_numpy(vals)
    got = np.asarray(hashing.xxhash_64([c]).data)
    for i, v in enumerate(vals):
        assert got[i] == py_xxh64(int(v).to_bytes(8, "little", signed=True))


def test_xxhash64_strings():
    strs = ["", "a", "abc", "12345678", "123456789012", "0123456789abcdef0123456789abcde"]
    c = Column.from_strings(strs)
    got = np.asarray(hashing.xxhash_64([c], seed=7).data)
    for i, s in enumerate(strs):
        assert got[i] == py_xxh64(s.encode(), seed=7), s


def test_checksum_md5_sha256():
    c = Column.from_sequence([1, 2, None])
    md5 = hashing.checksum([c], "md5").to_pylist()
    assert md5[0] == hashlib.md5(np.int64(1).tobytes()).hexdigest()
    assert md5[2] == hashlib.md5(b"").hexdigest()  # nulls skipped
    sha = hashing.checksum([c], "sha256").to_pylist()
    assert sha[1] == hashlib.sha256(np.int64(2).tobytes()).hexdigest()


def test_multi_column_combine_differs(rng):
    a = Column.from_numpy(rng.integers(0, 100, 50))
    b = Column.from_numpy(rng.integers(0, 100, 50))
    h_ab = np.asarray(hashing.murmurhash3_x86_32([a, b]).data)
    h_ba = np.asarray(hashing.murmurhash3_x86_32([b, a]).data)
    assert (h_ab != h_ba).any()  # order-sensitive combine


def test_frame_hash_values(rng):
    import cudf_tpu as ct

    df = ct.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    hv = df.hash_values()
    assert hv.dtype.to_numpy() == np.uint32
    assert len(set(hv.to_pandas().tolist())) == 3
    hx = df.hash_values(method="xxhash64")
    assert hx.dtype.to_numpy() == np.uint64
    hm = df.hash_values(method="md5")
    assert all(len(s) == 32 for s in hm.to_pandas().tolist())
    sv = df["a"].hash_values()
    assert len(sv) == 3
