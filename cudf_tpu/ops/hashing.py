"""Column hash functions.

TPU-native equivalent of libcudf's hashing module
(reference: cpp/src/hash/ — murmurhash3_x86_32.cu, xxhash_64.cu,
md5_hash.cu, sha_hash.cuh; public API cpp/include/cudf/hashing.hpp).

Device tier (spec-exact, vectorized over rows on the VPU):
  * ``murmurhash3_x86_32`` — all fixed-width dtypes + strings.  Variable
    length is handled with a static python loop over the max block count
    and per-row masks (full-block / tail-block / past-end), so one trace
    covers every row length — no data-dependent control flow under jit.
  * ``xxhash_64`` — fixed-width dtypes + strings up to 32-byte elements
    (small-input path of the spec); longer strings take the host tier.

Host tier: ``md5`` / ``sha1`` / ``sha224`` / ``sha256`` / ``sha384`` /
``sha512`` via hashlib over per-row serialized bytes → hex string column
(checksums are host-interop features, not hot-path kernels).

The *internal* row hash used by join/groupby/shuffle stays the cheaper
splitmix64 combine in row_ops.py; this module is the user-facing,
spec-conformant surface (``DataFrame.hash_values``).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column

__all__ = ["murmurhash3_x86_32", "xxhash_64", "hash_values", "checksum"]

_U32 = jnp.uint32
_U64 = jnp.uint64


def _rotl32(x, r: int):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _rotl64(x, r: int):
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fixed_bytes(col: Column):
    """bytes[n, w] as uint32 lanes for a fixed-width column (little-endian)."""
    data = col.data
    if col.dtype.is_bool:
        data = data.astype(jnp.uint8)
    w = data.dtype.itemsize
    # bitcast to unsigned of same width, then extract bytes by shifts
    unsigned = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint64}[w]
    import jax.lax as lax

    u = lax.bitcast_convert_type(data, unsigned).astype(_U64)
    cols = [((u >> _U64(8 * k)) & _U64(0xFF)).astype(_U32) for k in range(w)]
    b = jnp.stack(cols, axis=1)
    lens = jnp.full((col.length,), w, jnp.int32)
    return b, lens


def _byte_matrix(col: Column):
    if col.dtype.is_string:
        offs = col.offsets
        lens = (offs[1:] - offs[:-1]).astype(jnp.int32)
        max_len = max(int(jnp.max(lens)) if col.length else 0, 4)
        pos = offs[:-1, None] + jnp.arange(max_len, dtype=offs.dtype)[None, :]
        in_range = pos < offs[1:, None]
        chars = jnp.take(col.data.astype(_U32),
                         jnp.clip(pos, 0, max(col.data.shape[0] - 1, 0)).reshape(-1),
                         mode="clip").reshape(col.length, max_len)
        return jnp.where(in_range, chars, _U32(0)), lens
    if col.dtype.is_dictionary:
        return _byte_matrix(col.decode_dictionary())
    if col.dtype.is_decimal:
        return _fixed_bytes(Column(dt.INT64, col.length,
                                   data=col.data.astype(jnp.int64),
                                   validity=col.validity))
    return _fixed_bytes(col)


_C1 = _U32(0xCC9E2D51)
_C2 = _U32(0x1B873593)


def _murmur32_rows(b, lens, seed: int):
    """Spec-exact MurmurHash3_x86_32 over byte matrix b[n, m] with row lens."""
    n, m = b.shape
    nblocks = (m + 3) // 4
    if m % 4:
        b = jnp.pad(b, ((0, 0), (0, 4 - m % 4)))
    h = jnp.full((n,), _U32(seed))
    lens32 = lens.astype(jnp.int32)
    for j in range(nblocks):
        k1 = (b[:, 4 * j]
              | (b[:, 4 * j + 1] << _U32(8))
              | (b[:, 4 * j + 2] << _U32(16))
              | (b[:, 4 * j + 3] << _U32(24)))
        k1 = k1 * _C1
        k1 = _rotl32(k1, 15)
        k1 = k1 * _C2
        full = lens32 >= (j + 1) * 4
        tail = (~full) & (lens32 > j * 4)
        h_full = _rotl32(h ^ k1, 13) * _U32(5) + _U32(0xE6546B64)
        h_tail = h ^ k1
        h = jnp.where(full, h_full, jnp.where(tail, h_tail, h))
    h = h ^ lens32.astype(_U32)
    h = h ^ (h >> _U32(16))
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> _U32(13))
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> _U32(16))
    return h


def murmurhash3_x86_32(cols: Sequence[Column], seed: int = 0) -> Column:
    """uint32[n] spec-exact murmur3 row hash; columns combined as in
    cudf's row hasher (hash_combine over per-column hashes,
    cpp/src/hash/murmurhash3_x86_32.cu)."""
    cols = list(cols)
    n = cols[0].length
    out = None
    for c in cols:
        b, lens = _byte_matrix(c)
        h = _murmur32_rows(b, lens, seed)
        if c.validity is not None:
            h = jnp.where(c.validity, h, _U32(0))
        if out is None:
            out = h
        else:  # boost hash_combine, 32-bit
            out = out ^ (h + _U32(0x9E3779B9) + (out << _U32(6)) + (out >> _U32(2)))
    return Column(dt.UINT32, n, data=out)


_P1 = _U64(0x9E3779B185EBCA87)
_P2 = _U64(0xC2B2AE3D27D4EB4F)
_P3 = _U64(0x165667B19E3779F9)
_P4 = _U64(0x85EBCA77C2B2AE63)
_P5 = _U64(0x27D4EB2F165667C5)


def _xxh64_rows(b, lens, seed: int):
    """Spec-exact xxhash64 over byte matrix b[n, m] with per-row lengths.

    Rows with len >= 32 run the 4-accumulator stripe loop (xxh64 spec;
    reference cpp/src/hash/xxhash_64.cu), shorter rows start from
    seed + P5; both converge into the shared 8/4/1-byte tail."""
    n, m = b.shape
    if m % 8:
        b = jnp.pad(b, ((0, 0), (0, 8 - m % 8)))
    m8 = b.shape[1]
    lens64 = lens.astype(jnp.int64)
    b64 = b.astype(_U64)

    def load64(start):
        k1 = _U64(0)
        for k in range(8):
            k1 = k1 | (b64[:, start + k] << _U64(8 * k))
        return k1

    def xround(v, k1):
        return _rotl64(v + k1 * _P2, 31) * _P1

    stripe_end = (lens64 // 32) * 32
    # stripe loop: 4 accumulators over 32-byte stripes
    if m8 >= 32:
        v1 = jnp.full((n,), _U64(seed) + _P1 + _P2, _U64)
        v2 = jnp.full((n,), _U64(seed) + _P2, _U64)
        v3 = jnp.full((n,), _U64(seed), _U64)
        v4 = jnp.full((n,), _U64(seed) - _P1, _U64)
        for s in range(m8 // 32):
            use = lens64 >= (s + 1) * 32
            v1 = jnp.where(use, xround(v1, load64(32 * s)), v1)
            v2 = jnp.where(use, xround(v2, load64(32 * s + 8)), v2)
            v3 = jnp.where(use, xround(v3, load64(32 * s + 16)), v3)
            v4 = jnp.where(use, xround(v4, load64(32 * s + 24)), v4)
        h_big = (_rotl64(v1, 1) + _rotl64(v2, 7)
                 + _rotl64(v3, 12) + _rotl64(v4, 18))
        for v in (v1, v2, v3, v4):  # merge rounds
            h_big = (h_big ^ xround(jnp.zeros((n,), _U64), v)) * _P1 + _P4
        acc = jnp.where(lens64 >= 32, h_big, _U64(seed) + _P5)
    else:
        acc = jnp.full((n,), _U64(seed) + _P5, _U64)
    acc = acc + lens64.astype(_U64)
    # tail over bytes in [stripe_end, len)
    end8 = stripe_end + ((lens64 - stripe_end) // 8) * 8
    # 8-byte lanes
    for j in range(m8 // 8):
        p = 8 * j
        use = (p >= stripe_end) & (p + 8 <= lens64)
        k1r = _rotl64(load64(p) * _P2, 31) * _P1
        upd = _rotl64(acc ^ k1r, 27) * _P1 + _P4
        acc = jnp.where(use, upd, acc)
    # one 4-byte lane
    for j4 in range(m8 // 4):
        p = j4 * 4
        use = (p == end8) & (p + 4 <= lens64)
        k1 = _U64(0)
        for k in range(4):
            k1 = k1 | (b64[:, p + k] << _U64(8 * k))
        upd = _rotl64(acc ^ (k1 * _P1), 23) * _P2 + _P3
        acc = jnp.where(use, upd, acc)
    # trailing bytes
    done4 = end8 + jnp.where(lens64 - end8 >= 4, 4, 0)
    for pos in range(m8):
        use = (pos >= done4) & (pos < lens64)
        upd = _rotl64(acc ^ (b64[:, pos] * _P5), 11) * _P1
        acc = jnp.where(use, upd, acc)
    acc = acc ^ (acc >> _U64(33))
    acc = acc * _P2
    acc = acc ^ (acc >> _U64(29))
    acc = acc * _P3
    acc = acc ^ (acc >> _U64(32))
    return acc


def xxhash_64(cols: Sequence[Column], seed: int = 0) -> Column:
    """uint64[n] spec-exact xxhash64 row hash (cpp/src/hash/xxhash_64.cu).

    All element lengths supported: >= 32-byte elements run the
    4-accumulator stripe loop, shorter ones the small-input path.
    """
    cols = list(cols)
    n = cols[0].length
    out = None
    for c in cols:
        b, lens = _byte_matrix(c)
        h = _xxh64_rows(b, lens, seed)
        if c.validity is not None:
            h = jnp.where(c.validity, h, _U64(0))
        if out is None:
            out = h
        else:
            out = out ^ (h + _U64(0x9E3779B97F4A7C15)
                         + (out << _U64(6)) + (out >> _U64(2)))
    return Column(dt.UINT64, n, data=out)


_HASHLIB = {"md5": hashlib.md5, "sha1": hashlib.sha1, "sha224": hashlib.sha224,
            "sha256": hashlib.sha256, "sha384": hashlib.sha384,
            "sha512": hashlib.sha512}


def checksum(cols: Sequence[Column], method: str = "md5") -> Column:
    """Hex-digest string column over per-row concatenated element bytes
    (host tier; cudf md5/sha semantics: null elements are skipped,
    cpp/src/hash/md5_hash.cu)."""
    fn = _HASHLIB[method]
    cols = list(cols)
    n = cols[0].length
    parts = []
    for c in cols:
        if c.dtype.is_string:
            data = c.to_pylist()
            parts.append([None if v is None else v.encode() for v in data])
        else:
            if c.dtype.is_dictionary:
                c = c.decode_dictionary()
            arr = np.asarray(c.data)
            if c.dtype.is_bool:
                arr = arr.astype(np.uint8)
            valid = (np.asarray(c.validity) if c.validity is not None
                     else np.ones(n, bool))
            parts.append([arr[i].tobytes() if valid[i] else None
                          for i in range(n)])
    out = []
    for i in range(n):
        h = fn()
        for p in parts:
            if p[i] is not None:
                h.update(p[i])
        out.append(h.hexdigest())
    return Column.from_strings(out)


def hash_values(cols: Sequence[Column], method: str = "murmur3",
                seed: int = 0) -> Column:
    """Dispatch for DataFrame.hash_values (cudf/core/dataframe.py hash_values)."""
    if method in ("murmur3", "murmurhash3_x86_32"):
        return murmurhash3_x86_32(cols, seed)
    if method in ("xxhash64", "xxhash_64"):
        return xxhash_64(cols, seed)
    if method in _HASHLIB:
        return checksum(cols, method)
    raise ValueError(f"unknown hash method {method!r}")
