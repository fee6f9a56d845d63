"""Device-side parquet page decode: RLE / bit-packed hybrid on the VPU.

TPU-native equivalent of libcudf's GPU page decode
(reference: cpp/src/io/parquet/page_decode.cuh, rle_stream.cuh — warp
-cooperative RLE streams).  Warp cooperation is the wrong shape for XLA;
the split here plays to each side's strength:

  host   — walk the run HEADERS only (a varint + kind per run: O(runs),
           microseconds for real pages) into flat run descriptors;
  device — expand all run VALUES in parallel: one `searchsorted` maps
           output positions to runs, RLE positions gather their run value,
           bit-packed positions slice their bits out of the raw byte
           buffer with vectorized shifts (O(values) on the VPU).

This upgrades the decode tier from the native C++ host kernels (csrc/)
to HBM-resident decode: the compressed page bytes are the only host→HBM
transfer; levels/indices never exist host-side.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["device_bitunpack", "device_rle_decode", "parse_rle_runs"]


def device_bitunpack(buf: jnp.ndarray, bit_width: int, count: int,
                     bit_offset: int = 0) -> jnp.ndarray:
    """Unpack `count` little-endian `bit_width`-bit ints from a uint8
    buffer starting at `bit_offset` bits (parquet bit-packing layout).

    Gathers up to 4 bytes per output and shifts — branch-free, one pass.
    bit_width <= 24 (parquet levels and dictionary indices in practice).
    """
    if bit_width == 0:
        return jnp.zeros((count,), jnp.int32)
    if bit_width > 24:
        raise ValueError("device_bitunpack supports bit_width <= 24")
    pos = bit_offset + jnp.arange(count, dtype=jnp.int64) * bit_width
    byte0 = pos >> 3
    shift = (pos & 7).astype(jnp.uint32)
    nb = buf.shape[0]

    def at(i):
        return jnp.take(buf, jnp.clip(i, 0, nb - 1), mode="clip").astype(jnp.uint32)

    word = (at(byte0)
            | (at(byte0 + 1) << jnp.uint32(8))
            | (at(byte0 + 2) << jnp.uint32(16))
            | (at(byte0 + 3) << jnp.uint32(24)))
    mask = jnp.uint32((1 << bit_width) - 1)
    return ((word >> shift) & mask).astype(jnp.int32)


def parse_rle_runs(data: bytes, bit_width: int, count: int):
    """Host header walk of a parquet RLE/bit-packed hybrid stream.

    Returns numpy descriptors:
      starts[r]   — first output index of run r
      lengths[r]  — values produced by run r
      is_packed[r]
      payload[r]  — RLE: the repeated value; packed: BIT offset of the
                    run's first value in `data`
    """
    starts, lengths, packed, payload = [], [], [], []
    i, out = 0, 0
    nbytes = (bit_width + 7) // 8
    while out < count and i < len(data):
        header = 0
        shift = 0
        while True:  # ULEB128 varint
            b = data[i]
            i += 1
            header |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        if header & 1:  # bit-packed group: (header>>1) groups of 8 values
            n = (header >> 1) * 8
            n = min(n, count - out)
            starts.append(out)
            lengths.append(n)
            packed.append(True)
            payload.append(i * 8)  # bit offset
            i += ((header >> 1) * 8 * bit_width + 7) // 8
        else:  # RLE run: value repeated (header>>1) times
            n = min(header >> 1, count - out)
            v = int.from_bytes(data[i:i + nbytes], "little") if nbytes else 0
            i += nbytes
            starts.append(out)
            lengths.append(n)
            packed.append(False)
            payload.append(v)
        out += n
    return (np.asarray(starts, np.int64), np.asarray(lengths, np.int64),
            np.asarray(packed, bool), np.asarray(payload, np.int64))


def device_rle_decode(data: bytes, bit_width: int, count: int) -> jnp.ndarray:
    """int32[count] values of an RLE/bit-packed hybrid stream, expanded on
    device (one searchsorted + masked gathers over the raw page bytes)."""
    if count == 0:
        return jnp.zeros((0,), jnp.int32)
    starts, lengths, packed, payload = parse_rle_runs(data, bit_width, count)
    if len(starts) == 0:
        return jnp.zeros((count,), jnp.int32)
    buf = jnp.asarray(np.frombuffer(data, np.uint8))
    starts_j = jnp.asarray(starts)
    pos = jnp.arange(count, dtype=jnp.int64)
    run = jnp.searchsorted(starts_j, pos, side="right") - 1
    within = pos - jnp.take(starts_j, run)
    pay = jnp.take(jnp.asarray(payload), run)
    is_p = jnp.take(jnp.asarray(packed), run)
    # bit-packed lanes: value bit position = run payload + within*bit_width
    bitpos = jnp.where(is_p, pay + within * bit_width, 0)
    if bit_width:
        byte0 = bitpos >> 3
        shift = (bitpos & 7).astype(jnp.uint32)
        nb = buf.shape[0]

        def at(i):
            return jnp.take(buf, jnp.clip(i, 0, nb - 1), mode="clip").astype(jnp.uint32)

        word = (at(byte0) | (at(byte0 + 1) << jnp.uint32(8))
                | (at(byte0 + 2) << jnp.uint32(16))
                | (at(byte0 + 3) << jnp.uint32(24)))
        unpacked = ((word >> shift) & jnp.uint32((1 << bit_width) - 1)).astype(jnp.int32)
    else:
        unpacked = jnp.zeros((count,), jnp.int32)
    return jnp.where(is_p, unpacked, pay.astype(jnp.int32))


# ----------------------------------------------------------------------
# DELTA encodings (round 2): host walks BLOCK headers only, device
# unpacks all deltas in one vectorized pass + cumsum reconstruction
# (reference: cpp/src/io/parquet/page_delta_decode.cu, delta_binary.cuh)
# ----------------------------------------------------------------------

def _read_uvarint(data: bytes, i: int):
    v = s = 0
    while True:
        b = data[i]
        i += 1
        v |= (b & 0x7F) << s
        if not (b & 0x80):
            return v, i
        s += 7


def _read_zigzag(data: bytes, i: int):
    u, i = _read_uvarint(data, i)
    return (u >> 1) ^ -(u & 1), i


def parse_delta_header(data: bytes):
    """(block_size, miniblocks_per_block, total_count, first_value, pos)."""
    bs, i = _read_uvarint(data, 0)
    mb, i = _read_uvarint(data, i)
    total, i = _read_uvarint(data, i)
    first, i = _read_zigzag(data, i)
    return bs, mb, total, first, i


def parse_delta_miniblocks(data: bytes, count: int):
    """Host block walk → per-miniblock descriptors + consumed bytes.

    Returns (starts, widths, bit_offsets, min_deltas, first_value,
    total_count, consumed)."""
    bs, mbs, total, first, i = parse_delta_header(data)
    vpm = bs // mbs                      # values per miniblock
    ndeltas = total - 1
    starts, widths, bitoffs, mins = [], [], [], []
    done = 0
    while done < ndeltas:
        min_delta, i = _read_zigzag(data, i)
        bws = data[i:i + mbs]
        i += mbs
        for m in range(mbs):
            if done >= ndeltas:
                break
            w = bws[m]
            n = min(vpm, ndeltas - done)
            starts.append(done)
            widths.append(w)
            bitoffs.append(i * 8)
            mins.append(min_delta)
            # miniblock payload is ALWAYS vpm values wide (spec padding)
            i += (vpm * w + 7) // 8
            done += n
    return (np.asarray(starts, np.int64), np.asarray(widths, np.int64),
            np.asarray(bitoffs, np.int64), np.asarray(mins, np.int64),
            first, total, i)


def device_delta_binary_decode(data: bytes, count: int = -1):
    """(values int64[count], consumed_bytes) for DELTA_BINARY_PACKED."""
    (starts, widths, bitoffs, mins, first, total,
     consumed) = parse_delta_miniblocks(data, count)
    if len(widths) and int(widths.max()) > 32:
        # 5-byte gather window covers width+shift <= 40 bits; wider
        # deltas (full-range int64 jumps) decode on HOST — rare in real
        # files, and correctness beats the device tier here
        n = total if count < 0 else min(count, total)
        out = np.zeros(max(n, 1), np.uint64)
        out[0] = np.uint64(first & 0xFFFFFFFFFFFFFFFF)
        big = int.from_bytes(data, "little")
        done = 1
        for s, w, bo, md in zip(starts.tolist(), widths.tolist(),
                                bitoffs.tolist(), mins.tolist()):
            if done > n - 1:
                break
            take = min(n - 1 - s, 32)
            mask = (1 << w) - 1
            for i in range(take):
                d = (big >> (bo + i * w)) & mask
                out[1 + s + i] = np.uint64(
                    (int(out[s + i]) + d + md) & 0xFFFFFFFFFFFFFFFF)
                done += 1
        return jnp.asarray(out[:n].astype(np.int64)), consumed
    n = total if count < 0 else min(count, total)
    if n <= 0:
        return jnp.zeros((0,), jnp.int64), consumed
    ndeltas = n - 1
    if ndeltas == 0:
        return jnp.full((1,), first, jnp.int64), consumed
    buf = jnp.asarray(np.frombuffer(data, np.uint8))
    pos = jnp.arange(ndeltas, dtype=jnp.int64)
    mb = jnp.searchsorted(jnp.asarray(starts), pos, side="right") - 1
    within = pos - jnp.take(jnp.asarray(starts), mb)
    w = jnp.take(jnp.asarray(widths), mb)
    bitpos = jnp.take(jnp.asarray(bitoffs), mb) + within * w
    nb = buf.shape[0]

    def at(i):
        return jnp.take(buf, jnp.clip(i, 0, nb - 1), mode="clip").astype(jnp.uint64)

    byte0 = bitpos >> 3
    shift = (bitpos & 7).astype(jnp.uint64)
    word = jnp.zeros_like(at(byte0))
    for k in range(5):   # up to 32-bit widths + shift spill
        word = word | (at(byte0 + k) << jnp.uint64(8 * k))
    mask = (jnp.uint64(1) << w.astype(jnp.uint64)) - jnp.uint64(1)
    delta = ((word >> shift) & mask).astype(jnp.int64)
    delta = delta + jnp.take(jnp.asarray(mins), mb)
    values = jnp.concatenate(
        [jnp.full((1,), first, jnp.int64), delta]).cumsum()
    return values, consumed


def device_delta_length_byte_array(data: bytes, count: int):
    """(offsets int64[count+1], chars uint8[...]) for
    DELTA_LENGTH_BYTE_ARRAY pages (lengths delta-packed, chars raw)."""
    lengths, consumed = device_delta_binary_decode(data, count)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(lengths)])
    chars = jnp.asarray(np.frombuffer(data, np.uint8, count=-1, offset=consumed))
    return offsets, chars


def device_dict_string_gather(indices: jnp.ndarray, dict_offsets: jnp.ndarray,
                              dict_chars: jnp.ndarray):
    """Expand dictionary-encoded strings on device: (offsets, chars).

    The page_string_decode.cu role for the dominant dict-encoded case:
    indices/dictionary stay HBM-resident; output assembled with
    segment_expand + one chars gather."""
    from cudf_tpu.ops._utils import segment_expand

    lens = jnp.take(dict_offsets[1:] - dict_offsets[:-1], indices)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(lens)])
    total = int(offsets[-1])
    if total == 0:
        return offsets, jnp.zeros((0,), jnp.uint8)
    row = segment_expand(offsets, total)
    within = jnp.arange(total, dtype=jnp.int64) - jnp.take(offsets, row)
    src = jnp.take(dict_offsets, jnp.take(indices, row)) + within
    chars = jnp.take(dict_chars, jnp.clip(src, 0, dict_chars.shape[0] - 1))
    return offsets, chars
