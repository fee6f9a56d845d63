"""Loader + numpy fallbacks for the native host IO kernels (csrc/).

Builds ``_tpudf_native`` from csrc/tpudf_native.cpp on first use (g++ via
setuptools; the image has the toolchain but no pybind11 — the extension
uses the raw CPython C API).  Every entry point has a numpy fallback so
the package works without a compiler.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np

_native = None
_tried = False


def _build_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "build", "native")


def load_native():
    """Import (building if needed) the C extension; None on failure."""
    global _native, _tried
    if _native is not None or _tried:
        return _native
    _tried = True
    try:
        import _tpudf_native  # already importable?

        _native = _tpudf_native
        return _native
    except ImportError:
        pass
    try:
        _native = _compile_and_load()
    except Exception:
        _native = None
    return _native


def _compile_and_load():
    import importlib.util
    import subprocess
    import sysconfig

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "csrc", "tpudf_native.cpp")
    outdir = _build_dir()
    os.makedirs(outdir, exist_ok=True)
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(outdir, "_tpudf_native" + suffix)
    # Rebuild whenever the source hash changes: a stale or foreign .so is
    # never loaded (the hash stamp ties the binary to the reviewed source).
    import hashlib

    with open(src, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()
    stamp = out + ".hash"
    have = None
    if os.path.exists(stamp):
        with open(stamp) as f:
            have = f.read().strip()
    if not os.path.exists(out) or have != src_hash:
        include = sysconfig.get_paths()["include"]
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            f"-I{include}", src, "-o", out,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(stamp, "w") as f:
            f.write(src_hash)
    spec = importlib.util.spec_from_file_location("_tpudf_native", out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["_tpudf_native"] = mod
    return mod


# ----------------------------------------------------------------------
# public API with fallbacks
# ----------------------------------------------------------------------

def multibyte_split(data: bytes, delimiter: bytes = b"\n") -> np.ndarray:
    """Record start offsets (int64, includes 0 and len(data))."""
    nat = load_native()
    if nat is not None:
        raw = nat.multibyte_split(data, delimiter)
        return np.frombuffer(raw, dtype=np.int64)
    # numpy fallback
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(delimiter) == 1:
        hits = np.nonzero(arr == delimiter[0])[0] + 1
    else:
        d = np.frombuffer(delimiter, dtype=np.uint8)
        m = np.ones(len(arr) - len(d) + 1, dtype=bool) if len(arr) >= len(d) else np.zeros(0, bool)
        for i, c in enumerate(d):
            m &= arr[i:len(arr) - len(d) + 1 + i] == c
        hits = np.nonzero(m)[0] + len(d)
    offs = np.concatenate([[0], hits])
    if len(offs) == 0 or offs[-1] != len(arr):
        offs = np.concatenate([offs, [len(arr)]])
    return offs.astype(np.int64)


def bitunpack32(data: bytes, bit_width: int, count: int) -> np.ndarray:
    nat = load_native()
    if nat is not None:
        raw = nat.bitunpack32(data, bit_width, count)
        return np.frombuffer(raw, dtype=np.int32)
    out = np.zeros(count, np.int32)
    acc = 0
    nbits = 0
    pos = 0
    mask = (1 << bit_width) - 1 if bit_width < 32 else 0xFFFFFFFF
    for i in range(count):
        while nbits < bit_width:
            b = data[pos] if pos < len(data) else 0
            acc |= b << nbits
            nbits += 8
            pos += 1
        out[i] = acc & mask
        acc >>= bit_width
        nbits -= bit_width
    return out


def rle_decode32(data: bytes, bit_width: int, count: int) -> np.ndarray:
    nat = load_native()
    if nat is not None:
        raw = nat.rle_decode32(data, bit_width, count)
        return np.frombuffer(raw, dtype=np.int32)
    out = []
    pos = 0
    byte_width = (bit_width + 7) // 8
    while len(out) < count and pos < len(data):
        header = 0
        shift = 0
        while pos < len(data):
            b = data[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        if header & 1:
            groups = header >> 1
            nvals = groups * 8
            vals = bitunpack32(data[pos:pos + (nvals * bit_width + 7) // 8], bit_width, nvals)
            pos += (nvals * bit_width + 7) // 8
            out.extend(vals.tolist())
        else:
            run = header >> 1
            v = int.from_bytes(data[pos:pos + byte_width], "little") if byte_width else 0
            pos += byte_width
            out.extend([v] * run)
    return np.asarray(out[:count] + [0] * max(0, count - len(out)), np.int32)


def snappy_compress(data: bytes) -> bytes:
    """Raw snappy block compress (csrc greedy LZ77; fallback emits a
    single literal element — a valid, if incompressible, snappy block)."""
    nat = load_native()
    if nat is not None and hasattr(nat, "snappy_compress"):
        return nat.snappy_compress(data)
    out = bytearray()
    v = len(data)
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    if data:
        l = len(data) - 1
        if l < 60:
            out.append(l << 2)
        else:
            nb = (l.bit_length() + 7) // 8
            out.append((59 + nb) << 2)
            out += l.to_bytes(nb, "little")
        out += data
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    nat = load_native()
    if nat is not None:
        return nat.snappy_decompress(data)
    # python fallback (slow, correctness only)
    pos = 0
    ulen = 0
    shift = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    out = bytearray()
    while pos < len(data) and len(out) < ulen:
        tag = data[pos]
        pos += 1
        t = tag & 3
        if t == 0:
            ln = (tag >> 2) + 1
            if ln > 60:
                nb = ln - 60
                ln = int.from_bytes(data[pos:pos + nb], "little") + 1
                pos += nb
            out += data[pos:pos + ln]
            pos += ln
        else:
            if t == 1:
                ln = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif t == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos:pos + 2], "little")
                pos += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            src = len(out) - off
            for i in range(ln):
                out.append(out[src + i])
    return bytes(out)
