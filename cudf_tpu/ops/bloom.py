"""Device bloom filter for join-filter pushdown.

TPU-native equivalent of cudf's bloom-filter join pushdown (reference:
cpp/src/join/ bloom filter usage in mixed/hash joins and the cudf-polars
runtime join filters).  Build: k murmur3-derived bit positions per build
row, one scatter.  Probe: k gathers + AND — cheap enough to pre-filter a
probe side before a shuffle or an expensive join, cutting the all-to-all
volume on ICI.

Split-seed design: instead of k independent hash passes, two murmur3
hashes (seed 0 / seed 0x9747b28c) combine as h1 + i*h2 (Kirsch &
Mitzenmacher double hashing) — 2 hash kernels total regardless of k.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from cudf_tpu.core.column import Column
from cudf_tpu.ops.hashing import murmurhash3_x86_32

__all__ = ["BloomFilter"]


class BloomFilter:
    def __init__(self, num_bits: int = 1 << 23, num_hashes: int = 4):
        self.m = int(num_bits)
        self.k = int(num_hashes)
        self.bits = jnp.zeros((self.m,), jnp.bool_)

    def _positions(self, cols: Sequence[Column]) -> jnp.ndarray:
        h1 = murmurhash3_x86_32(cols, seed=0).data.astype(jnp.uint32)
        h2 = murmurhash3_x86_32(cols, seed=0x9747B28C).data.astype(jnp.uint32)
        i = jnp.arange(self.k, dtype=jnp.uint32)[:, None]
        pos = (h1[None, :] + i * h2[None, :]) % jnp.uint32(self.m)
        return pos.reshape(-1).astype(jnp.int32)  # [k*n]

    def add(self, cols: Sequence[Column]) -> "BloomFilter":
        self.bits = self.bits.at[self._positions(cols)].set(True)
        return self

    def maybe_contains(self, cols: Sequence[Column]) -> jnp.ndarray:
        """bool[n]: False guarantees absence; True may be a false positive."""
        n = cols[0].length
        hit = jnp.take(self.bits, self._positions(cols)).reshape(self.k, n)
        return jnp.all(hit, axis=0)

    def fill_ratio(self) -> float:
        return float(jnp.mean(self.bits))
