"""Partitioning: hash_partition, round_robin — the kernel under every shuffle.

TPU-native equivalent of libcudf partitioning
(reference: cpp/src/partitioning/partitioning.cu, round_robin.cu).

``hash_partition`` = row hash → partition id → ONE stable sort by partition
id + offsets via a bincount.  The output (reordered table + offsets) is the
wire format the multi-chip shuffle (cudf_tpu.parallel.shuffle) sends over
ICI all-to-all, replacing pack()+UCX of the reference.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table
from cudf_tpu.ops import copying
from cudf_tpu.ops.row_ops import row_hash


def partition_ids(keys: Sequence[Column], num_partitions: int, seed: int = 0) -> jnp.ndarray:
    h = row_hash(list(keys), seed=seed)
    return (h % jnp.uint64(num_partitions)).astype(jnp.int32)


def hash_partition(
    table: Table, key_names: Sequence[str], num_partitions: int, seed: int = 0
) -> Tuple[Table, jnp.ndarray]:
    """Returns (reordered table, int64 offsets[num_partitions+1])."""
    pids = partition_ids([table[k] for k in key_names], num_partitions, seed)
    return partition_by_ids(table, pids, num_partitions)


def partition_by_ids(table: Table, pids: jnp.ndarray, num_partitions: int) -> Tuple[Table, jnp.ndarray]:
    n = table.num_rows
    idx = jnp.arange(n, dtype=jnp.int64)
    _, order = jax.lax.sort([pids.astype(jnp.int32), idx], num_keys=1, is_stable=True)
    out = copying.gather_table(table, order, bounds_check=False)
    counts = jnp.zeros((num_partitions,), jnp.int64).at[pids.astype(jnp.int64)].add(1)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(counts)])
    return out, offsets


def round_robin_partition(
    table: Table, num_partitions: int, start_partition: int = 0
) -> Tuple[Table, jnp.ndarray]:
    n = table.num_rows
    pids = ((jnp.arange(n, dtype=jnp.int64) + start_partition) % num_partitions).astype(jnp.int32)
    return partition_by_ids(table, pids, num_partitions)
