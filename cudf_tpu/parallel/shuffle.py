"""Hash-shuffle over ICI: bucketize + all_to_all, fully static shapes.

TPU-native replacement for the reference's shuffle service
(rapidsmpf shuffle over UCXX/MPI; kernel = hash_partition partitioning.cu
+ pack contiguous_split.cu, SURVEY.md §2.11).

XLA collectives are static-shape, so the ragged all-to-all uses the
max-bucket-capacity design (SURVEY.md §5): each shard scatters its rows
into a [P, C] padded send buffer per array + a per-destination count
vector; ``lax.all_to_all`` exchanges buffers over ICI; receivers get
[P, C] plus true counts and mask out padding.  Capacity C is a static
overflow budget; every shuffle RETURNS the number of rows it had to
drop, so jitted callers can detect overflow in-band (psum over shards)
instead of silently masking — the wrong-answer hazard flagged in
round 1's review.

All functions here are shard-local (call inside shard_map).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _mix64(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint64)
    x = x ^ (x >> jnp.uint64(33))
    x = x * jnp.uint64(0xFF51AFD7ED558CCD)
    x = x ^ (x >> jnp.uint64(33))
    x = x * jnp.uint64(0xC4CEB9FE1A85EC53)
    x = x ^ (x >> jnp.uint64(33))
    return x


def key_hash(key: jnp.ndarray) -> jnp.ndarray:
    """uint64 hash of an int key array (jit-safe row hash for shuffles)."""
    return _mix64(jax.lax.bitcast_convert_type(key.astype(jnp.int64), jnp.uint64))


def row_hash(keys: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Combined uint64 hash over multiple int key columns (the row-hasher
    role of row_operators.cu for shuffle routing)."""
    h = jnp.zeros(keys[0].shape, jnp.uint64)
    for k in keys:
        h = _mix64(h ^ key_hash(k))
    return h


def bucketize(
    arrays: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    pids: jnp.ndarray,
    num_parts: int,
    capacity: int,
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Scatter local rows into [P, C] send buffers by destination partition.

    Invalid rows are parked in no bucket.  Returns (buffers, counts[P],
    dropped) where ``dropped`` is the number of valid rows beyond the
    static capacity (0 = lossless shuffle).
    """
    n = pids.shape[0]
    pids = jnp.where(valid, pids.astype(jnp.int32), num_parts)  # invalid → overflow row
    # stable sort by destination so each bucket's rows are contiguous
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_pid, order = jax.lax.sort([pids, idx], num_keys=1, is_stable=True)
    counts = jnp.zeros((num_parts + 1,), jnp.int32).at[pids].add(1)[:num_parts]
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    within = jnp.arange(n, dtype=jnp.int32) - jnp.take(offsets, jnp.clip(sorted_pid, 0, num_parts))
    in_cap = (within < capacity) & (sorted_pid < num_parts)
    dest_p = jnp.where(in_cap, sorted_pid, num_parts)  # overflow → sentinel row
    dest_s = jnp.where(in_cap, within, 0)
    bufs = []
    for a in arrays:
        src = jnp.take(a, order)
        buf = jnp.zeros((num_parts + 1, capacity) + a.shape[1:], a.dtype)
        buf = buf.at[dest_p, dest_s].set(src)
        bufs.append(buf[:num_parts])
    dropped = jnp.sum(jnp.maximum(counts - capacity, 0))
    counts = jnp.minimum(counts, capacity)
    return bufs, counts, dropped


def exchange(
    bufs: Sequence[jnp.ndarray], counts: jnp.ndarray, axis: str = "x"
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """all_to_all the [P, C, ...] buffers + counts over mesh axis ``axis``.

    Returns received ([P, C, ...] where row q came from shard q) and a
    [P] vector of valid counts per source, flattened views are
    [(P*C, ...)], mask = arange(C) < counts[q] per block.
    """
    out_bufs = [
        jax.lax.all_to_all(b, axis, split_axis=0, concat_axis=0, tiled=True) for b in bufs
    ]
    out_counts = jax.lax.all_to_all(counts, axis, split_axis=0, concat_axis=0, tiled=True)
    return out_bufs, out_counts


def received_mask(out_counts: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """bool[P*C] valid-row mask for flattened received buffers."""
    num_parts = out_counts.shape[0]
    slot = jnp.arange(capacity, dtype=jnp.int32)
    return (slot[None, :] < out_counts[:, None]).reshape(num_parts * capacity)


def shuffle_by_key(
    key: jnp.ndarray,
    payloads: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    num_parts: int,
    capacity: int,
    axis: str = "x",
) -> Tuple[jnp.ndarray, List[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """One-call hash shuffle: rows land on shard hash(key) % P.

    Returns (key_recv[P*C], payloads_recv, valid_recv[P*C], dropped) —
    shard-local; ``dropped`` counts rows this shard could not send
    (psum over the axis for a global overflow check).
    """
    keys, payloads, mask, dropped = shuffle_by_keys(
        [key], payloads, valid, num_parts, capacity, axis)
    return keys[0], payloads, mask, dropped


def shuffle_by_keys(
    keys: Sequence[jnp.ndarray],
    payloads: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    num_parts: int,
    capacity: int,
    axis: str = "x",
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Multi-key hash shuffle: rows land on shard row_hash(keys) % P.

    Returns (keys_recv, payloads_recv, valid_recv[P*C], dropped).
    """
    keys = list(keys)
    pids = (row_hash(keys) % jnp.uint64(num_parts)).astype(jnp.int32)
    bufs, counts, dropped = bucketize(
        [*keys, *payloads], valid, pids, num_parts, capacity)
    out_bufs, out_counts = exchange(bufs, counts, axis)
    mask = received_mask(out_counts, capacity)
    flat = [b.reshape((num_parts * capacity,) + b.shape[2:]) for b in out_bufs]
    return flat[:len(keys)], flat[len(keys):], mask, dropped


def shuffle_by_keys_2d(
    keys: Sequence[jnp.ndarray],
    payloads: Sequence[jnp.ndarray],
    valid: jnp.ndarray,
    n_dcn: int,
    n_ici: int,
    cap_ici: int,
    cap_dcn: int,
    dcn_axis: str = "dcn",
    ici_axis: str = "x",
):
    """Hierarchical shuffle over a 2-D (dcn × ici) mesh.

    Stage A rides ICI: rows move to the intra-slice shard whose local
    index equals the destination's local index.  Stage B rides DCN:
    same-local-index peers exchange across slices.  DCN (the slow hop)
    carries each row exactly once — the standard hierarchical all-to-all
    (SURVEY §5 comm-backend mapping; rapidsmpf routes through UCXX
    without this locality).

    Returns (keys_recv, payloads_recv, valid_recv, dropped).
    """
    keys = list(keys)
    P = n_dcn * n_ici
    pid = (row_hash(keys) % jnp.uint64(P)).astype(jnp.int32)
    dest_slice = pid // n_ici
    dest_local = pid % n_ici
    # stage A: to dest_local within my slice, dest_slice rides as payload
    bufsA, cntA, dropA = bucketize(
        [*keys, *payloads, dest_slice], valid, dest_local, n_ici, cap_ici)
    outA, cntA2 = exchange(bufsA, cntA, ici_axis)
    maskA = received_mask(cntA2, cap_ici)
    flatA = [b.reshape((n_ici * cap_ici,) + b.shape[2:]) for b in outA]
    slice_of = flatA[-1]
    # stage B: across slices to dest_slice (local index already correct)
    bufsB, cntB, dropB = bucketize(
        flatA[:-1], maskA, slice_of, n_dcn, cap_dcn)
    outB, cntB2 = exchange(bufsB, cntB, dcn_axis)
    maskB = received_mask(cntB2, cap_dcn)
    flatB = [b.reshape((n_dcn * cap_dcn,) + b.shape[2:]) for b in outB]
    return (flatB[:len(keys)], flatB[len(keys):], maskB,
            dropA + dropB)
