"""Device mesh helpers and row-partitioned frames.

The partition axis is named "x" (one table partition per chip — the
analogue of dask-cudf partitions / streaming PartitionInfo,
streaming/parallel.py:128).  Multi-slice meshes (ICI × DCN) become 2-D
meshes later; all collectives below address axis "x" only.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_multislice_mesh(n_slices: int, per_slice: Optional[int] = None,
                         dcn_axis: str = "dcn", ici_axis: str = "x") -> Mesh:
    """2-D mesh for multi-slice pods: axis ``dcn`` crosses slices (data-
    center network), axis ``ici`` stays intra-slice (SURVEY §2.11 comm-
    backend row: ICI for intra-slice collectives, DCN for inter-slice).

    On real hardware jax orders devices slice-major, so reshaping the
    device list to [n_slices, per_slice] puts each row on one slice."""
    devs = jax.devices()
    per = per_slice if per_slice is not None else len(devs) // n_slices
    grid = np.array(devs[:n_slices * per]).reshape(n_slices, per)
    return Mesh(grid, (dcn_axis, ici_axis))


def partition_frame(df, mesh: Mesh, axis: str = "x"):
    """Split a DataFrame's columns row-wise across the mesh (pad to a
    multiple of n_shards).  Returns (dict name→sharded array,
    sharded valid mask, rows_per_shard)."""
    n_shards = mesh.shape[axis]
    n = len(df)
    per = -(-n // n_shards)
    total = per * n_shards
    sharding = NamedSharding(mesh, P(axis))
    arrays = {}
    dictionaries = {}
    for name in df._table.names:
        col = df._table[name]
        if col.dtype.is_string:
            # dictionary-encode: codes ride the jitted tier as ints, the
            # keys stay host-side for decode (match_dictionaries
            # discipline, join.cu:37)
            from cudf_tpu.ops.dictionary import encode as dict_encode

            col = dict_encode(col)
        if col.dtype.is_dictionary:
            dictionaries[name] = col.children[0]
        data = col.data
        pad = total - n
        if pad:
            data = jnp.concatenate([data, jnp.zeros((pad,), data.dtype)])
        arrays[name] = jax.device_put(data, sharding)
    valid = jnp.arange(total, dtype=jnp.int64) < n
    if dictionaries:
        arrays["__dictionaries__"] = dictionaries
    return arrays, jax.device_put(valid, sharding), per


def collect_frame(arrays: dict, valid: jnp.ndarray, names: Sequence[str]):
    """Gather shards back into a host-side DataFrame (drops padding)."""
    from cudf_tpu.core.column import Column
    from cudf_tpu.core.table import Table
    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index

    mask = np.asarray(valid)
    cols = {}
    for name in names:
        cols[name] = Column.from_numpy(np.asarray(arrays[name])[mask])
    t = Table(cols)
    return DataFrame._from(t, default_index(t.num_rows))
