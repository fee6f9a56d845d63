"""Multi-process SPMD bootstrap.

TPU-native replacement for the reference's distributed launch layer
(dask-cuda LocalCUDACluster / rapidsmpf bootstrap — python/dask_cudf and
rapidsmpf integrations): on TPU pods the runtime is jax.distributed — one
python process per host, all chips visible as one global device set, and
collectives ride ICI automatically once arrays are sharded over a Mesh.

Usage on a pod slice (one process per host):

    from cudf_tpu.parallel import bootstrap
    bootstrap.initialize()            # reads JAX_COORDINATOR_ADDRESS etc.
    mesh = bootstrap.global_mesh()    # 1-D mesh over every chip in the pod
    ... cudf_tpu.parallel.dist ops over the mesh ...

Single-process (including CPU test meshes) needs no initialize() call —
global_mesh() just wraps jax.devices().
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Initialize jax.distributed for a multi-host run.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, also
    honored by jax itself on TPU pods where they're auto-populated by the
    runtime).  A single-process run (num_processes in (None, 0, 1) with no
    coordinator) is a no-op so the same script works from laptop to pod.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or os.environ.get("CUDF_TPU__COORDINATOR")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if not coordinator_address and (num_processes or 1) <= 1:
        _initialized = True  # single-process: nothing to set up
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def shutdown() -> None:
    global _initialized
    if _initialized and jax.process_count() > 1:
        jax.distributed.shutdown()
    _initialized = False


def process_info() -> dict:
    """Topology snapshot for logging/diagnostics."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.default_backend(),
    }


def global_mesh(axis_names=("x",), shape=None) -> "jax.sharding.Mesh":
    """Mesh over every chip in the job (all hosts).

    Default: 1-D mesh — the right layout for hash-shuffle dataframe ops
    (all_to_all over ICI).  Pass shape for 2-D layouts, e.g.
    ``global_mesh(("dp", "mp"), (4, 2))``.
    """
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = (devices.size,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    return jax.sharding.Mesh(devices.reshape(shape), axis_names)


def host_local_slice(n_rows: int) -> slice:
    """Row range this process should load (even split by process index) —
    the multi-host analogue of dask_cudf's partition-per-worker reads."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_rows // np_)
    return slice(p * per, min((p + 1) * per, n_rows))
