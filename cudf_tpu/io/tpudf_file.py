"""tpudf fast table format — near-memcpy save/load.

TPU-native equivalent of the reference's experimental cudftable format
(reference: cpp/src/io/cudftable.cpp:25-40 — header "CTBL" + pack()
metadata + contiguous data).  Here: header b"TPDF" + metadata length +
pack() json metadata + the single contiguous buffer.  Loading is one read
+ one HBM transfer.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"TPDF"


def write_tpudf(df, path: str) -> None:
    from cudf_tpu.ops.pack import pack

    packed = pack(df._table)
    blob = np.asarray(packed.gpu_data)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(packed.metadata).to_bytes(8, "little"))
        f.write(packed.metadata)
        f.write(int(blob.nbytes).to_bytes(8, "little"))
        f.write(blob.tobytes())


def read_tpudf(path: str):
    import jax.numpy as jnp

    from cudf_tpu.ops.pack import PackedColumns, unpack
    from cudf_tpu.frame.dataframe import DataFrame
    from cudf_tpu.frame.index import default_index

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError("not a tpudf file")
        mlen = int.from_bytes(f.read(8), "little")
        meta = f.read(mlen)
        dlen = int.from_bytes(f.read(8), "little")
        blob = np.frombuffer(f.read(dlen), np.uint8)
    t = unpack(PackedColumns(meta, jnp.asarray(blob)))
    return DataFrame._from(t, default_index(t.num_rows))
