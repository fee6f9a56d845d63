"""Table serialization: pack a Table into one contiguous buffer + metadata.

TPU-native equivalent of cudf::pack / contiguous_split / chunked_pack
(reference: cpp/include/cudf/contiguous_split.hpp:70-113) — the wire
format for shuffle and spill: all column buffers concatenated into a
single uint8 device buffer plus a host-side metadata blob, so a table
moves with ONE transfer/DMA.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.core.table import Table


@dataclass
class PackedColumns:
    metadata: bytes          # host json blob (schema + buffer spans)
    gpu_data: jnp.ndarray    # ONE contiguous uint8 device buffer


def _align8(x: int) -> int:
    return (x + 7) & ~7


def _collect(col: Column, bufs: List[np.ndarray], meta: Dict) -> Dict:
    node: Dict = {"dtype": col.dtype.id.name, "length": col.length, "scale": col.dtype.scale}
    if col.dtype.fields:
        node["fields"] = [n for n, _ in col.dtype.fields]
    if col.dtype.value_type is not None:
        node["value_type"] = col.dtype.value_type.id.name

    def add(buf, name, np_dtype):
        if buf is None:
            node[name] = None
            return
        host = np.asarray(buf)
        idx = len(bufs)
        bufs.append(host.view(np.uint8) if host.dtype != np.uint8 else host)
        node[name] = {"buf": idx, "dtype": str(host.dtype), "n": int(host.shape[0])}

    add(col.data, "data", None)
    add(col.validity, "validity", None)
    add(col.offsets, "offsets", None)
    node["children"] = [_collect(c, bufs, meta) for c in col.children]
    return node


def pack(table: Table) -> PackedColumns:
    bufs: List[np.ndarray] = []
    meta = {
        "names": list(table.names),
        "columns": [_collect(c, bufs, {}) for c in table.columns],
    }
    spans = []
    pos = 0
    for b in bufs:
        pos = _align8(pos)
        spans.append([pos, int(b.nbytes)])
        pos += b.nbytes
    total = _align8(pos)
    blob = np.zeros(total, np.uint8)
    for b, (off, nb) in zip(bufs, spans):
        blob[off:off + nb] = b.reshape(-1).view(np.uint8)
    meta["spans"] = spans
    return PackedColumns(json.dumps(meta).encode(), jnp.asarray(blob))


def _rebuild(node: Dict, blob: np.ndarray, spans) -> Column:
    def get(name):
        info = node.get(name)
        if info is None:
            return None
        off, nb = spans[info["buf"]]
        raw = blob[off:off + nb]
        return jnp.asarray(np.frombuffer(raw.tobytes(), dtype=np.dtype(info["dtype"])))

    tid = dt.TypeId[node["dtype"]]
    if tid == dt.TypeId.LIST:
        vt = dt.DType(dt.TypeId[node["value_type"]]) if "value_type" in node else None
        dtype = dt.DType(tid, value_type=vt)
    elif tid == dt.TypeId.STRUCT:
        children = [_rebuild(c, blob, spans) for c in node["children"]]
        names = node.get("fields", [str(i) for i in range(len(children))])
        dtype = dt.struct_dtype([(n, c.dtype) for n, c in zip(names, children)])
        return Column(dtype, node["length"], validity=get("validity"), children=tuple(children))
    elif tid == dt.TypeId.DICTIONARY32:
        vt = dt.DType(dt.TypeId[node["value_type"]]) if "value_type" in node else dt.STRING
        dtype = dt.DType(tid, value_type=vt)
    else:
        dtype = dt.DType(tid, scale=node.get("scale", 0))
    children = tuple(_rebuild(c, blob, spans) for c in node["children"])
    return Column(dtype, node["length"], data=get("data"), validity=get("validity"),
                  offsets=get("offsets"), children=children)


def unpack(packed: PackedColumns) -> Table:
    meta = json.loads(packed.metadata.decode())
    blob = np.asarray(packed.gpu_data)
    cols = [_rebuild(c, blob, meta["spans"]) for c in meta["columns"]]
    return Table.from_pairs(meta["names"], cols)


def contiguous_split(table: Table, splits: List[int]) -> List[PackedColumns]:
    """Split + pack each piece (cudf::contiguous_split)."""
    from cudf_tpu.ops import copying

    bounds = [0, *splits, table.num_rows]
    out = []
    for i in range(len(bounds) - 1):
        piece = Table.from_pairs(
            table.names,
            [copying.slice(c, bounds[i], bounds[i + 1]) for c in table.columns],
        )
        out.append(pack(piece))
    return out
