"""Struct-column operations (reference: cpp/src/structs/).

Layout: parallel field children + row validity.  Comparisons flatten to the
field columns via the row-operator layer (structs/flatten analogy).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column


def make_struct_column(fields: Sequence[Tuple[str, Column]],
                       validity: Optional[jnp.ndarray] = None) -> Column:
    names = [n for n, _ in fields]
    children = [c for _, c in fields]
    n = children[0].length
    dtype = dt.struct_dtype([(nm, c.dtype) for nm, c in fields])
    return Column(dtype, n, children=tuple(children), validity=validity)


def from_pydicts(dicts) -> Column:
    keys = list(dict.fromkeys(k for d in dicts if d is not None for k in d))
    mask = np.array([d is not None for d in dicts])
    fields = []
    for k in keys:
        fields.append((k, Column.from_sequence(
            [None if d is None else d.get(k) for d in dicts]
        )))
    validity = None if mask.all() else jnp.asarray(mask)
    return make_struct_column(fields, validity)


def to_pydicts(col: Column):
    names = [n for n, _ in col.dtype.fields]
    cols = [c.to_pylist() for c in col.children]
    valid = np.asarray(col.validity) if col.validity is not None else None
    out = []
    for i in range(col.length):
        if valid is not None and not valid[i]:
            out.append(None)
        else:
            out.append({n: cols[j][i] for j, n in enumerate(names)})
    return out


def field(col: Column, name_or_idx) -> Column:
    """struct.field access (the .struct accessor core)."""
    names = [n for n, _ in col.dtype.fields]
    i = name_or_idx if isinstance(name_or_idx, int) else names.index(name_or_idx)
    child = col.children[i]
    if col.validity is not None:
        from cudf_tpu.core import bitmask as bm

        return child.with_validity(bm.and_masks(child.validity, col.validity))
    return child


def explode_to_table(col: Column):
    """struct → one column per field (used by .struct.explode())."""
    from cudf_tpu.core.table import Table

    names = [n for n, _ in col.dtype.fields]
    return Table({n: field(col, n) for n in names})
