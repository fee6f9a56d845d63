"""Dictionary (categorical) encode/decode.

TPU-native equivalent of libcudf dictionary
(reference: cpp/src/dictionary/, match_dictionaries used before joins
join.cu:37-41).  Strings hostile to a vector machine get dictionary-encoded
early; groupby/join/sort then operate on int32 codes — the idiomatic TPU
path for string-keyed queries (SURVEY.md §7 hard-part (c)).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops import copying
from cudf_tpu.ops.row_ops import equality_keys, lex_sort_indices
from cudf_tpu.ops.stream_compaction import filter_indices


def encode(col: Column) -> Column:
    """Value column → DICTIONARY32 (sorted unique keys + int32 codes)."""
    if col.dtype.is_dictionary:
        return col
    codes, keys = factorize(col, sort=True)
    return Column(
        dt.dictionary_dtype(keys.dtype),
        col.length,
        data=codes,
        validity=col.validity,
        children=(keys,),
    )


def factorize(col: Column, sort: bool = True) -> Tuple[jnp.ndarray, Column]:
    """(int32 codes, unique keys).  codes of null rows are 0 but masked by
    the column validity (pandas factorize uses -1; the frame layer maps)."""
    n = col.length
    if n == 0:
        return jnp.zeros((0,), jnp.int32), Column.empty(col.dtype)
    base = col.decode_dictionary() if col.dtype.is_dictionary else col
    order = lex_sort_indices([base], stable=True)  # nulls last
    neq = None
    for k in equality_keys(base):
        s = jnp.take(k, order)
        d = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
        neq = d if neq is None else (neq | d)
    gid_sorted = jnp.cumsum(neq.astype(jnp.int64)) - 1
    from cudf_tpu.ops._utils import inverse_permutation

    codes = jnp.take(gid_sorted, inverse_permutation(order))
    if base.validity is not None:
        codes = jnp.where(base.validity, codes, 0)  # null rows: in-range code, masked
    # unique rows: first of each run; drop the trailing null run if present
    rep_sorted_pos = filter_indices(neq)
    rep_rows = jnp.take(order, rep_sorted_pos)
    keys = copying.gather(base, rep_rows, bounds_check=False)
    if base.validity is not None and base.null_count > 0:
        # nulls sorted last → last run is the null run
        keys = copying.slice(keys, 0, keys.length - 1)
    if not sort:
        # reorder keys by first appearance (pandas factorize default)
        first_rows = rep_rows if base.null_count == 0 or base.validity is None else rep_rows[:-1]
        appearance = jnp.argsort(first_rows)
        keys = copying.gather(keys, appearance.astype(jnp.int64), bounds_check=False)
        remap = jnp.zeros((appearance.shape[0],), jnp.int64).at[appearance].set(
            jnp.arange(appearance.shape[0], dtype=jnp.int64)
        )
        codes = jnp.take(remap, jnp.clip(codes, 0, appearance.shape[0] - 1))
    return codes.astype(jnp.int32), keys


def match_dictionaries(a: Column, b: Column) -> Tuple[Column, Column]:
    """Re-encode two dictionary columns over the union key set
    (cudf::dictionary::match_dictionaries) so joins compare codes only."""
    av = a.decode_dictionary()
    bv = b.decode_dictionary()
    union = copying.concatenate([av, bv])
    enc = encode(union)
    ea = Column(enc.dtype, a.length, data=enc.data[: a.length],
                validity=av.validity, children=enc.children)
    eb = Column(enc.dtype, b.length, data=enc.data[a.length:],
                validity=bv.validity, children=enc.children)
    return ea, eb


def set_keys(col: Column, new_keys: Column) -> Column:
    """Re-encode codes against a new key set (cudf::dictionary::set_keys)."""
    from cudf_tpu.ops.search import contains, lower_bound

    values = col.decode_dictionary()
    pos = lower_bound(new_keys, values)
    found = contains(new_keys, values)
    validity = found if col.validity is None else (col.validity & found)
    if bool(jnp.all(validity)):
        validity = None
    return Column(
        dt.dictionary_dtype(new_keys.dtype), col.length,
        data=pos.astype(jnp.int32), validity=validity, children=(new_keys,),
    )
