"""Index / RangeIndex / MultiIndex.

TPU-native equivalent of cudf-python's index layer
(reference: python/cudf/cudf/core/index.py, multiindex.py).
RangeIndex stays lazy (no device buffer) until materialized, matching the
reference's RangeIndex optimization.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column, as_column
from cudf_tpu.ops import copying


class Index:
    def __init__(self, data=None, name=None, dtype=None, column: Optional[Column] = None):
        if column is not None:
            self._column = column
        else:
            if isinstance(data, Index):
                self._column = data._column
                name = name if name is not None else data.name
            else:
                if name is None and hasattr(data, "name") and not isinstance(
                        data, (str, bytes)):
                    # keep pandas Index/Series names through conversion
                    name = data.name
                self._column = _to_index_column(data, dtype)
        self.name = name

    # ------------------------------------------------------------------
    @property
    def dtype(self):
        return self._column.dtype

    def __len__(self) -> int:
        return self._column.length

    @property
    def size(self) -> int:
        return len(self)

    @property
    def values(self):
        return self._column.to_numpy()

    def to_numpy(self):
        return self._column.to_numpy()

    def to_pandas(self):
        import pandas as pd

        from cudf_tpu.frame.series import column_to_pandas_array

        # column_to_pandas_array keeps nullable/arrow extension dtypes
        # (Int64 group keys etc.); plain columns come back as numpy
        return pd.Index(column_to_pandas_array(self._column, pd),
                        name=self.name)

    def to_pylist(self):
        return self._column.to_pylist()

    def take(self, indices: jnp.ndarray) -> "Index":
        return Index(column=copying.gather(self._column, indices, bounds_check=False), name=self.name)

    def append(self, other: "Index") -> "Index":
        return Index(
            column=copying.concatenate([self._column, _as_index(other)._column]), name=self.name
        )

    def slice(self, start: int, stop: int) -> "Index":
        return Index(column=copying.slice(self._column, start, stop), name=self.name)

    def equals(self, other) -> bool:
        other = _as_index(other)
        if len(self) != len(other):
            return False
        from cudf_tpu.ops.binaryop import binary_operation

        if len(self) == 0:
            return True
        try:
            eq = binary_operation(self._column, other._column, "null_equals")
        except TypeError:
            return False
        return bool(jnp.all(eq.data))

    def copy(self):
        return Index(column=self._column, name=self.name)

    def rename(self, name):
        return Index(column=self._column, name=name)

    def __getitem__(self, i):
        if isinstance(i, slice):
            start, stop, step = i.indices(len(self))
            if step == 1:
                return self.slice(start, stop)
            return self.take(jnp.arange(start, stop, step, dtype=jnp.int64))
        return self._column[i]

    def __repr__(self):
        return f"Index({self.to_pylist()[:20]}, name={self.name!r}, dtype={self.dtype!r})"

    def __iter__(self):
        return iter(self.to_pylist())

    @property
    def is_unique(self) -> bool:
        from cudf_tpu.ops.stream_compaction import distinct_count

        return distinct_count(self._column, dropna=False) == len(self)

    def get_indexer_for(self, labels) -> jnp.ndarray:
        """positions of labels in this index (first match), -1 if missing."""
        needles = _to_index_column(labels, None)
        from cudf_tpu.ops.join import _aligned_keys, _lex_searchsorted
        import jax

        l_ops, n_ops = _aligned_keys([self._column], [needles])
        nh = self._column.length
        hidx = jnp.arange(nh, dtype=jnp.int64)
        res = jax.lax.sort([*l_ops, hidx], num_keys=len(l_ops), is_stable=True)
        sorted_ops, order = list(res[:-1]), res[-1]
        lo = _lex_searchsorted(sorted_ops, n_ops, "left")
        hi = _lex_searchsorted(sorted_ops, n_ops, "right")
        found = hi > lo
        return jnp.where(found, jnp.take(order, jnp.clip(lo, 0, max(nh - 1, 0))), -1)

    def union(self, other) -> "Index":
        from cudf_tpu.ops import sort as sort_ops, stream_compaction as sc

        both = copying.concatenate([self._column, _as_index(other)._column])
        idx = sc.distinct_indices([both], "first")
        col = copying.gather(both, idx, bounds_check=False)
        order = sort_ops.sorted_order([col])
        return Index(column=copying.gather(col, order, bounds_check=False),
                     name=self.name if self.name == _as_index(other).name else None)

    def intersection(self, other) -> "Index":
        from cudf_tpu.ops import search as search_ops, sort as sort_ops, stream_compaction as sc

        other = _as_index(other)
        mask = search_ops.contains(other._column, self._column)
        keep = sc.filter_indices(mask)
        col = copying.gather(self._column, keep, bounds_check=False)
        idx = sc.distinct_indices([col], "first")
        col = copying.gather(col, idx, bounds_check=False)
        order = sort_ops.sorted_order([col])
        return Index(column=copying.gather(col, order, bounds_check=False), name=self.name)

    def difference(self, other) -> "Index":
        from cudf_tpu.ops import search as search_ops, sort as sort_ops, stream_compaction as sc

        other = _as_index(other)
        mask = ~search_ops.contains(other._column, self._column)
        keep = sc.filter_indices(mask)
        col = copying.gather(self._column, keep, bounds_check=False)
        idx = sc.distinct_indices([col], "first")
        col = copying.gather(col, idx, bounds_check=False)
        order = sort_ops.sorted_order([col])
        return Index(column=copying.gather(col, order, bounds_check=False), name=self.name)

    def sort_values(self, ascending=True) -> "Index":
        from cudf_tpu.ops import sort as sort_ops

        order = sort_ops.sorted_order([self._column], [ascending])
        return self.take(order)

    def argsort(self, ascending=True):
        from cudf_tpu.ops import sort as sort_ops
        import numpy as np

        return np.asarray(sort_ops.sorted_order([self._column], [ascending]))

    def unique(self) -> "Index":
        from cudf_tpu.ops import stream_compaction as sc

        idx = sc.distinct_indices([self._column], "first")
        return Index(column=copying.gather(self._column, idx, bounds_check=False), name=self.name)

    def isin(self, values):
        from cudf_tpu.core.column import as_column
        from cudf_tpu.ops import search as search_ops
        import numpy as np

        vals = as_column(list(values))
        return np.asarray(search_ops.contains(vals, self._column))

    def astype(self, dtype_) -> "Index":
        from cudf_tpu.ops.unary import cast
        from cudf_tpu.core import dtypes as _dt

        return Index(column=cast(self._column, _dt.dtype(dtype_)), name=self.name)

    def min(self):
        from cudf_tpu.ops import reductions

        return reductions.min(self._column)

    def max(self):
        from cudf_tpu.ops import reductions

        return reductions.max(self._column)

    def to_series(self):
        from cudf_tpu.frame.series import Series

        return Series._from(self._column, self.copy(), self.name)

    def to_frame(self, name=None):
        from cudf_tpu.frame.dataframe import DataFrame

        nm = name if name is not None else (self.name if self.name is not None else "index")
        return DataFrame({nm: self._column})

    def get_loc(self, key):
        pos = self._positions_of(key)
        if pos.shape[0] == 0:
            raise KeyError(key)
        return int(pos[0]) if pos.shape[0] == 1 else np.asarray(pos)

    @property
    def nlevels(self):
        return 1

    def _positions_of(self, label) -> jnp.ndarray:
        """All positions equal to label (for duplicate-label loc)."""
        from cudf_tpu.ops.binaryop import binary_operation
        from cudf_tpu.ops.stream_compaction import filter_indices

        eq = binary_operation(self._column, label, "eq")
        m = eq.data
        if eq.validity is not None:
            m = m & eq.validity
        return filter_indices(m)


class RangeIndex(Index):
    def __init__(self, start=0, stop=None, step=1, name=None):
        if stop is None:
            start, stop = 0, start
        self.start, self.stop, self.step = int(start), int(stop), int(step)
        self.name = name
        self._materialized: Optional[Column] = None

    @property
    def _column(self) -> Column:
        if self._materialized is None:
            self._materialized = copying.sequence(len(self), self.start, self.step, dt.INT64)
        return self._materialized

    @_column.setter
    def _column(self, v):  # pragma: no cover
        self._materialized = v

    def __len__(self) -> int:
        if self.step > 0:
            return max(0, -(-(self.stop - self.start) // self.step))
        return max(0, -(-(self.start - self.stop) // -self.step))

    @property
    def dtype(self):
        return dt.INT64

    def to_pandas(self):
        import pandas as pd

        return pd.RangeIndex(self.start, self.stop, self.step, name=self.name)

    def slice(self, start: int, stop: int) -> "RangeIndex":
        n = len(self)
        start = max(0, min(start, n))
        stop = max(start, min(stop, n))
        return RangeIndex(
            self.start + start * self.step, self.start + stop * self.step, self.step, self.name
        )

    def equals(self, other) -> bool:
        if isinstance(other, RangeIndex):
            if len(self) != len(other):
                return False
            if len(self) == 0:
                return True
            return (self.start == other.start) and (self.step == other.step)
        return super().equals(other)

    def copy(self):
        return RangeIndex(self.start, self.stop, self.step, self.name)

    def rename(self, name):
        return RangeIndex(self.start, self.stop, self.step, name)

    def __getitem__(self, i):
        if isinstance(i, slice):
            start, stop, step = i.indices(len(self))
            return RangeIndex(
                self.start + start * self.step,
                self.start + stop * self.step,
                self.step * step,
                self.name,
            )
        if i < 0:
            i += len(self)
        return self.start + i * self.step

    def __repr__(self):
        return f"RangeIndex(start={self.start}, stop={self.stop}, step={self.step})"


class MultiIndex(Index):
    """Multi-level index as parallel columns (core/multiindex.py analogue)."""

    def __init__(self, columns: Sequence[Column], names: Sequence[Optional[str]]):
        self._columns: Tuple[Column, ...] = tuple(columns)
        self.names: Tuple[Optional[str], ...] = tuple(names)
        self.name = None

    @property
    def _column(self) -> Column:
        raise TypeError("MultiIndex has multiple columns")

    @property
    def nlevels(self) -> int:
        return len(self._columns)

    def __len__(self) -> int:
        return self._columns[0].length if self._columns else 0

    @property
    def dtype(self):
        return np.dtype(object)

    def get_level_values(self, level) -> Index:
        i = level if isinstance(level, int) else self.names.index(level)
        return Index(column=self._columns[i], name=self.names[i])

    def take(self, indices) -> "MultiIndex":
        return MultiIndex(
            [copying.gather(c, indices, bounds_check=False) for c in self._columns], self.names
        )

    def slice(self, start: int, stop: int) -> "MultiIndex":
        return MultiIndex([copying.slice(c, start, stop) for c in self._columns], self.names)

    def append(self, other: "MultiIndex") -> "MultiIndex":
        return MultiIndex(
            [copying.concatenate([a, b]) for a, b in zip(self._columns, other._columns)],
            self.names,
        )

    def to_pandas(self):
        import pandas as pd

        arrays = [c.to_arrow().to_pandas() for c in self._columns]
        return pd.MultiIndex.from_arrays(arrays, names=self.names)

    def to_pylist(self):
        lists = [c.to_pylist() for c in self._columns]
        return list(zip(*lists))

    def equals(self, other) -> bool:
        if not isinstance(other, MultiIndex) or other.nlevels != self.nlevels:
            return False
        return all(
            Index(column=a).equals(Index(column=b))
            for a, b in zip(self._columns, other._columns)
        )

    def copy(self):
        return MultiIndex(self._columns, self.names)

    def __repr__(self):
        return f"MultiIndex({self.to_pylist()[:10]}, names={list(self.names)})"


def _to_index_column(data, dtype) -> Column:
    if isinstance(data, Column):
        return data
    if data is None:
        data = []
    return as_column(data, dtype=dtype) if not np.isscalar(data) else as_column([data], dtype=dtype)


def _as_index(obj) -> Index:
    if isinstance(obj, Index):
        return obj
    import pandas as pd

    if isinstance(obj, pd.MultiIndex):
        from cudf_tpu.core.column import as_column

        return MultiIndex(
            [as_column(obj.get_level_values(i)) for i in range(obj.nlevels)],
            list(obj.names),
        )
    return Index(obj)


def default_index(n: int) -> RangeIndex:
    return RangeIndex(n)
