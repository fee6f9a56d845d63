"""Table — an ordered collection of equal-length Columns, as a JAX pytree.

TPU-native equivalent of libcudf's ``cudf::table``/``table_view``
(reference: cpp/src/table/, cpp/include/cudf/table/table.hpp) merged with
cudf-python's ``ColumnAccessor`` ordered label→column mapping
(reference: python/cudf/cudf/core/column_accessor.py:113).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax

from cudf_tpu.core.column import Column


class Table:
    __slots__ = ("_names", "_columns")

    def __init__(self, columns: Optional[Dict[str, Column]] = None):
        columns = columns or {}
        self._names: Tuple[str, ...] = tuple(columns.keys())
        self._columns: Tuple[Column, ...] = tuple(columns.values())
        if self._columns:
            n = self._columns[0].length
            for name, c in zip(self._names, self._columns):
                if c.length != n:
                    raise ValueError(
                        f"column {name!r} has length {c.length}, expected {n}"
                    )

    @classmethod
    def from_pairs(cls, names: Sequence[str], columns: Sequence[Column]) -> "Table":
        t = cls.__new__(cls)
        t._names = tuple(names)
        t._columns = tuple(columns)
        return t

    # pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        return self._columns, self._names

    @classmethod
    def tree_unflatten(cls, names, columns):
        return cls.from_pairs(names, columns)

    # ----------------------------------------------------------------
    @property
    def num_rows(self) -> int:
        return self._columns[0].length if self._columns else 0

    @property
    def num_columns(self) -> int:
        return len(self._columns)

    @property
    def names(self) -> Tuple[str, ...]:
        return self._names

    @property
    def columns(self) -> Tuple[Column, ...]:
        return self._columns

    @property
    def nbytes(self) -> int:
        return sum(c.nbytes for c in self._columns)

    def __len__(self) -> int:
        return self.num_rows

    def __contains__(self, name) -> bool:
        return name in self._names

    def __getitem__(self, name: str) -> Column:
        try:
            return self._columns[self._names.index(name)]
        except ValueError:
            raise KeyError(name) from None

    def column(self, i: int) -> Column:
        return self._columns[i]

    def items(self) -> Iterable[Tuple[str, Column]]:
        return zip(self._names, self._columns)

    def select(self, names: Sequence[str]) -> "Table":
        return Table.from_pairs(tuple(names), tuple(self[n] for n in names))

    def select_by_index(self, idx: Sequence[int]) -> "Table":
        return Table.from_pairs(
            tuple(self._names[i] for i in idx), tuple(self._columns[i] for i in idx)
        )

    def drop(self, names: Sequence[str]) -> "Table":
        drop = set(names)
        keep = [(n, c) for n, c in self.items() if n not in drop]
        return Table.from_pairs([n for n, _ in keep], [c for _, c in keep])

    def insert(self, name: str, column: Column, loc: Optional[int] = None) -> "Table":
        names, cols = list(self._names), list(self._columns)
        if name in names:
            i = names.index(name)
            cols[i] = column
        elif loc is None:
            names.append(name)
            cols.append(column)
        else:
            names.insert(loc, name)
            cols.insert(loc, column)
        return Table.from_pairs(names, cols)

    def rename(self, mapping: Dict[str, str]) -> "Table":
        return Table.from_pairs([mapping.get(n, n) for n in self._names], self._columns)

    def to_dict(self) -> Dict[str, Column]:
        return dict(self.items())

    # interop --------------------------------------------------------
    def __arrow_c_array__(self, requested_schema=None):
        """Arrow PyCapsule protocol — the table as one struct-typed
        record batch (C-Data, no pyarrow on the path)."""
        from cudf_tpu import arrow_cdata

        return arrow_cdata.table_capsules(self, requested_schema=requested_schema)

    def __arrow_c_stream__(self, requested_schema=None):
        from cudf_tpu import arrow_cdata

        return arrow_cdata.table_stream_capsule(self, requested_schema=requested_schema)

    def to_arrow(self):
        import pyarrow as pa

        return pa.table({n: c.to_arrow() for n, c in self.items()})

    @classmethod
    def from_arrow(cls, tbl) -> "Table":
        return cls({name: Column.from_arrow(tbl.column(name)) for name in tbl.column_names})

    def to_pandas(self):
        return self.to_arrow().to_pandas()

    @classmethod
    def from_pandas(cls, df) -> "Table":
        # per-column via as_column (not pa.Table.from_pandas wholesale):
        # preserves pandas nullable/arrow extension provenance so Int64 /
        # string / ArrowDtype columns round-trip exactly; iloc handles
        # duplicate labels
        from cudf_tpu.core.column import as_column

        return cls.from_pairs(
            list(df.columns),
            [as_column(df.iloc[:, i]) for i in range(df.shape[1])])

    def __repr__(self) -> str:
        cols = ", ".join(f"{n}: {c.dtype!r}" for n, c in self.items())
        return f"Table[{self.num_rows} rows]({cols})"


jax.tree_util.register_pytree_node(Table, Table.tree_flatten, Table.tree_unflatten)
