"""Column — the owning columnar container, as a JAX pytree.

TPU-native equivalent of libcudf's ``cudf::column`` / ``column_view``
(reference: cpp/include/cudf/column/column.hpp:36-116, column_view.hpp:44).

Arrow-compatible layout over flat jnp HBM buffers:
- fixed-width:   ``data``  = values buffer (storage dtype; timestamps are
                 int64 ticks), ``validity`` = bool[n] or None (all valid).
- STRING:        ``data``  = uint8 chars buffer, ``offsets`` = int64[n+1]
                 (64-bit offsets from day one — the reference gates these
                 behind a large-strings threshold, strings/utilities.cu:152).
- LIST:          ``offsets`` = int64[n+1], ``children`` = (values column,).
- STRUCT:        ``children`` = field columns.
- DICTIONARY32:  ``data`` = int32 codes, ``children`` = (keys column,).

Column is registered as a pytree: buffers are leaves, (dtype, length) is
static aux data — so whole tables flow through ``jax.jit`` / ``shard_map``
boundaries and every (op, dtype, rank) combination compiles exactly once.

Unlike libcudf there is no user-visible stream parameter: XLA's async
dispatch plays the role of CUDA streams.
"""

from __future__ import annotations

from typing import Any, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import bitmask as bm
from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.dtypes import DType, TypeId


class Column:
    __slots__ = ("data", "validity", "offsets", "children", "dtype", "length",
                 "_null_count", "__weakref__")

    def __init__(
        self,
        dtype: DType,
        length: int,
        data: Optional[jnp.ndarray] = None,
        validity: Optional[jnp.ndarray] = None,
        offsets: Optional[jnp.ndarray] = None,
        children: Tuple["Column", ...] = (),
        null_count: Optional[int] = None,
    ):
        self.dtype = dtype
        self.length = int(length)
        self.data = data
        self.validity = validity
        self.offsets = offsets
        self.children = tuple(children)
        self._null_count = null_count

    # ------------------------------------------------------------------
    # pytree protocol
    # ------------------------------------------------------------------
    def tree_flatten(self):
        leaves = (self.data, self.validity, self.offsets, self.children)
        aux = (self.dtype, self.length)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data, validity, offsets, children = leaves
        dtype, length = aux
        return cls(dtype, length, data=data, validity=validity, offsets=offsets, children=tuple(children))

    # ------------------------------------------------------------------
    # basic properties
    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self.length

    @property
    def size(self) -> int:
        return self.length

    @property
    def null_count(self) -> int:
        if self._null_count is None:
            self._null_count = bm.null_count(self.validity, self.length)
        return self._null_count

    @property
    def has_nulls(self) -> bool:
        return self.validity is not None and self.null_count > 0

    @property
    def nbytes(self) -> int:
        total = 0
        if self.data is not None:
            total += self.data.nbytes
        if self.validity is not None:
            total += self.validity.nbytes
        if self.offsets is not None:
            total += self.offsets.nbytes
        for c in self.children:
            total += c.nbytes
        return total

    def copy(self) -> "Column":
        return Column(
            self.dtype,
            self.length,
            data=self.data,
            validity=self.validity,
            offsets=self.offsets,
            children=self.children,
            null_count=self._null_count,
        )

    def with_validity(self, validity: Optional[jnp.ndarray]) -> "Column":
        return Column(
            self.dtype, self.length, data=self.data, validity=validity,
            offsets=self.offsets, children=self.children,
        )

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def from_numpy(cls, arr: np.ndarray, mask: Optional[np.ndarray] = None) -> "Column":
        """Build from a 1-D numpy array.  ``mask`` is True where valid."""
        arr = np.asarray(arr)
        if arr.ndim != 1:
            raise ValueError("Column.from_numpy expects a 1-D array")
        if arr.dtype.kind in ("U", "S", "O"):
            return cls.from_strings(arr.tolist(), mask=mask)
        logical = dt.dtype(arr.dtype)
        if arr.dtype.kind in ("M", "m"):
            storage = arr.astype(np.int64) if logical.storage == np.int64 else arr.astype(np.int32)
            if mask is None:
                natmask = ~np.isnat(arr)
                if not natmask.all():
                    mask = natmask
        else:
            storage = arr
        validity = bm.from_numpy_mask(mask)
        return cls(logical, arr.shape[0], data=jnp.asarray(storage), validity=validity)

    @classmethod
    def from_jnp(cls, arr: jnp.ndarray, dtype: Optional[DType] = None,
                 validity: Optional[jnp.ndarray] = None) -> "Column":
        logical = dtype if dtype is not None else dt.dtype(np.dtype(arr.dtype))
        return cls(logical, arr.shape[0], data=arr, validity=validity)

    @classmethod
    def from_sequence(cls, seq: Sequence[Any], dtype: Optional[DType] = None) -> "Column":
        """Build from a python sequence; None / NaN-likes become nulls."""
        seq = list(seq)
        n = len(seq)
        import decimal as _pydec

        want = dt.dtype(dtype) if dtype is not None else None
        if (want is not None and want.is_decimal) or (
            want is None and any(isinstance(v, _pydec.Decimal) for v in seq)
        ):
            from cudf_tpu.ops.decimal import cast_to_decimal, from_decimals

            col = from_decimals(seq)
            return cast_to_decimal(col, want) if want is not None else col
        if any(isinstance(v, (list, tuple, np.ndarray)) for v in seq):
            from cudf_tpu.ops.lists import from_pylists

            return from_pylists([None if v is None else list(v) for v in seq])
        if any(isinstance(v, dict) for v in seq):
            from cudf_tpu.ops.structs import from_pydicts

            return from_pydicts(seq)
        is_null = np.array([_is_null(v) for v in seq], dtype=bool)
        nonnull = [v for v, m in zip(seq, is_null) if not m]
        if dtype is not None:
            dtype = dt.dtype(dtype)
        if dtype is None:
            dtype = _infer_dtype(nonnull)
        if dtype.is_temporal:
            # iNaT integer ticks are NaT (pandas M8/m8 sentinel)
            inat = np.array([isinstance(v, (int, np.integer))
                             and int(v) == -(2 ** 63) for v in seq], bool)
            if inat.any():
                is_null = is_null | inat
                seq = [0 if m else v for v, m in zip(seq, inat)]
                nonnull = [v for v, m in zip(seq, is_null) if not m]
        if dtype.is_string:
            vals = ["" if m else str(v) for v, m in zip(seq, is_null)]
            return cls.from_strings(vals, mask=None if not is_null.any() else ~is_null)
        storage = dtype.storage
        fill = _null_fill_value(dtype)
        np_vals = np.empty(n, dtype=storage)
        for i, (v, m) in enumerate(zip(seq, is_null)):
            np_vals[i] = fill if m else _coerce_value(v, dtype)
        mask = None if not is_null.any() else ~is_null
        validity = bm.from_numpy_mask(mask)
        return cls(dtype, n, data=jnp.asarray(np_vals), validity=validity)

    @classmethod
    def from_strings(cls, strings: Sequence[str], mask: Optional[np.ndarray] = None) -> "Column":
        """Host-side string column factory (offsets + chars buffers).

        Equivalent of cudf::make_strings_column
        (cpp/src/strings/strings_column_factories.cu).
        """
        encoded = [("" if s is None else s).encode("utf-8") for s in strings]
        if mask is None and any(s is None for s in strings):
            mask = np.array([s is not None for s in strings], dtype=bool)
        lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=len(encoded))
        offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        chars = np.frombuffer(b"".join(encoded), dtype=np.uint8).copy()
        validity = bm.from_numpy_mask(mask)
        return cls(
            dt.STRING,
            len(encoded),
            data=jnp.asarray(chars),
            offsets=jnp.asarray(offsets),
            validity=validity,
        )

    @classmethod
    def full(cls, length: int, value: Any, dtype: Optional[DType] = None) -> "Column":
        if dtype is None:
            dtype = _infer_dtype([value] if not _is_null(value) else [])
        dtype = dt.dtype(dtype)
        if _is_null(value):
            if dtype.is_string:
                return cls(
                    dt.STRING, length,
                    data=jnp.zeros((0,), jnp.uint8),
                    offsets=jnp.zeros((length + 1,), jnp.int64),
                    validity=jnp.zeros((length,), jnp.bool_),
                )
            data = jnp.full((length,), _null_fill_value(dtype), dtype=dtype.storage)
            return cls(dtype, length, data=data, validity=jnp.zeros((length,), jnp.bool_))
        if dtype.is_string:
            return cls.from_strings([value] * length)
        data = jnp.full((length,), _coerce_value(value, dtype), dtype=dtype.storage)
        return cls(dtype, length, data=data)

    @classmethod
    def empty(cls, dtype: DType) -> "Column":
        dtype = dt.dtype(dtype)
        if dtype.is_string:
            return cls(dtype, 0, data=jnp.zeros((0,), jnp.uint8), offsets=jnp.zeros((1,), jnp.int64))
        return cls(dtype, 0, data=jnp.zeros((0,), dtype.storage))

    @classmethod
    def from_arrow(cls, arr) -> "Column":
        """Build from a pyarrow Array / ChunkedArray."""
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_dictionary(arr.type):
            keys = cls.from_arrow(arr.dictionary)
            codes = cls.from_arrow(arr.indices)
            codes_data = codes.data.astype(jnp.int32)
            return cls(
                dt.dictionary_dtype(keys.dtype), len(arr),
                data=codes_data, validity=codes.validity, children=(keys,),
            )
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            arr = arr.cast(pa.large_list(arr.type.value_type))
            n = len(arr)
            off = np.asarray(arr.offsets)[arr.offset:arr.offset + n + 1].astype(np.int64)
            child_full = cls.from_arrow(arr.values)
            base = int(off[0])
            validity = None
            if arr.null_count > 0:
                validity = jnp.asarray(~np.asarray(arr.is_null()))
            from cudf_tpu.ops.lists import make_list_column
            from cudf_tpu.ops import copying as _cp

            child = _cp.slice(child_full, base, int(off[-1]))
            return make_list_column(jnp.asarray(off - base), child, validity)
        if pa.types.is_struct(arr.type):
            from cudf_tpu.ops.structs import make_struct_column

            fields = []
            for i in range(arr.type.num_fields):
                f = arr.type.field(i)
                fields.append((f.name, cls.from_arrow(arr.field(i))))
            validity = None
            if arr.null_count > 0:
                validity = jnp.asarray(~np.asarray(arr.is_null()))
            return make_struct_column(fields, validity)
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.large_string())
            bufs = arr.buffers()
            nullbuf, offbuf, charbuf = bufs[0], bufs[1], bufs[2]
            n = len(arr)
            off = np.frombuffer(offbuf, dtype=np.int64, count=n + 1 + arr.offset)[arr.offset:]
            base = off[0]
            chars = np.frombuffer(charbuf, dtype=np.uint8)[base:off[-1]] if charbuf is not None else np.zeros(0, np.uint8)
            off = off - base
            validity = None
            if nullbuf is not None and arr.null_count > 0:
                valb = np.frombuffer(nullbuf, dtype=np.uint8)
                bits = np.unpackbits(valb, bitorder="little")[arr.offset:arr.offset + n]
                validity = jnp.asarray(bits.astype(bool))
            return cls(dt.STRING, n, data=jnp.asarray(chars.copy()),
                       offsets=jnp.asarray(off.copy()), validity=validity)
        if pa.types.is_timestamp(arr.type) and arr.type.tz is not None:
            # arrow tz-aware ticks are UTC epochs — exactly our storage
            naive = cls.from_arrow(arr.cast(pa.timestamp(arr.type.unit)))
            return cls(dt.DType(naive.dtype.id, tz=str(arr.type.tz)),
                       naive.length, data=naive.data, validity=naive.validity)
        if pa.types.is_decimal(arr.type):
            # arrow decimal(p, s): value = unscaled * 10**-s → our scale = -s
            vals = arr.to_pylist()
            mask = np.array([v is not None for v in vals], dtype=bool)
            reps = np.array(
                [0 if v is None else int(v.scaleb(arr.type.scale)) for v in vals],
                dtype=np.int64,
            )
            bits = 64 if arr.type.bit_width <= 64 else 128
            dtype_ = dt.decimal_dtype(scale=-arr.type.scale, bits=bits)
            validity = None if mask.all() else jnp.asarray(mask)
            return cls(dtype_, len(vals),
                       data=jnp.asarray(reps.astype(dtype_.storage)),
                       validity=validity)
        # fixed-width via numpy (fill nulls so int columns don't widen to float)
        if arr.null_count > 0:
            mask = ~np.asarray(arr.is_null())
            if pa.types.is_floating(arr.type):
                filled = arr
            elif pa.types.is_timestamp(arr.type) or pa.types.is_duration(arr.type) or (
                str(arr.type).startswith("date")
            ):
                npd = arr.to_numpy(zero_copy_only=False)
                return cls.from_numpy(np.ascontiguousarray(npd), mask=mask)
            else:
                filled = arr.fill_null(_zero_for(arr.type))
            npd = filled.to_numpy(zero_copy_only=False)
            return cls.from_numpy(np.ascontiguousarray(npd), mask=mask)
        npd = arr.to_numpy(zero_copy_only=False)
        return cls.from_numpy(np.ascontiguousarray(npd))

    # ------------------------------------------------------------------
    # export
    # ------------------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        """Materialize to host.  Nulls become NaN/NaT/None as appropriate."""
        if self.dtype.is_string:
            return np.array(self.to_pylist(), dtype=object)
        if self.dtype.is_dictionary:
            return self.decode_dictionary().to_numpy()
        data = np.asarray(self.data)
        if self.dtype.is_temporal:
            data = data.astype(self.dtype.to_numpy())
        if self.validity is not None:
            mask = np.asarray(self.validity)
            if not mask.all():
                if self.dtype.is_float:
                    data = data.copy()
                    data[~mask] = np.nan
                elif self.dtype.is_temporal:
                    data = data.copy()
                    data[~mask] = np.datetime64("NaT") if self.dtype.is_timestamp else np.timedelta64("NaT")
                else:
                    out = data.astype(object)
                    out[~mask] = None
                    return out
        return data

    def to_pylist(self) -> List[Any]:
        if self.dtype.id == TypeId.LIST:
            from cudf_tpu.ops.lists import to_pylists

            return to_pylists(self)
        if self.dtype.id == TypeId.STRUCT:
            from cudf_tpu.ops.structs import to_pydicts

            return to_pydicts(self)
        if self.dtype.is_string:
            chars = np.asarray(self.data).tobytes()
            offs = np.asarray(self.offsets)
            valid = np.asarray(self.validity) if self.validity is not None else None
            out: List[Any] = []
            for i in range(self.length):
                if valid is not None and not valid[i]:
                    out.append(None)
                else:
                    out.append(chars[offs[i]:offs[i + 1]].decode("utf-8"))
            return out
        if self.dtype.is_decimal:
            from cudf_tpu.ops.decimal import to_decimals

            return to_decimals(self)
        arr = self.to_numpy()
        return [None if _is_null(v) else v.item() if hasattr(v, "item") else v for v in arr]

    def __arrow_c_array__(self, requested_schema=None):
        """Arrow PyCapsule protocol — zero-copy C-Data export
        (reference: cpp/include/cudf/interop.hpp:477-533)."""
        from cudf_tpu import arrow_cdata

        return arrow_cdata.column_capsules(self, requested_schema=requested_schema)

    def to_arrow(self):
        import pyarrow as pa

        if self.dtype.id == TypeId.LIST:
            child = self.children[0].to_arrow()
            offs = np.asarray(self.offsets)
            buf_validity = None
            if self.validity is not None:
                buf_validity = pa.py_buffer(np.packbits(np.asarray(self.validity), bitorder="little"))
            return pa.LargeListArray.from_arrays(
                pa.array(offs, type=pa.int64()), child
            ) if self.validity is None else pa.LargeListArray.from_buffers(
                pa.large_list(child.type), self.length,
                [buf_validity, pa.py_buffer(offs)], children=[child],
            )
        if self.dtype.id == TypeId.STRUCT:
            names = [n for n, _ in self.dtype.fields]
            children = [c.to_arrow() for c in self.children]
            mask = None
            if self.validity is not None:
                mask = pa.array(~np.asarray(self.validity))
            return pa.StructArray.from_arrays(children, names, mask=mask)
        if self.dtype.is_string:
            n = self.length
            offs = np.asarray(self.offsets)
            chars = np.asarray(self.data)
            buf_validity = None
            if self.validity is not None:
                buf_validity = pa.py_buffer(np.packbits(np.asarray(self.validity), bitorder="little"))
            arr = pa.LargeStringArray.from_buffers(
                n, pa.py_buffer(offs), pa.py_buffer(chars), buf_validity, self.null_count
            )
            return arr.cast(pa.string()) if offs[-1] < 2**31 else arr
        if self.dtype.is_dictionary:
            keys = self.children[0].to_arrow()
            codes = np.asarray(self.data)
            mask = None
            if self.validity is not None:
                mask = ~np.asarray(self.validity)
            return pa.DictionaryArray.from_arrays(pa.array(codes, mask=mask), keys)
        if self.dtype.is_decimal:
            from cudf_tpu.ops.decimal import to_decimals

            return pa.array(to_decimals(self),
                            type=pa.decimal128(38, max(0, -self.dtype.scale)))
        data = np.asarray(self.data)
        mask = None
        if self.validity is not None:
            mask = ~np.asarray(self.validity)
        if self.dtype.is_timestamp and self.dtype.tz is not None:
            unit = self.dtype.time_unit or "ns"
            return pa.array(data.astype(np.int64), mask=mask).cast(
                pa.timestamp(unit, tz=self.dtype.tz))
        if self.dtype.is_temporal:
            data = data.astype(self.dtype.to_numpy())
        return pa.array(data, mask=mask)

    def to_pandas(self, nullable: bool = False):
        import pandas as pd

        return pd.Series(self.to_arrow().to_pandas())

    # ------------------------------------------------------------------
    # dictionary helpers
    # ------------------------------------------------------------------
    def decode_dictionary(self) -> "Column":
        """DICTIONARY32 -> materialized value column (cudf::dictionary::decode)."""
        if not self.dtype.is_dictionary:
            return self
        from cudf_tpu.ops import copying

        keys = self.children[0]
        codes = jnp.where(self.validity, self.data, 0) if self.validity is not None else self.data
        out = copying.gather(keys, codes.astype(jnp.int64), bounds_check=False)
        return out.with_validity(bm.and_masks(self.validity, out.validity))

    # ------------------------------------------------------------------
    # element access / repr
    # ------------------------------------------------------------------
    def __getitem__(self, i):
        if isinstance(i, slice):
            from cudf_tpu.ops import copying

            start, stop, step = i.indices(self.length)
            if step == 1:
                return copying.slice(self, start, stop)
            idx = jnp.arange(start, stop, step, dtype=jnp.int64)
            return copying.gather(self, idx)
        i = int(i)
        if i < 0:
            i += self.length
        if not 0 <= i < self.length:
            raise IndexError(i)
        if self.validity is not None and not bool(self.validity[i]):
            # pandas scalar semantics: plain float columns surface
            # missing as NaN, datetimes as NaT (None only for types with
            # a genuine null, e.g. strings / masked dtypes)
            if self.dtype.is_float and not (self.dtype.nullable
                                            or self.dtype.arrow):
                return np.nan
            if self.dtype.is_timestamp and not self.dtype.arrow:
                return np.datetime64("NaT")
            if self.dtype.is_duration and not self.dtype.arrow:
                return np.timedelta64("NaT")
            return None
        if self.dtype.is_string:
            o0, o1 = int(self.offsets[i]), int(self.offsets[i + 1])
            return np.asarray(self.data[o0:o1]).tobytes().decode("utf-8")
        if self.dtype.is_dictionary:
            return self.children[0][int(self.data[i])]
        v = self.data[i]
        if self.dtype.is_temporal:
            return np.int64(int(v)).astype(self.dtype.to_numpy())
        return v.item() if hasattr(v, "item") else v

    def __repr__(self) -> str:
        head = self.to_pylist()[:10] if self.length <= 1000 else self[:10].to_pylist()
        more = "..." if self.length > 10 else ""
        return f"Column<{self.dtype!r}>[{self.length}] {head}{more}"


jax.tree_util.register_pytree_node(
    Column, Column.tree_flatten, Column.tree_unflatten
)


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------

def _zero_for(pa_type):
    import pyarrow as pa

    if pa.types.is_boolean(pa_type):
        return False
    return 0


def _is_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, float) and v != v:
        return True
    if isinstance(v, np.datetime64) and np.isnat(v):
        return True
    if isinstance(v, np.timedelta64) and np.isnat(v):
        return True
    if isinstance(v, np.floating) and np.isnan(v):
        return True
    tname = type(v).__name__
    if tname in ("NAType", "NaTType"):
        return True
    return False


def _infer_dtype(values: Iterable[Any]) -> DType:
    values = list(values)
    if not values:
        return dt.FLOAT64  # pandas object default for empty
    import datetime as _datetime

    import decimal as _pydec2

    has_float = False
    has_bool = False
    has_int = False
    for v in values:
        if isinstance(v, str):
            return dt.STRING
        if isinstance(v, _pydec2.Decimal):
            return dt.decimal_dtype(scale=int(v.as_tuple().exponent))
        tname = type(v).__name__
        if tname == "Timestamp" or isinstance(v, _datetime.datetime):
            # pandas-3 inference: the scalar's unit (Timestamp.unit),
            # plain datetime.datetime lists infer microseconds
            return dt.unit_dtype("M", getattr(v, "unit", "us"))
        if tname == "Timedelta" or isinstance(v, _datetime.timedelta):
            return dt.unit_dtype("m", getattr(v, "unit", "us"))
        if isinstance(v, (bool, np.bool_)):
            has_bool = True
        elif isinstance(v, (int, np.integer)):
            has_int = True
        elif isinstance(v, (float, np.floating)):
            has_float = True
        elif isinstance(v, np.datetime64):
            return dt.unit_dtype("M", np.datetime_data(v.dtype)[0])
        elif isinstance(v, np.timedelta64):
            return dt.unit_dtype("m", np.datetime_data(v.dtype)[0])
        else:
            return dt.STRING
    if has_float:
        return dt.FLOAT64
    if has_int:
        return dt.INT64
    if has_bool:
        return dt.BOOL8
    return dt.FLOAT64


def _null_fill_value(dtype: DType):
    if dtype.is_float:
        return np.nan
    if dtype.is_bool:
        return False
    return 0


def _coerce_value(v: Any, dtype: DType):
    if dtype.is_timestamp or dtype.is_duration:
        if isinstance(v, (np.datetime64, np.timedelta64)):
            return v.astype(dtype.to_numpy()).astype(np.int64)
        tname = type(v).__name__
        if tname in ("Timestamp", "Timedelta"):
            # pandas scalars carry ns ticks; rescale to the column's unit
            ns = np.int64(v.value)
            unit = dtype.time_unit or "ns"
            per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
            if per_sec == 10**9:
                return ns
            return np.int64(ns // (10**9 // per_sec))
        import datetime as _datetime

        if isinstance(v, _datetime.datetime):
            return np.datetime64(v).astype(dtype.to_numpy()).astype(np.int64)
        if isinstance(v, _datetime.timedelta):
            return np.timedelta64(v).astype(dtype.to_numpy()).astype(np.int64)
        return np.int64(v)
    if dtype.is_bool:
        return bool(v)
    if dtype.is_decimal:
        from cudf_tpu.ops.decimal import _pow10, _scalar_to_fixed

        rep, s = _scalar_to_fixed(v)
        if s >= dtype.scale:
            return rep * _pow10(s - dtype.scale)
        import decimal as _pydec

        return int(_pydec.Decimal(rep).scaleb(s - dtype.scale)
                   .to_integral_value(rounding=_pydec.ROUND_HALF_EVEN))
    return v


def as_column(obj, dtype: Optional[DType] = None) -> Column:
    """Coerce anything column-like to a Column."""
    if isinstance(obj, Column):
        if dtype is not None and dt.dtype(dtype) != obj.dtype:
            from cudf_tpu.ops import unary

            return unary.cast(obj, dt.dtype(dtype))
        return obj
    if isinstance(obj, jnp.ndarray):
        col = Column.from_jnp(obj)
    elif isinstance(obj, np.ndarray):
        col = Column.from_numpy(obj)
    elif hasattr(obj, "_column"):  # Series / Index
        col = obj._column
    elif type(obj).__module__.startswith("pyarrow"):
        col = Column.from_arrow(obj)
    elif hasattr(obj, "__arrow_array__") and not type(obj).__module__.startswith("pandas"):
        col = Column.from_arrow(obj.__arrow_array__())
    elif type(obj).__module__.startswith("pandas"):
        import pandas as pd

        if isinstance(obj, (pd.Series, pd.Index)):
            import pyarrow as pa

            col = Column.from_arrow(pa.Array.from_pandas(obj))
            if type(obj.dtype).__name__ == "ArrowDtype" and not (
                col.dtype.is_string or col.dtype.is_nested
            ):
                col = Column(dt.DType(col.dtype.id, tz=col.dtype.tz, arrow=True),
                             col.length, data=col.data, validity=col.validity,
                             offsets=col.offsets, children=col.children)
            if type(obj.dtype).__name__ in (
                "Int8Dtype", "Int16Dtype", "Int32Dtype", "Int64Dtype",
                "UInt8Dtype", "UInt16Dtype", "UInt32Dtype", "UInt64Dtype",
                "Float32Dtype", "Float64Dtype", "BooleanDtype",
                "StringDtype",
            ) and dt.dtype(obj.dtype).nullable:
                # keep nullable extension provenance for exact round-trip
                want_n = dt.dtype(obj.dtype)
                if want_n.id != col.dtype.id:
                    from cudf_tpu.ops import unary as _un

                    col = _un.cast(col, dt.DType(want_n.id))
                col = Column(want_n, col.length, data=col.data,
                             validity=col.validity, offsets=col.offsets,
                             children=col.children)
        elif isinstance(obj, pd.api.extensions.ExtensionArray):
            # pd.array(...) values: reuse the Series path (nullable
            # extension provenance, ArrowDtype handling)
            return as_column(pd.Series(obj), dtype=dtype)
        else:
            col = Column.from_sequence(list(obj))
    elif np.isscalar(obj) or obj is None:
        raise TypeError("scalar passed to as_column; use Column.full")
    else:
        col = Column.from_sequence(list(obj), dtype=dtype)
        return col
    if dtype is not None and dt.dtype(dtype) != col.dtype:
        from cudf_tpu.ops import unary

        return unary.cast(col, dt.dtype(dtype))
    return col
