"""Series accessors: .str, .dt, .cat.

TPU-native equivalent of cudf-python accessor namespaces
(reference: python/cudf/cudf/core/accessors/ — string.py, datetimelike.py,
categorical.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from cudf_tpu.core import dtypes as dt
from cudf_tpu.core.column import Column
from cudf_tpu.ops import datetime as dt_ops, strings as str_ops, unary
from cudf_tpu.frame.series import Series


class StringMethods:
    def __init__(self, s: Series):
        if not (s.dtype.is_string or s.dtype.is_dictionary):
            raise AttributeError(".str accessor requires string dtype")
        self._s = s
        self._col = s._column.decode_dictionary() if s.dtype.is_dictionary else s._column

    def _wrap(self, col: Column) -> Series:
        return Series._from(col, self._s._index, self._s.name)

    def _wrap_bool(self, col: Column) -> Series:
        """pandas-3 str-dtype predicates return False for missing values."""
        if col.validity is not None:
            import jax.numpy as jnp

            col = Column(col.dtype, col.length, data=col.data & col.validity)
        return Series._from(col, self._s._index, self._s.name)

    def len(self):
        return self._wrap(str_ops.length(self._col))

    def byte_count(self):
        return self._wrap(str_ops.byte_count(self._col))

    def lower(self):
        return self._wrap(str_ops.lower(self._col))

    def upper(self):
        return self._wrap(str_ops.upper(self._col))

    def capitalize(self):
        return self._wrap(str_ops.capitalize(self._col))

    def title(self):
        return self._wrap(str_ops.title(self._col))

    def swapcase(self):
        return self._wrap(str_ops.swapcase(self._col))

    def strip(self, to_strip=None):
        return self._wrap(str_ops.strip(self._col, to_strip, "both"))

    def lstrip(self, to_strip=None):
        return self._wrap(str_ops.strip(self._col, to_strip, "left"))

    def rstrip(self, to_strip=None):
        return self._wrap(str_ops.strip(self._col, to_strip, "right"))

    def slice(self, start=None, stop=None, step=None):
        return self._wrap(str_ops.slice_strings(self._col, start, stop, step))

    def get(self, i):
        return self._wrap(str_ops.get(self._col, i))

    def __getitem__(self, key):
        if isinstance(key, slice):
            return self.slice(key.start, key.stop, key.step)
        return self.get(key)

    def contains(self, pat, case=True, regex=True, flags=0):
        import re

        if flags and not regex:
            # pandas semantics: flags only apply to regex patterns
            raise ValueError("Cannot use flags with a literal pattern")
        if not case:
            flags |= re.IGNORECASE
        if regex and (_is_regex(pat) or flags):
            return self._wrap_bool(str_ops.contains_re(self._col, pat, flags))
        if not case:
            return self._wrap_bool(str_ops.contains_literal(str_ops.lower(self._col), pat.lower()))
        return self._wrap_bool(str_ops.contains_literal(self._col, pat))

    def match(self, pat, flags=0):
        return self._wrap_bool(str_ops.match_re(self._col, pat, flags))

    def fullmatch(self, pat, flags=0):
        return self._wrap_bool(str_ops.fullmatch_re(self._col, pat, flags))

    def _affix_match(self, pat, na, op):
        import jax.numpy as jnp

        pats = pat if isinstance(pat, tuple) else (pat,)
        out = None
        for p in pats:
            c = op(self._col, p)
            if out is None:
                out = c
            else:
                out = out.with_validity(out.validity)
                out.data = out.data | c.data
        if na is not None and na is not False and na is not True:
            try:
                import pandas as _pd

                if _pd.isna(na):
                    na = None
            except Exception:
                pass
        if na is not None and out.validity is not None:
            out = type(out)(out.dtype, out.length,
                            data=jnp.where(out.validity, out.data,
                                           jnp.bool_(bool(na))))
        return self._wrap_bool(out)

    def startswith(self, pat, na=None):
        return self._affix_match(pat, na, str_ops.startswith)

    def endswith(self, pat, na=None):
        return self._affix_match(pat, na, str_ops.endswith)

    def _find_impl(self, sub, start, end, from_end):
        import jax.numpy as jnp

        from cudf_tpu.core import dtypes as dt
        from cudf_tpu.core.column import Column as _C

        if start == 0 and end is None:
            return self._wrap(
                str_ops.find_literal(self._col, sub, from_end=from_end))
        # python str.find(sub, start, end) slice semantics: search in
        # s[start:end], report ABSOLUTE position
        sliced = str_ops.slice_strings(self._col, start or None, end)
        pos = str_ops.find_literal(sliced, sub, from_end=from_end)
        L = str_ops.length(self._col).data.astype(jnp.int64)
        st = jnp.int64(start)
        norm = jnp.where(st >= 0, jnp.minimum(st, L),
                         jnp.maximum(L + st, 0))
        data = jnp.where(pos.data >= 0, pos.data + norm, jnp.int64(-1))
        return self._wrap(_C(dt.INT64, pos.length, data=data,
                             validity=pos.validity))

    def find(self, sub, start=0, end=None):
        return self._find_impl(sub, start, end, False)

    def rfind(self, sub, start=0, end=None):
        return self._find_impl(sub, start, end, True)

    def findall(self, pat, flags=0):
        """Per-row regex findall (host tier: list-typed results;
        reference routes findall through its device regex, findall.cu)."""
        import re

        rx = re.compile(pat, flags)
        vals = self._col.to_pylist()
        import pyarrow as pa

        arr = pa.array([None if v is None else rx.findall(v)
                        for v in vals], pa.list_(pa.string()))
        from cudf_tpu.core.column import Column as _C

        return self._wrap(_C.from_arrow(arr))

    def index(self, sub, start=0, end=None):
        out = self.find(sub, start, end)
        if bool((out == -1).any()):
            raise ValueError("substring not found")
        return out

    def count(self, pat, flags=0):
        if _is_regex(pat):
            return self._wrap(str_ops.count_re(self._col, pat, flags))
        return self._wrap(str_ops.count_literal(self._col, pat))

    def replace(self, pat, repl, n=-1, regex=True, flags=0):
        if regex and _is_regex(pat):
            return self._wrap(str_ops.replace_re(self._col, pat, repl, n, flags))
        return self._wrap(str_ops.replace_literal(self._col, pat, repl, n))

    def extract(self, pat, flags=0, expand=True):
        cols = str_ops.extract_re(self._col, pat, flags)
        from cudf_tpu.frame.dataframe import DataFrame
        from cudf_tpu.core.table import Table

        if len(cols) == 1 and not expand:
            return self._wrap(cols[0])
        return DataFrame._from(
            Table({i: c for i, c in enumerate(cols)}), self._s._index
        )

    def split(self, pat=None, n=-1, expand=False, regex=False):
        if expand:
            cols = str_ops.split_expand(self._col, pat, n, regex)
            from cudf_tpu.frame.dataframe import DataFrame
            from cudf_tpu.core.table import Table

            return DataFrame._from(Table({i: c for i, c in enumerate(cols)}), self._s._index)
        lists = str_ops.split_record(self._col, pat, n)
        import pandas as pd

        return pd.Series(lists, index=self._s._index.to_pandas(), name=self._s.name)

    def pad(self, width, side="left", fillchar=" "):
        return self._wrap(str_ops.pad(self._col, width, side, fillchar))

    def ljust(self, width, fillchar=" "):
        return self._wrap(str_ops.pad(self._col, width, "right", fillchar))

    def rjust(self, width, fillchar=" "):
        return self._wrap(str_ops.pad(self._col, width, "left", fillchar))

    def center(self, width, fillchar=" "):
        return self._wrap(str_ops.pad(self._col, width, "both", fillchar))

    def slice_replace(self, start=None, stop=None, repl=""):
        return self._wrap(str_ops._host_map(
            self._col, lambda s: s[: (start or 0)] + repl + s[(stop if stop is not None else len(s)):],
            dt.STRING).with_validity(self._col.validity))

    def translate(self, table):
        return self._wrap(str_ops._host_map(
            self._col, lambda s: s.translate(table), dt.STRING
        ).with_validity(self._col.validity))

    def removeprefix(self, prefix):
        return self._wrap(str_ops._host_map(
            self._col, lambda s: s.removeprefix(prefix), dt.STRING
        ).with_validity(self._col.validity))

    def removesuffix(self, suffix):
        return self._wrap(str_ops._host_map(
            self._col, lambda s: s.removesuffix(suffix), dt.STRING
        ).with_validity(self._col.validity))

    def wrap(self, width):
        import textwrap

        return self._wrap(str_ops._host_map(
            self._col, lambda s: "\n".join(textwrap.wrap(s, width)), dt.STRING
        ).with_validity(self._col.validity))

    def zfill(self, width):
        return self._wrap(str_ops.zfill(self._col, width))

    def repeat(self, repeats):
        return self._wrap(str_ops.repeat_strings(self._col, repeats))

    def cat(self, others=None, sep=None, na_rep=None):
        sep = sep or ""
        if others is None:
            return str_ops.join_strings(self._col, sep)
        import numpy as _np

        if not isinstance(others, (Series, list, tuple, _np.ndarray)) \
                and type(others).__name__ not in ("Index", "DataFrame"):
            # pandas cat() rejects non-list-likes; unbounded-__getitem__
            # objects (e.g. another .str accessor) would otherwise
            # iterate forever through the old sequence protocol
            raise TypeError(
                "others must be Series, Index, DataFrame, np.ndarray "
                "or list-like (either containing only strings or "
                "containing only objects of type Series/Index/"
                "np.ndarray[1-dim])")
        from cudf_tpu.ops.binaryop import binary_operation

        other_col = others._column if isinstance(others, Series) else Column.from_strings(list(others))
        left = self._col
        if sep:
            sep_col = Column.from_strings([sep] * left.length)
            left = binaryop_concat(left, sep_col)
        out = binary_operation(left, other_col, "add")
        return self._wrap(out)

    def isdigit(self):
        return self._wrap_bool(str_ops.isdigit(self._col))

    def isdecimal(self):
        return self._wrap_bool(str_ops.isdecimal(self._col))

    def isnumeric(self):
        return self._wrap_bool(str_ops.isnumeric(self._col))

    def isalpha(self):
        return self._wrap_bool(str_ops.isalpha(self._col))

    def isalnum(self):
        return self._wrap_bool(str_ops.isalnum(self._col))

    def isspace(self):
        return self._wrap_bool(str_ops.isspace(self._col))

    def isupper(self):
        return self._wrap_bool(str_ops.isupper(self._col))

    def islower(self):
        return self._wrap_bool(str_ops.islower(self._col))


def binaryop_concat(l: Column, r: Column) -> Column:
    from cudf_tpu.ops.binaryop import _concat_strings

    return _concat_strings(l, r)


def _is_regex(pat: str) -> bool:
    return any(c in pat for c in r".^$*+?{}[]\|()")


class DatetimeProperties:
    def __init__(self, s: Series):
        if not (s.dtype.is_timestamp or s.dtype.is_duration):
            raise AttributeError(".dt accessor requires datetime64/timedelta64 dtype")
        self._s = s

    def _wrap(self, col: Column) -> Series:
        return Series._from(col, self._s._index, self._s.name)

    def _extract(self, field: str) -> Series:
        col = self._s._column
        if col.dtype.tz is not None:
            from cudf_tpu.ops.timezone import wall_clock_column

            col = wall_clock_column(col)
        return self._wrap(dt_ops.extract(col, field))

    @property
    def tz(self):
        return self._s._column.dtype.tz

    def tz_localize(self, tz) -> Series:
        from cudf_tpu.ops import timezone as tz_ops

        return self._wrap(tz_ops.tz_localize(self._s._column, tz))

    def tz_convert(self, tz) -> Series:
        from cudf_tpu.ops import timezone as tz_ops

        return self._wrap(tz_ops.tz_convert(self._s._column, tz))

    @property
    def year(self):
        return self._extract("year")

    @property
    def month(self):
        return self._extract("month")

    @property
    def day(self):
        return self._extract("day")

    @property
    def hour(self):
        return self._extract("hour")

    @property
    def minute(self):
        return self._extract("minute")

    @property
    def second(self):
        return self._extract("second")

    @property
    def microsecond(self):
        return self._extract("microsecond")

    @property
    def nanosecond(self):
        return self._extract("nanosecond")

    @property
    def weekday(self):
        return self._extract("weekday")

    dayofweek = weekday
    day_of_week = weekday

    @property
    def dayofyear(self):
        return self._extract("dayofyear")

    day_of_year = dayofyear

    @property
    def quarter(self):
        return self._extract("quarter")

    @property
    def days_in_month(self):
        return self._extract("days_in_month")

    daysinmonth = days_in_month

    @property
    def is_leap_year(self):
        return self._extract("is_leap_year")

    @property
    def is_month_start(self):
        return self._extract("is_month_start")

    @property
    def is_month_end(self):
        return self._extract("is_month_end")

    @property
    def date(self):
        import pandas as pd

        return pd.Series(self._s.to_pandas().dt.date, name=self._s.name)

    def floor(self, freq):
        return self._wrap(dt_ops.floor(self._s._column, freq))

    def ceil(self, freq):
        return self._wrap(dt_ops.ceil(self._s._column, freq))

    def round(self, freq):
        return self._wrap(dt_ops.round(self._s._column, freq))

    def as_unit(self, unit):
        """Change timestamp/duration resolution (pandas Series.dt.as_unit)."""
        col = self._s._column
        ts = {"s": dt.TypeId.TIMESTAMP_SECONDS, "ms": dt.TypeId.TIMESTAMP_MILLISECONDS,
              "us": dt.TypeId.TIMESTAMP_MICROSECONDS, "ns": dt.TypeId.TIMESTAMP_NANOSECONDS}
        dur = {"s": dt.TypeId.DURATION_SECONDS, "ms": dt.TypeId.DURATION_MILLISECONDS,
               "us": dt.TypeId.DURATION_MICROSECONDS, "ns": dt.TypeId.DURATION_NANOSECONDS}
        tid = (ts if col.dtype.is_timestamp else dur)[unit]
        out = unary.cast(col, dt.DType(tid))
        if col.dtype.tz is not None:
            out = Column(dt.DType(tid, tz=col.dtype.tz), out.length,
                         data=out.data, validity=out.validity)
        return self._wrap(out)

    def strftime(self, fmt):
        return Series(self._s.to_pandas().dt.strftime(fmt).tolist(),
                      index=self._s._index, name=self._s.name)

    # duration properties
    @property
    def days(self):
        ticks = {"s": 86400, "ms": 86400_000, "us": 86400_000_000, "ns": 86400_000_000_000}
        t = ticks[self._s.dtype.time_unit or "s"]
        col = self._s._column
        return self._wrap(Column(dt.INT64, col.length,
                                 data=jnp.floor_divide(col.data.astype(jnp.int64), t),
                                 validity=col.validity))

    @property
    def seconds(self):
        ticks = {"s": 1, "ms": 1000, "us": 1_000_000, "ns": 1_000_000_000}
        t = ticks[self._s.dtype.time_unit or "s"]
        col = self._s._column
        secs = jnp.floor_divide(col.data.astype(jnp.int64), t)
        return self._wrap(Column(dt.INT64, col.length, data=jnp.mod(secs, 86400),
                                 validity=col.validity))

    def total_seconds(self):
        ticks = {"s": 1, "ms": 1000, "us": 1_000_000, "ns": 1_000_000_000}
        t = ticks[self._s.dtype.time_unit or "s"]
        col = self._s._column
        return self._wrap(Column(dt.FLOAT64, col.length,
                                 data=col.data.astype(jnp.float64) / t,
                                 validity=col.validity))


class CategoricalAccessor:
    def __init__(self, s: Series):
        if not s.dtype.is_dictionary:
            raise AttributeError(".cat accessor requires category dtype")
        self._s = s

    @property
    def categories(self):
        from cudf_tpu.frame.index import Index

        return Index(column=self._s._column.children[0])

    @property
    def codes(self) -> Series:
        col = self._s._column
        codes = col.data.astype(jnp.int64)
        if col.validity is not None:
            codes = jnp.where(col.validity, codes, -1)
        return Series._from(Column(dt.INT64, col.length, data=codes), self._s._index, None)

    @property
    def ordered(self):
        return False

    def as_ordered(self):
        return self._s.copy()

    def as_unordered(self):
        return self._s.copy()

    def set_categories(self, new_categories):
        from cudf_tpu.ops.dictionary import set_keys
        from cudf_tpu.core.column import as_column

        out = set_keys(self._s._column, as_column(list(new_categories)))
        return Series._from(out, self._s._index, self._s.name)

    def add_categories(self, new_categories):
        from cudf_tpu.ops import copying
        from cudf_tpu.core.column import as_column

        keys = copying.concatenate([self._s._column.children[0], as_column(list(new_categories))])
        return self.set_categories(keys.to_pylist())


class ListMethods:
    """.list accessor (reference: accessors/lists.py)."""

    def __init__(self, s: Series):
        from cudf_tpu.core.dtypes import TypeId

        if s.dtype.id != TypeId.LIST:
            raise AttributeError(".list accessor requires list dtype")
        self._s = s

    def _wrap(self, col: Column) -> Series:
        return Series._from(col, self._s._index, self._s.name)

    def len(self):
        from cudf_tpu.ops import lists

        return self._wrap(lists.count_elements(self._s._column))

    def get(self, i: int):
        from cudf_tpu.ops import lists

        return self._wrap(lists.extract_list_element(self._s._column, i))

    def contains(self, value):
        from cudf_tpu.ops import lists

        return self._wrap(lists.contains(self._s._column, value))

    def index(self, value):
        from cudf_tpu.ops import lists

        return self._wrap(lists.index_of(self._s._column, value))

    def sort_values(self, ascending=True):
        from cudf_tpu.ops import lists

        return self._wrap(lists.segmented_sort(self._s._column, ascending))

    def unique(self):
        from cudf_tpu.ops import lists

        return self._wrap(lists.unique_per_row(self._s._column))

    def concat(self, other: Series):
        from cudf_tpu.ops import lists

        return self._wrap(lists.concatenate_rows([self._s._column, other._column]))

    @property
    def leaves(self):
        return Series(self._s._column.children[0])


class StructMethods:
    """.struct accessor (reference: accessors/struct.py)."""

    def __init__(self, s: Series):
        from cudf_tpu.core.dtypes import TypeId

        if s.dtype.id != TypeId.STRUCT:
            raise AttributeError(".struct accessor requires struct dtype")
        self._s = s

    def field(self, name):
        from cudf_tpu.ops import structs

        return Series._from(structs.field(self._s._column, name),
                            self._s._index, name if isinstance(name, str) else None)

    def explode(self):
        from cudf_tpu.ops import structs
        from cudf_tpu.frame.dataframe import DataFrame

        t = structs.explode_to_table(self._s._column)
        return DataFrame._from(t, self._s._index)
