"""Masked scalar type for null-aware device UDFs.

TPU-native replacement for cudf's numba masked UDF extension
(reference: python/cudf/cudf/core/udf/masked_typing.py — a numba type
carrying (value, valid) through CUDA-jitted row functions).  Here the
same (value, valid) pair is a pytree that rides `jax.vmap`: arithmetic
propagates validity exactly like column binaryops, and `fillna`/`is_na`
give the UDF explicit null control.  No separate compiler — the UDF
traces through XLA like any other jax function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Masked(NamedTuple):
    value: jnp.ndarray
    valid: jnp.ndarray

    # ---- null control -------------------------------------------------
    def is_na(self):
        return ~self.valid

    def fillna(self, default):
        return jnp.where(self.valid, self.value, default)

    # ---- arithmetic (validity = and of operand validities) -------------
    def _bin(self, other, fn):
        if isinstance(other, Masked):
            return Masked(fn(self.value, other.value), self.valid & other.valid)
        return Masked(fn(self.value, other), self.valid)

    def _rbin(self, other, fn):
        return Masked(fn(other, self.value), self.valid)

    def __add__(self, o):
        return self._bin(o, jnp.add)

    def __radd__(self, o):
        return self._rbin(o, jnp.add)

    def __sub__(self, o):
        return self._bin(o, jnp.subtract)

    def __rsub__(self, o):
        return self._rbin(o, jnp.subtract)

    def __mul__(self, o):
        return self._bin(o, jnp.multiply)

    def __rmul__(self, o):
        return self._rbin(o, jnp.multiply)

    def __truediv__(self, o):
        return self._bin(o, jnp.true_divide)

    def __rtruediv__(self, o):
        return self._rbin(o, jnp.true_divide)

    def __pow__(self, o):
        return self._bin(o, jnp.power)

    def __mod__(self, o):
        return self._bin(o, jnp.mod)

    def __neg__(self):
        return Masked(-self.value, self.valid)

    def __abs__(self):
        return Masked(jnp.abs(self.value), self.valid)

    # ---- comparisons ---------------------------------------------------
    def __eq__(self, o):  # type: ignore[override]
        return self._bin(o, jnp.equal)

    def __ne__(self, o):  # type: ignore[override]
        return self._bin(o, jnp.not_equal)

    def __lt__(self, o):
        return self._bin(o, jnp.less)

    def __le__(self, o):
        return self._bin(o, jnp.less_equal)

    def __gt__(self, o):
        return self._bin(o, jnp.greater)

    def __ge__(self, o):
        return self._bin(o, jnp.greater_equal)

    def __hash__(self):  # NamedTuple eq is overridden; keep hashable
        return object.__hash__(self)


def where(cond, a, b):
    """Masked-aware select: cond may be Masked (its nulls poison output)."""
    cv = cond.valid if isinstance(cond, Masked) else None
    c = cond.value if isinstance(cond, Masked) else cond
    av = a.valid if isinstance(a, Masked) else True
    bv = b.valid if isinstance(b, Masked) else True
    aval = a.value if isinstance(a, Masked) else a
    bval = b.value if isinstance(b, Masked) else b
    out = jnp.where(c, aval, bval)
    valid = jnp.where(c, av, bv)
    if cv is not None:
        valid = valid & cv
    return Masked(out, valid)
