"""HBM→host spilling of cold column buffers.

TPU-native equivalent of cudf's SpillManager/SpillableBuffer
(reference: python/cudf/cudf/core/buffer/spill_manager.py:202-351,
spillable_buffer.py:101-462).

Design: a global registry of weakly-referenced Columns.  ``spill()`` moves
a column's device buffers to pinned host numpy arrays (freeing HBM);
access re-uploads transparently through ``ensure_on_device``.  Spill
policy: explicit, or spill-coldest-first until a target HBM budget via
``spill_to_budget``.  (Automatic spill-on-OOM needs allocator hooks — a
later round; the registry + statistics match the reference's surface.)
"""

from __future__ import annotations

import time
import weakref
from typing import Dict, List, Optional

import numpy as np

from cudf_tpu.utils.config import get_option


class SpillStatistics:
    def __init__(self):
        self.spills = 0
        self.unspills = 0
        self.bytes_spilled = 0
        self.bytes_unspilled = 0

    def __repr__(self):
        return (f"SpillStatistics(spills={self.spills}, unspills={self.unspills}, "
                f"spilled={self.bytes_spilled}B, unspilled={self.bytes_unspilled}B)")


class SpillManager:
    def __init__(self):
        self._registry: Dict[int, weakref.ref] = {}
        self._last_access: Dict[int, float] = {}
        self.statistics = SpillStatistics()

    def register(self, col) -> None:
        self._registry[id(col)] = weakref.ref(col)
        self._last_access[id(col)] = time.monotonic()

    def touch(self, col) -> None:
        self._last_access[id(col)] = time.monotonic()

    def live_columns(self) -> List:
        out = []
        dead = []
        for k, ref in self._registry.items():
            c = ref()
            if c is None:
                dead.append(k)
            else:
                out.append(c)
        for k in dead:
            self._registry.pop(k, None)
            self._last_access.pop(k, None)
        return out

    def spill(self, col) -> int:
        """Move a column's buffers to host; returns bytes freed."""
        freed = 0
        import jax

        for attr in ("data", "validity", "offsets"):
            buf = getattr(col, attr, None)
            if buf is not None and not isinstance(buf, (np.ndarray, _HostSpilled)):
                host = np.asarray(buf)
                setattr(col, attr, _HostSpilled(host))
                freed += host.nbytes
        for ch in getattr(col, "children", ()):
            freed += self.spill(ch)
        if freed:
            self.statistics.spills += 1
            self.statistics.bytes_spilled += freed
        return freed

    def ensure_on_device(self, col) -> None:
        import jax.numpy as jnp

        restored = 0
        for attr in ("data", "validity", "offsets"):
            buf = getattr(col, attr, None)
            if isinstance(buf, _HostSpilled):
                setattr(col, attr, jnp.asarray(buf.host))
                restored += buf.host.nbytes
        for ch in getattr(col, "children", ()):
            self.ensure_on_device(ch)
        if restored:
            self.statistics.unspills += 1
            self.statistics.bytes_unspilled += restored
        self.touch(col)

    def spill_to_budget(self, budget_bytes: int) -> int:
        """Spill coldest-first until live device bytes <= budget."""
        cols = self.live_columns()
        cols.sort(key=lambda c: self._last_access.get(id(c), 0.0))
        live = sum(c.nbytes for c in cols)
        freed = 0
        for c in cols:
            if live - freed <= budget_bytes:
                break
            freed += self.spill(c)
        return freed


class _HostSpilled:
    """Marker wrapper for a spilled (host-resident) buffer."""

    __slots__ = ("host",)

    def __init__(self, host: np.ndarray):
        self.host = host

    @property
    def nbytes(self):
        return self.host.nbytes

    @property
    def shape(self):
        return self.host.shape

    @property
    def dtype(self):
        return self.host.dtype


_manager: Optional[SpillManager] = None


def get_spill_manager() -> SpillManager:
    global _manager
    if _manager is None:
        _manager = SpillManager()
    return _manager


def spill(obj) -> int:
    """Spill a DataFrame/Series/Column to host memory."""
    mgr = get_spill_manager()
    if hasattr(obj, "_table"):
        return sum(mgr.spill(c) for c in obj._table.columns)
    if hasattr(obj, "_column"):
        return mgr.spill(obj._column)
    return mgr.spill(obj)


def unspill(obj) -> None:
    mgr = get_spill_manager()
    if hasattr(obj, "_table"):
        for c in obj._table.columns:
            mgr.ensure_on_device(c)
    elif hasattr(obj, "_column"):
        mgr.ensure_on_device(obj._column)
    else:
        mgr.ensure_on_device(obj)
