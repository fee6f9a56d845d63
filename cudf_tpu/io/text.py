"""Text reader: split a file into records by delimiter.

TPU-native equivalent of cudf::io::text::multibyte_split
(reference: cpp/src/io/text/multibyte_split.cu) — the byte scan runs in
the native C++ tier (csrc/), producing offsets directly; one transfer
builds the device string column.
"""

from __future__ import annotations

import numpy as np


def read_text(path_or_bytes, delimiter: str = "\n", strip_delimiters: bool = True):
    """Series of records split by ``delimiter`` (cudf.read_text)."""
    import jax.numpy as jnp

    from cudf_tpu import native
    from cudf_tpu.core import dtypes as dt
    from cudf_tpu.core.column import Column
    from cudf_tpu.frame.series import Series

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    offsets = native.multibyte_split(data, delimiter.encode())
    chars = np.frombuffer(data, np.uint8)
    col = Column(
        dt.STRING, offsets.shape[0] - 1,
        data=jnp.asarray(chars), offsets=jnp.asarray(offsets),
    )
    if strip_delimiters:
        from cudf_tpu.ops.strings import strip

        col = strip(col, delimiter, side="right")
    return Series(col)
