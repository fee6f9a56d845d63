"""cudf_tpu.testing — public test utilities (cudf.testing equivalent)."""

from cudf_tpu.utils.testing import assert_eq, make_random_frame

__all__ = ["assert_eq", "make_random_frame"]
