import jax as _jax
_jax.config.update("jax_enable_x64", True)
from cudf_tpu.core.dtypes import DType, dtype  # noqa: E402
from cudf_tpu.core.column import Column  # noqa: E402
from cudf_tpu.core.table import Table  # noqa: E402
