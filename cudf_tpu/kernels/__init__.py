"""Pallas TPU kernels — tier-2 of the kernel stack (SURVEY.md §7).

Tier-1 ops are plain XLA (ops/*); these kernels cover the paths where
explicit control of VMEM layout and the MXU beats what XLA emits:

- hash_aggregate:  single-pass low-cardinality groupby as one-hot matmuls
  on the MXU (replaces libcudf's shared-memory hash aggs,
  cpp/src/groupby/hash/compute_shared_memory_aggs.cu)
- All kernels validate against a jnp reference in interpreter mode in
  tests (the TPU analogue of compute-sanitizer runs, SURVEY.md §5).
"""

from cudf_tpu.kernels.hash_aggregate import onehot_groupby_aggregate

__all__ = ["onehot_groupby_aggregate"]
