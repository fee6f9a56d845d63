"""Flagship query "models" — cuDF is a query engine, so its model zoo is
a query zoo (SURVEY.md: the reference has no NN models; its headline
workloads are db-benchmark groupby/join and TPC-H/NDS-H queries).

Each entry is a jittable compute graph over columnar buffers — the
framework's "forward steps", dispatching to the same kernel tiers
bench.py measures:

- ``g1_groupby``: db-benchmark G1 sum/mean/count.  Low-cardinality keys
  ride the row-batched one-hot MXU kernel; high-cardinality keys the
  radix-partition pipeline (kernels/hash_aggregate.py,
  kernels/radix_partition.py).
- ``j1_join``: db-benchmark J1 inner join against a unique-key dim
  table (single-window MXU probe for small domains, two-pass radix
  partition beyond).
- ``tpch_queries``: the TPC-H plans (benchmarks/tpch.py) over the frame
  API / LazyFrame engine.
"""

from typing import Tuple

import jax.numpy as jnp


def g1_groupby(keys: jnp.ndarray, vals: jnp.ndarray, num_groups: int,
               low_card_threshold: int = 4096):
    """(sums[K], counts[K]) — the G1 groupby forward step.

    Dispatches between the one-hot MXU kernel and the radix-partition
    pipeline by cardinality (the hash-vs-sort decision, groupby.cu:54).
    """
    if num_groups <= low_card_threshold:
        from cudf_tpu.kernels.hash_aggregate import onehot_groupby_aggregate

        s, c, _, _ = onehot_groupby_aggregate(keys, vals, num_groups,
                                              with_minmax=False)
        return s, c.astype(jnp.int64)
    from cudf_tpu.kernels.radix_partition import radix_groupby_sum_count

    s, c = radix_groupby_sum_count(keys, vals, num_groups)
    return s, c.astype(jnp.int64)


def j1_join(probe_keys: jnp.ndarray, probe_row_ids: jnp.ndarray,
            build_keys: jnp.ndarray,
            key_domain: int) -> Tuple[jnp.ndarray, ...]:
    """db-benchmark J1 inner join (unique build keys) forward step.

    Returns (probe_keys, probe_row_ids, build_row_ids, unique) in
    partitioned row planes — gather maps, the output shape of
    inner_join_retrieve.cu (see kernels/radix_partition.py docstring).
    """
    from cudf_tpu.kernels.radix_partition import radix_join_inner_unique

    return radix_join_inner_unique(probe_keys, probe_row_ids, build_keys,
                                   key_domain)


def tpch_queries():
    """The TPC-H LazyFrame plans (benchmarks/tpch.py)."""
    from benchmarks import tpch

    return {"q1": tpch.q1, "q3": tpch.q3, "q4": tpch.q4, "q5": tpch.q5,
            "q6": tpch.q6, "q9": tpch.q9, "q10": tpch.q10, "q12": tpch.q12,
            "q14": tpch.q14, "generate": tpch.generate}


__all__ = ["g1_groupby", "j1_join", "tpch_queries"]
