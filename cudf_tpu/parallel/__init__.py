"""Multi-chip scale-out: mesh, hash-shuffle over ICI, distributed relational ops.

TPU-native replacement for the reference's distributed runtime
(rapidsmpf UCXX/MPI shuffle service + cudf-polars streaming executor,
SURVEY.md §2.11): collectives are XLA all_to_all/all_gather/psum inside
``shard_map`` over a 1-D device mesh — shuffles ride ICI, no sockets.
"""

from cudf_tpu.parallel.mesh import make_mesh, partition_frame, collect_frame
from cudf_tpu.parallel.shuffle import bucketize, exchange, shuffle_by_key, shuffle_by_keys
from cudf_tpu.parallel.dist import (
    dist_groupby_sum,
    dist_groupby_sum_multi,
    dist_inner_join,
    dist_join,
    dist_sort,
    dist_distinct,
    broadcast_inner_join,
    distributed_groupby_agg,
)

__all__ = [
    "make_mesh",
    "partition_frame",
    "collect_frame",
    "bucketize",
    "exchange",
    "shuffle_by_key",
    "shuffle_by_keys",
    "dist_groupby_sum",
    "dist_groupby_sum_multi",
    "dist_inner_join",
    "dist_join",
    "dist_sort",
    "dist_distinct",
    "broadcast_inner_join",
    "distributed_groupby_agg",
]
