"""Flagship query "models" — cuDF is a query engine, so its model zoo is
a query zoo (SURVEY.md: the reference has no NN models; its headline
workloads are db-benchmark groupby/join and TPC-H/NDS-H queries).

Each entry is a jittable compute graph over columnar buffers, used by
bench.py and __graft_entry__ as the framework's "forward steps".
"""

from bench import groupby_pipeline as g1_groupby_pipeline  # noqa: F401
from bench import join_pipeline as j1_join_pipeline  # noqa: F401


def tpch_queries():
    """The TPC-H LazyFrame plans (benchmarks/tpch.py)."""
    from benchmarks import tpch

    return {"q1": tpch.q1, "q3": tpch.q3, "q4": tpch.q4, "q5": tpch.q5,
            "q6": tpch.q6, "q9": tpch.q9, "q10": tpch.q10, "q12": tpch.q12,
            "q14": tpch.q14, "generate": tpch.generate}


__all__ = ["g1_groupby_pipeline", "j1_join_pipeline", "tpch_queries"]
