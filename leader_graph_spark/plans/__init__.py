"""Query registry — importing this package registers every query."""

from leader_graph_spark.plans.registry import REGISTRY, QuerySpec, bench_queries, query

# Import for side effect: each module registers its queries.
from leader_graph_spark.plans import graph_queries, relational  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "bench_queries", "query"]
