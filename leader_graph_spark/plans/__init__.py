"""Query registry — importing this package registers every query."""

from leader_graph_spark.plans.registry import REGISTRY, QuerySpec, bench_queries, query

# Import for side effect: each module registers its queries.
from leader_graph_spark.plans import (  # noqa: E402,F401
    analytics_queries,
    dedup_queries,
    graph_queries,
    pipeline_queries,
    relational,
    similarity_queries,
    streaming_queries,
    text_queries,
    warehouse_queries,
)

__all__ = ["REGISTRY", "QuerySpec", "bench_queries", "query"]
