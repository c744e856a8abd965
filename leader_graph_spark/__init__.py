"""leader_graph_spark — a PySpark-native analytics engine.

Re-expresses the data-processing and query capabilities of the reference
repo qiuyue97/leader_graph (batch ETL + knowledge-graph derivation over
scraped tabular/HTML data) as idiomatic Spark DataFrame/SQL operators,
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) that a 100 TB deployment
needs.

Quick start (the reference's seven-stage workflow, see README cookbook)::

    from leader_graph_spark import get_spark, ingest_orgs, build_graph

    spark = get_spark("my_app")
    orgs = ingest_orgs(raw_org_rows)          # stage 1
    ...                                        # stages 3-7
    g = build_graph(orgs, leaders, events)     # mysql2neo4j workload
    g["schoolmates"].show()

Or run any of the 200+ named, oracle-verified queries::

    from leader_graph_spark import REGISTRY
    REGISTRY["flagship_colleagues_interval"].spark(spark, sf_dir).show()

Layout
------
- ``session``    : tuned SparkSession builder
- ``sources``    : table/file sources (parquet test tables, CSV/Excel/JSON)
- ``functions``  : scalar function library (SURVEY.md §2.7) + text analysis
- ``operators``  : relational operators (dedup, interval joins, forward-fill,
                   incremental anti-joins, similarity search, sessionization)
- ``graph``      : vertices/edges builders + derived-relationship queries
                   (SURVEY.md §2.3 J1-J10) + DataFrame graph algorithms
- ``plans``      : the named query registry consumed by ``__spark_entry__``
- ``streaming``  : Structured Streaming jobs over the events table
- ``extract``    : semi-structured (HTML) extraction UDFs (SURVEY.md §2.8)
- ``pipeline``   : the reference's seven-stage workflow as pure transforms
"""

__version__ = "0.2.0"

# Curated public API, lazily resolved (PEP 562) so ``import
# leader_graph_spark`` stays instant — the registry alone imports ~40
# operator modules, which only REGISTRY/bench_queries users should pay.
_EXPORTS = {
    # session & test tables
    "get_spark": "leader_graph_spark.session",
    "load_table": "leader_graph_spark.sources.tables",
    "load_tables": "leader_graph_spark.sources.tables",
    "register_views": "leader_graph_spark.sources.tables",
    # file boundary (S1-S4)
    "read_csv": "leader_graph_spark.sources.files",
    "read_excel": "leader_graph_spark.sources.files",
    "read_tabular_dir": "leader_graph_spark.sources.files",
    # the seven-stage reference workflow (main.py:26-42)
    "ingest_orgs": "leader_graph_spark.pipeline.stages",
    "extract_org_fields": "leader_graph_spark.pipeline.stages",
    "derive_leaders": "leader_graph_spark.pipeline.stages",
    "extract_leader_fields": "leader_graph_spark.pipeline.stages",
    "extract_leader_details": "leader_graph_spark.pipeline.stages",
    "structure_careers": "leader_graph_spark.pipeline.stages",
    "build_graph": "leader_graph_spark.pipeline.stages",
    # GraphFrames-shaped property-graph facade (motif finding, bfs,
    # aggregateMessages, algorithm delegates)
    "DFGraph": "leader_graph_spark.graph.frames",
    # the named-query registry (drives __spark_entry__, bench.py, tests)
    "REGISTRY": "leader_graph_spark.plans",
    "bench_queries": "leader_graph_spark.plans",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    return __all__
