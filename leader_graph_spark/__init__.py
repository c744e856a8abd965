"""leader_graph_spark — a PySpark-native analytics engine.

Re-expresses the data-processing and query capabilities of the reference
repo qiuyue97/leader_graph (batch ETL + knowledge-graph derivation over
scraped tabular/HTML data) as idiomatic Spark DataFrame/SQL operators,
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) that a 100 TB deployment
needs.

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
"""

__version__ = "0.1.0"
