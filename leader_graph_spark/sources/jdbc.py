"""JDBC edge adapters — the engine's boundary to an operational RDBMS.

The reference reads and writes MySQL at every pipeline stage
(``utils/db_utils.py:37-89``, ``src/mysql2neo4j.py:87-151``). In this
engine the lake (parquet) is the system of record and the RDBMS is an
EDGE: ingest once through JDBC into parquet, run all analytics on the
lake, export results back through JDBC. These helpers wrap
``spark.read.jdbc`` / ``df.write.jdbc`` with the settings that matter
at scale:

- **Partitioned parallel reads**: without ``partition_column`` +
  bounds, a JDBC scan is ONE task holding one connection — a
  non-starter for a big table. With them, Spark issues
  ``num_partitions`` range-bounded queries in parallel.
- **Predicate pushdown**: Catalyst pushes filters on the returned
  DataFrame into the generated SQL (visible as ``PushedFilters`` in
  ``explain``), so ``read_jdbc_table(...).filter(...)`` ships the
  WHERE clause to the database, not the rows to Spark. Explicit
  ``predicates`` (one WHERE fragment per partition) cover non-numeric
  splits the bounds form can't express.
- **fetchsize / batchsize**: the row-at-a-time JDBC defaults are the
  classic throughput killer; both default higher here.

No MySQL driver jar ships with this repo; pass the driver class via
``properties`` and put the jar on the Spark classpath at deployment.
CI exercises this edge unconditionally against EMBEDDED Derby (the jar
pyspark already ships for the Hive metastore) in
``tests/test_jdbc_embedded.py``; the live-endpoint round-trip also
runs when ``SPARK_GRAFT_JDBC_URL`` is set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000
DEFAULT_BATCH_SIZE = 10_000


def jdbc_options(
    url: str,
    table: str,
    *,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Common option dict for the DataFrameReader/Writer jdbc paths."""
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if properties:
        opts.update(properties)
    return opts


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    predicates: list[str] | None = None,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S5/S1 edge read (``utils/db_utils.py:37-60``): a table (or a
    ``(SELECT …) t`` pushdown subquery) from an operational database.

    Exactly one of three parallelism modes applies:
    - ``predicates``: one partition per WHERE fragment (non-numeric or
      skew-aware splits, e.g. per-month fragments);
    - ``partition_column`` + bounds: ``num_partitions`` range queries
      over a numeric/date column (the common case — use the primary
      key);
    - neither: single-connection read, acceptable only for dimension
      tables.
    """
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(
        url, table, fetch_size=fetch_size, properties=properties
    ).items():
        reader = reader.option(k, v)
    if predicates is not None:
        props = dict(properties or {})
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """K1/K2 edge write (``utils/db_utils.py:61-89``): append or
    overwrite into an RDBMS table.

    ``num_partitions`` caps concurrent connections (each write task
    holds one); ``batch_size`` batches INSERTs. True keyed upsert is
    engine-specific SQL (ON DUPLICATE KEY / ON CONFLICT) that plain
    ``write.jdbc`` cannot express — the lake-side equivalent is
    ``keyed_upsert_recompute`` (K2); for a real MySQL edge, land into a
    staging table here and issue the merge statement on the database.
    """
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def ingest_jdbc_to_parquet(
    spark: SparkSession,
    url: str,
    table: str,
    out_dir: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> None:
    """The landing-zone move (``src/mysql2neo4j.py:87-151`` reshaped):
    one parallel JDBC scan → columnar lake files; every downstream query
    then gets parquet pushdown/pruning instead of hammering the OLTP
    store."""
    df = read_jdbc_table(
        spark,
        url,
        table,
        partition_column=partition_column,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        num_partitions=num_partitions,
        properties=properties,
    )
    df.write.mode("overwrite").parquet(out_dir)
