"""Canonical test-table sources (parquet).

The reference reads everything through per-stage JDBC SELECTs with
explicit column lists and ``is_deleted = 0`` filters
(``utils/db_utils.py:37-62``, ``src/mysql2neo4j.py:87-151``); in Spark
the equivalent projection pruning and predicate pushdown are free once
the scan is declared — ``spark.read.parquet`` + ``.select``/``.filter``
reach the parquet reader as ReadSchema/PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ts_parquet_unit(path: str, column: str = "ts") -> str | None:
    """Probe the parquet *logical* type of a timestamp column from the
    file footer (driver-side, no Spark job). Returns the arrow unit
    ('s'/'ms'/'us'/'ns') for timestamp columns, None if the column is
    absent, and raises for a plain integer column — the driver's
    testdata has shipped ``ts`` as TIMESTAMP(NANOS) one round and
    timestamp[us] the next, so a bare int64 has no safe default
    interpretation (off-by-1000× if guessed wrong)."""
    import pyarrow.parquet as pq
    from pyarrow import types as pa_types

    schema = pq.read_schema(path)
    if column not in schema.names:
        return None
    t = schema.field(column).type
    if pa_types.is_timestamp(t):
        return t.unit
    raise ValueError(
        f"{path}: column {column!r} has physical type {t} — not a parquet "
        "timestamp logical type; refusing to guess an epoch unit"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one canonical table. Column pruning / filter pushdown happen
    at the parquet scan for anything composed on top of this.

    The ``events`` table has carried TIMESTAMP(NANOS) — illegal for
    Spark's vectorized parquet reader — so it is read via the
    nanosAsLong legacy mode; the footer logical type is verified to
    really be nanos before converting to microsecond TimestampType
    (truncation, which matches DuckDB's ns→µs conversion of the same
    files).
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            unit = ts_parquet_unit(path)
            if unit != "ns":
                raise ValueError(
                    f"{path}: ts read as bigint but parquet logical unit is "
                    f"{unit!r}, not 'ns' — testdata encoding changed"
                )
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every canonical table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def fan_out(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Decouple CPU parallelism from input splits for per-row-expensive
    downstream work (md5 hashing, shingling, SRP projections).

    A 100 TB table arrives in thousands of scan splits and this is a
    no-op; a small single-file table arrives as ONE split, which would
    serialize all downstream hash work on one core while 31 idle. When
    the scan has fewer partitions than the cluster's default
    parallelism, round-robin-shuffle the (narrow) input once — measured
    3.5× on the MinHash pipeline at sf0.1. Skipped entirely when the
    input is already parallel, so it never adds a shuffle at scale.
    """
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
