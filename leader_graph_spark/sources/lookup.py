"""S6 — keyed point lookup over a lake layout.

The reference serves ``get_html_by_org_id/uuid/name(key) → remark``
from an indexed MySQL table
(``html_extractor/extract_table_from_remark.py:77-165``). A data lake
has no B-tree, but the same O(small) lookup falls out of LAYOUT: hash
the key into ``n_buckets`` directory partitions at write time and sort
rows by key inside each file. A point lookup then

1. prunes to ONE directory via the partition filter (reads 1/n_buckets
   of the table's files — the coarse "index"), and
2. skips row groups inside that bucket via parquet min/max stats on
   the sorted key column (the fine "index").

No shuffle, no driver collect of data — only the bucket number is
computed up front. The managed-table twin (``df.write.bucketBy(n,
key).sortBy(key).saveAsTable``) additionally feeds shuffle-free joins;
the path-based form here needs no metastore and is what a landing zone
actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_key_bucket"


def _bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))


def write_keyed_layout(
    df: DataFrame, path: str, *, key_col: str, n_buckets: int = 64
) -> None:
    """Materialize a lookup-optimized layout: hash-bucket directory
    partitions + key-sorted files (row-group stats become selective).

    ``n_buckets`` sizes the pruning granularity: each lookup scans
    ~table_bytes/n_buckets, so pick buckets so one bucket is a few
    hundred MB at the target scale. The key is hashed as a string so
    any key type lays out identically."""
    (
        df.withColumn(BUCKET_COL, _bucket_expr(key_col, n_buckets))
        .repartition(n_buckets, BUCKET_COL)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def point_lookup(
    spark: SparkSession, path: str, *, key_col: str, value, n_buckets: int = 64
) -> DataFrame:
    """Keyed lookup against a :func:`write_keyed_layout` table.

    The bucket number for ``value`` is computed with the same hash
    (one 1-row local plan — no data scan), then applied as a literal
    partition filter so the scan lists exactly one directory; the
    equality predicate on the sorted key column prunes row groups
    within it. Returns the matching rows as a DataFrame."""
    bucket = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(value).cast("string")), F.lit(n_buckets)).alias("b")
        )
        .first()["b"]
    )
    return (
        spark.read.parquet(path)
        .filter(F.col(BUCKET_COL) == int(bucket))
        .filter(F.col(key_col) == value)
        .drop(BUCKET_COL)
    )
