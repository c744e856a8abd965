"""Similarity-search queries over the ``embeddings`` table.

The cosine math is sequential-fold double arithmetic on both engines
(verified bit-identical through round(·, 6)); ranking ties break on
neighbor id so top-k is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from leader_graph_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    embedding_near_duplicates,
)
from leader_graph_spark.plans.registry import query
from leader_graph_spark.sources.tables import load_table

_COS_SQL = (
    "round(list_sum(list_transform(list_zip(a.embedding, b.embedding),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"
)

_TOPK_ORACLE = f"""
WITH scored AS (
  SELECT a.vec_id AS id, b.vec_id AS neighbor_id, {_COS_SQL} AS cosine_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
),
ranked AS (
  SELECT id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


@query("embedding_topk_bruteforce", _TOPK_ORACLE, tags=("similarity-knn",))
def embedding_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors per vector (brute-force baseline for
    ANN). Deterministic: rounded score + id tie-break."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, id_col="vec_id", vec_col="embedding", k=5)


_NEARDUP_ORACLE = f"""
SELECT a.vec_id AS id_1, b.vec_id AS id_2, {_COS_SQL} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS_SQL} >= 0.95
"""


@query("embedding_near_dup", _NEARDUP_ORACLE, tags=("dedup-embedding-cosine",))
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (semantic dedup): unordered
    pairs with cosine ≥ 0.95."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.95
    )


@query("ann_lsh_topk", None, bench=True, tags=("similarity-ann-lsh",))
def ann_lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via sign-random-projection LSH buckets — the
    100 TB scale path (equi-join on bucket instead of all-pairs cross
    join). Hyperplanes are md5-derived on the driver, so not
    SQL-expressible → rows-only check; recall vs brute force is
    unit-tested in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(
        emb, id_col="vec_id", vec_col="embedding", k=5, n_planes=4, n_tables=4, dim=64
    )


_IVF_TOPK_ORACLE = """
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id % 40 = 0
),
cand AS (
  SELECT a.vec_id AS id, a.embedding AS v,
         sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
         c.centroid_id,
         round(
           list_sum(list_transform(list_zip(a.embedding, c.cvec), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS csim
  FROM embeddings a CROSS JOIN centroids c
),
assigned AS (
  SELECT id, v, nrm, centroid_id FROM (
    SELECT id, v, nrm, centroid_id,
           row_number() OVER (PARTITION BY id ORDER BY csim DESC, centroid_id) AS rn
    FROM cand
  ) WHERE rn = 1
),
scored AS (
  SELECT a.id, b.id AS neighbor_id,
         round(list_sum(list_transform(list_zip(a.v, b.v), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (a.nrm * b.nrm), 6) AS cosine_sim
  FROM assigned a JOIN assigned b ON a.centroid_id = b.centroid_id AND a.id <> b.id
)
SELECT id, neighbor_id, cosine_sim, rank FROM (
  SELECT id, neighbor_id, cosine_sim,
         CAST(row_number() OVER (PARTITION BY id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


@query("ann_ivf_topk", _IVF_TOPK_ORACLE, tags=("similarity-ann-ivf",))
def ann_ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probe approximate top-5 (search within the assigned centroid
    partition only) — the inverted-file complement to the SRP-LSH path.
    Fully oracle-checked: assignment (rounded csim + id tie-break) and
    the within-list exact search are both plain fold arithmetic the
    oracle reproduces; recall structure additionally validated in
    tests/test_similarity.py."""
    from leader_graph_spark.operators.similarity import ann_ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, id_col="vec_id", vec_col="embedding", k=5, centroid_mod=40)


from leader_graph_spark.operators.clustering import kmeans_fixed_point, kmeans_oracle_sql  # noqa: E402


@query("kmeans_assignments", kmeans_oracle_sql(k=8, iterations=2), tags=("clustering-kmeans",))
def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=8) over the embeddings in
    integer micro-units — exact arithmetic, so the unrolled-CTE DuckDB
    oracle reproduces assignments and squared distances bit-for-bit
    (the PageRank fixed-point trick applied to clustering). Produces
    the centroid sets that IVF search (``ann_ivf_topk``) probes."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fixed_point(emb, id_col="vec_id", vec_col="embedding", k=8, iterations=2)
