"""K-means clustering over an embedding column — the IVF-training /
corpus-partitioning primitive of a training-data pipeline (the offline
step that produces the centroids ``ann_ivf_topk`` probes).

Like :mod:`leader_graph_spark.graph.algorithms` PageRank, the iterative
loop runs in **integer micro-units** (``CAST(floor(x·1e6) AS BIGINT)``)
so every distance, argmin, and centroid mean is exact integer
arithmetic — order-independent, hence reproducible bit-for-bit by an
unrolled SQL oracle. Float k-means would hash differently across
engines because summation order differs per partitioning.

Scale shape per iteration (the Lloyd step GraphX/MLlib also use):
- centroids are k rows → **broadcast**; assignment is a map-side
  zip_with fold per (vector, centroid) — no shuffle, no n×k join
  materialization beyond the projected argmin;
- the centroid update is one groupBy(cid) over n rows (map-side
  partial sums of 64-element arrays via posexplode), shuffling at
  most k·dim·partitions rows;
- ``localCheckpoint`` truncates lineage so the unrolled plan stays
  flat across iterations.

Reference parity: the reference has no clustering; this is a
north-star operator (BASELINE.json: similarity-search scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def to_fixed_point(vec, scale: int = MICRO):
    """array<float> → array<bigint> micro-units via floor (floor, not
    round: HALF_UP vs banker's rounding differs across engines;
    floor is identical everywhere)."""
    return F.transform(
        vec.cast("array<double>"), lambda x: F.floor(x * F.lit(scale)).cast("bigint")
    )


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def kmeans_fixed_point(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Lloyd's k-means, exact integer arithmetic, deterministic seeds
    (the k smallest ids). Returns the final assignment
    ``(vec_id, cid, sq_dist)`` — ``cid`` is the seed vector's id.

    Ties (equidistant centroids) break toward the smallest cid, and
    the per-dimension mean uses BIGINT ``div`` (truncation toward
    zero), both mirrored exactly by the oracle.
    """
    assign, _ = kmeans_fit(
        emb, id_col=id_col, vec_col=vec_col, k=k, iterations=iterations
    )
    return assign


def kmeans_fit(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """:func:`kmeans_fixed_point` plus the trained codebook: returns
    ``(assignments, centroids)`` where centroids is ``(cid, c
    array<bigint>)`` — the codebook the final assignment was computed
    against (``iterations - 1`` Lloyd updates after seeding). ADC-style
    consumers (PQ search) need the codebook itself, not just the
    argmin."""
    vecs = emb.select(
        F.col(id_col).alias("vid"), to_fixed_point(F.col(vec_col)).alias("v")
    ).localCheckpoint()
    centroids = (
        vecs.orderBy("vid")
        .limit(k)
        .select(F.col("vid").alias("cid"), F.col("v").alias("c"))
        .localCheckpoint()
    )
    w = Window.partitionBy("vid").orderBy("dist", "cid")
    for it in range(iterations):
        assign = (
            vecs.crossJoin(F.broadcast(centroids))
            .select("vid", "v", "cid", _sq_dist(F.col("v"), F.col("c")).alias("dist"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        if it == iterations - 1:
            return (
                assign.select(
                    F.col("vid").alias(id_col), "cid", F.col("dist").alias("sq_dist")
                ),
                centroids,
            )
        # Lloyd update: element-wise integer mean per cluster.
        prev_centroids = centroids
        centroids = (
            assign.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.expr("sum(val) div count(1)").alias("cval"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s.getField("cval"),
                ).alias("c")
            )
            .localCheckpoint()
        )
        from leader_graph_spark.graph.algorithms import _release

        _release(prev_centroids)
    raise AssertionError("iterations must be >= 1")


def kmeans_oracle_ctes(*, k: int = 8, iterations: int = 2) -> tuple[str, str]:
    """The unrolled-CTE body shared by :func:`kmeans_oracle_sql` and
    downstream composites (semantic dedup builds its pair pruning on
    top of the same assignment CTEs). Returns ``(with_body,
    final_assign_name)`` — callers prepend ``WITH `` and select from
    the named CTE (``vecs`` holds the long-format fixed-point vectors).
    """
    base = f"""
vecs AS (
  SELECT vid, u.pos AS pos, u.val AS val FROM (
    SELECT vec_id AS vid,
           unnest(list_transform(range(1, len(embedding) + 1),
                  i -> {{'pos': i - 1, 'val': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)}})) AS u
    FROM embeddings)
),
seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}),
cent0 AS (
  SELECT vid AS cid, pos, val AS cval FROM vecs WHERE vid IN (SELECT vec_id FROM seeds)
)"""
    steps = []
    for it in range(iterations):
        prev = f"cent{it}"
        steps.append(
            f"""
dist{it} AS (
  SELECT v.vid, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
  FROM vecs v JOIN {prev} c ON v.pos = c.pos
  GROUP BY v.vid, c.cid
),
assign{it} AS (
  SELECT vid, cid, dist
  FROM (SELECT vid, cid, dist,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
        FROM dist{it})
  WHERE rn = 1
)"""
        )
        if it < iterations - 1:
            steps.append(
                f"""
cent{it + 1} AS (
  SELECT a.cid, v.pos, sum(v.val) // count(*) AS cval
  FROM assign{it} a JOIN vecs v ON a.vid = v.vid
  GROUP BY a.cid, v.pos
)"""
            )
    return ",".join([base] + steps), f"assign{iterations - 1}"


def kmeans_oracle_sql(*, k: int = 8, iterations: int = 2) -> str:
    """Unrolled-CTE DuckDB twin of :func:`kmeans_fixed_point`.

    Centroids stay in long format (cid, pos, cval) — a different plan
    from the Spark broadcast-array implementation, but identical
    integers, so the driver's value hash matches exactly.
    """
    body, last = kmeans_oracle_ctes(k=k, iterations=iterations)
    # DuckDB sum(BIGINT) yields HUGEINT, which the driver's hasher
    # renders differently from Spark's BIGINT — cast the final column.
    return f"WITH {body}\nSELECT vid AS vec_id, cid, CAST(dist AS BIGINT) AS sq_dist FROM {last}"


def pq_codes(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``m`` contiguous subvectors, k-means each subspace independently
    (:func:`kmeans_fixed_point`, same integer micro-unit arithmetic and
    min-id seeding), and encode every vector as its ``m`` per-subspace
    nearest-centroid ids plus the total squared reconstruction error.

    This is the memory-side scale path for ANN: 64 floats (256 B)
    compress to ``m`` small codes; IVF-PQ search scans codes with
    per-subspace lookup tables instead of raw vectors. Here the encode
    step is the operator; codes are the seed vectors' ids so the whole
    artifact is deterministic and SQL-reproducible.

    Scale shape: each subspace runs the broadcast-centroid Lloyd loop
    over an ``m``-times narrower vector (same shuffle structure,
    ``m``× less data each), then the ``m`` assignment tables — each
    (id, code, err) — join back on the id. Output:
    ``(id, code_0..code_{m-1}, recon_err)`` — codes as SCALAR columns,
    not an array: list columns stringify engine-dependently under the
    driver's hasher (the round-1/2 canonicalization bug class the
    hashability guard bans).
    """
    assigns = []
    for j in range(m):
        sliced = emb.select(
            F.col(id_col),
            F.expr(f"slice({vec_col}, {j} * (size({vec_col}) div {m}) + 1, "
                   f"size({vec_col}) div {m})").alias("subvec"),
        )
        a = kmeans_fixed_point(
            sliced, id_col=id_col, vec_col="subvec", k=k, iterations=iterations
        ).select(
            F.col(id_col),
            F.col("cid").alias(f"code_{j}"),
            F.col("sq_dist").alias(f"err_{j}"),
        )
        assigns.append(a)
    out = assigns[0]
    for a in assigns[1:]:
        out = out.join(a, id_col)
    return out.select(
        F.col(id_col),
        *[F.col(f"code_{j}") for j in range(m)],
        sum([F.col(f"err_{j}") for j in range(m)], F.lit(0).cast("bigint")).alias("recon_err"),
    )


def pq_oracle_sql(*, m: int = 4, dim: int = 64, k: int = 8, iterations: int = 2) -> str:
    """Unrolled DuckDB twin of :func:`pq_codes`: the shared fixed-point
    ``vecs`` CTE, then per-subspace k-means CTE chains filtered to the
    subspace's position range (positions are absolute here, relative in
    Spark — squared distances are translation-invariant, so the
    integers agree exactly)."""
    sub_dim = dim // m
    parts = [
        f"""
vecs AS (
  SELECT vid, u.pos AS pos, u.val AS val FROM (
    SELECT vec_id AS vid,
           unnest(list_transform(range(1, len(embedding) + 1),
                  i -> {{'pos': i - 1, 'val': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)}})) AS u
    FROM embeddings)
),
seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})"""
    ]
    for j in range(m):
        lo, hi = j * sub_dim, (j + 1) * sub_dim
        parts.append(
            f"""
s{j}vecs AS (SELECT vid, pos, val FROM vecs WHERE pos >= {lo} AND pos < {hi}),
s{j}cent0 AS (
  SELECT vid AS cid, pos, val AS cval FROM s{j}vecs
  WHERE vid IN (SELECT vec_id FROM seeds)
)"""
        )
        for it in range(iterations):
            parts.append(
                f"""
s{j}dist{it} AS (
  SELECT v.vid, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
  FROM s{j}vecs v JOIN s{j}cent{it} c ON v.pos = c.pos
  GROUP BY v.vid, c.cid
),
s{j}assign{it} AS (
  SELECT vid, cid, dist
  FROM (SELECT vid, cid, dist,
               row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
        FROM s{j}dist{it})
  WHERE rn = 1
)"""
            )
            if it < iterations - 1:
                parts.append(
                    f"""
s{j}cent{it + 1} AS (
  SELECT a.cid, v.pos, sum(v.val) // count(*) AS cval
  FROM s{j}assign{it} a JOIN s{j}vecs v ON a.vid = v.vid
  GROUP BY a.cid, v.pos
)"""
                )
    last = iterations - 1
    codes = ", ".join(f"s{j}assign{last}.cid AS code_{j}" for j in range(m))
    errs = " + ".join(f"s{j}assign{last}.dist" for j in range(m))
    joins = "\nJOIN ".join(
        [f"s0assign{last}"]
        + [f"s{j}assign{last} USING (vid)" for j in range(1, m)]
    )
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT vid AS vec_id, {codes}, CAST({errs} AS BIGINT) AS recon_err
FROM {joins}"""
    )


def pq_adc_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    n_queries: int = 10,
    topk: int = 5,
) -> DataFrame:
    """PQ search by asymmetric distance computation (ADC): approximate
    top-``topk`` neighbors of the ``n_queries`` smallest-id vectors,
    where dist(query, vec) ≈ Σ_j sqdist(query_sub_j, codebook_j[code_j]).

    The PQ payoff at 100 TB: the corpus side is touched ONLY through
    its codes (``m`` small ints per vector); raw vectors are needed for
    the queries alone. Per subspace the LUT is ``n_queries × k`` rows —
    a broadcast — so scoring is a map-side broadcast-hash join against
    the codes table followed by one (query, vec) sum; no shuffle ever
    carries a vector.

    Exact integer arithmetic end-to-end (micro-unit fixed point), so
    the unrolled SQL oracle reproduces distances and ranks exactly.
    Output: ``(query_id, neighbor_id, approx_sq_dist, rank)``; ties
    break toward the smaller neighbor id; queries match themselves
    (rank 1 with error = their own reconstruction error — kept, as a
    built-in sanity signal).
    """
    per_sub = []
    for j in range(m):
        sliced = emb.select(
            F.col(id_col),
            F.expr(f"slice({vec_col}, {j} * (size({vec_col}) div {m}) + 1, "
                   f"size({vec_col}) div {m})").alias("subvec"),
        )
        assign, cents = kmeans_fit(
            sliced, id_col=id_col, vec_col="subvec", k=k, iterations=iterations
        )
        qvecs = (
            sliced.orderBy(id_col)
            .limit(n_queries)
            .select(F.col(id_col).alias("qid"), to_fixed_point(F.col("subvec")).alias("qv"))
        )
        lut = qvecs.crossJoin(F.broadcast(cents)).select(
            "qid", "cid", _sq_dist(F.col("qv"), F.col("c")).alias("d")
        )
        per_sub.append(
            assign.select(F.col(id_col).alias("nid"), "cid")
            .join(F.broadcast(lut), "cid")
            .select("qid", "nid", "d")
        )
    scores = per_sub[0]
    for p in per_sub[1:]:
        scores = scores.unionByName(p)
    totals = scores.groupBy("qid", "nid").agg(F.sum("d").alias("approx_sq_dist"))
    w = Window.partitionBy("qid").orderBy("approx_sq_dist", "nid")
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "approx_sq_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_adc_oracle_sql(
    *, m: int = 4, dim: int = 64, k: int = 8, iterations: int = 2,
    n_queries: int = 10, topk: int = 5,
) -> str:
    """DuckDB twin of :func:`pq_adc_topk`: the PQ training CTEs from
    :func:`pq_oracle_sql` plus per-subspace query LUTs against the
    final codebook and a rank window over the summed distances."""
    base = pq_oracle_sql(m=m, dim=dim, k=k, iterations=iterations)
    with_body = base[len("WITH "):base.rindex("\nSELECT")]
    last = iterations - 1
    parts = [with_body]
    parts.append(
        f"qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_queries})"
    )
    unions = []
    for j in range(m):
        cent = f"s{j}cent{last}"
        parts.append(
            f"""
lut{j} AS (
  SELECT v.vid AS qid, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS d
  FROM s{j}vecs v JOIN {cent} c ON v.pos = c.pos
  WHERE v.vid IN (SELECT vec_id FROM qids)
  GROUP BY v.vid, c.cid
)"""
        )
        unions.append(
            f"SELECT l.qid, a.vid AS nid, l.d FROM s{j}assign{last} a "
            f"JOIN lut{j} l ON l.cid = a.cid"
        )
    union_sql = "\nUNION ALL\n".join(unions)
    parts.append(f"""
totals AS (
  SELECT qid, nid, CAST(sum(d) AS BIGINT) AS approx_sq_dist
  FROM ({union_sql})
  GROUP BY qid, nid
)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT qid AS query_id, nid AS neighbor_id, approx_sq_dist,
       CAST(rn AS INTEGER) AS rank
FROM (SELECT qid, nid, approx_sq_dist,
             row_number() OVER (PARTITION BY qid ORDER BY approx_sq_dist, nid) AS rn
      FROM totals)
WHERE rn <= {topk}"""
    )


def pq_adc_rerank_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    n_queries: int = 10,
    coarse_k: int = 20,
    topk: int = 5,
) -> DataFrame:
    """Two-stage retrieval — the production ANN read path: a WIDE
    approximate candidate set from code-only PQ-ADC scoring
    (:func:`pq_adc_topk` with ``coarse_k`` candidates), then an EXACT
    re-rank that touches raw vectors only for the |queries| × coarse_k
    survivors. Quantization error costs recall at the coarse stage
    only; the final ordering is exact over the candidates.

    Scale shape: the coarse stage never shuffles a vector (codes +
    broadcast LUTs); the re-rank joins the tiny candidate list to the
    corpus by id twice (query side, neighbor side) — point lookups a
    lake layout serves with pruned scans — and computes the exact
    fixed-point distance in-row. Work touching raw vectors is
    O(n_queries · coarse_k), independent of corpus size.

    Output: (query_id, neighbor_id, exact_sq_dist, rank ≤ topk); ties
    break toward the smaller neighbor id."""
    coarse = pq_adc_topk(
        emb, id_col=id_col, vec_col=vec_col, m=m, k=k,
        iterations=iterations, n_queries=n_queries, topk=coarse_k,
    ).select("query_id", "neighbor_id")
    fixed = emb.select(
        F.col(id_col), to_fixed_point(F.col(vec_col)).alias("fv")
    )
    qv = fixed.select(F.col(id_col).alias("query_id"), F.col("fv").alias("qv"))
    nv = fixed.select(F.col(id_col).alias("neighbor_id"), F.col("fv").alias("nv"))
    scored = (
        coarse.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _sq_dist(F.col("qv"), F.col("nv")).alias("exact_sq_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("exact_sq_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            "exact_sq_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_adc_rerank_oracle_sql(
    *, m: int = 4, dim: int = 64, k: int = 8, iterations: int = 2,
    n_queries: int = 10, coarse_k: int = 20, topk: int = 5,
) -> str:
    """DuckDB twin of :func:`pq_adc_rerank_topk`: the coarse oracle as
    a derived table, exact micro-unit distances recomputed per
    candidate by indexing both raw vectors."""
    coarse = pq_adc_oracle_sql(
        m=m, dim=dim, k=k, iterations=iterations,
        n_queries=n_queries, topk=coarse_k,
    )
    fx = "CAST(floor(CAST({v}[i] AS DOUBLE) * 1000000) AS BIGINT)"
    qf, nf = fx.format(v="q.embedding"), fx.format(v="n.embedding")
    return f"""
WITH coarse AS ({coarse}),
exact AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(sum(({qf} - {nf}) * ({qf} - {nf})) AS BIGINT) AS exact_sq_dist
  FROM coarse c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings n ON n.vec_id = c.neighbor_id
  CROSS JOIN (SELECT unnest(range(1, {dim} + 1)) AS i)
  GROUP BY c.query_id, c.neighbor_id
)
SELECT query_id, neighbor_id, exact_sq_dist, CAST(rn AS INTEGER) AS rank
FROM (SELECT query_id, neighbor_id, exact_sq_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY exact_sq_dist, neighbor_id) AS rn
      FROM exact)
WHERE rn <= {topk}"""
