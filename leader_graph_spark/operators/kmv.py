"""K-Minimum-Values (KMV / bottom-k) distinct sketches.

The mergeable-summary family (HLL NDV, CMS frequency, equi-depth
ranges, bitmap exact algebra) lacks one shape: an APPROXIMATE sketch
that supports set INTERSECTION — HLL unions beautifully but cannot
intersect without inclusion-exclusion error blowup, and exact bitmaps
pay memory linear in cardinality. KMV (Beyer et al. 2007, "On synopses
for distinct-value estimation under multiset operations") closes it:
keep the k smallest hash values of the key set; then

- distinct estimate  D̂ = (k−1)/θ, θ = the k-th smallest normalized
  hash (if the set has < k members the sketch IS the set — exact);
- union sketch       = k smallest of the concatenated sketches;
- intersection       Ĵ = |{v ∈ union-sketch : v in BOTH inputs}| / k,
  D̂∩ = Ĵ · D̂∪ — the resemblance estimator over the union's bottom-k.

Everything here is DETERMINISTIC: the "random" hash is md5 (leading 8
hex chars → 32-bit value), so a DuckDB oracle reproduces the sketch —
including every estimate — bit-for-bit. That is the usual repo
contract: the approximation error is part of the verified output, not
an excuse to skip verification.

Scale shape: a bottom-k is an algebraic aggregate — per-partition
bottom-k (map-side), then bottom-k of the concatenation — shipped here
as ``sort_array(collect_set)[0:k]`` over per-partition pre-truncated
arrays. Sketch size is k values regardless of cardinality; merges are
array concatenation + truncate, never a rescan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 32)


def _key_hash(key: Column | str) -> Column:
    """32-bit deterministic hash: leading 8 md5 hex chars (the same
    engine-portable arithmetic as every sampling/minhash operator)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


def kmv_sketch(df: DataFrame, *, key_col: str, k: int = 64) -> DataFrame:
    """One-row sketch: ``values`` = the k smallest distinct key hashes
    (ascending). Distinct keys hash distinctly modulo 32-bit collisions
    — which the estimator absorbs like any KMV implementation."""
    per_part = (
        df.select(_key_hash(key_col).alias("h"))
        .groupBy(F.spark_partition_id().alias("_p"))
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("vals"))
    )
    return per_part.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("vals")))), 1, k
        ).alias("values")
    )


def kmv_distinct_estimate(values: Column, k: int) -> Column:
    """D̂ = (k−1)/θ with θ = kth-min / 2³²; exact size when the sketch
    holds the whole set (fewer than k values)."""
    full = F.size(values) >= k
    theta = F.element_at(values, k).cast("double") / F.lit(HASH_SPACE)
    return F.when(full, F.round(F.lit(k - 1) / theta, 6)).otherwise(
        F.size(values).cast("double")
    )


def kmv_overlap_estimates(
    a: DataFrame, b: DataFrame, *, k: int = 64
) -> DataFrame:
    """Union/intersection/Jaccard estimates from two one-row sketches
    (columns ``values``). Output one row: (union_est, jaccard_est,
    intersection_est) — all deterministic, all reproducible by the SQL
    oracle."""
    merged = (
        a.select(F.col("values").alias("va"))
        .crossJoin(b.select(F.col("values").alias("vb")))
        .select(
            "va",
            "vb",
            F.slice(
                F.array_sort(F.array_union("va", "vb")), 1, k
            ).alias("vu"),
        )
    )
    in_both = F.size(
        F.filter(
            F.col("vu"),
            lambda v: F.array_contains("va", v) & F.array_contains("vb", v),
        )
    )
    union_est = kmv_distinct_estimate(F.col("vu"), k)
    jaccard = F.round(in_both.cast("double") / F.least(F.size("vu"), F.lit(k)), 6)
    return merged.select(
        union_est.alias("union_est"),
        jaccard.alias("jaccard_est"),
        F.round(union_est * jaccard, 6).alias("intersection_est"),
    )
