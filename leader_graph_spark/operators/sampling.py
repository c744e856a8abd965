"""Deterministic sampling operators for training-data curation.

``df.sample()`` is engine- and partitioning-dependent (seeded per
partition), so two runs over differently-partitioned copies of the
same data disagree — useless for reproducible dataset releases. These
operators derive membership from a hash of the ROW KEY instead: any
engine, any partitioning, same sample. Same principle as the
md5-bucket train/val/test split (``plans/text_queries.py:doc_hash_split``),
extended to per-stratum quotas and weighted sampling.

- :func:`stratified_sample_exact` — exactly ⌈n_s × fraction⌉ rows per
  stratum, chosen by hash rank. One window per stratum partition; at
  scale this is a single shuffle on the stratum key, and a skewed
  stratum is still one partition's sort (use the salted count path if
  a stratum alone exceeds an executor).
- :func:`hash_sample` — Bernoulli-style p-sample with no shuffle at
  all (pure map-side predicate): take rows whose key-hash bucket falls
  under p. Counts are binomial, not exact, but the plan is a filter —
  the form to prefer at 100 TB when ±0.1% on the sample size is fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_MOD = 1_000_000


def _hash_bucket(key_col: str, salt: str) -> "F.Column":
    """Uniform bucket in [0, 1e6) from md5(salt|key) — reproducible in
    any engine with md5 + hex arithmetic (cf. doc_hash_split)."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _HASH_MOD


def hash_sample(
    df: DataFrame, *, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Map-side deterministic sample: keep rows whose hash bucket <
    fraction × 1e6. No shuffle, no state; re-running on re-partitioned
    or incrementally-grown data keeps every previously-sampled row
    (append-stable), which is what incremental dataset refreshes
    need."""
    return df.filter(_hash_bucket(key_col, salt) < int(fraction * _HASH_MOD))


def stratified_sample_exact(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Exact per-stratum quota sample: rank rows inside each stratum by
    (hash, key) and keep the first ⌈count × fraction⌉.

    The hash order makes the choice deterministic and unbiased w.r.t.
    any data ordering; the key tie-break makes it total. Rank order is
    the md5 hex STRING (lexicographic — identical in every engine, no
    hex-to-int arithmetic needed). Equivalent SQL (the oracle form):
    row_number() and count() windows over the stratum partition,
    filtered on rank ≤ ceil(cnt × fraction)."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string")))
    w_rank = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    w_all = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * fraction))
        .drop("_rk", "_n")
    )
