"""Probabilistic record linkage (Fellegi & Sunter, JASA 1969) as pure
DataFrame composition — the entity-resolution step a training-data
pipeline runs when the same real-world entity arrives from multiple
sources with dirty quasi-identifiers (user profiles, author records,
crawled contact pages) and exact-key dedup cannot see the match.

Method (public: Fellegi-Sunter; the same decision model behind Splink
and RecordLinkage): candidate pairs come from BLOCKING (an equi-join
on one or more deterministic keys — never all-pairs), each pair gets a
per-field agreement vector, each field contributes its log-likelihood
weight (agreement weight ``log2(m/u)`` > 0, disagreement weight
``log2((1-m)/(1-u))`` < 0, for match/unmatch probabilities m and u),
and the summed score is thresholded into match / possible / non_match.
Weights are supplied as INTEGER milli-units so score sums are exact
``bigint`` arithmetic — no float summation order anywhere, which keeps
the operator oracle-hashable.

Scale design (100 TB):
- Pair generation is an equi-join on the blocking key: both sides
  shuffle ONCE on that key and the pair count is sum over blocks of
  |A_b| x |B_b| — bounded by blocking design, never |A| x |B|. A
  blocking key with hot blocks is the usual skew story: refine the key
  (more fields) or salt; AQE's skew-join split also applies.
- The agreement vector, weights and verdict are all built-in column
  expressions: constant-folded by Catalyst, whole-stage codegen,
  zero Python in the hot path.
- Multi-pass blocking (union of several blocking keys, dedup on the
  pair id) composes from this primitive plus ``union``/``dropDuplicates``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fellegi_sunter_link", "levenshtein_within"]


def levenshtein_within(max_edits: int) -> Callable[[Column, Column], Column]:
    """Approximate-agreement predicate for :func:`fellegi_sunter_link`:
    fields agree when their Levenshtein distance is within
    ``max_edits`` (typos, OCR noise, transliteration drift — the
    real-world reason exact-equality linkage under-merges). Built on
    the JVM ``levenshtein`` expression (exact integer edit distance;
    DuckDB's ``levenshtein`` matches it 1:1, so banded agreement stays
    oracle-exact). NULL handling mirrors ``eqNullSafe``: two NULLs
    agree, NULL vs value disagrees."""
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")

    def pred(lc: Column, rc: Column) -> Column:
        both_null = lc.isNull() & rc.isNull()
        neither = lc.isNotNull() & rc.isNotNull()
        return both_null | (neither & (F.levenshtein(lc, rc) <= int(max_edits)))

    return pred


def fellegi_sunter_link(
    left: DataFrame,
    right: DataFrame,
    *,
    block_on: str | list[str],
    compare: dict[str, tuple],
    weights: dict[str, tuple[int, int]],
    match_threshold: int,
    possible_threshold: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Link ``left`` x ``right`` records that share a blocking key and
    score each candidate pair with Fellegi-Sunter field weights.

    Parameters
    ----------
    block_on : column name (or list) present on BOTH sides; candidate
        pairs are the equi-join on these columns (null keys never
        match, as in SQL join semantics).
    compare : field name -> (left column, right column), optionally
        extended with an agreement predicate: ``(lcol, rcol)`` uses
        null-safe equality (``eqNullSafe``: two NULLs agree, NULL vs
        value disagrees — the standard missing-data convention when m/u
        estimates already price in missingness), while
        ``(lcol, rcol, predicate)`` supplies a custom
        ``Callable[[Column, Column], Column]`` — e.g.
        :func:`levenshtein_within` for typo-tolerant agreement, a
        numeric-band lambda for dates/amounts.
    weights : field name -> (agreement_milli, disagreement_milli),
        integer milli-units of the log-likelihood ratio. Keys must
        equal ``compare``'s.
    match_threshold / possible_threshold : verdict cut points on the
        summed milli-score: ``match`` at >= match_threshold,
        ``possible`` at >= possible_threshold, else ``non_match``.

    Returns the joined pairs with one boolean ``agree_<field>`` per
    compared field, the exact ``bigint`` ``score_milli``, and
    ``verdict``. Every output column is deterministic given the
    inputs, so the operator is value-hash testable against a SQL twin.
    """
    if set(compare) != set(weights):
        raise ValueError(
            f"compare/weights field mismatch: {sorted(compare)} vs {sorted(weights)}"
        )
    if match_threshold < possible_threshold:
        raise ValueError("match_threshold must be >= possible_threshold")
    keys = [block_on] if isinstance(block_on, str) else list(block_on)
    ls, rs = suffixes
    lhs = left.select([F.col(c).alias(c + ls) for c in left.columns])
    rhs = right.select([F.col(c).alias(c + rs) for c in right.columns])
    cond = [lhs[k + ls] == rhs[k + rs] for k in keys]
    pairs = lhs.join(rhs, cond, "inner")

    score: Column = F.lit(0).cast("bigint")
    agree_cols: list[Column] = []
    for fname in sorted(compare):
        spec = compare[fname]
        lcol, rcol = spec[0], spec[1]
        if len(spec) > 2:
            agree = spec[2](pairs[lcol + ls], pairs[rcol + rs])
        else:
            agree = pairs[lcol + ls].eqNullSafe(pairs[rcol + rs])
        agree_cols.append(agree.alias(f"agree_{fname}"))
        w_agree, w_disagree = weights[fname]
        score = score + F.when(agree, F.lit(int(w_agree))).otherwise(
            F.lit(int(w_disagree))
        ).cast("bigint")
    verdict = (
        F.when(score >= int(match_threshold), F.lit("match"))
        .when(score >= int(possible_threshold), F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return pairs.select(
        "*",
        *agree_cols,
        score.alias("score_milli"),
        verdict.alias("verdict"),
    )
