"""Skew A/B: naive vs bucketed interval self-join under a hot key
(round-4 VERDICT item 4).

SCALE.md claims the month-bucket blocking variant
(``interval_overlap_self_join_bucketed``) loses ~1.4x on uniform keys
but wins under key skew — the 100 TB argument. This script backs the
claim with a number: it synthesizes two deterministic datasets of
identical size,

  uniform — N people spread evenly over K keys,
  hot     — the same N people but ~30%% of them on ONE key
            (the verdict's "one nation holding ~30%% of customers"),

and interleaved-best-of-N A/Bs the naive equi-join form against the
bucketed form on each. Both forms must produce identical pair counts
(asserted). The mechanism being measured:

  * naive: all pairs of a key meet in ONE sort-merge partition — a hot
    key with H rows costs H^2/2 candidate comparisons single-threaded;
  * bucketed: pairs only meet in the coarse month bucket containing the
    later start, so a hot key's comparisons shrink to
    sum_b rows(b)^2/2 (intervals are short relative to the time range)
    AND spread over (key, bucket) partitions.

Synthetic data is generated in-Spark from ``spark.range`` with
xxhash64-derived fields — deterministic, no files written, and the
generator is materialized via localCheckpoint so the A/B times the
JOIN, not the generator.

Reference semantics unchanged (src/mysql2neo4j.py:255-489); this is a
physical-strategy benchmark only.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from leader_graph_spark.operators.intervals import (
    interval_overlap_self_join,
    interval_overlap_self_join_bucketed,
)
from leader_graph_spark.session import get_spark

N = 120_000  # people
K = 400  # keys
MONTH_RANGE = 600  # 50 years of month scalars
HOT_SHARE_MOD = 10  # id % 10 < 3  -> ~30% of rows on key 0
RUNS = 3
BUCKET_MONTHS = 24  # matches the shipped flagship_colleagues_bucketed


def _people(spark, *, hot: bool):
    df = spark.range(N).select(F.col("id").alias("person_id"))
    h = lambda salt: F.abs(F.xxhash64(F.col("person_id"), F.lit(salt)))  # noqa: E731
    if hot:
        key = F.when(F.col("person_id") % HOT_SHARE_MOD < 3, F.lit(0)).otherwise(
            (h("key") % (K - 1)) + 1
        )
    else:
        key = h("key") % K
    start = h("start") % (MONTH_RANGE - 30)
    length = 6 + h("len") % 18
    return df.select(
        "person_id",
        key.cast("long").alias("group_key"),
        start.cast("long").alias("start_m"),
        (start + length).cast("long").alias("end_m"),
    )


def main():
    spark = get_spark("profile_skew_interval")
    datasets = {
        name: _people(spark, hot=hot).localCheckpoint()
        for name, hot in (("uniform", False), ("hot", True))
    }
    forms = {
        "naive": lambda d: interval_overlap_self_join(
            d, key_cols=["group_key"], id_col="person_id"
        ),
        "bucketed": lambda d: interval_overlap_self_join_bucketed(
            d, key_cols=["group_key"], id_col="person_id", bucket_months=BUCKET_MONTHS
        ),
    }
    # Correctness gate + warm-up: both forms must emit the same pairs.
    counts = {}
    for dname, d in datasets.items():
        for fname, fn in forms.items():
            counts[f"{dname}/{fname}"] = fn(d).count()
        assert counts[f"{dname}/naive"] == counts[f"{dname}/bucketed"], counts
    timings = {f"{d}/{f}": [] for d in datasets for f in forms}
    for _ in range(RUNS):
        for dname, d in sorted(datasets.items()):
            for fname, fn in sorted(forms.items()):
                t0 = time.perf_counter()
                fn(d).write.format("noop").mode("overwrite").save()
                timings[f"{dname}/{fname}"].append(round(time.perf_counter() - t0, 3))
    best = {n: min(t) for n, t in timings.items()}
    out = {
        "n": N,
        "keys": K,
        "hot_share": 0.3,
        "bucket_months": BUCKET_MONTHS,
        "runs": RUNS,
        "pair_counts": counts,
        "best": best,
        "crossover": {
            "uniform_bucketed_over_naive": round(
                best["uniform/bucketed"] / best["uniform/naive"], 2
            ),
            "hot_naive_over_bucketed": round(best["hot/naive"] / best["hot/bucketed"], 2),
        },
        "all": timings,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
