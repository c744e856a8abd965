"""Crafted-case semantics for the behavior queries and the weighted
sampler: funnel ordering constraints, retention offsets, and the A-ES
sample vs a pure-python model of the same key arithmetic."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime

from pyspark.sql import functions as F


def _ts(s: str):
    return datetime.fromisoformat(s)


def _funnel(spark, rows):
    from leader_graph_spark.plans.behavior_queries import funnel_view_click_purchase  # noqa: F401
    # Drive the same window chain through a temp view of crafted events.
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    w_cols = df
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    w_cols = w_cols.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    w_cols = w_cols.withColumn(
        "t_click",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
        ).over(w),
    )
    w_cols = w_cols.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
            )
        ).over(w),
    )
    agg = w_cols.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return {r.user_id: (r.t_view, r.t_click, r.t_purchase) for r in agg.collect()}


def test_funnel_ordering_constraint(spark):
    rows = [
        # user 1: purchase BEFORE any view must not count; later chain does.
        (1, "purchase", _ts("2024-01-01 00:00:00")),
        (1, "view", _ts("2024-01-01 01:00:00")),
        (1, "click", _ts("2024-01-01 02:00:00")),
        (1, "purchase", _ts("2024-01-01 03:00:00")),
        # user 2: click with no prior view → funnel stalls at view-missing.
        (2, "click", _ts("2024-01-01 01:00:00")),
        # user 3: view then click at the SAME instant → strict > rejects it.
        (3, "view", _ts("2024-01-01 01:00:00")),
        (3, "click", _ts("2024-01-01 01:00:00")),
    ]
    got = _funnel(spark, rows)
    assert got[1] == (
        _ts("2024-01-01 01:00:00"),
        _ts("2024-01-01 02:00:00"),
        _ts("2024-01-01 03:00:00"),
    )
    assert got[2] == (None, None, None)
    assert got[3] == (_ts("2024-01-01 01:00:00"), None, None)


def test_weighted_sample_matches_python_model(spark):
    from leader_graph_spark.operators.sampling import weighted_sample_topk

    rows = [(i, "s", 10 + 90 * (i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    got = {
        (r.doc_id, r.rk)
        for r in weighted_sample_topk(
            df, strata_col="lang", key_col="doc_id", weight_col="n_chars", k=5
        ).collect()
    }

    def aes(doc_id: int, w: int) -> float:
        h = hashlib.md5(f"wsample|{doc_id}".encode()).hexdigest()
        bucket = int(h[:8], 16) % 1_000_000
        return -math.log((bucket + 0.5) / 1_000_000.0) / w

    ranked = sorted(rows, key=lambda r: (aes(r[0], r[2]), r[0]))[:5]
    want = {(r[0], i + 1) for i, r in enumerate(ranked)}
    assert got == want


def test_weighted_sample_zero_weight_excluded(spark):
    from leader_graph_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, "s", 0), (2, "s", 5)], "doc_id bigint, lang string, n_chars bigint"
    )
    rows = weighted_sample_topk(
        df, strata_col="lang", key_col="doc_id", weight_col="n_chars", k=5
    ).collect()
    assert [r.doc_id for r in rows] == [2]


def test_domain_cap_caps_and_is_stable(spark):
    from leader_graph_spark.operators.sampling import domain_capped_sample

    rows = [(i, f"d{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_capped_sample(
        df, domain_col="source", key_col="doc_id", max_per_domain=5
    )
    got = out.collect()
    per = {}
    for r in got:
        per.setdefault(r.source, []).append(r.doc_id)
    assert all(len(v) == 5 for v in per.values())
    assert {r.domain_rank for r in got} == {1, 2, 3, 4, 5}
    # repartitioning must not change the survivors (hash order, not
    # arrival/partition order)
    re = {
        (r.doc_id, r.source)
        for r in domain_capped_sample(
            df.repartition(13), domain_col="source", key_col="doc_id", max_per_domain=5
        ).collect()
    }
    assert re == {(r.doc_id, r.source) for r in got}


def test_dsir_scores_prefer_target_like_docs(spark):
    """Docs written in the target's vocabulary must outscore docs in a
    disjoint vocabulary — the ordering is the product."""
    from leader_graph_spark.operators.sampling import dsir_importance_scores

    target_vocab = "alpha beta gamma delta epsilon"
    other_vocab = "zork blarg quux fnord wibble"
    rows = [
        (1, target_vocab + " " + target_vocab),
        (2, other_vocab + " " + other_vocab),
        (3, target_vocab),  # target-like raw doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100 + i, target_vocab) for i in range(10)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.dsir_score, r.n_tokens)
        for r in dsir_importance_scores(
            df, target, key_col="doc_id", text_col="text"
        ).collect()
    }
    # per-token score: normalize by token count to compare fairly
    assert got[1][0] / got[1][1] > got[2][0] / got[2][1]
    assert got[3][0] / got[3][1] > got[2][0] / got[2][1]
