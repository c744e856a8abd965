"""Incremental join maintenance: the differential delta must equal the
full recompute minus the stored result — no missing rows, no double
counting — on crafted data where every delta/base combination occurs."""

from __future__ import annotations

from leader_graph_spark.operators.ivm import (
    incremental_join_delta,
    incremental_join_update,
)


def _dfs(spark):
    # keys: 1 base×base, 2 base-l×delta-r, 3 delta-l×base-r,
    # 4 delta-l×delta-r, 5 l-only, 6 r-only; key 7 multi-row fanout.
    base_l = spark.createDataFrame(
        [(1, "bl1"), (2, "bl2"), (5, "bl5"), (7, "bl7a"), (7, "bl7b")], "k long, lv string"
    )
    delta_l = spark.createDataFrame([(3, "dl3"), (4, "dl4")], "k long, lv string")
    base_r = spark.createDataFrame([(1, "br1"), (3, "br3"), (6, "br6"), (7, "br7")], "k long, rv string")
    delta_r = spark.createDataFrame([(2, "dr2"), (4, "dr4"), (7, "dr7")], "k long, rv string")
    return base_l, delta_l, base_r, delta_r


def test_incremental_equals_full_recompute(spark):
    base_l, delta_l, base_r, delta_r = _dfs(spark)
    stored = base_l.join(base_r, "k")
    maintained = incremental_join_update(stored, base_l, delta_l, base_r, delta_r, "k")
    full = base_l.unionByName(delta_l).join(base_r.unionByName(delta_r), "k")
    got = sorted(tuple(r) for r in maintained.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want
    # fanout key 7: 2 left rows × 2 right rows must appear exactly 4×.
    assert sum(1 for t in got if t[0] == 7) == 4


def test_delta_branches_disjoint(spark):
    base_l, delta_l, base_r, delta_r = _dfs(spark)
    delta = incremental_join_delta(base_l, delta_l, base_r, delta_r, "k")
    rows = [tuple(r) for r in delta.collect()]
    assert len(rows) == len(set(rows))  # no row produced by both branches
    # delta-l×delta-r (key 4) arrives exactly once, via the first branch.
    assert sum(1 for t in rows if t[0] == 4) == 1


def test_retractable_delta_paths(spark):
    """All four retraction paths on one crafted table: dirty group's
    min repaired upward after deleting the minimum; insert-only group
    merges algebraically; untouched group passes through; fully-deleted
    group disappears; brand-new group appears."""
    from pyspark.sql import functions as F

    from leader_graph_spark.operators.skew import apply_retractable_delta

    base = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 9), ("b", 2), ("b", 4), ("c", 7), ("d", 3)],
        "k string, v long",
    )
    state0 = base.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("min_v"), F.max("v").alias("max_v"),
    )
    changes = spark.createDataFrame(
        [
            ("a", 1, -1),   # delete the min of a → dirty, min must become 5
            ("b", 6, 1),    # insert-only → algebraic max bump
            ("d", 3, -1),   # delete d's only row → group drops
            ("e", 11, 1),   # brand-new group
        ],
        "k string, v long, w int",
    )
    current = spark.createDataFrame(
        [("a", 5), ("a", 9), ("b", 2), ("b", 4), ("b", 6), ("c", 7), ("e", 11)],
        "k string, v long",
    )
    out = {
        r.k: (r.n, r.total, r.min_v, r.max_v)
        for r in apply_retractable_delta(
            state0, changes, current, keys=["k"], value_col="v"
        ).collect()
    }
    assert out == {
        "a": (2, 14, 5, 9),
        "b": (3, 12, 2, 6),
        "c": (1, 7, 7, 7),
        "e": (1, 11, 11, 11),
    }
