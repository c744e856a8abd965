"""Crafted-case semantics for the round-10 additions: multi-touch
attribution boundaries, the Q18 group-HAVING join-back, the vocab
coverage curve, and the bigram-LM scorer's smoothing arithmetic."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s: str):
    return datetime.fromisoformat(s)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).select("event_id", "ts", "user_id", "event_type", F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_attribution_lookback_boundaries(spark, tmp_path):
    from leader_graph_spark.plans.behavior_queries import purchase_attribution_touches

    sf = _write_events(
        spark,
        tmp_path,
        [
            # purchase 100 at Jan 10 00:00; lookback [Jan 7 00:00, Jan 10 00:00)
            (1, _ts("2024-01-07 00:00:00"), 1, "view"),  # exactly -3d → included
            (2, _ts("2024-01-06 23:59:59"), 1, "view"),  # older than 3d → excluded
            (3, _ts("2024-01-10 00:00:00"), 1, "click"),  # same instant → excluded
            (4, _ts("2024-01-09 12:00:00"), 1, "click"),  # in window → included, last
            (100, _ts("2024-01-10 00:00:00"), 1, "purchase"),
            # purchase 200 with no touches at all: dark conversion row.
            (200, _ts("2024-01-20 00:00:00"), 2, "purchase"),
        ],
    )
    got = {r.purchase_id: r for r in purchase_attribution_touches(spark, sf).collect()}
    p = got[100]
    assert (p.n_views, p.n_clicks) == (1, 1)
    assert p.first_touch_type == "view" and p.last_touch_type == "click"
    assert p.last_touch_gap_us == 12 * 3600 * 1_000_000
    dark = got[200]
    assert (dark.n_views, dark.n_clicks) == (0, 0)
    assert dark.first_touch_type is None and dark.last_touch_gap_us is None


def test_attribution_linear_credit_is_fixed_point_split(spark, tmp_path):
    from leader_graph_spark.plans.behavior_queries import attribution_channel_credit

    sf = _write_events(
        spark,
        tmp_path,
        [
            # one purchase, three touches: 2 views + 1 click (click last).
            (1, _ts("2024-01-09 01:00:00"), 1, "view"),
            (2, _ts("2024-01-09 02:00:00"), 1, "view"),
            (3, _ts("2024-01-09 03:00:00"), 1, "click"),
            (100, _ts("2024-01-10 00:00:00"), 1, "purchase"),
        ],
    )
    got = {r.channel: r for r in attribution_channel_credit(spark, sf).collect()}
    per_touch = 1_000_000_000 // 3
    assert got["view"].linear_credit_nano == 2 * per_touch
    assert got["click"].linear_credit_nano == per_touch
    assert got["click"].last_touch_purchases == 1
    assert got["view"].first_touch_purchases == 1
    assert got["view"].last_touch_purchases == 0


def test_large_volume_customers_having_gate(spark, tmp_path):
    from leader_graph_spark.plans.warehouse_queries import large_volume_customers

    li = spark.createDataFrame(
        # order 10: 260 > 250 qualifies; order 20: exactly 250 must NOT.
        [(10, 200.0), (10, 60.0), (20, 250.0)],
        "l_orderkey bigint, l_quantity double",
    )
    orders = spark.createDataFrame(
        [(10, 1, 1000.0, _ts("2024-01-01 00:00:00")), (20, 1, 2000.0, _ts("2024-01-02 00:00:00"))],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate timestamp",
    )
    cust = spark.createDataFrame([(1, "Customer#1")], "c_custkey bigint, c_name string")
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    cust.write.parquet(str(tmp_path / "customer.parquet"))
    rows = large_volume_customers(spark, str(tmp_path)).collect()
    assert [(r.o_orderkey, r.sum_qty) for r in rows] == [(10, 260.0)]


def test_vocab_coverage_curve_monotone_and_exact(spark, tmp_path):
    from leader_graph_spark.plans.text_queries import vocab_coverage_curve

    docs = spark.createDataFrame(
        # freq: a=4, b=2, c=1 → total 7 occurrences, 3 types.
        [(1, "a a b", "en", "s", 5), (2, "a a b c", "en", "s", 7)],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.k: r for r in vocab_coverage_curve(spark, str(tmp_path)).collect()}
    assert rows[8].n_vocab_types == 3  # only 3 types exist
    assert rows[8].tokens_covered == 7 and rows[8].total_tokens == 7
    assert rows[8].coverage_nano == 1_000_000_000
    # every k ≥ #types saturates identically
    assert rows[64].tokens_covered == 7


def test_bigram_lm_add_one_smoothing(spark, tmp_path):
    from leader_graph_spark.plans.text_queries import bigram_lm_quality

    docs = spark.createDataFrame(
        # corpus: "a b a b" and "a b" → unigrams a=3,b=3 V=2; bigrams:
        # (a,b)=3, (b,a)=1.
        [(1, "a b a b", "en", "s", 7), (2, "a b", "en", "s", 3)],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in bigram_lm_quality(spark, str(tmp_path)).collect()}
    p_ab = (3 + 1) * 1_000_000_000 // (3 + 2)  # c12=3, c1(a)=3, V=2
    p_ba = (1 + 1) * 1_000_000_000 // (3 + 2)
    assert rows[2].n_bigrams == 1 and rows[2].avg_bigram_prob_nano == p_ab
    assert rows[1].n_bigrams == 3
    assert rows[1].avg_bigram_prob_nano == (2 * p_ab + p_ba) // 3
    assert rows[1].min_bigram_prob_nano == p_ba


def test_ancestor_closure_and_rollup_semantics(spark, tmp_path):
    from leader_graph_spark.plans.graph_queries import hierarchy_subtree_rollup

    # forest over keys 1..20, parent = k div 8: children of 1 are 8..15,
    # children of 2 are 16..20; 1's subtree also includes nothing deeper
    # (8*8=64 > 20). Balances = key value in dollars.
    cust = spark.createDataFrame(
        [(k, f"c{k}", 0, float(k), "SEG") for k in range(1, 21)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    cust.write.parquet(str(tmp_path / "customer.parquet"))
    got = {r.node_key: r for r in hierarchy_subtree_rollup(spark, str(tmp_path)).collect()}
    # node 1: direct children 8..15 → 8 descendants, depth 1, sum 8..15
    assert got[1].n_descendants == 8 and got[1].subtree_depth == 1
    assert got[1].desc_balance_cents == sum(range(8, 16)) * 100
    # node 2: children 16..20
    assert got[2].n_descendants == 5
    assert got[2].desc_balance_cents == sum(range(16, 21)) * 100
    # leaves (e.g. 9) have no rollup row at all
    assert 9 not in got


def test_ks_drift_exact_statistic(spark, tmp_path):
    from leader_graph_spark.plans.stats_queries import price_drift_ks

    from datetime import datetime as dt

    early = dt(1997, 1, 1)
    late = dt(1999, 1, 1)
    # one nation; early sample {1,2}, late sample {2,3}:
    # ECDF gaps at v=1: |1/2-0| = .5 ; v=2: |1-1/2| = .5 ; v=3: 0 → KS 0.5
    orders = spark.createDataFrame(
        [
            (1, 1, 1.0, early),
            (2, 1, 2.0, early),
            (3, 1, 2.0, late),
            (4, 1, 3.0, late),
        ],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate timestamp",
    )
    cust = spark.createDataFrame([(1, 0)], "c_custkey bigint, c_nationkey int")
    nation = spark.createDataFrame([(0, "N0", 0)], "n_nationkey int, n_name string, n_regionkey int")
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    cust.write.parquet(str(tmp_path / "customer.parquet"))
    nation.write.parquet(str(tmp_path / "nation.parquet"))
    rows = price_drift_ks(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_early, r.n_late) == (2, 2)
    assert r.ks_nano == 500_000_000


def test_skyline_dominance_semantics(spark, tmp_path):
    from leader_graph_spark.plans.analytics_queries import supplier_offer_skyline

    from datetime import datetime as dt, timedelta

    base = dt(1992, 1, 1)

    from datetime import datetime as dt

    def row(pk, price, day):
        return (pk, price, base + timedelta(days=day))

    li = spark.createDataFrame(
        [
            # part 1: (10, d2) and (20, d1) are the frontier;
            # (20, d3) dominated by (10, d2)? no: 20>10 price, d3>d2 → dominated by (10,d2)? price 10<20 and d2<d3 → yes dominated.
            # (10, d2) twice → tie collapses to one row with n_offers 2.
            row(1, 0.10, 2),
            row(1, 0.10, 2),
            row(1, 0.20, 1),
            row(1, 0.20, 3),
            # part 2: single offer always survives.
            row(2, 0.99, 9),
        ],
        "l_partkey bigint, l_extendedprice double, l_shipdate timestamp",
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = {
        (r.partkey, r.price_cents, r.ship_day): r.n_offers
        for r in supplier_offer_skyline(spark, str(tmp_path)).collect()
    }
    assert rows == {(1, 10, 2): 2, (1, 20, 1): 1, (2, 99, 9): 1}


def test_harmonic_centrality_star_graph(spark, tmp_path):
    from leader_graph_spark.plans.graph_queries import harmonic_centrality_membership

    # one region, two nations, one customer in nation A. From pivot A:
    # region at 1, nation B at 2, customer at 1. From pivot B: region 1,
    # A 2, customer 3.
    region = spark.createDataFrame([(0, "R")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    cust = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "S")],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    for name, df in (("region", region), ("nation", nation), ("customer", cust)):
        df.write.parquet(str(tmp_path / f"{name}.parquet"))
    import hashlib

    def mid(kind, name):
        return hashlib.md5(f"{kind}_{name}".encode()).hexdigest()

    got = {r.id: r for r in harmonic_centrality_membership(spark, str(tmp_path)).collect()}
    cust_row = got[mid("customer", "c1")]
    # customer: dist 1 from A, dist 3 from B → 1e6 + 333333
    assert cust_row.harmonic_milli == 1_000_000 + 1_000_000 // 3
    assert cust_row.ecc_k == 3 and cust_row.n_reached == 2
    # vertex A's lanes across pivots: from pivot A dist 0 (contributes
    # 0), from pivot B dist 2 — harmonic sums per-vertex over pivots.
    a_row = got[mid("nation", "A")]
    assert a_row.harmonic_milli == 500_000
    assert a_row.ecc_k == 2 and a_row.n_reached == 2
