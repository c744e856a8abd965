"""observe()-piggybacked DQ metrics: the counters ride an existing
action (no second scan) and must equal the standalone aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from leader_graph_spark.plans.dq_queries import observed_rule_metrics
from leader_graph_spark.sources.tables import load_table


def test_observed_metrics_match_standalone(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    rules = {
        "v_price": F.col("o_totalprice") <= 0,
        "v_status": ~F.col("o_orderstatus").isin("O", "F", "P"),
        "v_open": F.col("o_orderstatus") == "O",
    }
    instrumented, obs = observed_rule_metrics(orders, rules)
    # the "pipeline action" is an unrelated aggregate — metrics ride it.
    revenue = instrumented.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).collect()
    assert revenue[0][0] is not None
    got = obs.get
    want = orders.agg(
        F.count(F.lit(1)).alias("n_checked"),
        *[F.sum(F.when(c, 1).otherwise(0)).alias(n) for n, c in rules.items()],
    ).collect()[0].asDict()
    assert got == want
    assert got["n_checked"] == orders.count()
    assert got["v_open"] > 0  # a rule that actually fires on driver data
