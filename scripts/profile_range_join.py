"""A/B: naive BETWEEN range join vs bucketized equi form, as interval
count grows (SCALE.md evidence).

With a handful of intervals the naive broadcast nested loop is fine —
|intervals| predicate evaluations per point. The quadratic trap opens
as |intervals| grows: the naive form evaluates every (point, interval)
pair, the bucketed form only same-month candidates. This script
measures both at sf0.1 with interleaved best-of-3 and asserts equal
pair counts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from leader_graph_spark.operators.intervals import point_in_interval_join  # noqa: E402
from leader_graph_spark.session import get_spark  # noqa: E402
from leader_graph_spark.sources.tables import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth_intervals(spark, n):
    # deterministic windows, 3-45 days long, spread over 1995-2001
    return spark.range(n).select(
        F.concat(F.lit("w"), "id").alias("w"),
        F.col("id"),
        F.timestamp_add(
            "DAY", (F.col("id") * 37 % 2300).cast("int"), F.lit("1995-01-01").cast("timestamp")
        ).alias("s"),
    ).select(
        "w", "s",
        F.timestamp_add("DAY", (F.col("id") % 43 + 3).cast("int"), F.col("s")).alias("e"),
    )


def run(df):
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t


def main():
    spark = get_spark("profile_range_join")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderdate")
    for n_iv in (6, 500, 5000):
        ivs = synth_intervals(spark, n_iv).localCheckpoint()
        naive = orders.join(
            ivs, (F.col("s") <= F.col("o_orderdate")) & (F.col("o_orderdate") < F.col("e"))
        )
        bucketed = point_in_interval_join(
            orders, ivs, point_col="o_orderdate", start_col="s", end_col="e"
        )
        nn, nb = naive.count(), bucketed.count()
        assert nn == nb, (nn, nb)
        times = {"naive": [], "bucketed": []}
        for _ in range(3):
            times["naive"].append(run(naive))
            times["bucketed"].append(run(bucketed))
        print(
            f"n_intervals={n_iv} pairs={nn} "
            f"naive={min(times['naive']):.3f}s bucketed={min(times['bucketed']):.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
