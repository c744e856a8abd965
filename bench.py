"""Headline benchmark: runs the bench-flagged queries from the registry
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a count over its full result (forces the
whole plan — scans, shuffles, joins — without driver-side collect of
potentially huge results).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from leader_graph_spark.plans import bench_queries
from leader_graph_spark.session import DEFAULT_SF_DIR, get_spark
from leader_graph_spark.sources.tables import load_table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("leader_graph_spark_bench")

    # Warm the engine paths the queries use (JVM codegen, shuffle,
    # parquet reader, Arrow/pandas interchange) so the first timed query
    # doesn't pay one-time session start-up costs.
    spark.range(100).groupBy((F.col("id") % 4).alias("k")).count().collect()
    load_table(spark, sf_dir, "nation").count()
    tiny = spark.range(8).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    tiny.mapInPandas(lambda it: it, "id long, v double").count()

    timings: dict[str, float] = {}
    for name, spec in sorted(bench_queries().items()):
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
