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

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
)
BASELINE_SF = 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("leader_graph_spark_bench")

    # Warm the engine paths the queries use so the timed sf0.1 runs
    # measure steady-state execution, not one-time session costs:
    # running each query once at sf0.001 compiles the exact same
    # whole-stage-codegen classes (janino caches by generated source),
    # spins up the Python/Arrow workers, and initializes the shuffle
    # and parquet reader paths. Measured: first-ever execution of the
    # MinHash plan costs ~8s in compile/startup that no later run pays.
    spark.range(100).groupBy((F.col("id") % 4).alias("k")).count().collect()
    load_table(spark, sf_dir, "nation").count()
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    for _, spec in sorted(bench_queries().items()):
        spec.spark(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # Best-of-N per query: single-run numbers on a shared box carry
    # multi-second scheduler/GC spikes (observed 3.5s → 12.7s on the
    # same query back-to-back); the minimum is the capability number.
    # Rounds are INTERLEAVED (all queries once, repeat) rather than
    # per-query back-to-back: host slowdowns on this box span tens of
    # seconds (observed a whole run at ~2× with no code change), so
    # consecutive attempts of one query all land in the same slow
    # window — interleaving spreads each query's attempts across the
    # full wall-clock span.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name, spec in sorted(bench_queries().items()):
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
    timings = {name: round(t, 3) for name, t in timings.items()}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # Regression guard: per-query ratios vs the committed in-repo
    # baseline (interleaved best-of-N at sf0.1, 32 cores). Ratios only
    # make sense at the baseline's scale factor; timings bounce
    # ±0.5s/query run to run — and this box shows whole-run ~2× slow
    # windows — so read sustained >1.3× as a regression, not noise.
    # ``overlap_n`` counts the queries the ratio actually covers:
    # queries absent from the baseline silently drop out of the ratio.
    if os.path.exists(BASELINE_PATH) and out["sf"] == BASELINE_SF:
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        ratios = {
            q: round(t / base["queries"][q], 2)
            for q, t in timings.items()
            if base["queries"].get(q)
        }
        if ratios:
            out["vs_baseline"] = {
                "baseline_round": base.get("round"),
                "overlap_n": len(ratios),
                "total_ratio": round(
                    sum(timings[q] for q in ratios)
                    / sum(base["queries"][q] for q in ratios),
                    3,
                ),
                "queries": ratios,
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
