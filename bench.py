"""Headline benchmark: runs the bench-flagged queries from the registry
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a noop-format write over its full result
(forces the whole plan — scans, shuffles, joins — without driver-side
collect of potentially huge results).

Artifact contract (round 11): the PRINTED line carries only the compact
fields above — the r9 round-over-round comparison was lost because the
line had grown to carry the full ledger + per-query host telemetry and a
tail-window capture truncated it mid-JSON (VERDICT r10 item 2). The
ledger, host telemetry and vs_baseline adjudication now land in
``bench_artifact.json`` next to this file (override with
$SPARK_GRAFT_BENCH_ARTIFACT); timing methodology is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from leader_graph_spark.hostload import HostWindow, _loadavg1
from leader_graph_spark.metrics import measure_query
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
        spec.bench_spark(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # Best-of-N per query: single-run numbers on a shared box carry
    # multi-second scheduler/GC spikes (observed 3.5s → 12.7s on the
    # same query back-to-back); the minimum is the capability number.
    # Rounds are INTERLEAVED (all queries once, repeat) rather than
    # per-query back-to-back: host slowdowns on this box span tens of
    # seconds (observed a whole run at ~2× with no code change), so
    # consecutive attempts of one query all land in the same slow
    # window — interleaving spreads each query's attempts across the
    # full wall-clock span.
    # Each attempt runs inside a HostWindow (leader_graph_spark/hostload.py):
    # loadavg before/after, whole-box /proc/stat busy-fraction, our-tree vs
    # FOREIGN cpu split, and the noisiest foreign PIDs. Two rounds of
    # driver-run drift (r7, r8: 17/22 queries +9-37%, unreproducible on a
    # quiet box) were adjudicated as host contention only by post-hoc
    # re-measurement; with per-attempt telemetry in the artifact, a flagged
    # ratio is explainable from the committed JSON alone.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    bench_load_start = _loadavg1()
    all_times: dict[str, list[float]] = {}
    all_host: dict[str, list[dict]] = {}
    for _ in range(runs):
        for name, spec in sorted(bench_queries().items()):
            with HostWindow() as hw:
                t0 = time.perf_counter()
                df = spec.bench_spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                elapsed = time.perf_counter() - t0
            all_times.setdefault(name, []).append(elapsed)
            all_host.setdefault(name, []).append(hw.as_dict())
    timings = {name: round(min(ts), 3) for name, ts in all_times.items()}
    # Per query: telemetry of the attempt that produced the reported min
    # (the capability number), plus the worst foreign fraction seen across
    # attempts (did ANY attempt face contention?).
    host = {}
    for name, ts in all_times.items():
        best = all_host[name][ts.index(min(ts))]
        best["foreign_frac_max"] = max(h["foreign_frac"] for h in all_host[name])
        host[name] = best

    # Shuffle-bytes/spill/actions ledger: one extra measured pass per
    # query AFTER the timed runs (so listener polling never contaminates
    # the timings). Bytes are the scale currency local wall-time hides —
    # a ~0.5s local floor can mask a 10x shuffle regression that would
    # dominate on a real cluster; bytes can't. ``jobs`` is the
    # driver-actions count (each is a full scheduling barrier at 1000
    # executors — the latency floor of the iterative queries).
    ledger = {}
    for name, spec in sorted(bench_queries().items()):
        led = measure_query(spark, lambda s=spec: s.bench_spark(spark, sf_dir)).as_dict()
        del led["wall_sec"]  # timings above are the authoritative times
        ledger[name] = led

    def median(ts: list[float]) -> float:
        s = sorted(ts)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    total = round(sum(timings.values()), 3)
    # ``out`` is the compact PRINTED contract; ``artifact`` carries the
    # full evidence (ledger/host/vs_baseline) and is written to a file so
    # the parseable stdout line stays small enough that no tail-window
    # capture can truncate it (the r9 BENCH artifact died exactly that way).
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    artifact = {
        **out,
        "ledger": ledger,
        "host": {
            "ncpu": os.cpu_count(),
            "load1_bench_start": round(bench_load_start, 2),
            "load1_bench_end": round(_loadavg1(), 2),
            "queries": host,
        },
    }

    # Baseline-emit mode: SPARK_GRAFT_BENCH_BASELINE_OUT=<path> writes
    # a new baseline carrying per-query min AND median of the
    # interleaved runs — the noise band the regression guard below
    # adjudicates against — plus output row counts (testdata-drift
    # detection, the round-4 guard).
    baseline_out = os.environ.get("SPARK_GRAFT_BENCH_BASELINE_OUT")
    if baseline_out:
        rows = {
            name: spec.bench_spark(spark, sf_dir).count()
            for name, spec in sorted(bench_queries().items())
        }
        with open(baseline_out, "w") as f:
            json.dump(
                {
                    "round": int(os.environ.get("SPARK_GRAFT_BENCH_ROUND", "0")),
                    "sf": out["sf"],
                    "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                    "methodology": (
                        f"interleaved best-of-{runs} after sf0.001 warm-up, "
                        "noop-format sink, codegen cache 5000 (session.py); "
                        "queries_median records the per-query median of the "
                        "same runs so vs_baseline flags only excursions "
                        "beyond the measured noise band; output_rows "
                        "recorded so testdata regenerations are detectable"
                    ),
                    "value": total,
                    "queries": timings,
                    "queries_median": {
                        name: round(median(ts), 3) for name, ts in all_times.items()
                    },
                    "ledger": ledger,
                    "output_rows": rows,
                },
                f,
                indent=1,
            )

    # Regression guard: per-query ratios vs the committed in-repo
    # baseline (interleaved best-of-N at sf0.1, 32 cores). Ratios only
    # make sense at the baseline's scale factor. ``overlap_n`` counts
    # the queries the ratio actually covers: queries absent from the
    # baseline silently drop out of the ratio. When the baseline
    # carries queries_median, each query gets a NOISE BAND:
    # band = max(1.3, 1 + 3·(median−min)/min) — a ratio inside the
    # band is machine-adjudicated as noise (this box shows whole-run
    # ~2× slow windows); only ``flagged`` entries are regressions.
    if os.path.exists(BASELINE_PATH) and out["sf"] == BASELINE_SF:
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        ratios = {
            q: round(t / base["queries"][q], 2)
            for q, t in timings.items()
            if base["queries"].get(q)
        }
        if ratios:
            med = base.get("queries_median") or {}
            bands = {
                q: round(
                    max(
                        1.3,
                        1 + 3 * (med[q] - base["queries"][q]) / base["queries"][q],
                    ),
                    2,
                )
                if med.get(q)
                else 1.3
                for q in ratios
            }
            artifact["vs_baseline"] = {
                "baseline_round": base.get("round"),
                "overlap_n": len(ratios),
                "total_ratio": round(
                    sum(timings[q] for q in ratios)
                    / sum(base["queries"][q] for q in ratios),
                    3,
                ),
                "queries": ratios,
                "flagged": sorted(
                    q for q, r in ratios.items() if r > bands[q]
                ),
                # Adjudication data for each flagged ratio: the host
                # telemetry of the attempt whose time IS the ratio's
                # numerator. foreign_frac ~0 on every attempt means the
                # regression is real; a large foreign_frac names the
                # contention that inflated the number.
                "flagged_host": {
                    q: host[q] for q, r in sorted(ratios.items()) if r > bands[q]
                },
            }
        # Bytes guard: shuffle volume is near-deterministic for a fixed
        # plan + data (unlike wall time), so the band is tight — flag a
        # query whose shuffle (read+write) bytes grew >30% over the
        # baseline ledger, with 1 MB absolute slack so the KB-scale
        # queries don't flag on AQE coalescing jitter.
        base_ledger = base.get("ledger") or {}
        bytes_flagged = []
        for q, led in ledger.items():
            b = base_ledger.get(q)
            if not b:
                continue
            now_mb = led["shuffle_read_mb"] + led["shuffle_write_mb"]
            base_mb = b["shuffle_read_mb"] + b["shuffle_write_mb"]
            if now_mb > base_mb * 1.3 + 1.0:
                bytes_flagged.append(q)
        if "vs_baseline" in artifact:
            artifact["vs_baseline"]["bytes_flagged"] = sorted(bytes_flagged)
    # Heavy section (r11, VERDICT r10 item 3): at sf0.1 every lane is
    # scheduling-floor-bound (the 8-vs-32-core ratios are ≈1), so wall
    # time cannot see plan wins — the byte ledger carries them. With
    # SPARK_GRAFT_BENCH_HEAVY=1 and a 10x replica present (built by
    # scripts/scale_stress.py --factor 10 --out /tmp/sf1.0), the
    # compute-bound lanes are re-timed at sf1 where wall follows the
    # plan. Opt-in only — the driver's default invocation is unchanged,
    # and results go to the artifact file, never the printed contract.
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY") == "1":
        heavy_dir = os.environ.get("SPARK_GRAFT_BENCH_HEAVY_SF_DIR", "/tmp/sf1.0")
        heavy_names = [
            "supplier_clustering_coefficients",
            "kcore_copurchase",
            "weighted_sssp_copurchase",
            "minhash_near_dup_docs",
            "schoolmates_shared_part",
        ]
        if os.path.isdir(heavy_dir):
            heavy_runs = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_RUNS", "2"))
            specs = bench_queries()
            heavy_times: dict[str, list[float]] = {}
            for _ in range(heavy_runs):
                for name in heavy_names:
                    with HostWindow() as hw:
                        t0 = time.perf_counter()
                        specs[name].bench_spark(spark, heavy_dir).write.format(
                            "noop"
                        ).mode("overwrite").save()
                        heavy_times.setdefault(name, []).append(
                            round(time.perf_counter() - t0, 3)
                        )
            heavy_ledger = {}
            for name in heavy_names:
                led = measure_query(
                    spark, lambda n=name: specs[n].bench_spark(spark, heavy_dir)
                ).as_dict()
                del led["wall_sec"]
                heavy_ledger[name] = led
            artifact["heavy"] = {
                "sf_dir": heavy_dir,
                "queries": {n: min(ts) for n, ts in heavy_times.items()},
                "attempts": heavy_times,
                "total": round(sum(min(ts) for ts in heavy_times.values()), 3),
                "ledger": heavy_ledger,
            }
        else:
            artifact["heavy"] = {"skipped": f"{heavy_dir} not present"}
    artifact_path = os.environ.get(
        "SPARK_GRAFT_BENCH_ARTIFACT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_artifact.json"),
    )
    with open(artifact_path, "w") as f:
        json.dump(artifact, f, indent=1)
    # The compact one-line contract, printed LAST so it is the tail.
    print(json.dumps(out))


if __name__ == "__main__":
    main()
