"""Spill battery (round-9, VERDICT r8 Next #2): the five heavy lanes
at the x30 replica with the JVM heap stepped DOWN until spill is
nonzero, proving graceful degradation instead of a cliff.

Every prior scale point ran at zero spill, so the 100 TB story had no
evidence for the memory-pressure regime (the x30 working sets fit the
48g bench heap). One invocation = one heap size (the JVM can't
shrink); the orchestrator loop is:

    for m in 48g 24g 12g 8g 6g; do
      SPARK_GRAFT_DRIVER_MEM=$m python scripts/spill_battery_r09.py \
          --mem $m --json-out /tmp/spill_$m.json
    done
    python scripts/spill_battery_r09.py --merge /tmp/spill_*.json \
        --json-out spill_battery_r09.json

Per lane and heap: interleaved best-of-N wall, the AppStatusStore
shuffle/spill ledger, and a RESULT FINGERPRINT (row count + sum of
xxhash64 over all columns) — identical fingerprints across heap sizes
prove the spilling configs still compute the same answer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = [
    "kcore_copurchase",
    "ngram_jaccard_prefix_filtered",
    "containment_near_dup_pairs",
    "minhash_near_dup_docs",
    "dedup_canonical_docs",
]

X30 = "/tmp/sf3.0"


def fingerprint(df) -> tuple[int, int]:
    # bit_xor, not sum: order-insensitive AND overflow-free under ANSI
    # mode (summing millions of 64-bit hashes overflows long)
    from pyspark.sql import functions as F

    agg = df.select(
        F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x")
    ).collect()[0]
    return int(agg["n"]), int(agg["x"] or 0)


def run_battery(mem: str, runs: int, out_path: str) -> None:
    """One measured execution per (query, heap): the fingerprint
    aggregation IS the measured action, so a single x30 run yields
    wall + ledger + result hash. Wall therefore carries the (tiny)
    final-agg overhead uniformly across heaps — the battery compares
    HEAPS, not queries, and bytes/spill are the primary metric."""
    from leader_graph_spark.metrics import measure_action
    from leader_graph_spark.plans import REGISTRY
    from leader_graph_spark.session import get_spark

    assert os.environ.get("SPARK_GRAFT_DRIVER_MEM") == mem, (
        "SPARK_GRAFT_DRIVER_MEM must equal --mem (the heap is fixed at JVM start)"
    )
    spark = get_spark(f"spill_battery_{mem}")
    for n in QUERIES:  # warm codegen/worker paths at tiny scale
        REGISTRY[n].bench_spark(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    out = {"mem": mem, "queries": {}}
    for n in QUERIES:
        try:
            led = measure_action(
                spark,
                lambda n=n: fingerprint(REGISTRY[n].bench_spark(spark, X30)),
            )
        except Exception as ex:  # OOM at this heap = the cliff, recorded
            out["queries"][n] = {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            print(n, mem, "FAILED", out["queries"][n]["error"], flush=True)
            # a hard OOM stops the whole local SparkContext; recover so
            # the remaining lanes still get measured at this heap
            if spark.sparkContext._jsc.sc().isStopped():
                spark = get_spark(f"spill_battery_{mem}_recovered")
            continue
        fp_n, fp_h = led.result
        d = led.as_dict()
        out["queries"][n] = {
            "sec": round(d["wall_sec"], 3),
            "shuffle_mb": round(d["shuffle_read_mb"] + d["shuffle_write_mb"], 1),
            "spill_mb": round(d["mem_spill_mb"] + d["disk_spill_mb"], 1),
            "disk_spill_mb": round(d["disk_spill_mb"], 1),
            "jobs": d["jobs"],
            "rows": fp_n,
            "hash": fp_h,
        }
        print(n, mem, json.dumps(out["queries"][n]), flush=True)
        with open(out_path, "w") as f:  # partial progress survives a timeout
            json.dump(out, f, indent=1)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


def merge(paths: list[str], out_path: str) -> None:
    per_mem = [json.load(open(p)) for p in paths]
    per_mem.sort(key=lambda d: -int(d["mem"].rstrip("g")))
    out = {
        "replica": X30,
        "method": "one JVM per heap size, interleaved best-of-N, noop sink, "
        "warm; ledger+fingerprint pass after timed runs; identical "
        "(rows, hash) across heaps proves spilling configs compute "
        "the same answer",
        "heaps": [d["mem"] for d in per_mem],
        "queries": {},
    }
    for n in QUERIES:
        rows = {}
        fps = set()
        for d in per_mem:
            q = d["queries"].get(n)
            if not q:
                continue
            rows[d["mem"]] = q
            if "hash" in q:
                fps.add((q["rows"], q["hash"]))
        rows["fingerprint_stable"] = len(fps) <= 1
        out["queries"][n] = rows
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mem")
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--merge", nargs="*")
    p.add_argument("--json-out", required=True)
    args = p.parse_args()
    if args.merge:
        merge(args.merge, args.json_out)
    else:
        run_battery(args.mem, args.runs, args.json_out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
