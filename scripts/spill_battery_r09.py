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
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return int(agg["n"]), int(agg["h"] or 0)


def run_battery(mem: str, runs: int, out_path: str) -> None:
    from leader_graph_spark.metrics import measure_query
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
    best = {n: float("inf") for n in QUERIES}
    failed: dict[str, str] = {}
    for _ in range(runs):
        for n in QUERIES:
            if n in failed:
                continue
            t0 = time.time()
            try:
                REGISTRY[n].bench_spark(spark, X30).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:  # OOM at this heap = the cliff, recorded
                failed[n] = f"{type(ex).__name__}: {str(ex)[:200]}"
                continue
            best[n] = min(best[n], time.time() - t0)
    out = {"mem": mem, "queries": {}}
    for n in QUERIES:
        if n in failed:
            out["queries"][n] = {"error": failed[n]}
            print(n, mem, "FAILED", failed[n], flush=True)
            continue
        led = measure_query(
            spark, lambda n=n: REGISTRY[n].bench_spark(spark, X30)
        ).as_dict()
        fp_n, fp_h = fingerprint(REGISTRY[n].bench_spark(spark, X30))
        out["queries"][n] = {
            "sec": round(best[n], 3),
            "shuffle_mb": round(led["shuffle_read_mb"] + led["shuffle_write_mb"], 1),
            "spill_mb": round(led["mem_spill_mb"] + led["disk_spill_mb"], 1),
            "disk_spill_mb": round(led["disk_spill_mb"], 1),
            "jobs": led["jobs"],
            "rows": fp_n,
            "hash": fp_h,
        }
        print(n, mem, json.dumps(out["queries"][n]), flush=True)
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
