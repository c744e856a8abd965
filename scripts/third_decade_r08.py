"""Third-decade battery (round-8): the five worst second-decade
exponents from `bench_scaling_two_decades_r07.json`, measured across
x30 -> x100 with the bytes ledger.

VERDICT r7 task 4: the linear candidate-verify terms (containment
0.93, kcore 0.91, ngram_jaccard 0.86, flagship_bucketed 0.83, minhash
0.77) should hold bytes-linear into the third decade; any exponent
crossing 1.0 gets named and fixed like round 7's two.

    python scripts/third_decade_r08.py [--skip-build] \
        --json-out bench_scaling_third_decade_r08.json

Uses scale_stress.build_replica for the x100 replica (key-offset,
alphabet-rotated, embedding-rotated — same workload, bigger) and the
AppStatusStore ledger for shuffle bytes / spill / jobs at both scales.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = [
    "containment_near_dup_pairs",
    "kcore_copurchase",
    "ngram_jaccard_prefix_filtered",
    "flagship_colleagues_bucketed",
    "minhash_near_dup_docs",
]

X30 = "/tmp/sf3.0"
X100 = "/tmp/sf10.0"


def measure(spark, sf_dir: str, names, runs: int):
    """Interleaved best-of-N wall + one ledger pass (after the timed
    runs, so listener polling never contaminates timings)."""
    from leader_graph_spark.metrics import measure_query
    from leader_graph_spark.plans import REGISTRY

    for n in names:  # warm codegen/worker paths
        REGISTRY[n].bench_spark(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    best = {n: float("inf") for n in names}
    for _ in range(runs):
        for n in names:
            t0 = time.time()
            REGISTRY[n].bench_spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best[n] = min(best[n], time.time() - t0)
    ledger = {}
    for n in names:
        led = measure_query(
            spark, lambda n=n: REGISTRY[n].bench_spark(spark, sf_dir)
        ).as_dict()
        del led["wall_sec"]
        ledger[n] = led
    return best, ledger


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--skip-build", action="store_true")
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--json-out", required=True)
    args = p.parse_args()

    from leader_graph_spark.session import get_spark
    from scale_stress import build_replica

    spark = get_spark("third_decade")
    if not args.skip_build and not os.path.exists(f"{X100}/lineitem.parquet"):
        build_replica(spark, X100, 100)
    if not os.path.exists(f"{X30}/lineitem.parquet"):
        raise SystemExit(f"{X30} missing — build with scale_stress --factor 30")

    t30, led30 = measure(spark, X30, QUERIES, args.runs)
    t100, led100 = measure(spark, X100, QUERIES, args.runs)
    factor = 100 / 30
    out = {
        "base": "/root/testdata/sf0.1",
        "points": {"x30": 30, "x100": 100},
        "method": f"interleaved best-of-{args.runs}, solo box, noop sink, warm; "
        "ledger pass after timed runs",
        "queries": {},
    }
    for n in QUERIES:
        ratio = t100[n] / t30[n]
        exp = math.log(ratio) / math.log(factor)
        b30 = led30[n]["shuffle_read_mb"] + led30[n]["shuffle_write_mb"]
        b100 = led100[n]["shuffle_read_mb"] + led100[n]["shuffle_write_mb"]
        out["queries"][n] = {
            "sec_x30": round(t30[n], 3),
            "sec_x100": round(t100[n], 3),
            "wall_ratio": round(ratio, 2),
            "exp_third_decade": round(exp, 3),
            "bytes_mb_x30": round(b30, 1),
            "bytes_mb_x100": round(b100, 1),
            "bytes_ratio": round(b100 / b30, 2) if b30 else None,
            "spill_mb_x100": round(
                led100[n]["mem_spill_mb"] + led100[n]["disk_spill_mb"], 1
            ),
            "jobs_x30": led30[n]["jobs"],
            "jobs_x100": led100[n]["jobs"],
            "superlinear": exp > 1.0,
        }
        print(n, json.dumps(out["queries"][n]), flush=True)
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    bad = [n for n, r in out["queries"].items() if r["superlinear"]]
    print(f"done; superlinear: {bad}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
