"""Byte-residual partition sweep (round-9, VERDICT r8 Next #5).

The third-decade battery left two named residuals: minhash shuffle
bytes grew 5.11x and k-core 3.79x for 3.33x data (x30 -> x100), both
attributed to per-task key concentration on a fixed 32-slot box — the
map-side combiner sees 100x the keys over the same task count, its
hashmap saturates, and partial aggregation degrades to pass-through.
The hypothesis PREDICTS: scale the number of tasks feeding the
aggregation (per-task cardinality drops back) and bytes/data falls
toward linear. On a real cluster task counts scale with data, so
confirming this closes the 100 TB question; refuting it names a real
term to fix.

Levers (the recorded initialPartitionNum rejection is NOT retried):
- minhash: the signature groupBy reads the exploded shingle stream,
  whose partition count is the documents SCAN split count —
  ``spark.sql.files.maxPartitionBytes`` 128m -> 32m -> 8m.
- kcore: each round's aggregation reads the AQE-coalesced previous
  round — ``spark.sql.adaptive.advisoryPartitionSizeInBytes``
  64m -> 16m -> 4m sets the coalesced task size, hence count.

    python scripts/partition_sweep_r09.py --json-out partition_sweep_r09.json

One measured run per configuration (bytes are near-deterministic for
a fixed plan; wall is recorded but secondary). x30 reference bytes
come from the committed bench_scaling_third_decade_r08.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

X100 = "/tmp/sf10.0"
R8 = os.path.join(ROOT, "bench_scaling_third_decade_r08.json")

SWEEPS = {
    "minhash_near_dup_docs": (
        "spark.sql.files.maxPartitionBytes",
        ["134217728", "33554432", "8388608"],  # 128m, 32m, 8m
    ),
    "kcore_copurchase": (
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ["67108864", "16777216", "4194304"],  # 64m, 16m, 4m
    ),
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--json-out", required=True)
    p.add_argument("--only")
    args = p.parse_args()

    from leader_graph_spark.metrics import measure_query
    from leader_graph_spark.plans import REGISTRY
    from leader_graph_spark.session import get_spark

    spark = get_spark("partition_sweep")
    r8 = json.load(open(R8))["queries"]
    out = {
        "replica": X100,
        "method": "one measured run per conf (bytes near-deterministic); "
        "x30 reference = committed r8 battery; prediction: bytes_mb "
        "falls toward bytes_x30 * 3.33 as task count rises",
        "queries": {},
    }
    for name, (conf_key, values) in SWEEPS.items():
        if args.only and args.only not in name:
            continue
        # tiny-scale warm so codegen/compile never lands in a point
        REGISTRY[name].bench_spark(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        saved = spark.conf.get(conf_key, None)
        points = []
        for v in values:
            spark.conf.set(conf_key, v)
            led = measure_query(
                spark, lambda n=name: REGISTRY[n].bench_spark(spark, X100)
            ).as_dict()
            point = {
                conf_key: v,
                "mb": round(led["shuffle_read_mb"] + led["shuffle_write_mb"], 1),
                "wall_sec": round(led["wall_sec"], 1),
                "jobs": led["jobs"],
                "spill_mb": round(led["mem_spill_mb"] + led["disk_spill_mb"], 1),
            }
            points.append(point)
            print(name, json.dumps(point), flush=True)
        if saved is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, saved)
        x30_mb = r8[name]["bytes_mb_x30"]
        out["queries"][name] = {
            "lever": conf_key,
            "x30_mb_reference": x30_mb,
            "linear_target_mb": round(x30_mb * 100 / 30, 1),
            "x100_default_mb_r8": r8[name]["bytes_mb_x100"],
            "points": points,
        }
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
