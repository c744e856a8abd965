"""Auto-serialized-checkpoint A/B (round-10, VERDICT r9 Next #5).

Round 9 diagnosed the 6g k-core death at the x30 replica as storage
starving execution and measured a MANUAL escape hatch
(``spark.leader_graph_spark.checkpoint.serialized=true`` → the dead
lane completes in 48.6 s). Round 10 derives the flip automatically
(``graph/algorithms.py:_maybe_auto_serialize``): this script proves
the 6g lane now completes with NO manual conf, that the auto decision
actually fired (the conf reads true afterwards), that the result
fingerprint matches the healthy-heap answer, and that a healthy heap
does NOT flip (the ~37% tax stays out of the default path).

One JVM per heap size (the heap is fixed at JVM start):

    SPARK_GRAFT_DRIVER_MEM=6g python scripts/auto_ser_ab_r10.py \
        --mem 6g --json-out /tmp/auto_ser_6g.json
    SPARK_GRAFT_DRIVER_MEM=24g python scripts/auto_ser_ab_r10.py \
        --mem 24g --json-out /tmp/auto_ser_24g.json
    python scripts/auto_ser_ab_r10.py --merge /tmp/auto_ser_*.json \
        --json-out auto_ser_ab_r10.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

X30 = "/tmp/sf3.0"
QUERY = "kcore_copurchase"
# healthy-heap answer from the r9 spill battery (identical across 48g..8g)
EXPECT_FP = (1049940, 9148193557144791791)


def fingerprint(df):
    from pyspark.sql import functions as F

    agg = (
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()[0]
    )
    return int(agg["n"]), int(agg["x"] or 0)


def run(mem: str, out_path: str) -> None:
    from leader_graph_spark.graph.algorithms import CKPT_SER_CONF
    from leader_graph_spark.plans import REGISTRY
    from leader_graph_spark.session import get_spark

    assert os.environ.get("SPARK_GRAFT_DRIVER_MEM") == mem, (
        "SPARK_GRAFT_DRIVER_MEM must equal --mem (heap is fixed at JVM start)"
    )
    spark = get_spark(f"auto_ser_ab_{mem}")
    # warm codegen/worker paths at tiny scale, then clear any flip the
    # warmup itself might have made (tiny states never should)
    REGISTRY[QUERY].bench_spark(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    warm_flip = (spark.conf.get(CKPT_SER_CONF, "false") or "").lower()
    out = {"mem": mem, "query": QUERY, "warmup_flipped": warm_flip == "true"}
    t0 = time.time()
    try:
        fp = fingerprint(REGISTRY[QUERY].bench_spark(spark, X30))
        out.update(
            sec=round(time.time() - t0, 1),
            completed=True,
            rows=fp[0],
            hash=fp[1],
            fingerprint_matches_r9=list(fp) == list(EXPECT_FP),
        )
    except Exception as ex:
        out.update(
            sec=round(time.time() - t0, 1),
            completed=False,
            error=f"{type(ex).__name__}: {str(ex)[:300]}",
        )
    out["auto_flipped"] = (spark.conf.get(CKPT_SER_CONF, "false") or "").lower() == "true"
    print(json.dumps(out), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


def merge(paths: list[str], out_path: str, note: str | None = None) -> None:
    runs = sorted((json.load(open(p)) for p in paths), key=lambda d: d["mem"])
    out = {
        "replica": X30,
        "query": QUERY,
        "knob": "auto (no manual conf): graph/algorithms._maybe_auto_serialize",
        "expected_fingerprint": list(EXPECT_FP),
        "runs": runs,
        "r9_baseline": {
            "manual_ser_6g_sec": 48.6,
            "default_6g": "died (UNABLE_TO_ACQUIRE_MEMORY in localCheckpoint)",
        },
    }
    if note:
        out["note"] = note
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mem")
    p.add_argument("--merge", nargs="*")
    p.add_argument("--json-out", required=True)
    p.add_argument("--note", help="free-text context recorded in the merged artifact")
    a = p.parse_args()
    if a.merge:
        merge(a.merge, a.json_out, a.note)
    else:
        run(a.mem, a.json_out)
