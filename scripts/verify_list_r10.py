"""Oracle-verify an explicit list of registered queries (r10 loop).

    python scripts/verify_list_r10.py q1 q2 ... [--sf-dir D]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]

    from oracle import compare

    from leader_graph_spark.plans import REGISTRY
    from leader_graph_spark.session import get_spark

    spark = get_spark("verify_list_r10")
    fails = []
    for name in args:
        spec = REGISTRY[name]
        t0 = time.time()
        r = compare(spec.spark(spark, sf_dir), spec.oracle, sf_dir)
        status = "OK" if r["match"] else "MISMATCH"
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", flush=True)
        if not r["match"]:
            fails.append(name)
            print(f"  detail: {r}", flush=True)
    print(f"done: {len(args) - len(fails)}/{len(args)} match")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
