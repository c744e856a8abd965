"""Capture plans/r11/<query>_<suffix>.txt — explain("formatted") at sf0.1.

    python scripts/capture_plan_r11.py <suffix> q1 q2 ...

For iterative queries the loop rounds execute eagerly, so the final
frame's plan is a checkpoint scan; the per-round shape is evidenced by
the bench ledger (jobs/stages/shuffle bytes) instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leader_graph_spark.plans import REGISTRY  # noqa: E402
from leader_graph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("capture_plan_r11")
    for name in names:
        df = REGISTRY[name].bench_spark(spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(path, flush=True)


if __name__ == "__main__":
    main()
