"""Per-stage breakdown of any registered query at sf0.1 (r10 opt round).

    python scripts/profile_stages_r10.py <query> [<query> ...]

Runs each query once at the warm dir (codegen/arrow warm-up), then once
measured at $SPARK_GRAFT_SF_DIR (default sf0.1) via the noop sink, and
prints every stage the action executed: duration, task count, executor
run/cpu time, shuffle read/write bytes, and the stage name (which names
the operator line in the plan). This is the guide-§1 empirical loop:
find WHICH stage carries the wall clock before touching any code.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leader_graph_spark.metrics import _max_ids, _stage_list  # noqa: E402
from leader_graph_spark.plans import REGISTRY  # noqa: E402
from leader_graph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def profile(spark, name: str) -> None:
    spec = REGISTRY[name]
    spec.bench_spark(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
    _, stage_mark = _max_ids(spark)
    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.perf_counter()
    spec.bench_spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    time.sleep(0.5)  # let the status bus drain
    stages = _stage_list(spark)
    rows = []
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() <= stage_mark:
            continue
        sub = s.submissionTime()
        comp = s.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        rows.append(
            (
                s.stageId(),
                dur if dur is not None else -1.0,
                s.numTasks(),
                s.executorRunTime() / 1000.0,
                s.executorCpuTime() / 1e9,
                s.shuffleReadBytes() / 1e6,
                s.shuffleWriteBytes() / 1e6,
                str(s.name())[:90],
            )
        )
    rows.sort(key=lambda r: -r[1])
    print(f"\n=== {name}: wall {wall:.3f}s, {len(rows)} stages ===")
    print(f"{'stage':>5} {'dur_s':>7} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} {'shR_MB':>8} {'shW_MB':>8}  name")
    for r in rows[:25]:
        print(f"{r[0]:>5} {r[1]:>7.2f} {r[2]:>5} {r[3]:>7.2f} {r[4]:>7.2f} {r[5]:>8.2f} {r[6]:>8.2f}  {r[7]}")


def main() -> None:
    spark = get_spark("profile_stages_r10")
    for name in sys.argv[1:]:
        profile(spark, name)
    spark.stop()


if __name__ == "__main__":
    main()
