"""Runtime shuffle/spill ledger via Spark's AppStatusStore.

Local wall-clock has a ~0.5s per-query floor that hides exactly the
costs that dominate on a real cluster: shuffle bytes moved, spill, and
the number of driver-side actions (jobs). This module snapshots the
application status store (the same KVStore that backs the UI and REST
API — populated even with ``spark.ui.enabled=false``) around a query
execution and reports the deltas:

- ``shuffle_write_bytes`` / ``shuffle_read_bytes``: bytes through the
  shuffle — THE scale currency; a plan whose bytes grow superlinearly
  is broken at 100 TB no matter what local wall time says.
- ``mem_spill_bytes`` / ``disk_spill_bytes``: task-level spill; any
  nonzero disk spill at bench scale means partitions are missized.
- ``jobs``: driver actions. Iterative algorithms pay a scheduling
  round-trip per job — at 1000 executors each action is a full
  driver→cluster barrier, so actions-per-query is the latency floor
  of the loop-style queries.
- ``stages`` / ``tasks``: scheduling volume.

Deltas are computed by job/stage id high-water mark (ids increase
monotonically per SparkContext), so concurrent history in the store
from earlier queries never contaminates a measurement — but the
measured action itself must be the only workload on the session while
it runs (the bench runs queries serially; tests do too).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


@dataclass
class Ledger:
    """Aggregated runtime metrics for one measured action."""

    wall_sec: float = 0.0
    shuffle_write_bytes: int = 0
    shuffle_read_bytes: int = 0
    mem_spill_bytes: int = 0
    disk_spill_bytes: int = 0
    jobs: int = 0
    stages: int = 0
    skipped_stages: int = 0
    tasks: int = 0
    result: Any = field(default=None, repr=False)

    def as_dict(self) -> dict:
        return {
            "wall_sec": round(self.wall_sec, 3),
            "shuffle_write_mb": round(self.shuffle_write_bytes / 1e6, 3),
            "shuffle_read_mb": round(self.shuffle_read_bytes / 1e6, 3),
            "mem_spill_mb": round(self.mem_spill_bytes / 1e6, 3),
            "disk_spill_mb": round(self.disk_spill_bytes / 1e6, 3),
            "jobs": self.jobs,
            "stages": self.stages,
            "skipped_stages": self.skipped_stages,
            "tasks": self.tasks,
        }


def _store(spark: SparkSession):
    return spark._jsc.sc().statusStore()


def _stage_list(spark: SparkSession):
    """AppStatusStore.stageList — py4j can't use the Scala defaults, and
    the arity differs across Spark lines: 4.x takes (statuses, details,
    withSummaries, unsortedQuantiles, taskStatus); 3.5 lacks the
    ``details`` flag. Try the 4.x signature first, fall back to 3.5's,
    so ``pip install leader-graph-spark[spark]`` (pyspark>=3.5) can run
    bench/measure on either line."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    store = _store(spark)
    try:
        return store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(gw.jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
    except Exception:
        pass
    try:
        # older arity without the ``details`` flag
        return store.stageList(
            jvm.java.util.ArrayList(),
            False,
            gw.new_array(gw.jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
    except Exception:
        # last resort: statuses-only (Scala default-arg stub)
        return store.stageList(jvm.java.util.ArrayList())


def _max_ids(spark: SparkSession) -> tuple[int, int]:
    """(max job id, max stage id) currently in the status store; -1 when empty."""
    store = _store(spark)
    jobs = store.jobsList(spark._jvm.java.util.ArrayList())
    max_job = max((jobs.apply(i).jobId() for i in range(jobs.size())), default=-1)
    stages = _stage_list(spark)
    max_stage = max((stages.apply(i).stageId() for i in range(stages.size())), default=-1)
    return max_job, max_stage


def measure_action(spark: SparkSession, action: Callable[[], Any]) -> Ledger:
    """Run ``action`` (any driver-side call that submits jobs — a
    ``.count()``, a noop-sink write, a whole pipeline) and return the
    Ledger of everything it executed.

    The status-store listener processes events asynchronously on the
    driver event bus; after the action returns we wait (bounded) until
    the store has no ACTIVE stages newer than the start mark so
    completed metrics are final.
    """
    start_job, start_stage = _max_ids(spark)
    led = Ledger()
    t0 = time.perf_counter()
    led.result = action()
    led.wall_sec = time.perf_counter() - t0

    # Let the async AppStatusListener drain: poll until no new-stage is
    # still ACTIVE/PENDING (bounded at 5s — local event buses drain in
    # milliseconds; the bound only guards a wedged bus).
    deadline = time.time() + 5.0
    while time.time() < deadline:
        stages = _stage_list(spark)
        busy = any(
            stages.apply(i).stageId() > start_stage
            and str(stages.apply(i).status()) in ("ACTIVE", "PENDING")
            for i in range(stages.size())
        )
        if not busy:
            break
        time.sleep(0.05)

    stages = _stage_list(spark)
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() <= start_stage:
            continue
        if str(s.status()) == "SKIPPED":
            led.skipped_stages += 1
            continue
        led.stages += 1
        led.tasks += s.numTasks()
        led.shuffle_write_bytes += s.shuffleWriteBytes()
        led.shuffle_read_bytes += s.shuffleReadBytes()
        led.mem_spill_bytes += s.memoryBytesSpilled()
        led.disk_spill_bytes += s.diskBytesSpilled()
    jobs = _store(spark).jobsList(spark._jvm.java.util.ArrayList())
    led.jobs = sum(1 for i in range(jobs.size()) if jobs.apply(i).jobId() > start_job)
    return led


def measure_query(spark: SparkSession, df_factory: Callable[[], Any]) -> Ledger:
    """Measure a DataFrame-producing thunk end-to-end through a noop
    sink (forces every scan/shuffle/join without collecting rows to the
    driver)."""

    def run():
        df = df_factory()
        df.write.format("noop").mode("overwrite").save()

    return measure_action(spark, run)
