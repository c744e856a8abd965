"""Best-of-N wall + shuffle/jobs ledger for named queries at sf0.1.

    python scripts/ab_measure_r10.py [-nN] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leader_graph_spark.metrics import measure_query  # noqa: E402
from leader_graph_spark.plans import REGISTRY  # noqa: E402
from leader_graph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    runs = 5
    names = []
    for a in sys.argv[1:]:
        if a.startswith("-n"):
            runs = int(a[2:])
        else:
            names.append(a)
    spark = get_spark("ab_measure_r10")
    for name in names:
        spec = REGISTRY[name]
        spec.bench_spark(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.bench_spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        led = measure_query(spark, lambda s=spec: s.bench_spark(spark, SF_DIR)).as_dict()
        print(
            f"{name}: best {min(times):.3f}s median {sorted(times)[len(times)//2]:.3f}s "
            f"shuffle r/w {led['shuffle_read_mb']:.3f}/{led['shuffle_write_mb']:.3f} MB "
            f"jobs {led['jobs']} stages {led.get('stages')} tasks {led.get('tasks')}",
            flush=True,
        )


if __name__ == "__main__":
    main()
