"""Replay the full DuckDB-oracle comparison at an arbitrary scale dir
(e.g. the 10x replica built by scale_stress.py) with per-query
watchdogs, so one quadratic ORACLE (the honest yardsticks are O(n^2)
by design) cannot wedge the whole replay.

    python scripts/replay_oracle_at.py --sf-dir /tmp/sf1.0 \
        --json-out /root/repo/oracle_replay_sf1_r06.json [--timeout 240]

Statuses per query:
- match / MISMATCH          : both sides finished inside the timeout
- oracle_timeout_spark_ok   : DuckDB yardstick exceeded the cap (expected
                              for the quadratic oracles at 10x) but the
                              Spark side finished and returned rows — the
                              engine scales where the yardstick can't;
                              correctness for these is pinned at
                              sf0.01/sf0.1 where the yardstick fits.
- spark_timeout / error     : the engine side failed — these ARE failures.

Results are flushed to --json-out after every query so a crash keeps
partial evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import duckdb  # noqa: E402

from oracle import canonical_rows, spark_result  # noqa: E402


def duckdb_side(sql: str, sf_dir: str, timeout: float):
    """Run the oracle with an interrupt watchdog. Returns (result, status)."""
    from leader_graph_spark.sources.tables import TABLES

    con = duckdb.connect()
    # Quadratic yardstick oracles at 10x can spill DuckDB temp until
    # the DISK fills (observed: dedup_canonical's recursive-closure
    # oracle wrote ~79 GB before dying) — cap the spill so infeasible
    # yardsticks fail fast as oracle errors instead of starving the
    # box.
    con.execute("SET temp_directory='/tmp/duckdb_replay_tmp'")
    con.execute("SET max_temp_directory_size='40GB'")
    # ...and cap memory: an unrolled iterative CTE over a 12M-row sym
    # edge list took the whole box down (kernel OOM-killed the replay
    # at query 100/205) under DuckDB's default 80%-of-RAM limit. A
    # bounded failure is an oracle_error row; an unbounded one is a
    # dead replay.
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # replica dirs are spark-written parquet DIRECTORIES; base
        # testdata are single files — glob both shapes
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return canonical_rows(cols, rows), "ok"
    except (duckdb.InterruptException, RuntimeError) as e:
        if "INTERRUPT" in str(e).upper() or isinstance(e, duckdb.InterruptException):
            return None, "timeout"
        raise
    finally:
        timer.cancel()
        con.close()


def spark_side(spark, fn, sf_dir: str, timeout: float):
    """Run the Spark side with a cancel-group watchdog.

    The cancel REPEATS until the query thread finishes:
    cancelJobGroup only kills currently-active jobs, and an iterative
    query (checkpoint-per-round loops) immediately submits the next
    round's action after the cancelled one — a single cancel let a
    timed-out kcore run 20 more minutes of rounds."""
    spark.sparkContext.setJobGroup("replay", "oracle replay", True)
    timed_out = threading.Event()
    done = threading.Event()

    def canceller():
        if done.wait(timeout):
            return
        timed_out.set()
        while not done.wait(1.0):
            spark.sparkContext.cancelJobGroup("replay")

    t = threading.Thread(target=canceller, daemon=True)
    t.start()
    try:
        return spark_result(fn(spark, sf_dir)), "ok"
    except Exception:
        if timed_out.is_set():
            return None, "timeout"
        raise
    finally:
        done.set()
        spark.sparkContext.setJobGroup("", "")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--json-out", required=True)
    p.add_argument("--timeout", type=float, default=240.0)
    p.add_argument("--queries", help="comma-separated subset")
    p.add_argument(
        "--resume",
        action="store_true",
        help="keep existing --json-out rows and run only queries not yet recorded",
    )
    p.add_argument(
        "--scaled",
        action="store_true",
        help=(
            "route the yardstick-infeasible queries (scripts/scaled_checks.py) "
            "through their sampled/structural verification instead of the "
            "doomed full oracle — makes the 10x replay fully verifiable "
            "with no oracle_*_spark_ok escape class"
        ),
    )
    args = p.parse_args()

    from leader_graph_spark.plans import REGISTRY
    from leader_graph_spark.session import get_spark

    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else sorted(REGISTRY)
    )
    spark = get_spark("oracle_replay")
    out: dict[str, dict] = {}
    if args.resume and os.path.exists(args.json_out):
        with open(args.json_out) as f:
            out = json.load(f)["results"]
        names = [n for n in names if n not in out]
        print(f"resuming: {len(out)} recorded, {len(names)} to run", flush=True)
    scaled_names: set = set()
    if args.scaled:
        import scaled_checks

        scaled_names = set(scaled_checks.CHECKS)
        os.makedirs("/tmp/replay_scaled_out", exist_ok=True)
    for i, name in enumerate(names):
        spec = REGISTRY[name]
        rec: dict = {}
        if name in scaled_names:
            try:
                rec = scaled_checks.run_scaled_check(
                    spark, name, args.sf_dir, "/tmp/replay_scaled_out"
                )
            except Exception as e:  # noqa: BLE001
                rec = {"status": f"error: {type(e).__name__}: {str(e)[:200]}"}
            out[name] = rec
            print(
                f"[{i + 1}/{len(names)}] {name}: {rec['status']} (scaled)",
                flush=True,
            )
            with open(args.json_out, "w") as f:
                json.dump(
                    {"sf_dir": args.sf_dir, "timeout": args.timeout, "results": out},
                    f,
                    indent=1,
                )
            continue
        t0 = time.time()
        try:
            sres, sstat = spark_side(spark, spec.spark, args.sf_dir, args.timeout)
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            sres, sstat = None, f"error: {type(e).__name__}: {str(e)[:200]}"
        rec["spark_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        try:
            ores, ostat = duckdb_side(spec.oracle, args.sf_dir, args.timeout)
        except Exception as e:  # noqa: BLE001
            ores, ostat = None, f"error: {type(e).__name__}: {str(e)[:200]}"
        rec["oracle_sec"] = round(time.time() - t0, 1)

        if sstat == "ok" and ostat == "ok":
            (sn, scols, shash), (on, ocols, ohash) = sres, ores
            ok = sn == on and scols == ocols and shash == ohash
            rec.update(status="match" if ok else "MISMATCH", rows=sn, rows_oracle=on)
        elif sstat == "ok" and ostat == "timeout":
            rec.update(status="oracle_timeout_spark_ok", rows=sres[0])
        elif sstat == "timeout":
            rec.update(status="spark_timeout", oracle_status=ostat)
        elif sstat == "ok":
            # oracle errored (e.g. spill cap) while the engine finished
            rec.update(status="oracle_error_spark_ok", rows=sres[0], oracle_status=ostat)
        else:
            rec.update(status=sstat, oracle_status=ostat)
        out[name] = rec
        print(f"[{i + 1}/{len(names)}] {name}: {rec['status']} "
              f"(spark {rec['spark_sec']}s, oracle {rec['oracle_sec']}s)", flush=True)
        with open(args.json_out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "timeout": args.timeout, "results": out}, f, indent=1)

    # Accepted statuses: oracle_timeout_spark_ok / oracle_error_spark_ok
    # are the documented outcome of the yardstick caps (240-600s,
    # 24GB/20GB spill) on quadratic/unrolled oracles at 10x — but ONLY
    # for the queries whose yardsticks are documented infeasible
    # (scaled_checks.CHECKS). An oracle crash on any OTHER query (a SQL
    # bug, an unrelated OOM) is a gate failure, not a pass — otherwise
    # the escape class the --scaled flag eliminates creeps back in.
    import scaled_checks as _sc

    def _accepted(n: str, status: str) -> bool:
        if status in ("match", "scaled_verify_match"):
            return True
        if status in ("oracle_timeout_spark_ok", "oracle_error_spark_ok"):
            return n in _sc.CHECKS
        return False

    bad = [n for n, r in out.items() if not _accepted(n, r["status"])]
    print(f"done: {len(out)} queries, {len(bad)} failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
