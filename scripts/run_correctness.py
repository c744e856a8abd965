"""Replay the driver's correctness gate locally.

    python scripts/run_correctness.py [--sf-dir D] [--only SUBSTR] [-q]

Runs every registered query (or those matching --only) against its
DuckDB oracle exactly as the driver does — row count + column names +
order-insensitive value hash — and exits non-zero on any mismatch.
The same comparison runs inside pytest (tests/test_parity.py); this
script is the fast loop for iterating on one query without the suite.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--only", help="substring filter on query names")
    p.add_argument("-q", "--quiet", action="store_true", help="print failures only")
    args = p.parse_args()

    from oracle import compare

    from leader_graph_spark.plans import REGISTRY
    from leader_graph_spark.session import get_spark

    spark = get_spark("run_correctness")
    names = sorted(n for n in REGISTRY if not args.only or args.only in n)
    fails, rows_only = [], 0
    t0 = time.time()
    for name in names:
        spec = REGISTRY[name]
        try:
            if spec.oracle is None:
                n = spec.spark(spark, args.sf_dir).count()
                rows_only += 1
                if not args.quiet:
                    print(f"{name}: rows-only ({n} rows)")
                continue
            r = compare(spec.spark(spark, args.sf_dir), spec.oracle, args.sf_dir)
            if r["match"]:
                if not args.quiet:
                    print(f"{name}: MATCH ({r['rows_spark']} rows)")
            else:
                fails.append(name)
                print(f"{name}: FAIL rows {r['rows_spark']}/{r['rows_oracle']} "
                      f"cols {r['cols_spark']} vs {r['cols_oracle']} "
                      f"rows_match={r['rows_match']} schema_match={r['schema_match']}",
                      file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: ERROR {e!r}", file=sys.stderr)
    print(
        f"{len(names) - len(fails)}/{len(names)} ok "
        f"({rows_only} rows-only) in {time.time() - t0:.1f}s"
    )
    if fails:
        print("FAILED:", fails, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
