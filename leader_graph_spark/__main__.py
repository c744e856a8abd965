"""Command-line entry point: run any registered query by name.

    python -m leader_graph_spark list [--tag TAG]
    python -m leader_graph_spark run <query> [--sf-dir DIR] [--limit N]
                                             [--explain] [--json]

``run`` prints the result as a table (or JSON lines) and ``--explain``
shows the formatted physical plan instead of executing — the same
surface the test/bench/driver paths use (`plans.REGISTRY`), so a query
that works here is exactly the query the correctness gate checks.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="leader_graph_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", help="filter by tag substring")
    p_list.add_argument(
        "--doc", action="store_true", help="include each query's first doc line"
    )

    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--explain", action="store_true")
    p_run.add_argument("--json", action="store_true")

    p_plan = sub.add_parser(
        "plan", help="show a query's executed plan + exchange summary"
    )
    p_plan.add_argument("query")
    p_plan.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = p.parse_args(argv)

    from leader_graph_spark.plans import REGISTRY

    if args.cmd == "list":
        for name, spec in sorted(REGISTRY.items()):
            tags = ",".join(spec.tags)
            if args.tag and args.tag not in tags:
                continue
            kind = "oracle" if spec.oracle is not None else "rows-only"
            line = f"{name}\t{kind}\t{tags}"
            if args.doc:
                first = (spec.doc or "").strip().splitlines()
                line += "\t" + (first[0] if first else "")
            print(line)
        return 0

    spec = REGISTRY.get(args.query)
    if spec is None:
        close = [n for n in REGISTRY if args.query in n]
        print(f"unknown query: {args.query}" + (f" (did you mean: {close[:5]})" if close else ""),
              file=sys.stderr)
        return 2

    from leader_graph_spark.session import get_spark

    spark = get_spark(f"cli_{args.query}")
    df = spec.spark(spark, args.sf_dir)
    if args.cmd == "plan":
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        broadcasts = plan.count("BroadcastExchange")
        print(f"shuffles={shuffles} broadcasts={broadcasts}\n")
        print(plan)
        return 0
    if args.explain:
        df.explain("formatted")
        return 0
    if args.json:
        for row in df.limit(args.limit).toJSON().collect():
            print(row)
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
