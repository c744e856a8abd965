"""Regenerate COVERAGE.md's auto-generated query-registry appendix
(run after adding/removing registry queries; the consistency test
asserts the appendix matches the live registry)."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from leader_graph_spark.plans import REGISTRY  # noqa: E402

MARKER = "\n## Appendix: complete query-registry index"


def appendix() -> str:
    lines = [
        "",
        "## Appendix: complete query-registry index (auto-generated)",
        "",
        "Every `queries()` entry with its check mode and tags — the",
        "line-by-line audit surface (regenerate with",
        "`python scripts/gen_coverage_index.py`).",
        "",
        "| query | check | tags |",
        "|---|---|---|",
    ]
    for n in sorted(REGISTRY):
        s = REGISTRY[n]
        mode = ("oracle" if s.oracle else "rows-only") + (" +bench" if s.bench else "")
        lines.append(f"| {n} | {mode} | {', '.join(s.tags)} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    path = os.path.join(ROOT, "COVERAGE.md")
    cov = open(path).read()
    if MARKER in cov:
        cov = cov[: cov.index(MARKER)]
    open(path, "w").write(cov + appendix())
    print(f"wrote appendix: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
