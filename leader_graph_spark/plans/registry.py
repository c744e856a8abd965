"""Named-query registry.

Every implemented operator from SURVEY.md §2 registers here as a
(name, spark callable, oracle SQL) triple. ``__spark_entry__`` exposes
the registry to the driver; ``tests/test_parity.py`` replays the
driver's DuckDB comparison locally.

Determinism rules for oracle parity (the driver hashes values):
- alias every computed column identically on both sides;
- money/metric aggregates go through DECIMAL casts so the result does
  not depend on floating-point summation order;
- any LIMIT/top-k has a total tie-breaking ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    doc: str = ""
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)
    # What bench.py times under this name. Defaults to ``spark``;
    # override when the driver-facing query is a verification HARNESS
    # around the operator (e.g. ann_lsh_topk's recall assertion joins
    # the LSH result against the brute-force yardstick — the bench
    # number should track the operator, not the yardstick).
    bench_fn: SparkQuery | None = None

    @property
    def bench_spark(self) -> SparkQuery:
        return self.bench_fn or self.spark


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    *,
    bench: bool = False,
    tags: tuple[str, ...] = (),
    bench_fn: SparkQuery | None = None,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a named query with its DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator
    (iterative algorithms, custom stateful streaming) — the driver then
    records a weaker rows-only check.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, fn.__doc__ or "", bench, tags, bench_fn
        )
        return fn

    return deco


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in REGISTRY.items() if s.bench}
