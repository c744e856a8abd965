"""Every registered query with an oracle must hash-match DuckDB at
sf0.01 — this replays the driver's correctness gate locally."""

from __future__ import annotations

import pytest

from leader_graph_spark.plans import REGISTRY

from tests.oracle import compare

ORACLE_QUERIES = sorted(REGISTRY)


def test_all_queries_have_oracles():
    """The rows-only class was eliminated in round 6 — every registered
    query carries a full (exact or bounded-assertion) oracle. Pin that
    it stays empty."""
    assert [n for n, s in REGISTRY.items() if s.oracle is None] == []


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    result = compare(df, spec.oracle, sf_dir)
    assert result["match"], {k: v for k, v in result.items() if not k.startswith("hash_") or not result["match"]}


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
