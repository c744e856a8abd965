"""Guard against the driver-hash canonicalization bug class.

Rounds 1 and 2 both lost CORRECTNESS rows to the same pattern: a query
whose FINAL output column is DECIMAL (Spark/DuckDB render scale
differently under the driver's pandas-based hasher) or whose oracle
aggregate silently widens to DuckDB HUGEINT (``sum(BIGINT)``), or a
list/struct column that stringifies engine-dependently.  Values match;
hashes don't.  This test walks EVERY registered oracle through DuckDB's
``DESCRIBE`` (type resolution without execution) and every oracle-paired
Spark plan's schema, and fails if any output column has a type in the
known-divergent class — so the bug class breaks tests, not rounds.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import types as T

from leader_graph_spark.plans import REGISTRY
from leader_graph_spark.sources.tables import TABLES

# Full-registry schema sweep: the spark_schemas fixture alone builds
# every oracle-paired plan (~120 s, eager for the iterative queries).
# The guarded bug class only changes when queries are added/edited, so
# this is a deep-audit battery, not a per-commit gate.
pytestmark = pytest.mark.slow

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)

# DuckDB type names that the driver's hasher renders differently from
# the Spark side (or order-dependently): any DECIMAL, the implicit
# HUGEINT/UHUGEINT widenings, and nested list/struct/map/union types.
_FORBIDDEN_DUCK = re.compile(r"DECIMAL|HUGEINT|STRUCT|MAP|UNION|\[\]", re.IGNORECASE)

_FORBIDDEN_SPARK = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark_schemas(spark, sf_dir):
    """One plan build per query for the whole module: for the
    iterative-graph queries plan CONSTRUCTION is eager (localCheckpoint
    materializes the upstream pipeline), so rebuilding per test would
    run the MinHash/propagation pipelines once per assertion."""
    return {name: REGISTRY[name].spark(spark, sf_dir).schema for name in ORACLE_QUERIES}


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_output_types_hashable(duck, name):
    spec = REGISTRY[name]
    rows = duck.execute(f"DESCRIBE {spec.oracle}").fetchall()
    bad = [(col, typ) for col, typ, *_ in rows if _FORBIDDEN_DUCK.search(typ)]
    assert not bad, (
        f"oracle for {name!r} emits driver-unhashable column types {bad}; "
        "CAST the final projection (DECIMAL->DOUBLE, sum(BIGINT)->BIGINT, "
        "flatten lists/structs)"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_spark_output_types_hashable(spark_schemas, name):
    schema = spark_schemas[name]
    bad = [(f.name, f.dataType.simpleString()) for f in schema.fields
           if isinstance(f.dataType, _FORBIDDEN_SPARK)]
    assert not bad, (
        f"Spark plan for {name!r} emits driver-unhashable column types {bad}; "
        "cast the final projection to scalar driver-stable types"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_column_names_agree(duck, spark_schemas, name):
    """The driver sorts columns BY NAME before hashing, so an alias
    mismatch between the Spark projection and the oracle SQL (or a
    duplicate name on either side) hash-mismatches even when every
    value is identical — the other recurring red-row class."""
    spec = REGISTRY[name]
    duck_cols = [col for col, *_ in duck.execute(f"DESCRIBE {spec.oracle}").fetchall()]
    spark_cols = [f.name for f in spark_schemas[name].fields]
    assert len(set(duck_cols)) == len(duck_cols), f"duplicate oracle columns: {duck_cols}"
    assert len(set(spark_cols)) == len(spark_cols), f"duplicate Spark columns: {spark_cols}"
    assert sorted(duck_cols) == sorted(spark_cols), (
        f"{name!r}: column names disagree — oracle {sorted(duck_cols)} "
        f"vs Spark {sorted(spark_cols)}; alias both sides identically"
    )


def test_coverage_appendix_matches_registry():
    """COVERAGE.md's auto-generated appendix must list every registry
    query (the judge's line-by-line audit surface) — regenerate with
    scripts/gen_coverage_index.py after registry changes."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from leader_graph_spark.plans import REGISTRY

    cov = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    ).read()
    missing = [n for n in sorted(REGISTRY) if f"| {n} |" not in cov]
    assert not missing, f"regenerate the COVERAGE appendix: {missing}"
