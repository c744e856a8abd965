"""JDBC edge tests against an EMBEDDED Derby database — no external
endpoint needed, so the S5/K1 RDBMS edge (reference
``utils/db_utils.py:37-89``: its whole storage layer is MySQL) is
exercised unconditionally in CI instead of perpetually skipped.

Derby ships inside pyspark's own jars (it backs the Hive metastore),
so ``jdbc:derby:<dir>;create=true`` with the embedded driver works in
any pyspark install with zero extra artifacts. The live-MySQL variant
in test_operators.py stays env-gated for real deployments.
"""

from __future__ import annotations

import pytest

from leader_graph_spark.sources.jdbc import (
    ingest_jdbc_to_parquet,
    read_jdbc_table,
    write_jdbc,
)
from leader_graph_spark.sources.tables import load_table

SF_SMOKE = "/root/testdata/sf0.001"

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "lakedb"
    return f"jdbc:derby:{db_dir};create=true"


@pytest.fixture(scope="module")
def seeded_tables(spark, derby_url):
    """Write nation_rt and orders_rt once per module so every test is
    independently runnable (no inter-test ordering)."""
    write_jdbc(
        load_table(spark, SF_SMOKE, "nation"),
        derby_url,
        "nation_rt",
        mode="overwrite",
        properties=DERBY_PROPS,
    )
    write_jdbc(
        load_table(spark, SF_SMOKE, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        derby_url,
        "orders_rt",
        mode="overwrite",
        properties=DERBY_PROPS,
    )


def test_jdbc_round_trip_embedded(spark, sf_smoke, derby_url, seeded_tables):
    """K1 write → S5 read round-trip through a real JDBC driver."""
    nation = load_table(spark, sf_smoke, "nation")
    back = read_jdbc_table(spark, derby_url, "nation_rt", properties=DERBY_PROPS)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    want = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert got == want


def test_jdbc_partitioned_parallel_read(spark, sf_smoke, derby_url, seeded_tables):
    """The bounds form issues num_partitions range queries — the scan
    must come back multi-partition with no rows lost or duplicated at
    the range seams."""
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo, hi = [
        (r["lo"], r["hi"])
        for r in orders.selectExpr(
            "min(o_orderkey) AS lo", "max(o_orderkey) AS hi"
        ).collect()
    ][0]
    back = read_jdbc_table(
        spark,
        derby_url,
        "orders_rt",
        partition_column="o_orderkey",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        num_partitions=4,
        properties=DERBY_PROPS,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()
    assert back.select("o_orderkey").distinct().count() == orders.count()


def test_jdbc_predicates_read_partitions_by_fragment(spark, sf_smoke, derby_url, seeded_tables):
    """One partition per WHERE fragment — the non-numeric split mode."""
    back = read_jdbc_table(
        spark,
        derby_url,
        "orders_rt",
        predicates=['MOD("o_orderkey", 2) = 0', 'MOD("o_orderkey", 2) = 1'],
        properties=DERBY_PROPS,
    )
    assert back.rdd.getNumPartitions() == 2
    orders = load_table(spark, sf_smoke, "orders")
    assert back.count() == orders.count()


def test_jdbc_filter_pushdown_reaches_database(spark, derby_url, seeded_tables):
    """Catalyst must ship the WHERE to the database (PushedFilters in
    the scan), not pull all rows and filter in Spark."""
    back = read_jdbc_table(
        spark, derby_url, "orders_rt", properties=DERBY_PROPS
    ).filter("o_totalprice > 100000")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1].split("]")[0]


def test_jdbc_ingest_to_parquet_landing(spark, sf_smoke, derby_url, tmp_path, seeded_tables):
    """The landing-zone move (mysql2neo4j.py:87-151 reshaped): JDBC scan
    → parquet; downstream reads hit the lake, not the OLTP store."""
    out = str(tmp_path / "nation_landed")
    ingest_jdbc_to_parquet(spark, derby_url, "nation_rt", out, properties=DERBY_PROPS)
    landed = spark.read.parquet(out)
    assert landed.count() == load_table(spark, sf_smoke, "nation").count()
