"""Testdata-drift guard: the driver regenerates /root/testdata between
rounds and has changed both physical types (events.ts: TIMESTAMP(NANOS)
→ timestamp[us]) and content (a region rename made a query predicate
vacuous — caught by hand in round 3). These tests make the next
regeneration fail loudly at round start instead of passing vacuously.

All checks are driver-side DuckDB/pyarrow — no Spark session, so the
whole module runs in seconds.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from leader_graph_spark.plans import REGISTRY
from leader_graph_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"

# Pinned physical schemas (pyarrow types as strings) for every driver
# table, as of the round-4 regeneration. A type change here has broken
# queries silently before (ts nanos→micros); fail loudly instead.
PINNED_SCHEMAS = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": "timestamp[us]",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {"vec_id": "int64", "embedding": "list<element: float>", "label": "int32"},
}

# Categorical values that registered queries reference as literals.
# If the driver renames any of these, a predicate somewhere goes
# vacuous (round 3: a region rename did exactly that).
PINNED_LITERALS = {
    ("region", "r_name"): {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"},
    ("orders", "o_orderstatus"): {"F", "O", "P"},
    ("orders", "o_orderpriority"): {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    },
    ("customer", "c_mktsegment"): {
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
    },
    ("lineitem", "l_returnflag"): {"A", "N", "R"},
    ("lineitem", "l_linestatus"): {"F", "O"},
    ("events", "event_type"): {"click", "error", "purchase", "signup", "view"},
    ("documents", "lang"): {"de", "en", "es", "fr", "zh"},
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("table", sorted(PINNED_SCHEMAS))
def test_schema_pinned(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    actual = {f.name: str(f.type) for f in schema}
    # timestamp tz-variants count as a change too: str() keeps the tz.
    assert actual == PINNED_SCHEMAS[table], (
        f"{table} schema drifted — audit every query touching it "
        f"(round-3 lesson: the ts nanos→micros change broke the "
        f"streaming reader's epoch interpretation)"
    )


@pytest.mark.parametrize("key", sorted(PINNED_LITERALS))
def test_categorical_literals_pinned(key, con):
    table, col = key
    vals = {r[0] for r in con.execute(f"SELECT DISTINCT {col} FROM {table}").fetchall()}
    assert vals == PINNED_LITERALS[key], (
        f"{table}.{col} value set drifted — every literal predicate on "
        f"this column needs a re-audit (round-3 lesson: a region rename "
        f"made local_supplier_volume's predicate vacuous, 0==0 passed)"
    )


def test_surrogate_key_patterns(con):
    """Prefix-structured values queries rely on via LIKE/regexp."""
    n = con.execute("SELECT count(*) FROM nation WHERE n_name LIKE 'NATION_%'").fetchone()[0]
    assert n == 25
    b = con.execute("SELECT count(DISTINCT p_brand) FROM part WHERE p_brand LIKE 'Brand#%'").fetchone()[0]
    assert b == 25
    s = con.execute("SELECT count(DISTINCT source) FROM documents WHERE source LIKE 'src%'").fetchone()[0]
    assert s == 20


@pytest.mark.slow  # executes all 200+ oracles in DuckDB, ~65 s; the verify skill runs the same audit every round
def test_no_vacuous_oracles(con):
    """Every registered oracle must see >0 rows at sf0.01 — a 0-row
    oracle hash-matches a 0-row Spark result no matter how wrong the
    query is (the exact failure mode that hid the round-3 literal
    drift)."""
    zeros = [
        name
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
        and con.execute(f"SELECT count(*) FROM ({spec.oracle})").fetchone()[0] == 0
    ]
    assert not zeros, f"vacuous oracles (stale literals?): {zeros}"


def test_row_counts_in_expected_band(con):
    """Scale factors changed silently would skew every perf comparison;
    pin order-of-magnitude row counts at sf0.01."""
    counts = {t: con.execute(f"SELECT count(*) FROM {t}").fetchone()[0] for t in TABLES}
    expected = {
        "region": (5, 5),
        "nation": (25, 25),
        "customer": (1_000, 3_000),
        "supplier": (50, 300),
        "part": (1_000, 4_000),
        "orders": (10_000, 30_000),
        "lineitem": (40_000, 120_000),
        "events": (5_000, 20_000),
        "documents": (300, 1_000),
        "embeddings": (300, 1_000),
    }
    for t, (lo, hi) in expected.items():
        assert lo <= counts[t] <= hi, (t, counts[t])


def test_events_epoch_range(con):
    """Catch a silent epoch-unit flip: converted timestamps must land in
    a plausible wall-clock window."""
    lo, hi = con.execute("SELECT min(ts), max(ts) FROM events").fetchone()
    assert lo.year >= 2000 and hi.year <= 2100, (lo, hi)


def test_aggregate_query_predicates_nonvacuous(con):
    """Global-aggregate queries return one row even when their
    predicates match NOTHING, so the zero-row-oracle audit cannot see
    their literals go stale (the Q1-row-of-NULLs failure mode). Pin the
    filtered intermediates of every registered global-aggregate query
    with data literals directly."""
    checks = {
        "forecast_revenue_change (q6 window)": """
            SELECT count(*) FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
        "promo_revenue_share (q14 month)": """
            SELECT count(*) FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""",
        "promo_revenue_share (PROMO parts)": """
            SELECT count(*) FROM part WHERE p_type = 'PROMO'""",
        "bm25/phrase query terms": """
            SELECT count(*) FROM documents
            WHERE lower(text) LIKE '%spark%' AND lower(text) LIKE '%vector%'
              AND lower(text) LIKE '%stream%'""",
        "user_state_asof anchor inside window": """
            SELECT count(*) FROM events
            WHERE ts <= TIMESTAMP '2024-01-16 00:00:00'""",
        "funnel stages present": """
            SELECT count(*) FROM events WHERE event_type IN ('view', 'click', 'purchase')""",
    }
    empty = [
        name for name, sql in checks.items() if con.execute(sql).fetchone()[0] == 0
    ]
    assert not empty, f"stale literals (regenerated testdata?): {empty}"


def test_event_ids_unique(con):
    """stream_dedup_roundtrip's identity oracle assumes each event_id
    appears once in the source (the query dedups a DOUBLE-landed copy
    back to the single-copy table). If a regeneration ships duplicate
    ids, that oracle silently flips red at the driver — fail here first,
    loudly, with the count."""
    n, d = con.execute(
        "SELECT count(*), count(DISTINCT event_id) FROM events"
    ).fetchone()
    assert n == d, f"events.event_id not unique: {n} rows, {d} distinct"


def test_primary_ids_unique(con):
    """Global ranks, shard striping, and point lookups assume the key
    tables' ids are unique; a regeneration breaking that should fail
    here, not as a downstream hash mismatch."""
    for table, col in [
        ("documents", "doc_id"),
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("embeddings", "vec_id"),
    ]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {col}) FROM {table}"
        ).fetchone()
        assert n == d, f"{table}.{col} not unique: {n} rows, {d} distinct"
