"""Local replay of the driver's DuckDB-oracle comparison.

Mirrors the driver contract: for each query, run the Spark DataFrame
and the oracle SQL over the same parquet tables, then compare
row count + column names + an order-insensitive value hash (columns
sorted by name, values canonicalized to strings).
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math

import duckdb

from leader_graph_spark.sources.tables import TABLES


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    lines = sorted("\x1f".join(_canon(row[i]) for i in order) for row in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), names, digest


def duckdb_oracle(sql: str, sf_dir: str) -> tuple[int, list[str], str]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return canonical_rows(cols, rows)


def spark_result(df) -> tuple[int, list[str], str]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return canonical_rows(cols, rows)


def compare(df, sql: str, sf_dir: str) -> dict:
    sn, scols, shash = spark_result(df)
    on, ocols, ohash = duckdb_oracle(sql, sf_dir)
    return {
        "rows_spark": sn,
        "rows_oracle": on,
        "cols_spark": scols,
        "cols_oracle": ocols,
        "hash_spark": shash,
        "hash_oracle": ohash,
        "rows_match": sn == on,
        "cols_match": scols == ocols,
        "hash_match": shash == ohash,
        "match": sn == on and scols == ocols and shash == ohash,
    }
