"""CLI entry point: list filtering, unknown-query suggestions, and a
run against the smoke data (in-process — no subprocess JVM spin-up)."""

from __future__ import annotations

import contextlib
import io

from leader_graph_spark.__main__ import main


def _capture(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_list_and_tag_filter():
    rc, out = _capture(["list"])
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) >= 160
    rc, out = _capture(["list", "--tag", "bm25"])
    assert rc == 0
    assert all("bm25" in line for line in out.strip().splitlines())


def test_unknown_query_suggests():
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = main(["run", "pricing_summ"])
    assert rc == 2
    assert "pricing_summary" in err.getvalue()


def test_run_json(spark, sf_smoke):
    # reuses the session fixture's JVM (getOrCreate) — no cold start
    rc, out = _capture(
        ["run", "pricing_summary", "--sf-dir", sf_smoke, "--json", "--limit", "3"]
    )
    assert rc == 0
    import json

    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert 1 <= len(rows) <= 3
    assert "l_returnflag" in rows[0]


def test_cli_plan(capsys):
    from leader_graph_spark.__main__ import main

    assert main(["plan", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("shuffles=")
    assert "HashAggregate" in out
