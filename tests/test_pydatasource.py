"""Custom Python DataSource (Spark 4): schema, option handling,
partition planning, exact deterministic contents, and composition with
the HTML extraction surface it feeds."""

from __future__ import annotations

from pyspark.sql import functions as F

from leader_graph_spark.sources.pydatasource import register, synth_page


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("leader_pages")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_exact_contents(spark):
    df = _read(spark, n_pages=10, n_shards=3)
    assert df.columns == ["url", "page_id", "html"]
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(synth_page(i) for i in range(10))
    assert got == want


def test_partition_planning(spark):
    df = _read(spark, n_pages=64, n_shards=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 64
    # uneven split: ceil-sized shards must not duplicate or drop pages
    df2 = _read(spark, n_pages=10, n_shards=4)
    assert df2.count() == 10
    assert df2.select("page_id").distinct().count() == 10


def test_feeds_html_extraction(spark):
    """The source's rows flow into the X1 title extractor unchanged —
    the landing contract the reference's scraper output satisfies."""
    from leader_graph_spark.extract.html import parse_pages

    pages = _read(spark, n_pages=6, n_shards=2).select(
        F.col("page_id").alias("doc_id"), "html"
    )
    out = parse_pages(pages, id_col="doc_id", html_col="html")
    rows = {r.doc_id: r.title for r in out.collect()}
    assert len(rows) == 6
    for i in range(6):
        assert rows[i] == synth_page(i)[2].split("<title>")[1].split("</title>")[0]
