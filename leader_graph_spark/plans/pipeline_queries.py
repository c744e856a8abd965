"""Extraction-pipeline queries: event validation (X11) with oracles,
plus the end-to-end career-structuring pipeline (X8 → X11 → explode)
over synthesized career texts.

Event rows are synthesized deterministically from ``orders`` so the
oracle can reproduce them: a mix of valid/invalid years, months, flags
and cross-type field violations keyed off ``o_orderkey`` residues.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from leader_graph_spark.operators.llm import structured_extraction
from leader_graph_spark.operators.validation import (
    event_violations,
    repair_events,
    validate_events_reject,
)
from leader_graph_spark.plans.registry import query
from leader_graph_spark.sources.tables import load_table

_SYNTH_EVENTS_SQL = """
synth AS (
  SELECT o_orderkey AS event_id,
         CASE WHEN o_orderkey % 3 = 0 THEN 'study'
              WHEN o_orderkey % 3 = 1 THEN 'work'
              ELSE 'unknown' END AS event_type,
         year(o_orderdate) + CASE WHEN o_orderkey % 11 = 0 THEN 300 ELSE 0 END AS start_year,
         CASE WHEN o_orderkey % 5 = 0 THEN 13 ELSE month(o_orderdate) END AS start_month,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE year(o_orderdate) + 1 END AS end_year,
         month(o_orderdate) AS end_month,
         TRUE AS is_end,
         (o_orderkey % 2 = 0) AS has_end_date,
         CASE WHEN o_orderkey % 3 = 0 THEN 'School_' || o_orderstatus ELSE NULL END AS school,
         CASE WHEN o_orderkey % 3 = 1 THEN o_orderpriority
              WHEN o_orderkey % 3 = 0 AND o_orderkey % 4 = 0 THEN 'stray_place'
              ELSE NULL END AS place,
         CASE WHEN o_orderkey % 3 = 1 AND o_orderkey % 4 <> 0 THEN 'manager' ELSE NULL END AS position
  FROM orders
)
"""


def _synth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        k.alias("event_id"),
        F.when(k % 3 == 0, "study").when(k % 3 == 1, "work").otherwise("unknown").alias(
            "event_type"
        ),
        (F.year("o_orderdate") + F.when(k % 11 == 0, 300).otherwise(0)).alias("start_year"),
        F.when(k % 5 == 0, 13).otherwise(F.month("o_orderdate")).alias("start_month"),
        F.when(k % 7 == 0, F.lit(None).cast("int"))
        .otherwise(F.year("o_orderdate") + 1)
        .alias("end_year"),
        F.month("o_orderdate").alias("end_month"),
        F.lit(True).alias("is_end"),
        (k % 2 == 0).alias("has_end_date"),
        F.when(k % 3 == 0, F.concat(F.lit("School_"), F.col("o_orderstatus"))).alias("school"),
        F.when(k % 3 == 1, F.col("o_orderpriority"))
        .when((k % 3 == 0) & (k % 4 == 0), F.lit("stray_place"))
        .alias("place"),
        F.when((k % 3 == 1) & (k % 4 != 0), F.lit("manager")).alias("position"),
    )


_REPAIR_ORACLE = f"""
WITH {_SYNTH_EVENTS_SQL},
yfix AS (
  SELECT event_id, event_type,
         CASE WHEN start_year IS NULL OR (start_year BETWEEN 1900 AND 2100) THEN start_year END AS start_year,
         CASE WHEN start_month IS NULL OR (start_month BETWEEN 1 AND 12) THEN start_month END AS start_month,
         CASE WHEN end_year IS NULL OR (end_year BETWEEN 1900 AND 2100) THEN end_year END AS end_year,
         CASE WHEN end_month IS NULL OR (end_month BETWEEN 1 AND 12) THEN end_month END AS end_month,
         is_end, has_end_date, school, place, position
  FROM synth
)
SELECT event_id, event_type, start_year, start_month, end_year, end_month,
       is_end,
       CASE WHEN end_year IS NULL THEN FALSE ELSE has_end_date END AS has_end_date,
       CASE WHEN event_type = 'work' THEN NULL ELSE school END AS school,
       CASE WHEN event_type = 'study' THEN NULL ELSE place END AS place,
       CASE WHEN event_type = 'study' THEN NULL ELSE position END AS position
FROM yfix
"""


@query("event_validation_repair", _REPAIR_ORACLE, tags=("X11-repair",))
def event_validation_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repair-mode schema validation (the Qwen variant,
    ``leader/bio_processor_qwen.py:348-423``): out-of-range dates nulled,
    cross-type fields nulled, has_end_date downgraded without an end
    year — every row survives."""
    return repair_events(_synth_events(spark, sf_dir))


_CHECKS_SQL = """list_filter([
  CASE WHEN NOT (start_year IS NULL OR (start_year BETWEEN 1900 AND 2100)) THEN 'start_year_range' END,
  CASE WHEN NOT (end_year IS NULL OR (end_year BETWEEN 1900 AND 2100)) THEN 'end_year_range' END,
  CASE WHEN NOT (start_month IS NULL OR (start_month BETWEEN 1 AND 12)) THEN 'start_month_range' END,
  CASE WHEN NOT (end_month IS NULL OR (end_month BETWEEN 1 AND 12)) THEN 'end_month_range' END,
  CASE WHEN NOT (NOT (is_end AND has_end_date) OR end_year IS NOT NULL) THEN 'end_flags_need_end_year' END,
  CASE WHEN NOT (event_type <> 'study' OR school IS NOT NULL) THEN 'study_requires_school' END,
  CASE WHEN NOT (event_type <> 'study' OR (place IS NULL AND position IS NULL)) THEN 'study_excludes_work_fields' END,
  CASE WHEN NOT (event_type <> 'work' OR (place IS NOT NULL AND position IS NOT NULL)) THEN 'work_requires_place_position' END,
  CASE WHEN NOT (event_type <> 'work' OR school IS NULL) THEN 'work_excludes_school' END,
  CASE WHEN NOT (event_type IN ('study', 'work')) THEN 'known_event_type' END
], x -> x IS NOT NULL)"""

_QUARANTINE_ORACLE = f"""
WITH {_SYNTH_EVENTS_SQL}
SELECT event_id, event_type,
       array_to_string(list_sort({_CHECKS_SQL}), ',') AS violations
FROM synth
WHERE len({_CHECKS_SQL}) > 0
"""


@query("event_validation_quarantine", _QUARANTINE_ORACLE, tags=("X11-reject",))
def event_validation_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reject-mode schema validation (the GPT path,
    ``leader/bio_processor.py:449-455``): rows with ≥1 violated rule go
    to quarantine with the violated-rule list attached. The rule list is
    emitted as a sorted comma-joined scalar so the driver's pandas-based
    hasher can canonicalize it (raw array columns are unhashable there);
    the full array form stays available via ``validate_events_reject``."""
    _, quarantine = validate_events_reject(_synth_events(spark, sf_dir))
    return quarantine.select(
        "event_id",
        "event_type",
        F.array_join(F.array_sort("violations"), ",").alias("violations"),
    )


# ---------------------------------------------------------------------------
# X1 HTML extraction, driver-checked: deterministic page synthesis →
# real parse (mapInPandas, stdlib html.parser) → posexplode of sections.
# The oracle reconstructs the EXPECTED extraction output by string
# construction from the same residues — it never parses HTML — so any
# drift in the parser (title suffix strip, citation-marker cleaning,
# summary assembly, section order) breaks the hash.
# ---------------------------------------------------------------------------

_SECTIONS_ORACLE = """
WITH base AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         'About doc ' || CAST(doc_id AS VARCHAR) AS description,
         CASE WHEN doc_id % 5 = 0 THEN '' ELSE 'Intro for doc ' || CAST(doc_id AS VARCHAR) || '.' END AS summary
  FROM documents
)
SELECT doc_id, title, description, summary,
       CAST(0 AS INT) AS sec_pos,
       'Overview ' || CAST(doc_id AS VARCHAR) AS heading,
       'Alpha content ' || CAST(doc_id AS VARCHAR) AS content
FROM base
UNION ALL
SELECT doc_id, title, description, summary,
       CAST(1 AS INT) AS sec_pos,
       'Career' AS heading,
       'Worked at Org' || CAST(doc_id % 10 AS VARCHAR) || ' since 199' || CAST(doc_id % 10 AS VARCHAR) AS content
FROM base WHERE doc_id % 2 = 0
"""


def _synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HTML pages keyed off doc_id residues: suffix-bearing
    <title>, meta description, optional pre-heading summary text, an
    always-present section with a citation marker the cleaner must strip,
    and an even-doc-only second section."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d,
        F.lit("_百度百科</title><meta name=\"description\" content=\"About doc "),
        d,
        F.lit("\"/></head><body>"),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("")
        ).otherwise(F.concat(F.lit("<p>Intro for doc "), d, F.lit(".</p>"))),
        F.lit("<h1>Overview "),
        d,
        F.lit("</h1><p>Alpha   content "),
        d,
        F.lit(" [3]</p>"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("<h2>Career</h2><p>Worked at Org"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("​ since 199"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("</p>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


@query("extracted_sections_explode", _SECTIONS_ORACLE, tags=("X1", "X6", "F2", "W5"))
def extracted_sections_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 page→content-struct extraction over synthesized HTML
    (``html_extractor/extract_content_from_remark.py:85-703``): real
    DOM-event parse via Arrow-batched mapInPandas, then one row per
    section in document order (posexplode — W5). Exercises the title
    suffix strip (F10), citation-marker/zero-width cleaning cascade
    (F2-F5) and the summary-before-first-heading rule against an oracle
    that rebuilds the expected output from the synthesis residues."""
    from leader_graph_spark.extract.html import parse_pages

    pages = _synth_pages(spark, sf_dir)
    parsed = parse_pages(pages, id_col="doc_id", html_col="html")
    return parsed.select(
        "doc_id",
        "title",
        "description",
        "summary",
        F.posexplode("sections").alias("sec_pos", "sec"),
    ).select(
        "doc_id",
        "title",
        "description",
        "summary",
        F.col("sec_pos").cast("int").alias("sec_pos"),
        F.col("sec.heading").alias("heading"),
        F.col("sec.content").alias("content"),
    )


_CAREER_ORACLE = """
SELECT o_custkey,
       'work' AS event_type,
       CAST(year(o_orderdate) AS INT) AS start_year,
       CAST(month(o_orderdate) AS INT) AS start_month,
       CAST(year(o_orderdate) + 1 AS INT) AS end_year,
       CAST(month(o_orderdate) AS INT) AS end_month,
       TRUE AS is_end,
       TRUE AS has_end_date,
       CAST(NULL AS VARCHAR) AS school,
       'worked as clerk at Store' || CAST(o_orderkey AS VARCHAR) AS place,
       'worked as clerk at Store' || CAST(o_orderkey AS VARCHAR) AS position
FROM orders
"""


@query("career_structuring_pipeline", _CAREER_ORACLE, tags=("X8", "X11", "F18"))
def career_structuring_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end X8→X11 pipeline: per-customer career text synthesized
    from order history, structured into typed events by the
    deterministic stub backend (mapInPandas — the LLM seam), validated
    in reject mode, exploded to one row per valid event. The career
    lines derive from orders by fixed formatting and the stub parses by
    rule, so the oracle reconstructs every expected event field straight
    from orders — line parsing, date math, study/work classification and
    validation survival are all under the value hash."""
    orders = load_table(spark, sf_dir, "orders")
    lines = orders.select(
        "o_custkey",
        F.format_string(
            "%d.%02d-%d.%02d worked as clerk at Store%d",
            F.year("o_orderdate"),
            F.month("o_orderdate"),
            F.year("o_orderdate") + 1,
            F.month("o_orderdate"),
            F.col("o_orderkey"),
        ).alias("line"),
        F.struct("o_orderdate", "o_orderkey").alias("ord"),
    )
    texts = lines.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "line"))), lambda s: s.line
            ),
            "\n",
        ).alias("career_text")
    )
    extracted = structured_extraction(
        texts, id_col="o_custkey", text_col="career_text", output_col="events"
    )
    exploded = extracted.select("o_custkey", F.explode("events").alias("e")).select(
        "o_custkey", "e.*"
    )
    valid, _ = validate_events_reject(exploded)
    return valid
