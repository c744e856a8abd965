"""The reference's seven-stage pipeline (``main.py:26-42``) as pure
DataFrame transforms over lake tables.

Reference stage → Spark transform:

1. ingest org charts (CSV/Excel) → ``ingest_orgs`` (S1-S3 + forward-fill
   W1 + first-wins dedup A5 + md5 keys F1)
2. scrape org pages → out-of-engine acquisition; a landing table with a
   ``remark`` HTML column is the input contract here
3. extract org fields from HTML → ``extract_org_fields`` (X1/X2)
4. derive leader rows from org pages → ``derive_leaders`` (X3 UDTF +
   P6 validation + P5 incremental anti-join)
5. scrape leader pages → landing table again
6. extract leader fields + portrait → ``extract_leader_fields``
7. structure career histories → ``structure_careers`` (X8 stub backend +
   X11 validation + F18 JSON round-trip)

Then the analytical workload (``src/mysql2neo4j.py``): ``build_graph``
materializes vertices/edges and the three derived-relationship edge
sets from the structured events.

Between stages the "IR" is a DataFrame (the reference re-reads MySQL
tables; here each stage is a pure function, checkpointable to parquet
at any boundary). Incremental reruns: every stage takes an optional
``done`` frame and anti-joins it away (P5) — the recompute skips
finished keys exactly as the reference's skip-processed reads do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from leader_graph_spark.extract.html import extract_links_table, parse_pages
from leader_graph_spark.functions.scalar import md5_key
from leader_graph_spark.graph.derived import (
    current_colleague_edges,
    historical_colleague_edges,
    same_group_pairs,
    schoolmate_edges,
)
from leader_graph_spark.operators.llm import structured_extraction
from leader_graph_spark.operators.validation import validate_events_reject


def ingest_orgs(raw: DataFrame) -> DataFrame:
    """Stage 1: raw org-chart rows → org table.

    - forward-fill empty parent-department cells from the nearest
      preceding non-empty row (W1, requires the ingest-order column
      ``row_seq`` the file reader provides);
    - first-wins dedup on the content-derived uuid (A5);
    - md5 surrogate keys, parent-scoped for same-name orgs (F1).
    Input columns: row_seq, parent_dept, dept, url.

    The forward-fill window is deliberately global (single partition):
    the input is a hand-maintained org-chart FILE — thousands of rows,
    not a fact table — and carrying the fill across the whole ingest
    order is the semantics. For billion-row forward-fill see
    ``forward_fill_events`` (per-key partitioned) or the two-phase
    carry pattern in ``operators/packing.py:pack_by_cumsum``.
    """
    valid_parent = F.when(
        F.col("parent_dept").isNotNull() & ~F.col("parent_dept").isin("", "/"),
        F.col("parent_dept"),
    )
    ffill = Window.orderBy("row_seq").rowsBetween(Window.unboundedPreceding, 0)
    filled = raw.withColumn("parent_dept", F.last(valid_parent, ignorenulls=True).over(ffill))
    keyed = filled.select(
        "row_seq",
        "parent_dept",
        "dept",
        "url",
        md5_key("parent_dept").alias("parent_uuid"),
        md5_key("dept", "parent_dept").alias("uuid"),
    )
    first_wins = Window.partitionBy("uuid").orderBy("row_seq")
    return (
        keyed.withColumn("rn", F.row_number().over(first_wins))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def extract_org_fields(orgs_with_html: DataFrame) -> DataFrame:
    """Stage 3: org landing table (uuid, remark HTML) → parsed fields."""
    return parse_pages(orgs_with_html, id_col="uuid", html_col="remark")


def derive_leaders(
    orgs_with_html: DataFrame, *, done: DataFrame | None = None
) -> DataFrame:
    """Stage 4: harvest person links under leadership headings (X3),
    one leader row per link, with P5 incremental skip of already-derived
    leader uuids."""
    # Rename the org key first — the link UDTF emits its own ``uuid``
    # (the person key), which would clash with the org id column.
    leaders = extract_links_table(
        orgs_with_html.withColumnRenamed("uuid", "org_uuid"),
        id_col="org_uuid",
        html_col="remark",
    )
    if done is not None:
        leaders = leaders.join(
            done.select(F.col("uuid").alias("done_uuid")),
            leaders["uuid"] == F.col("done_uuid"),
            "left_anti",
        )
    return leaders


def extract_leader_fields(leaders_with_html: DataFrame) -> DataFrame:
    """Stage 6: leader landing table → parsed person page fields."""
    return parse_pages(leaders_with_html, id_col="uuid", html_col="remark")


def extract_leader_details(leaders_with_html: DataFrame) -> DataFrame:
    """Stage 6b: fixed-field person details (X5 infobox cascade —
    ethnicity / native_place / birth_date / alma_mater /
    political_status) from the same landing table; ``native_place``
    feeds the SAME_HOMETOWN derivation in :func:`build_graph`."""
    from leader_graph_spark.extract.html import PERSON_DETAIL_MAPPING, extract_infobox_table

    return extract_infobox_table(
        leaders_with_html,
        id_col="uuid",
        html_col="remark",
        field_mapping=PERSON_DETAIL_MAPPING,
    )


def structure_careers(
    leaders: DataFrame, *, text_col: str = "career_text", done: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Stage 7: career free-text → validated typed events.

    Returns (valid event rows, quarantine rows). Reruns skip leaders
    already present in ``done`` (P5)."""
    pending = leaders
    if done is not None:
        pending = pending.join(
            done.select(F.col("uuid").alias("done_uuid")),
            pending["uuid"] == F.col("done_uuid"),
            "left_anti",
        )
    extracted = structured_extraction(pending, id_col="uuid", text_col=text_col)
    events = extracted.select("uuid", F.explode("events").alias("e")).select("uuid", "e.*")
    return validate_events_reject(events)


def build_graph(
    orgs: DataFrame,
    leaders: DataFrame,
    events: DataFrame,
    *,
    person_details: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The mysql2neo4j analytical workload (``src/mysql2neo4j.py:491-541``)
    as one batch: vertices, membership edges, and the three derived
    edge families (SCHOOLMATES, COLLEAGUES current+historical, and —
    when ``person_details`` from :func:`extract_leader_details` is
    supplied — SAME_HOMETOWN by ``native_place``)."""
    person_v = leaders.select(
        F.col("uuid").alias("id"), F.lit("Person").alias("label"), F.col("name")
    )
    org_v = orgs.select(
        F.col("uuid").alias("id"), F.lit("Organization").alias("label"),
        F.col("dept").alias("name"),
    )
    vertices = person_v.unionByName(org_v).dropDuplicates(["id"])

    works_for = leaders.select(
        F.col("uuid").alias("src"), F.col("org_uuid").alias("dst"),
        F.lit("WORKS_FOR").alias("relationship"),
    )
    belongs_to = orgs.select(
        F.col("uuid").alias("src"), F.col("parent_uuid").alias("dst"),
        F.lit("BELONGS_TO").alias("relationship"),
    ).filter(F.col("dst").isNotNull())

    study = events.filter(F.col("event_type") == "study").select(
        F.col("uuid").alias("person_id"),
        F.col("school"),
        "start_year",
        "start_month",
        "end_year",
        "end_month",
    )
    schoolmates = schoolmate_edges(study, exclude_schools=["中央党校"])
    colleagues_now = current_colleague_edges(
        leaders.select("uuid", "org_uuid"), org_col="org_uuid", id_col="uuid"
    )
    work = events.filter(
        (F.col("event_type") == "work") & F.col("place").isNotNull()
    ).select(
        F.col("uuid").alias("person_id"),
        F.col("place"),
        "start_year",
        "start_month",
        "end_year",
        "end_month",
    )
    colleagues_past = historical_colleague_edges(work, org_col="place", id_col="person_id")
    out = {
        "vertices": vertices,
        "edges": works_for.unionByName(belongs_to),
        "schoolmates": schoolmates,
        "colleagues_now": colleagues_now,
        "colleagues_past": colleagues_past,
    }
    if person_details is not None:
        out["same_hometown"] = same_group_pairs(
            person_details.select("uuid", "native_place"),
            group_col="native_place",
            id_col="uuid",
        )
    return out
