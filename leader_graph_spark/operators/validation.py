"""Event-schema validation (SURVEY.md §2.8 X11) as column expressions.

The reference validates LLM-extracted career events two ways:
- **reject**: Pydantic validators throw → the whole row falls back to
  ``{"events": []}`` (``leader/schema.py:41-96``,
  ``leader/bio_processor.py:449-455``);
- **repair**: the Qwen variant nulls out invalid fields and downgrades
  inconsistent flags instead of rejecting
  (``leader/bio_processor_qwen.py:348-423``).

Both modes here are pure ``when/otherwise`` column transforms over a
typed event row set — fully relational, oracle-checkable.

Rules (from ``leader/schema.py:41-96``):
- years in [1900, 2100]; months in [1, 12];
- ``is_end AND has_end_date`` requires ``end_year``;
- study events require ``school`` and must not carry place/position;
- work events require place+position and must not carry school.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _year_ok(c: Column) -> Column:
    return c.isNull() | ((c >= 1900) & (c <= 2100))


def _month_ok(c: Column) -> Column:
    return c.isNull() | ((c >= 1) & (c <= 12))


def event_violations(df: DataFrame) -> Column:
    """Array of violated-rule names per event row (empty → valid)."""
    checks = [
        ("start_year_range", _year_ok(F.col("start_year"))),
        ("end_year_range", _year_ok(F.col("end_year"))),
        ("start_month_range", _month_ok(F.col("start_month"))),
        ("end_month_range", _month_ok(F.col("end_month"))),
        (
            "end_flags_need_end_year",
            ~(F.col("is_end") & F.col("has_end_date")) | F.col("end_year").isNotNull(),
        ),
        (
            "study_requires_school",
            (F.col("event_type") != "study") | F.col("school").isNotNull(),
        ),
        (
            "study_excludes_work_fields",
            (F.col("event_type") != "study")
            | (F.col("place").isNull() & F.col("position").isNull()),
        ),
        (
            "work_requires_place_position",
            (F.col("event_type") != "work")
            | (F.col("place").isNotNull() & F.col("position").isNotNull()),
        ),
        (
            "work_excludes_school",
            (F.col("event_type") != "work") | F.col("school").isNull(),
        ),
        ("known_event_type", F.col("event_type").isin("study", "work")),
    ]
    arr = F.array(
        *[F.when(~ok, F.lit(name)) for name, ok in checks]
    )
    return F.filter(arr, lambda x: x.isNotNull())


def validate_events_reject(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Reject mode: split into (valid, quarantine). Mirrors the GPT
    path where any violation voids the extraction."""
    flagged = df.withColumn("violations", event_violations(df))
    valid = flagged.filter(F.size("violations") == 0).drop("violations")
    quarantine = flagged.filter(F.size("violations") > 0)
    return valid, quarantine


def repair_events(df: DataFrame) -> DataFrame:
    """Repair mode (the Qwen variant): null out-of-range dates, null
    cross-type fields, downgrade ``has_end_date`` when no end year —
    every row survives."""
    year_fix = lambda c: F.when(_year_ok(F.col(c)), F.col(c)).otherwise(F.lit(None))  # noqa: E731
    month_fix = lambda c: F.when(_month_ok(F.col(c)), F.col(c)).otherwise(F.lit(None))  # noqa: E731
    out = (
        df.withColumn("start_year", year_fix("start_year"))
        .withColumn("end_year", year_fix("end_year"))
        .withColumn("start_month", month_fix("start_month"))
        .withColumn("end_month", month_fix("end_month"))
    )
    is_study = F.col("event_type") == "study"
    is_work = F.col("event_type") == "work"
    out = (
        out.withColumn("school", F.when(is_work, F.lit(None)).otherwise(F.col("school")))
        .withColumn("place", F.when(is_study, F.lit(None)).otherwise(F.col("place")))
        .withColumn("position", F.when(is_study, F.lit(None)).otherwise(F.col("position")))
        .withColumn(
            "has_end_date",
            F.when(F.col("end_year").isNull(), F.lit(False)).otherwise(F.col("has_end_date")),
        )
    )
    return out
