"""Derived-relationship edge builders — the reference's analytical core.

Reproduces the three Cypher derivation queries of
``src/mysql2neo4j.py:229-489`` as DataFrame joins with *exact* null
semantics:

- SAME_HOMETOWN (J3): group people by a shared attribute, all unordered
  pairs within a group (``:229-253``).
- SCHOOLMATES (J4): pairs through a shared school; ``atTheSameTime`` is
  three-valued logic collapsed to false when any year bound is missing
  (``:270-276``); missing start months count as January, missing end
  months as December (``:273-274``); overlap window via latest-start /
  earliest-end (``:280-311``); excluded school (``:265``).
- COLLEAGUES (J5 current / J6 historical): current pairs carry
  ``overlapPeriod='till now'`` (``:373-396``); historical pairs require
  all four date parts non-null on both sides (``:398-489``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from leader_graph_spark.functions.scalar import format_period


def same_group_pairs(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """J3: all unordered pairs within a non-null, non-empty group
    (``src/mysql2neo4j.py:229-253``). Dedup by ``id1 < id2``. The
    empty-string check runs on a string view of the column so numeric
    group keys work too."""
    base = df.filter(
        F.col(group_col).isNotNull() & (F.col(group_col).cast("string") != "")
    )
    a, b = base.alias("a"), base.alias("b")
    cond = (F.col(f"a.{group_col}") == F.col(f"b.{group_col}")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    out = [F.col(f"a.{group_col}").alias(group_col)]
    out += [F.col(f"a.{id_col}").alias(f"{id_col}_1"), F.col(f"b.{id_col}").alias(f"{id_col}_2")]
    for c in carry_cols:
        out += [F.col(f"a.{c}").alias(f"{c}_1"), F.col(f"b.{c}").alias(f"{c}_2")]
    return a.join(b, cond).select(*out)


def _months(year: Column, month: Column, default_month: int) -> Column:
    return year * 12 + F.coalesce(month, F.lit(default_month))


def schoolmate_edges(
    study: DataFrame,
    *,
    school_col: str = "school",
    id_col: str = "person_id",
    start_year: str = "start_year",
    start_month: str = "start_month",
    end_year: str = "end_year",
    end_month: str = "end_month",
    exclude_schools: Sequence[str] = (),
) -> DataFrame:
    """J4 SCHOOLMATES with reference-exact null semantics.

    Output: school, ``{id}_1``/``_2``, ``at_same_time`` (false — not
    null — when any year bound missing), ``overlap_period``
    (``YYYY.MM-YYYY.MM`` when at_same_time, else null).
    """
    base = study
    if exclude_schools:
        base = base.filter(~F.col(school_col).isin(list(exclude_schools)))
    a, b = base.alias("a"), base.alias("b")
    cond = (F.col(f"a.{school_col}") == F.col(f"b.{school_col}")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )

    def side(s: str) -> tuple[Column, Column, Column, Column]:
        sy, sm = F.col(f"{s}.{start_year}"), F.col(f"{s}.{start_month}")
        ey, em = F.col(f"{s}.{end_year}"), F.col(f"{s}.{end_month}")
        return _months(sy, sm, 1), _months(ey, em, 12), sy, ey

    a_start, a_end, a_sy, a_ey = side("a")
    b_start, b_end, b_sy, b_ey = side("b")
    bounds_present = a_sy.isNotNull() & a_ey.isNotNull() & b_sy.isNotNull() & b_ey.isNotNull()
    overlaps = (a_start <= b_end) & (b_start <= a_end)
    # Three-valued logic collapsed to false exactly as the reference does
    # when any year is missing (src/mysql2neo4j.py:270-276).
    at_same_time = F.when(bounds_present & overlaps, F.lit(True)).otherwise(F.lit(False))
    overlap_start = F.greatest(a_start, b_start)
    overlap_end = F.least(a_end, b_end)
    period = F.when(at_same_time, format_period(overlap_start, overlap_end))

    return a.join(b, cond).select(
        F.col(f"a.{school_col}").alias(school_col),
        F.col(f"a.{id_col}").alias(f"{id_col}_1"),
        F.col(f"b.{id_col}").alias(f"{id_col}_2"),
        at_same_time.alias("at_same_time"),
        period.alias("overlap_period"),
    )


def current_colleague_edges(
    people: DataFrame,
    *,
    org_col: str,
    id_col: str,
    position_col: str | None = None,
) -> DataFrame:
    """J5 current colleagues: pairs through the shared current org,
    ``overlap_period='till now'`` (``src/mysql2neo4j.py:373-396``)."""
    carry = (position_col,) if position_col else ()
    pairs = same_group_pairs(people, group_col=org_col, id_col=id_col, carry_cols=carry)
    return pairs.withColumn("overlap_period", F.lit("till now"))


def historical_colleague_edges(
    work: DataFrame,
    *,
    org_col: str = "workplace",
    id_col: str = "person_id",
    start_year: str = "start_year",
    start_month: str = "start_month",
    end_year: str = "end_year",
    end_month: str = "end_month",
) -> DataFrame:
    """J6 historical colleagues: all four date parts must be non-null on
    both sides (``src/mysql2neo4j.py:404-409``), overlap on month
    scalars, formatted overlap window."""
    complete = work.filter(
        F.col(start_year).isNotNull()
        & F.col(start_month).isNotNull()
        & F.col(end_year).isNotNull()
        & F.col(end_month).isNotNull()
    )
    a, b = complete.alias("a"), complete.alias("b")
    cond = (F.col(f"a.{org_col}") == F.col(f"b.{org_col}")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    a_start = F.col(f"a.{start_year}") * 12 + F.col(f"a.{start_month}")
    a_end = F.col(f"a.{end_year}") * 12 + F.col(f"a.{end_month}")
    b_start = F.col(f"b.{start_year}") * 12 + F.col(f"b.{start_month}")
    b_end = F.col(f"b.{end_year}") * 12 + F.col(f"b.{end_month}")
    overlaps = (a_start <= b_end) & (b_start <= a_end)
    return a.join(b, cond & overlaps).select(
        F.col(f"a.{org_col}").alias(org_col),
        F.col(f"a.{id_col}").alias(f"{id_col}_1"),
        F.col(f"b.{id_col}").alias(f"{id_col}_2"),
        format_period(F.greatest(a_start, b_start), F.least(a_end, b_end)).alias(
            "overlap_period"
        ),
    )
