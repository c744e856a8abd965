"""Slowly-changing-dimension (SCD2) historization.

The reference's update flows keep only the latest state per key —
REPLACE-INTO style recompute upserts (``utils/db_utils.py:37-89``,
modeled by K2 ``keyed_upsert_recompute``). SCD2 is the warehouse-grade
historized form of the same idea: every attribute CHANGE opens a new
version row carrying a validity interval, so any past state can be
queried with ``valid_from <= t < valid_to``.

Scale design: rebuilt declaratively from the full change log with ONE
shuffle on the key — the run-detection lag/row_number windows, the
per-version aggregation, and the valid_to lead all share the same
(key)-partitioning, so Catalyst reuses a single exchange. No iterative
merge, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from leader_graph_spark.sources.tables import fan_out


def scd2_collapse(
    df: DataFrame,
    *,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Collapse an event/snapshot stream into SCD2 version intervals:
    consecutive rows with the same attribute value merge into one
    version; each version row carries (valid_from, valid_to, n_events,
    is_current), with ``valid_to`` equal to the next version's
    ``valid_from`` (NULL on the open current version).

    Null attributes are versions too (``eqNullSafe`` run detection);
    ``tie_col`` breaks timestamp ties deterministically.

    Output: (key, version, attr, valid_from, valid_to, n_events,
    is_current), one row per (key, run of equal attr values).
    """
    # Rename BEFORE the windows: partitioning must be established on the
    # exact output attribute ("key"), or the final lead window cannot see
    # that it is already co-partitioned once the original column is
    # projected away (alias-aware partitioning propagation stops at the
    # project that drops the source attribute).
    base = fan_out(df).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(attr_col).alias("attr"),
        *([F.col(tie_col).alias("_tie")] if tie_col else []),
    )
    order = [F.col("ts")] + ([F.col("_tie")] if tie_col else [])
    w = Window.partitionBy("key").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    rn = F.row_number().over(w)
    prev = F.lag("attr").over(w)
    changed = ((rn == 1) | ~prev.eqNullSafe(F.col("attr"))).cast("int")
    # Runs are CONTIGUOUS in (key, order) — so the per-version aggregates
    # are expressible as key-partitioned running windows plus a run-end
    # filter, never a groupBy on (key, version): a groupBy would add a
    # second exchange on the composite key, and the final valid_to
    # window a third. This formulation keeps the whole operator on ONE
    # hash exchange (verified via explain in tests).
    marked = base.select(
        "key",
        "ts",
        "attr",
        rn.alias("rn"),
        F.sum(changed).over(wrun).alias("version"),
        F.max(F.when(changed == 1, F.col("ts"))).over(wrun).alias("valid_from"),
        F.max(F.when(changed == 1, rn)).over(wrun).alias("run_start_rn"),
        # next row opens a new run (or there is no next row) → run end
        (F.lead(changed, 1, 1).over(w) == 1).alias("is_run_end"),
    )
    ends = marked.filter("is_run_end")
    # key partitioning survives the filter: this window sorts in place
    w2 = Window.partitionBy("key").orderBy("version")
    valid_to = F.lead("valid_from").over(w2)
    return ends.select(
        "key",
        F.col("version").cast("int").alias("version"),
        "attr",
        "valid_from",
        valid_to.alias("valid_to"),
        (F.col("rn") - F.col("run_start_rn") + 1).cast("int").alias("n_events"),
        valid_to.isNull().alias("is_current"),
    )
