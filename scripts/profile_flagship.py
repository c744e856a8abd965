"""One-session A/B of the flagship interval-join formatting variants +
schoolmates profile, at sf0.1 (round-4 drift attribution, VERDICT item 1).

Variants, interleaved best-of-N (the box shows whole-run slow windows, so
attempts of each variant are spread across the session and only ratios
within this run are meaningful):
  flagship_current   — per-output-pair format (r3 code, shipped)
  flagship_carry     — per-input-row strings carried through the join (r2 code)
  flagship_noformat  — ids + raw month scalars, no strings (join floor)
  schoolmates        — shipped schoolmates_shared_part
  schoolmates_nofmt  — schoolmates with the final format stripped (join floor)

Also records output row counts (pair expansion size) so a future testdata
regeneration that changes the expansion is detectable.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from leader_graph_spark.functions.scalar import format_month_scalar, ts_months_scalar
from leader_graph_spark.operators.intervals import interval_overlap_self_join
from leader_graph_spark.plans.graph_queries import schoolmates_shared_part
from leader_graph_spark.plans.relational import flagship_colleagues_interval
from leader_graph_spark.session import get_spark
from leader_graph_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
RUNS = 5


def _cust_intervals(spark, sf_dir, with_strings: bool):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spans = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt"), F.max("o_orderdate").alias("last_dt")
    )
    start_m = ts_months_scalar("first_dt")
    end_m = ts_months_scalar("last_dt")
    cols = [
        "c_custkey",
        "c_nationkey",
        start_m.alias("start_m"),
        end_m.alias("end_m"),
    ]
    if with_strings:
        cols += [
            format_month_scalar(start_m).alias("start_str"),
            format_month_scalar(end_m).alias("end_str"),
        ]
    return customer.join(spans, customer.c_custkey == spans.o_custkey).select(*cols)


def flagship_carry(spark, sf_dir):
    cust = _cust_intervals(spark, sf_dir, with_strings=True)
    pairs = interval_overlap_self_join(
        cust,
        key_cols=["c_nationkey"],
        id_col="c_custkey",
        carry_cols=["start_m", "end_m", "start_str", "end_str"],
    )
    return pairs.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_custkey_1").alias("custkey_1"),
        F.col("c_custkey_2").alias("custkey_2"),
        F.concat(
            F.when(F.col("start_m_1") >= F.col("start_m_2"), F.col("start_str_1")).otherwise(
                F.col("start_str_2")
            ),
            F.lit("-"),
            F.when(F.col("end_m_1") <= F.col("end_m_2"), F.col("end_str_1")).otherwise(
                F.col("end_str_2")
            ),
        ).alias("overlap_period"),
    )


def flagship_noformat(spark, sf_dir):
    cust = _cust_intervals(spark, sf_dir, with_strings=False)
    pairs = interval_overlap_self_join(
        cust, key_cols=["c_nationkey"], id_col="c_custkey"
    )
    return pairs.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_custkey_1").alias("custkey_1"),
        F.col("c_custkey_2").alias("custkey_2"),
        "overlap_start",
        "overlap_end",
    )


def schoolmates_nofmt(spark, sf_dir):
    # schoolmate_edges ends in a formatted window; reproduce its core
    # join without the final string stage.
    from leader_graph_spark.plans.graph_queries import EXCLUDED_SCHOOL_NAME

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    excluded = part.filter(F.col("p_name") == EXCLUDED_SCHOOL_NAME).select("p_partkey")
    study = (
        li.join(F.broadcast(excluded), li.l_partkey == excluded.p_partkey, "left_anti")
        .groupBy(F.col("l_suppkey").alias("person_id"), F.col("l_partkey").alias("school"))
        .agg(F.min("l_shipdate").alias("first_sd"), F.max("l_shipdate").alias("last_sd"))
        .select(
            "person_id",
            "school",
            (F.year("first_sd") * 12 + F.month("first_sd") - 1).alias("start_m"),
            (F.year("last_sd") * 12 + F.month("last_sd") - 1).alias("end_m"),
        )
    )
    a = study.alias("a")
    b = study.alias("b")
    cond = (
        (F.col("a.school") == F.col("b.school"))
        & (F.col("a.person_id") < F.col("b.person_id"))
    )
    return a.join(b, cond).select(
        F.col("a.school").alias("school"),
        F.col("a.person_id").alias("id1"),
        F.col("b.person_id").alias("id2"),
        F.greatest("a.start_m", "b.start_m").alias("o_start"),
        F.least("a.end_m", "b.end_m").alias("o_end"),
    )


VARIANTS = {
    "flagship_current": flagship_colleagues_interval,
    "flagship_carry": flagship_carry,
    "flagship_noformat": flagship_noformat,
    "schoolmates": schoolmates_shared_part,
    "schoolmates_nofmt": schoolmates_nofmt,
}


def main():
    spark = get_spark("profile_flagship")
    counts = {}
    for name, fn in sorted(VARIANTS.items()):
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        counts[name] = fn(spark, SF_DIR).count()
    timings: dict[str, list[float]] = {n: [] for n in VARIANTS}
    for _ in range(RUNS):
        for name, fn in sorted(VARIANTS.items()):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.perf_counter() - t0, 3))
    out = {
        "sf": 0.1,
        "runs": RUNS,
        "rows": counts,
        "best": {n: min(t) for n, t in timings.items()},
        "all": timings,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
