"""User-behavior analytics: ordered funnel conversion and cohort
retention over the ``events`` table.

The reference's event handling stops at per-entity latest-state
(``src/leader_relation_data2mysql.py``); these add the two
sequence-aware analyses every event-sourced store is actually asked
for: "how many users progressed view → click → purchase, in order?"
and "of the users who first appeared on day D, how many came back k
days later?". Both are single-shuffle plans on ``user_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from leader_graph_spark.plans.registry import query
from leader_graph_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Ordered funnel: view → click → purchase
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH e1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
),
e2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
              OVER (PARTITION BY user_id) AS t_click
  FROM e1
),
e3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM e2
)
SELECT user_id, min(t_view) AS t_view, min(t_click) AS t_click,
       min(t_purchase) AS t_purchase,
       CAST(CASE WHEN min(t_purchase) IS NOT NULL THEN 3
                 WHEN min(t_click) IS NOT NULL THEN 2
                 WHEN min(t_view) IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS stage_reached
FROM e3 GROUP BY user_id
"""


@query("funnel_view_click_purchase", _FUNNEL_ORACLE, bench=True, tags=("behavior", "funnel"))
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered funnel: first view, first click strictly AFTER
    that view, first purchase strictly after that click — the ordering
    constraint is what distinguishes a funnel from three independent
    mins (a purchase before any view must NOT count).

    Scale shape: three chained unordered windows over the SAME
    ``user_id`` partitioning — each stage's threshold feeds the next
    stage's conditional min — followed by a groupBy on the same key, so
    the whole funnel is ONE hash exchange of the events table and no
    self-joins (the naive form joins events to events per stage). An
    unordered min-over-partition needs no sort, only the hash.
    """
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", ts.alias("ts")
    )
    e = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    e = e.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    agg = e.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return agg.select(
        "user_id", "t_view", "t_click", "t_purchase",
        stage.cast("int").alias("stage_reached"),
    )


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT c.cohort_day,
       CAST(date_diff('day', c.cohort_day, u.day) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM ud u JOIN cohort c ON u.user_id = c.user_id
GROUP BY c.cohort_day, day_offset
"""


@query("cohort_retention_daily", _RETENTION_ORACLE, tags=("behavior", "retention"))
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users grouped by first-active day, then
    for each (cohort, day-offset) the count of users active that many
    days later — the retention-curve table behind every engagement
    dashboard, and a data-freshness probe for training pipelines (a
    cohort whose activity vanishes mid-window flags an ingest gap).

    Scale shape: TWO shuffles total, no join. Activity collapses
    straight to one day-SET per user (``collect_set`` — map-side
    combinable, and bounded by the CALENDAR, ≤ window-days entries per
    user, so the set can never blow a row); the cohort day is then just
    ``array_min`` in place — computing it in the same row eliminates
    both the distinct-(user, day) pre-shuffle and the cohort self-join
    a naive plan would run (3 exchanges → 2, and no join at all); the
    final (cohort, offset) rollup shuffles calendar-sized keys. The
    user dimension is never broadcast — at 100 TB it doesn't fit.
    """
    per_user = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("timestamp").cast("date").alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    return (
        per_user.select(F.array_min("days").alias("cohort_day"), F.explode("days").alias("day"))
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("int").alias("day_offset"))
        .agg(F.count("*").cast("bigint").alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Event-sequence pattern matching (CEP-lite)
# ---------------------------------------------------------------------------

_SEQ_REGEX = "v[^p]*p"

_SEQ_MATCH_ORACLE = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(length(seq) AS INT) AS seq_len,
       CAST(len(regexp_extract_all(seq, '{_SEQ_REGEX}')) AS INT) AS n_conversions
FROM seqs
"""


@query("event_sequence_regex_match", _SEQ_MATCH_ORACLE, tags=("behavior", "cep", "sequence"))
def event_sequence_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex over each user's event-type SEQUENCE: encode the ordered
    history as a one-char-per-event string and count ``v[^p]*p``
    matches — "a view that eventually converts, with no purchase in
    between", i.e. distinct conversion episodes. This is the
    lightweight form of MATCH_RECOGNIZE-style complex event processing:
    any per-user ordered pattern (abandonment, retry storms,
    error-before-purchase) is one regex away, and the funnel query's
    fixed three-stage chain is just one instance of it.

    Scale shape: one groupBy on user_id building the sequence string
    via sort_array(collect_list(struct)) — per-user history must fit a
    row (true for event-type initials even at 100 TB: 1 char/event);
    the regex then runs map-side per user. Both engines count
    non-overlapping leftmost matches, so the value parity is exact.
    """
    e = load_table(spark, sf_dir, "events")
    initial = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seqs = (
        e.select("user_id", F.struct(F.col("ts").cast("timestamp").alias("ts"),
                                     F.col("event_id").alias("event_id"),
                                     initial.alias("c")).alias("ev"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("ev")), lambda s: s["c"]), ""
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("int").alias("seq_len"),
        F.regexp_count("seq", F.lit(_SEQ_REGEX)).cast("int").alias("n_conversions"),
    )


# ---------------------------------------------------------------------------
# EWMA (recursive fold) per user
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
SELECT user_id, CAST(count(*) AS INT) AS n_events,
       list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE),
                      list(CAST(value AS DOUBLE) ORDER BY ts, event_id)),
         (acc, x) -> acc * 0.5 + x * 0.5
       ) AS ewma_value
FROM events GROUP BY user_id
"""


@query("user_value_ewma", _EWMA_ORACLE, tags=("behavior", "timeseries", "ewma"))
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's event
    values (sₜ = ½·sₜ₋₁ + ½·xₜ, seed 0) — the recency-weighted signal
    smoother of monitoring and feature pipelines, and a computation
    WINDOW FUNCTIONS CANNOT EXPRESS (each state depends on the previous
    state, not on a frame of inputs). Expressed as a deterministic
    left fold over the time-ordered value array via the ``aggregate``
    higher-order function — sequential semantics inside one row,
    distributed across users.

    α = ½ is chosen deliberately: halving a double is EXACT (power-of-
    two scaling), so the only rounding is in the additions, which both
    engines perform in the identical order — the oracle matches
    bit-for-bit with no fixed-point collapse needed. Scale shape: one
    groupBy on user_id; per-user history must fit a row (same contract
    as the sequence-regex query)."""
    e = load_table(spark, sf_dir, "events")
    ev = F.struct(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").alias("event_id"),
        F.col("value").cast("double").alias("value"),
    )
    g = e.select("user_id", ev.alias("ev")).groupBy("user_id").agg(
        F.array_sort(F.collect_list("ev")).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda s: s["value"])
    return g.select(
        "user_id",
        F.size("evs").cast("int").alias("n_events"),
        F.aggregate(
            vals, F.lit(0.0), lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5)
        ).alias("ewma_value"),
    )


# ---------------------------------------------------------------------------
# Event transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(floor(1000000.0 * CAST(count(*) AS DOUBLE)
            / CAST(sum(count(*)) OVER (PARTITION BY event_type) AS DOUBLE)) AS BIGINT)
         AS row_share_ppm
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@query("event_transition_matrix", _TRANSITIONS_ORACLE, tags=("behavior", "markov"))
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    per user — the behavioral fingerprint behind "what usually follows
    an error?", and the input to next-event prediction baselines. The
    per-row normalization (share of transitions leaving each state) is
    floor-ppm over exact counts, so nothing depends on float summation.

    Scale shape: one lead() window per user partition (hash only — the
    tie-broken sort is within user), collapsing immediately to the
    |types|² transition matrix; the ppm window runs over that ≤25-row
    aggregate."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").cast("timestamp"), "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").cast("bigint").alias("n_transitions"))
    w_row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.floor(
            F.lit(1000000.0)
            * F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_row).cast("double")
        )
        .cast("bigint")
        .alias("row_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Daily volume anomaly flags (z-score over exact statistics)
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events GROUP BY day
),
stats AS (
  SELECT count(*) AS k, sum(n_events) AS s, sum(n_events * n_events) AS ss FROM daily
)
SELECT d.day, CAST(d.n_events AS BIGINT) AS n_events,
       (abs(CAST(d.n_events AS DOUBLE) - (CAST(st.s AS DOUBLE) / st.k))
        > 2.0 * sqrt((CAST(st.ss AS DOUBLE) / st.k)
                     - (CAST(st.s AS DOUBLE) / st.k) * (CAST(st.s AS DOUBLE) / st.k)))
         AS is_anomaly
FROM daily d CROSS JOIN stats st
"""


@query("daily_volume_anomalies", _ANOMALY_ORACLE, tags=("dq", "anomaly", "timeseries"))
def daily_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly flags: each day's event count against a
    2σ band from the window's own mean/variance — the pipeline
    tripwire for a collapsed or doubled feed. Sufficient statistics
    (k, Σx, Σx²) are exact integers; mean/σ appear only in one
    identical double expression per engine, so the boolean flag is
    hash-stable. Population σ (÷k) keeps the expression minimal.

    Scale shape: the corpus reduces map-side to calendar days; the
    3-value stats row broadcasts back. At 100 TB the identical plan
    runs per (source, day) with a grouped stats table instead of a
    global one."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("timestamp").cast("date").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    stats = daily.agg(
        F.count("*").alias("k"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("k")
    var = F.col("ss").cast("double") / F.col("k") - mean * mean
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        (
            F.abs(F.col("n_events").cast("double") - mean) > F.lit(2.0) * F.sqrt(var)
        ).alias("is_anomaly"),
    )


_DWELL_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts,
         lead(event_type) OVER w AS next_type,
         lead(ts) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type AS from_type, next_type AS to_type,
       count(*) AS n_transitions,
       CAST(sum(epoch_us(next_ts) - epoch_us(ts)) AS BIGINT) AS total_dwell_us,
       CAST(sum(epoch_us(next_ts) - epoch_us(ts)) // count(*) AS BIGINT) AS mean_dwell_us
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@query("transition_dwell_times", _DWELL_ORACLE, tags=("behavior", "dwell"))
def transition_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean dwell time per event-type TRANSITION (round-5): how long
    users sit between a view and the click that follows it, per
    (from, to) pair — the timing companion to the transition
    probability matrix (``event_transition_matrix`` gives WHERE users
    go; this gives HOW FAST). Exact integer microseconds end-to-end:
    epoch-µs differences summed as BIGINT, mean as integer division —
    no float, engine-identical. One user-keyed window (lead with the
    event-id tie-break) + a |types|²-row aggregate."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("gap_us"),
    ).where(F.col("next_type").isNotNull())
    return seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("gap_us").cast("bigint").alias("total_dwell_us"),
        F.expr("CAST(sum(gap_us) div count(1) AS BIGINT)").alias("mean_dwell_us"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution over a purchase lookback window
# ---------------------------------------------------------------------------

_ATTRIB_LOOKBACK_DAYS = 3

_ATTRIB_TOUCHES_ORACLE = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id, event_type, ts
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.purchase_id, p.user_id, p.pts, t.event_id, t.event_type, t.ts
  FROM p LEFT JOIN t
    ON p.user_id = t.user_id
   AND t.ts < p.pts
   AND t.ts >= p.pts - INTERVAL {_ATTRIB_LOOKBACK_DAYS} DAY
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY purchase_id ORDER BY ts ASC, event_id ASC) AS rn_first,
         row_number() OVER (PARTITION BY purchase_id ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM j
)
SELECT purchase_id, user_id,
       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS INT) AS n_views,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS INT) AS n_clicks,
       min(CASE WHEN rn_first = 1 THEN event_type END) AS first_touch_type,
       max(CASE WHEN rn_last = 1 THEN event_type END) AS last_touch_type,
       CAST(epoch_us(min(pts)) - epoch_us(max(ts)) AS BIGINT) AS last_touch_gap_us
FROM ranked GROUP BY purchase_id, user_id
"""


@query("purchase_attribution_touches", _ATTRIB_TOUCHES_ORACLE, tags=("behavior", "attribution"))
def purchase_attribution_touches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase touchpoint summary for multi-touch attribution:
    every purchase paired with the view/click touches in the trailing
    3-day lookback window (strictly before the purchase instant) —
    touch counts per channel, first/last touch channel, and the
    integer-microsecond gap from the last touch to the purchase.
    Purchases with NO touch in the window survive the left join with
    zero counts and NULL channels (the "dark conversion" row the
    channel rollup must not lose).

    Determinism: first/last touch resolved by ``max_by/min_by`` on the
    (ts, event_id) struct — the event-id tiebreak makes equal-timestamp
    touches deterministic; the gap is epoch-µs arithmetic, no floats.

    Scale shape: an equi-join on ``user_id`` with the lookback band as
    a post-join theta — per-user event counts are bounded, so the band
    filter runs inside each sort-merge key group and the join output
    is O(purchases × touches-in-window), never a time cross product.
    At 100 TB the join key would be (user_id, day-bucket) exactly as
    in ``operators/intervals.point_in_interval_join``; with the
    synthetic per-user densities the plain user key is the faster plan
    (no bucket replication of the probe side)."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    t = events.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
        F.col("ts").alias("t_ts"),
    )
    j = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (t["t_ts"] < p["pts"])
        & (t["t_ts"] >= p["pts"] - F.expr(f"INTERVAL {_ATTRIB_LOOKBACK_DAYS} DAYS")),
        "left",
    ).select(p["purchase_id"], p["user_id"], p["pts"], "t_id", "t_type", "t_ts")
    return j.groupBy("purchase_id", "user_id").agg(
        F.count(F.when(F.col("t_type") == "view", 1)).cast("int").alias("n_views"),
        F.count(F.when(F.col("t_type") == "click", 1)).cast("int").alias("n_clicks"),
        F.expr("min_by(t_type, struct(t_ts, t_id))").alias("first_touch_type"),
        F.expr("max_by(t_type, struct(t_ts, t_id))").alias("last_touch_type"),
        (F.unix_micros(F.min("pts")) - F.unix_micros(F.max("t_ts")))
        .cast("bigint")
        .alias("last_touch_gap_us"),
    )


_ATTRIB_CREDIT_ORACLE = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id, event_type, ts
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.purchase_id, t.event_id, t.event_type, t.ts
  FROM p JOIN t
    ON p.user_id = t.user_id
   AND t.ts < p.pts
   AND t.ts >= p.pts - INTERVAL {_ATTRIB_LOOKBACK_DAYS} DAY
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n_touches,
         row_number() OVER (PARTITION BY purchase_id ORDER BY ts DESC, event_id DESC) AS rn_last,
         row_number() OVER (PARTITION BY purchase_id ORDER BY ts ASC, event_id ASC) AS rn_first
  FROM j
)
SELECT event_type AS channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(CASE WHEN rn_last = 1 THEN 1 END) AS BIGINT) AS last_touch_purchases,
       CAST(count(CASE WHEN rn_first = 1 THEN 1 END) AS BIGINT) AS first_touch_purchases,
       CAST(sum(1000000000 // n_touches) AS BIGINT) AS linear_credit_nano
FROM sized GROUP BY event_type
"""


@query("attribution_channel_credit", _ATTRIB_CREDIT_ORACLE, tags=("behavior", "attribution"))
def attribution_channel_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel-level attribution rollup over the same 3-day lookback
    pairing: for each channel (view / click) the number of purchases it
    closed (last-touch), opened (first-touch), and its linear-model
    credit — each purchase's single credit unit split evenly across its
    touches. Credit is fixed-pointed BEFORE summing
    (``1e9 div n_touches`` per touch, integer division) so the
    distributed sum is order-independent and engine-exact; nothing
    float crosses the aggregation.

    Scale: reuses the purchase×touch band join (user-keyed, see
    ``purchase_attribution_touches``), then two purchase-keyed window
    ranks — same partitioning as the join output, so AQE coalesces
    them into one exchange; the final rollup is a |channels|-row
    aggregate with map-side combine."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    t = events.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
        F.col("ts").alias("t_ts"),
    )
    j = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (t["t_ts"] < p["pts"])
        & (t["t_ts"] >= p["pts"] - F.expr(f"INTERVAL {_ATTRIB_LOOKBACK_DAYS} DAYS")),
    ).select(p["purchase_id"], "t_id", "t_type", "t_ts")
    from pyspark.sql import Window

    wp = Window.partitionBy("purchase_id")
    sized = j.select(
        "t_type",
        F.count(F.lit(1)).over(wp).alias("n_touches"),
        F.row_number()
        .over(wp.orderBy(F.desc("t_ts"), F.desc("t_id")))
        .alias("rn_last"),
        F.row_number()
        .over(wp.orderBy(F.asc("t_ts"), F.asc("t_id")))
        .alias("rn_first"),
    )
    return sized.groupBy(F.col("t_type").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.count(F.when(F.col("rn_last") == 1, 1))
        .cast("bigint")
        .alias("last_touch_purchases"),
        F.count(F.when(F.col("rn_first") == 1, 1))
        .cast("bigint")
        .alias("first_touch_purchases"),
        F.sum(F.expr("1000000000 div n_touches")).cast("bigint").alias("linear_credit_nano"),
    )
