"""Window / analytic / sessionization operators (SURVEY.md §2.5 gap).

The reference has no window functions (grep-verified, SURVEY §2.5),
but its stream semantics imply them everywhere: before/after-image
diffing (prj_after, mysql.js:229-236), running per-entity state, the
implicit begin→commit session (agg_tx, postgresql.js:437-465), and
per-backend ordered delivery (agg_order, lapidus.js:88-109). These
queries give the rebuild that surface as first-class, scale-safe
operators.

Scale notes (100 TB posture):
- every window here partitions by the entity key (``user_id``) —
  one shuffle, then per-partition streaming evaluation; no unbounded
  frames over the whole dataset, no ``collect``.
- tumbling windows are a pure projection before a hash aggregate
  (map-side partials apply); they are the batch analog of the
  streaming windowed aggregation (see streaming/queries.py).
- running double sums would be order-dependent across engines, so the
  frame is pinned (ROWS UNBOUNDED PRECEDING .. CURRENT ROW over a
  total per-partition order) and summed in exact DECIMAL, cast to
  double at the end — bit-identical left folds on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

#: session gap, seconds (30 min) — agg_tx's begin→commit session made
#: explicit as an inactivity-gap sessionization.
SESSION_GAP_S = 1800


@query(
    "win_lag_delta",
    oracle="""
    SELECT event_id, user_id AS entity_id, value,
           lag(value) OVER w AS prev_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    operator="prj_after (gap §2.5 analytic)",
    doc="Before/after-image diff per entity: the update event's "
    "after-image vs the previous event (mysql.js:229-236 row.after) "
    "as lag() over the per-entity sequence.",
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        F.col("event_id"),
        F.col("user_id").alias("entity_id"),
        F.col("value"),
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
    )


@query(
    "win_running_total",
    oracle="""
    SELECT event_id, user_id AS entity_id,
           count(*) OVER w AS n_so_far,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    operator="agg_txid_tag (gap §2.5 analytic)",
    doc="Per-entity running state carried between events — the "
    "currentTxId-style running stamp (postgresql.js:55,479) as a "
    "cumulative window over the entity's ordered history.",
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        F.col("event_id"),
        F.col("user_id").alias("entity_id"),
        F.count("*").over(w).alias("n_so_far"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
    )


@query(
    "win_sessionize",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts,
             -- BIGINT cast: DuckDB sum() yields HUGEINT, which a
             -- pandas round-trip silently widens to float64 ("3.0"
             -- vs "3") and breaks value-hash parity.
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_no
      FROM gaps
    )
    SELECT user_id AS entity_id, session_no,
           count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_no
    """,
    operator="agg_tx (gap §2.5 sessionization)",
    doc="Inactivity-gap sessionization: the begin→commit implicit "
    "session (postgresql.js:437-465) generalized to a 30-min gap "
    "session per entity; streaming analog is session_window.",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    # Full-precision gap test: unix_timestamp() truncates to whole
    # seconds, so a 1800.4s gap would read as 1800 and fail the strict
    # > while the oracle's exact-interval compare passes it. Every
    # fixture timestamp has a sub-second component — compare in
    # microseconds, matching the oracle's `ts - lag(ts) > INTERVAL`.
    # unix_micros() requires TIMESTAMP (LTZ); the fixture ts is
    # TIMESTAMP_NTZ. The session TZ is pinned UTC (session.py), so the
    # NTZ→LTZ cast is value-preserving.
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    is_new = F.when(
        prev_ts.isNull() | (gap_us > SESSION_GAP_S * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_no", F.sum("is_new").over(cum))
        .groupBy(F.col("user_id").alias("entity_id"), F.col("session_no"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "win_tumbling_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    operator="streaming windowed agg, batch analog (SURVEY §2.4 scorecard)",
    doc="Tumbling 1-hour event-time windows — the batch twin of the "
    "streaming windowed aggregation (the reference has no windows at "
    "all; SURVEY §2.4 scorecard). F.window aligns to the epoch, so "
    "window.start == date_trunc('hour').",
)
def win_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "win_sliding_counts",
    oracle="""
    WITH b AS (
      SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 1800000000) AS w0,
             value
      FROM events
    ), s AS (
      SELECT w0 AS window_start, value FROM b
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS window_start, value FROM b
    )
    SELECT window_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM s GROUP BY window_start
    """,
    operator="streaming windowed agg, sliding batch analog (SURVEY §2.4 scorecard)",
    doc="SLIDING 1-hour windows every 30 minutes — each event lands in "
    "exactly duration/slide = 2 windows. The oracle states the "
    "assignment explicitly: the event's 30-min bucket start and that "
    "start minus one slide (Spark's F.window aligns slides to the "
    "epoch, so both engines bucket identically). Completes the "
    "tumbling/sliding/session window triple the reference lacks "
    "entirely (§2.4 scorecard).",
)
def win_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "win_value_battery",
    oracle="""
    SELECT event_id,
           user_id AS entity_id,
           first_value(value) OVER wf AS first_val,
           last_value(value) OVER wf AS last_val,
           nth_value(value, 2) OVER wf AS second_val,
           lead(value) OVER wo AS next_val
    FROM events
    WINDOW
      wf AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      wo AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    operator="value window functions (gap §2.5)",
    doc="first_value / last_value / nth_value / lead sharing one "
    "partition key: per-entity earliest, latest, second and next "
    "observation in a single pass — one exchange on the entity key, "
    "all four functions evaluated in the same Window operator. "
    "Deterministic because (ts, event_id) totally orders each "
    "partition.",
)
def win_value_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.first("value").over(wf).alias("first_val"),
        F.last("value").over(wf).alias("last_val"),
        F.nth_value("value", 2).over(wf).alias("second_val"),
        F.lead("value").over(wo).alias("next_val"),
    )


@query(
    "win_scd2_history",
    oracle="""
    SELECT user_id AS entity_id,
           event_id AS version_seq,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    operator="temporal/SCD2 history (win_cdc_snapshot generalization)",
    doc="Slowly-changing-dimension type-2 history: every change event "
    "becomes a version row with a [valid_from, valid_to) range via "
    "lead() — the full-history materialization where win_cdc_snapshot "
    "keeps only the current version.",
)
def win_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        F.col("user_id").alias("entity_id"),
        F.col("event_id").alias("version_seq"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@query(
    "win_dedup_consecutive",
    oracle="""
    WITH d AS (
      SELECT event_id, user_id, ts, props,
             lag(props) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_props
      FROM events
    )
    SELECT event_id, user_id AS entity_id, ts, props AS item
    FROM d
    WHERE prev_props IS NULL OR props IS DISTINCT FROM prev_props
    """,
    operator="changelog compaction (prj_envelope noise suppression)",
    doc="Consecutive-duplicate suppression: drop change events whose "
    "row image equals the entity's previous image (echo writes, "
    "touch updates) — the compaction a CDC consumer applies before "
    "fan-out to cut sink traffic.",
)
def win_dedup_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("props").over(w)
    return (
        ev.withColumn("prev_props", prev)
        .filter(F.col("prev_props").isNull() | ~F.col("props").eqNullSafe(F.col("prev_props")))
        .select(
            "event_id",
            F.col("user_id").alias("entity_id"),
            "ts",
            F.col("props").alias("item"),
        )
    )


PIVOT_TYPES = ("click", "purchase", "signup", "view", "error")


@query(
    "agg_pivot_type_matrix",
    oracle=f"""
    SELECT user_id % 10 AS cohort,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in PIVOT_TYPES)}
    FROM events
    GROUP BY user_id % 10
    """,
    operator="pivot (gap §2.5)",
    doc="Event-type × cohort pivot matrix — groupBy().pivot() with "
    "explicit value list (no discovery pass), one shuffle; oracle is "
    "the equivalent conditional aggregation.",
)
def agg_pivot_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        # explicit values: skips the extra distinct-discovery job AND
        # keeps the output schema stable under data drift
        .pivot("event_type", list(PIVOT_TYPES))
        .count()
        .na.fill(0)
    )
    renamed = out.select(
        "cohort", *[F.col(t).alias(f"n_{t}") for t in PIVOT_TYPES]
    )
    return renamed


@query(
    "prj_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decile,
           count(*) AS n_events,
           min(event_id) AS first_seq
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
    """,
    operator="src_decode schema-on-read (postgresql.js:607-611)",
    doc="Dynamic JSON payload field promoted to a typed column at "
    "query time (get_json_object) and aggregated — the schema-on-read "
    "path for envelopes whose row image is kept as a raw JSON string.",
)
def prj_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.floor(F.get_json_object("props", "$.k").cast("bigint") / 10)
    return ev.groupBy(k.alias("k_decile")).agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_seq"),
    )


@query(
    "agg_rollup_hierarchy",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    operator="grouping sets/rollup (gap §2.5)",
    doc="Hierarchical rollup (status → priority → grand total) — "
    "grouping-sets surface the reference lacks; Catalyst expands to "
    "one Expand + hash aggregate (single shuffle).",
)
def agg_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@query(
    "win_rank_battery",
    oracle="""
    SELECT event_id,
           event_type AS type,
           value,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist,
           ntile(4) OVER w AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
    """,
    operator="ranking-function battery (gap §2.5)",
    doc="The full ranking-function surface — rank, dense_rank, "
    "percent_rank, cume_dist, ntile — sharing ONE window spec, so "
    "all five ride a single exchange on the partition key. "
    "percent_rank/cume_dist are exact ratios of window-row integers "
    "(both engines divide the same int64s → bit-identical doubles); "
    "the ORDER BY carries the key tie-break that makes ntile "
    "deterministic.",
)
def win_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        F.col("event_type").alias("type"),
        "value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_rolling_range",
    oracle="""
    SELECT event_id, user_id AS entity_id, ts,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS n_7d
    FROM events
    """,
    operator="RANGE-frame rolling window (gap §2.5)",
    doc="Time-based rolling aggregates: per-entity 7-day rolling sum "
    "and count with a RANGE frame — the frame is defined by the "
    "timestamp VALUE, not row position, so sparse and bursty "
    "histories both get calendar-correct windows. Spark's rangeBetween "
    "needs a numeric ordering column: the frame runs over unix_micros "
    "(ts), an exact integer, with the interval expressed in "
    "microseconds — bit-identical to the oracle's INTERVAL frame. "
    "One exchange on the entity key; sums via exact DECIMAL.",
)
def win_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seven_days_us = 7 * 86400 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-seven_days_us, 0)
    )
    return ev.select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


@query(
    "agg_funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts AS t1, event_id AS i1 FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'signup'
      ) WHERE rn = 1
    ), s2 AS (
      SELECT user_id, ts AS t2, event_id AS i2 FROM (
        SELECT e.user_id, e.ts, e.event_id,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND (e.ts, e.event_id) > (s1.t1, s1.i1)
      ) WHERE rn = 1
    ), s3 AS (
      SELECT user_id, ts AS t3 FROM (
        SELECT e.user_id, e.ts,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (s2.t2, s2.i2)
      ) WHERE rn = 1
    )
    SELECT s1.user_id AS entity_id,
           s1.t1 AS signup_ts,
           s2.t2 AS first_view_ts,
           s3.t3 AS first_purchase_ts,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS converted
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
    operator="ordered-sequence funnel (gap §2.5 sequential pattern)",
    doc="Three-stage ordered conversion funnel signup → view → "
    "purchase: each stage is the EARLIEST qualifying event strictly "
    "after the previous stage's event (ties broken by event_id — a "
    "total order, so both engines pick the same row). Spark computes "
    "each stage as min(struct(ts, event_id)) per entity — an "
    "argmin without a sort — with one key-partitioned aggregation "
    "and one equi-join per stage; the oracle states the same picks "
    "via row_number. The sequential-pattern query behind activation "
    "and attribution analytics.",
)
def agg_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    key = F.struct("ts", "event_id")

    def first_after(df: DataFrame, etype: str, after: DataFrame | None, after_col: str):
        src = df.filter(F.col("event_type") == etype)
        if after is not None:
            src = src.join(after, "user_id").filter(key > F.col(after_col))
        return src.groupBy("user_id").agg(F.min(key).alias(f"k_{etype}"))

    s1 = first_after(ev, "signup", None, "")
    s2 = first_after(ev, "view", s1, "k_signup")
    s3 = first_after(ev, "purchase", s2, "k_view")
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            F.col("user_id").alias("entity_id"),
            F.col("k_signup.ts").alias("signup_ts"),
            F.col("k_view.ts").alias("first_view_ts"),
            F.col("k_purchase.ts").alias("first_purchase_ts"),
            F.when(F.col("k_purchase").isNotNull(), 1).otherwise(0).cast("bigint").alias("converted"),
        )
    )


@query(
    "win_streaks",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnt
      FROM events
    ), runs AS (
      SELECT user_id, event_type, rn - rnt AS grp, count(*) AS len
      FROM r GROUP BY user_id, event_type, rn - rnt
    )
    SELECT user_id AS entity_id, event_type,
           max(len) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY user_id, event_type
    """,
    operator="gaps-and-islands streaks (gap §2.5)",
    doc="Longest consecutive-run per (entity, type) via the gaps-and-"
    "islands identity: within an entity's (ts, event_id)-ordered "
    "history, rn_overall - rn_within_type is constant exactly across "
    "a maximal run of one type, so runs fall out of a single "
    "grouping with no self-join or iteration. Both row_numbers share "
    "the entity-key exchange; the island aggregation is one more "
    "shuffle on a derived key. The classic sessionless sequence "
    "statistic (error bursts, retry storms, engagement streaks).",
)
def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    runs = r.groupBy("user_id", "event_type", "grp").agg(F.count("*").alias("len"))
    return runs.groupBy(F.col("user_id").alias("entity_id"), F.col("event_type")).agg(
        F.max("len").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_runs"),
    )


@query(
    "agg_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, ts,
             date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort_week,
             date_trunc('week', ts) AS activity_week
      FROM events
    )
    SELECT cohort_week,
           CAST((epoch_us(activity_week) - epoch_us(cohort_week))
                // 604800000000 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
    FROM f
    GROUP BY cohort_week, week_offset
    """,
    operator="cohort retention matrix (gap §2.5 analytics)",
    doc="Weekly cohort retention: entities grouped by their first-"
    "event week, activity counted per week offset — the standard "
    "retention triangle. Week offsets are exact: both engines "
    "Monday-truncate, so the microsecond difference is an exact "
    "multiple of a week and the integer division carries no float. "
    "One window pass on the entity key + one distinct aggregation.",
)
def agg_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    f = ev.select(
        "user_id",
        F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
        F.date_trunc("week", F.col("ts")).alias("activity_week"),
    )
    off = F.expr(
        "(unix_micros(CAST(activity_week AS TIMESTAMP)) - "
        "unix_micros(CAST(cohort_week AS TIMESTAMP))) div 604800000000"
    ).cast("bigint")
    return (
        f.withColumn("week_offset", off)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


@query(
    "win_mad_anomaly",
    oracle="""
    WITH base AS (SELECT event_type, event_id, value FROM events),
    n AS (SELECT event_type, count(*) AS n FROM base GROUP BY 1),
    r1 AS (
      SELECT b.*, row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS rn
      FROM base b
    ),
    med AS (
      SELECT r1.event_type, r1.value AS med
      FROM r1 JOIN n USING (event_type)
      WHERE rn = (n + 1) // 2
    ),
    d AS (
      SELECT b.event_type, b.event_id, abs(b.value - m.med) AS dev, m.med
      FROM base b JOIN med m ON b.event_type = m.event_type
    ),
    r2 AS (
      SELECT d.*, row_number() OVER (PARTITION BY event_type
                                     ORDER BY dev, event_id) AS rn2
      FROM d
    ),
    mad AS (
      SELECT r2.event_type, r2.dev AS mad
      FROM r2 JOIN n USING (event_type)
      WHERE rn2 = (n + 1) // 2
    )
    SELECT d.event_type AS type,
           any_value(d.med) AS med_value,
           any_value(mad.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > 5 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM d JOIN mad ON d.event_type = mad.event_type
    GROUP BY d.event_type
    """,
    operator="robust anomaly detection (median/MAD — pipeline data quality)",
    doc="Per-type robust outlier count: events whose value deviates "
    "from the type's median by more than 5x the median absolute "
    "deviation. Median and MAD are the LOWER-MEDIAN ELEMENTS (the "
    "(n+1) div 2-th smallest, an actual data value) rather than "
    "interpolated quantiles, so both engines compute bit-identical "
    "doubles with no interpolation-formula drift. All three window "
    "passes share one partition key: a single exchange on event_type, "
    "then in-partition sorts. Scale note: an exact per-group order "
    "statistic serializes each group through one task — at 100 TB "
    "swap the medians for approx_percentile (t-digest, mergeable) "
    "and keep this exact query as the small-scale verification twin.",
)
def win_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type")
    w_val = Window.partitionBy("event_type").orderBy("value", "event_id")
    mid = F.expr("(n + 1) div 2")
    r1 = ev.withColumn("n", F.count("*").over(w)).withColumn(
        "rn", F.row_number().over(w_val)
    )
    with_med = r1.withColumn(
        "med", F.max(F.when(F.col("rn") == mid, F.col("value"))).over(w)
    ).withColumn("dev", F.abs(F.col("value") - F.col("med")))
    w_dev = Window.partitionBy("event_type").orderBy("dev", "event_id")
    with_mad = with_med.withColumn("rn2", F.row_number().over(w_dev)).withColumn(
        "mad", F.max(F.when(F.col("rn2") == mid, F.col("dev"))).over(w)
    )
    return with_mad.groupBy(F.col("event_type").alias("type")).agg(
        F.first("med").alias("med_value"),
        F.first("mad").alias("mad"),
        F.sum((F.col("dev") > 5 * F.col("mad")).cast("bigint")).alias("n_anomalies"),
    )


@query(
    "agg_quantile_gate",
    oracle="""
    WITH base AS (SELECT event_type, event_id, value FROM events),
    n AS (SELECT event_type, count(*) AS n FROM base GROUP BY 1),
    r AS (
      SELECT b.*, row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS rn
      FROM base b
    ),
    q AS (
      SELECT r.event_type,
             max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med,
             max(CASE WHEN rn = greatest(n // 10, 1) THEN value END) AS lo,
             max(CASE WHEN rn = greatest((9 * n) // 10, 1) THEN value END) AS hi
      FROM r JOIN n USING (event_type)
      GROUP BY r.event_type
    )
    SELECT event_type AS type, med AS median_exact, TRUE AS sketch_ok
    FROM q
    """,
    operator="quantile sketch gate (Greenwald-Khanna — the 100 TB percentile path)",
    doc="The third sketch gate (after one-shot HLL and mergeable HLL "
    "union): exact per-type median — the lower-median ELEMENT, an "
    "actual data value — alongside approx_percentile's Greenwald-"
    "Khanna summary at accuracy 10000, flagged within 5% of the "
    "exact p10-p90 spread. The oracle pins the flag TRUE. The "
    "tolerance is orders of magnitude above the summary's rank-error "
    "bound, so merge-order jitter in the sketch (GK merges are not "
    "perfectly order-independent) can never flip the flag — the "
    "gate is stable AND a real regression tripwire. At 100 TB the "
    "exact side (a per-group global order statistic) is the one you "
    "drop; the sketch is one normal aggregation exchange.",
)
def agg_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type")
    w_val = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.withColumn("n", F.count("*").over(w)).withColumn(
        "rn", F.row_number().over(w_val)
    )
    mid = F.expr("(n + 1) div 2")
    lo_rn = F.greatest(F.expr("n div 10"), F.lit(1))
    hi_rn = F.greatest(F.expr("(9 * n) div 10"), F.lit(1))
    exact = r.groupBy(F.col("event_type").alias("type")).agg(
        F.max(F.when(F.col("rn") == mid, F.col("value"))).alias("med"),
        F.max(F.when(F.col("rn") == lo_rn, F.col("value"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("value"))).alias("hi"),
    )
    approx = ev.groupBy(F.col("event_type").alias("type")).agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("med_approx")
    )
    return exact.join(F.broadcast(approx), "type").select(
        "type",
        F.col("med").alias("median_exact"),
        (
            F.abs(F.col("med_approx") - F.col("med"))
            <= F.lit(0.05) * (F.col("hi") - F.col("lo"))
        ).alias("sketch_ok"),
    )


#: resample stride and the entity sampling knob for the fixture query
#: (every RESAMPLE_MOD-th user keeps the output hash-sized).
RESAMPLE_MOD = 97


@query(
    "win_resample_ffill",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events
      WHERE user_id % {RESAMPLE_MOD} = 0
      GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts,
             1 AS is_grid, CAST(0 AS BIGINT) AS sk, CAST(NULL AS DOUBLE) AS v
      FROM u
    ), obs AS (
      SELECT user_id, ts, 0 AS is_grid, event_id AS sk, value AS v
      FROM events WHERE user_id % {RESAMPLE_MOD} = 0
    ), merged AS (
      -- sk = event_id pins ties between same-timestamp observations,
      -- keeping the fill deterministic on both engines
      SELECT *, last_value(v IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, is_grid, sk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS filled
      FROM (SELECT * FROM grid UNION ALL SELECT * FROM obs)
    )
    SELECT user_id AS entity_id, ts AS grid_ts, filled AS value_ffill
    FROM merged WHERE is_grid = 1
    """,
    operator="time-series resample + forward fill (gap §2.5 analytics)",
    doc="Hourly resampling with forward fill — the pandas "
    "resample().ffill() primitive, distributed: per entity, an "
    "hourly grid spanning its history (F.sequence — no explode of a "
    "driver-side range), unioned with the raw observations, then ONE "
    "entity-key window takes the last non-null value at or before "
    "each grid point. No point-in-time join, no quadratic as-of "
    "probe: the union+window formulation shuffles each entity's "
    "rows exactly once. Filled values are actual data values "
    "(no arithmetic), so parity is exact. A grid hour before an "
    "entity's first observation stays NULL by contract.",
)
def win_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % RESAMPLE_MOD == 0
    )
    u = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = u.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("ts"),
    ).select(
        "user_id",
        "ts",
        F.lit(1).alias("is_grid"),
        F.lit(0).cast("bigint").alias("sk"),
        F.lit(None).cast("double").alias("v"),
    )
    obs = ev.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_grid"),
        F.col("event_id").alias("sk"),
        F.col("value").alias("v"),
    )
    # sk = event_id pins ties between same-timestamp observations
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid", "sk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = grid.unionByName(obs).withColumn(
        "filled", F.last("v", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_grid") == 1).select(
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("grid_ts"),
        F.col("filled").alias("value_ffill"),
    )


#: EMA smoothing factor 1/4 — binary-exact, so the float recursion is
#: bit-identical wherever the fold order is pinned.
EMA_ALPHA_NUM, EMA_ALPHA_DEN = 1, 4


@query(
    "win_ema",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
             count(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id AS entity_id,
           CAST(n_events AS BIGINT) AS n_events,
           vs[1] AS first_value,
           list_reduce(vs, (a, x) ->
             ({EMA_ALPHA_NUM} * x + ({EMA_ALPHA_DEN} - {EMA_ALPHA_NUM}) * a)
               / {EMA_ALPHA_DEN}) AS ema
    FROM seq
    """,
    operator="exponential moving average (order-sensitive fold — gap §2.5 time series)",
    doc="Per-entity EMA (alpha = 1/4) over the event-time-ordered "
    "value sequence — the classic smoothing recursion a_{{i}} = "
    "alpha*x + (1-alpha)*a_{{i-1}}, which no window frame expresses "
    "because each step depends on the previous RESULT. Computed as "
    "an explicit left-fold over the sorted-collected sequence on "
    "both engines: the fold order is pinned by (ts, event_id) and "
    "alpha is a binary-exact rational evaluated as (1*x + 3*a)/4, "
    "so the float recursion is bit-identical. One shuffle on the "
    "entity key; state per group is that entity's history — the "
    "same bound as transaction assembly.",
)
def win_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value))), s -> s.value)"
        ).alias("vs"),
        F.count("*").alias("n_events"),
    )
    a_num, a_den = EMA_ALPHA_NUM, EMA_ALPHA_DEN
    return seq.select(
        F.col("user_id").alias("entity_id"),
        "n_events",
        F.element_at("vs", 1).alias("first_value"),
        F.expr(
            f"aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1), "
            f"(a, x) -> ({a_num} * x + ({a_den} - {a_num}) * a) / {a_den})"
        ).alias("ema"),
    )


@query(
    "win_ohlc_bars",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS bar_ts,
           (min(struct_pack(ts := ts, id := event_id, v := value))).v AS open_v,
           max(value) AS high_v,
           min(value) AS low_v,
           (max(struct_pack(ts := ts, id := event_id, v := value))).v AS close_v,
           CAST(count(*) AS BIGINT) AS volume,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
    operator="agg_order + win (time-series OHLC downsample, gap §2.5)",
    doc="Hourly OHLC bars per event type — the canonical time-series "
    "downsample (resample('1h').ohlc()). Open/close are exact "
    "argmin/argmax by (ts, event_id) via lexicographic struct "
    "min/max INSIDE the one grouped aggregation — no window pass, no "
    "self-join, no sort: the whole query is a single partial-"
    "aggregated exchange on (type, hour), the shape that scales to "
    "any tick volume because per-group state is one struct per "
    "extreme. Sums are DECIMAL-exact before the double cast; the "
    "event_id tiebreak pins concurrent-timestamp ties on both "
    "engines.",
)
def win_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("bar_ts")
    st = F.struct(F.col("ts"), F.col("event_id").alias("id"), F.col("value").alias("v"))
    return ev.groupBy("event_type", bar).agg(
        F.min(st).getField("v").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max(st).getField("v").alias("close_v"),
        F.count("*").cast("bigint").alias("volume"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@query(
    "win_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), p AS (
      SELECT prev_type, event_type AS curr_type, count(*) AS n
      FROM s WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, curr_type,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
    FROM p
    """,
    operator="win + agg (behavioral transition matrix, gap §2.5)",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag() pairs each event with its predecessor "
    "((ts, event_id) total order pins concurrent ties), then the "
    "(prev, curr) counts normalize into row-stochastic probabilities "
    "— the session-flow model behind next-action prediction and "
    "funnel-shape drift monitoring. One entity-key window exchange + "
    "one pair-count agg + one tiny matrix-row window; the "
    "probability is a single exact-integer division (sum(n) is "
    "computed once per matrix row, and the matrix is event-type² "
    "sized — trivially broadcastable at any corpus scale).",
)
def win_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    p = s.groupBy("prev_type", F.col("event_type").alias("curr_type")).agg(
        F.count("*").alias("n")
    )
    row = Window.partitionBy("prev_type")
    return p.select(
        "prev_type",
        "curr_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(row)).alias("p"),
    )


@query(
    "win_cusum_drift",
    oracle="""
    WITH seq AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS k
      FROM events GROUP BY user_id
    ), f AS (
      SELECT user_id, n_events, k,
             list_reduce(
               -- field ORDER is load-bearing: DuckDB's list_reduce
               -- updates struct fields SEQUENTIALLY, so a later field
               -- reading a.s would see the value an earlier field just
               -- wrote (verified by probe). 'm' therefore comes FIRST
               -- (reads the old s), then 's' overwrites.
               list_prepend({'m': CAST(0 AS DOUBLE), 's': CAST(0 AS DOUBLE)},
                 list_transform(vs, x ->
                   {'m': CAST(0 AS DOUBLE), 's': CAST(x AS DOUBLE)})),
               (a, b) -> {'m': greatest(a.m,
                                 greatest(CAST(0 AS DOUBLE), a.s + (b.s - k))),
                          's': greatest(CAST(0 AS DOUBLE), a.s + (b.s - k))}
             ) AS r
      FROM seq
    )
    SELECT user_id AS entity_id,
           CAST(n_events AS BIGINT) AS n_events,
           k AS mean_ref,
           (r).m AS peak_cusum,
           (r).s AS final_cusum,
           CAST((r).m > k AS BIGINT) AS drift
    FROM f
    """,
    operator="CUSUM drift detection (order-sensitive fold — gap §2.5 time series)",
    doc="Per-entity one-sided CUSUM against the entity's own mean: "
    "s_i = max(0, s_{i-1} + (x_i − k)) with the peak tracked in the "
    "same pass — the classic sequential change-point statistic, "
    "which (like the EMA) no window frame expresses because each "
    "step depends on the previous RESULT. The fold carries a STRUCT "
    "accumulator (running statistic + running peak) over the "
    "(ts, event_id)-pinned sequence, identical arithmetic order on "
    "both engines, so every float bit matches: the reference k is a "
    "double derived from one exact DECIMAL sum, and max/plus "
    "operations are order-pinned. One shuffle on the entity key; "
    "per-group state is that entity's history — the same bound as "
    "transaction assembly and win_ema. A drift flag trips when the "
    "peak exceeds one mean-unit — the monitoring verdict a pipeline "
    "would alert on.",
)
def win_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value))), s -> s.value)"
        ).alias("vs"),
        F.count("*").alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("k"),
    )
    # same field order as the oracle ('m' before 's'); Spark's
    # named_struct evaluates fields independently, so this is purely
    # for symmetry with the DuckDB sequential-update quirk noted there
    fold = (
        "aggregate(vs, named_struct('m', CAST(0 AS DOUBLE), 's', CAST(0 AS DOUBLE)), "
        "(a, x) -> named_struct("
        "'m', greatest(a.m, greatest(CAST(0 AS DOUBLE), a.s + (CAST(x AS DOUBLE) - k))), "
        "'s', greatest(CAST(0 AS DOUBLE), a.s + (CAST(x AS DOUBLE) - k))))"
    )
    f = seq.withColumn("r", F.expr(fold))
    return f.select(
        F.col("user_id").alias("entity_id"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("k").alias("mean_ref"),
        F.col("r.m").alias("peak_cusum"),
        F.col("r.s").alias("final_cusum"),
        (F.col("r.m") > F.col("k")).cast("bigint").alias("drift"),
    )
