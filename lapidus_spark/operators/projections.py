"""Projection / normalization operators (SURVEY.md §2.3).

Everything here is a pure ``select`` — no shuffle, fully pipelined
inside whole-stage codegen, column-pruned down to the scan at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.cdc import CDC_TYPE_EXPR, normalize_events
from lapidus_spark.sources.tables import load_table


@query(
    "prj_envelope",
    oracle=f"""
    SELECT event_id AS event_seq,
           'pg_main' AS source,
           {CDC_TYPE_EXPR} AS type,
           'public' AS schema_name,
           'users' AS table_name,
           CAST(user_id AS VARCHAR) AS pk,
           CASE WHEN {CDC_TYPE_EXPR} = 'delete' THEN NULL ELSE props END AS item,
           user_id AS tx_id,
           ts
    FROM events
    """,
    operator="prj_envelope",
    doc="Source payload → canonical envelope (postgresql.js:471-480; "
    "delete is key-only per postgresql.js:416-425, mysql.js:148-152).",
)
def prj_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_events(load_table(spark, sf_dir, "events"))


@query(
    "prj_pk_coalesce",
    oracle="""
    SELECT event_id,
           COALESCE(NULLIF(json_extract_string(props, '$.k'), ''),
                    CAST(user_id AS VARCHAR),
                    CAST(event_id AS VARCHAR)) AS pk
    FROM events
    """,
    operator="prj_pk",
    doc="First-non-null candidate-key scan, the PG delete pk rule "
    "(postgresql.js:423-424) as a coalesce.",
)
def prj_pk_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.coalesce(
            F.nullif(F.get_json_object("props", "$.k"), F.lit("")),
            F.col("user_id").cast("string"),
            F.col("event_id").cast("string"),
        ).alias("pk"),
    )


@query(
    "prj_routing_key",
    oracle="""
    SELECT event_id,
           concat_ws('.', 'public', 'users', CAST(user_id AS VARCHAR)) AS subject
    FROM events
    """,
    operator="prj_subject",
    doc="NATS routing subject schema.table.pk (nats.js:17-21).",
)
def prj_routing_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.concat_ws(
            ".", F.lit("public"), F.lit("users"), F.col("user_id").cast("string")
        ).alias("subject"),
    )


CACHE_ACTION_EXPR = (
    f"CASE {CDC_TYPE_EXPR} WHEN 'update' THEN 'invalidate' "
    "WHEN 'delete' THEN 'purge' ELSE 'populate' END"
)


@query(
    "prj_cache_action",
    oracle=f"""
    SELECT event_id,
           {CACHE_ACTION_EXPR} AS cache_action,
           concat_ws('.', 'cache', {CACHE_ACTION_EXPR}, 'public', 'users',
                     CAST(user_id AS VARCHAR)) AS cache_topic
    FROM events
    """,
    operator="sink_cache",
    doc="Cache-invalidation topic derivation populate/invalidate/purge "
    "(nats.js:25-28 — we implement the documented intent, not the "
    "event.action bug).",
)
def prj_cache_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    action = F.expr(CACHE_ACTION_EXPR)
    return ev.select(
        F.col("event_id"),
        action.alias("cache_action"),
        F.concat_ws(
            ".",
            F.lit("cache"),
            action,
            F.lit("public"),
            F.lit("users"),
            F.col("user_id").cast("string"),
        ).alias("cache_topic"),
    )


@query(
    "prj_scalar_battery",
    oracle="""
    SELECT event_id,
           upper(event_type) AS type_u,
           substr(event_type, 1, 3) AS type_3,
           length(event_type) AS type_len,
           concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS tag,
           regexp_replace(event_type, '[aeiou]', '_', 'g') AS type_novowel,
           year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
           date_trunc('day', ts) AS day_ts,
           abs(value) AS v_abs,
           floor(value) AS v_floor,
           ceil(value) AS v_ceil,
           sqrt(abs(value)) AS v_sqrt,
           greatest(value, 100.0) AS v_hi,
           least(value, 100.0) AS v_lo,
           coalesce(nullif(event_type, 'error'), 'redacted') AS type_safe
    FROM events
    """,
    operator="scalar function library (gap §2.5)",
    doc="Scalar-function battery: string, date-part, math, and "
    "conditional functions with engine-identical semantics (sqrt is "
    "IEEE correctly-rounded; floor/ceil exact; regexp_replace global "
    "on both sides) — all inside one whole-stage-codegen projection.",
)
def prj_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_u"),
        F.substring("event_type", 1, 3).alias("type_3"),
        F.length("event_type").cast("long").alias("type_len"),
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias("tag"),
        F.regexp_replace("event_type", "[aeiou]", "_").alias("type_novowel"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.date_trunc("day", "ts").alias("day_ts"),
        F.abs("value").alias("v_abs"),
        F.floor("value").cast("double").alias("v_floor"),
        F.ceil("value").cast("double").alias("v_ceil"),
        F.sqrt(F.abs("value")).alias("v_sqrt"),
        F.greatest("value", F.lit(100.0)).alias("v_hi"),
        F.least("value", F.lit(100.0)).alias("v_lo"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("redacted")).alias("type_safe"),
    )


@query(
    "set_union_streams",
    oracle="""
    SELECT user_id AS entity_id, event_type AS type FROM events
      WHERE event_type = 'signup'
    UNION
    SELECT user_id AS entity_id, event_type AS type FROM events
      WHERE event_type = 'purchase'
    """,
    operator="ctl_fork/agg_order",
    doc="Multi-backend union: one worker per backend merged downstream "
    "(lapidus.js:88-109) → unionByName + dedup.",
)
def set_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("entity_id"), F.col("event_type").alias("type")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"), F.col("event_type").alias("type")
    )
    return a.unionByName(b).distinct()
