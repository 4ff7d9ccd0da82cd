"""Stateful operators (SURVEY.md §2.4) — batch semantics.

These are the reference's only truly stateful stages: transaction
assembly, the last-schema-per-table cache, commit-timestamp stamping,
and the canonical downstream consumer (last-write-wins snapshot).

Scale notes (100 TB posture):
- tx assembly groups by tx_id: bounded groups (a transaction's
  statements), so ``collect_list`` per group is safe; the reference
  itself flags its in-memory buffer for spill rework
  (postgresql.js:14-17) — Spark's spilling aggregation solves it.
- snapshot/last-value use window row_number / max_by, which shuffle
  once on the entity key and stream within partitions — no unbounded
  state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.cdc import CDC_TYPE_EXPR
from lapidus_spark.sources.tables import load_table


@query(
    "agg_tx_assembly",
    oracle="""
    SELECT user_id AS tx_id,
           count(*) AS n_items,
           min(event_id) AS first_seq,
           max(event_id) AS last_seq,
           string_agg(event_type, '|' ORDER BY event_id) AS item_types
    FROM events
    GROUP BY user_id
    """,
    operator="agg_tx",
    doc="DatabaseTransaction: buffer DML between begin/commit, emit "
    "items in statement order (postgresql.js:18-33,437-465,487-501). "
    "Batch analog: per-tx ordered assembly via sorted collect_list.",
)
def agg_tx_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # sort_array on struct(seq, type) sorts by seq → statement order,
    # independent of shuffle arrival order (the reference relies on a
    # totally-ordered pipe; we must not).
    ordered = F.array_sort(F.collect_list(F.struct(F.col("event_id"), F.col("event_type"))))
    return ev.groupBy(F.col("user_id").alias("tx_id")).agg(
        F.count("*").alias("n_items"),
        F.min("event_id").alias("first_seq"),
        F.max("event_id").alias("last_seq"),
        F.array_join(ordered.getField("event_type"), "|").alias("item_types"),
    )


@query(
    "win_schema_cache",
    oracle="""
    SELECT event_type AS table_name,
           arg_max(props, event_id) AS latest_schema,
           max(event_id) AS schema_seq
    FROM events
    GROUP BY event_type
    """,
    operator="win_schema",
    doc="schemaCache: latest schema line per table attached to later "
    "envelopes (postgresql.js:56,430-436,477) → max_by per key.",
)
def win_schema_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("table_name")).agg(
        F.max_by("props", "event_id").alias("latest_schema"),
        F.max("event_id").alias("schema_seq"),
    )


@query(
    "win_cdc_snapshot",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_id, ts, event_type, value, props,
             {CDC_TYPE_EXPR} AS cdc_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id AS entity_id, event_id AS last_seq, ts AS last_ts,
           cdc_type AS last_type, value AS last_value, props AS item
    FROM ranked WHERE rn = 1 AND cdc_type <> 'delete'
    """,
    operator="win_cdc_snapshot",
    doc="Last-write-wins materialization — the canonical consumer of "
    "the event stream (cache semantics, nats.js:25-28): latest row "
    "image per entity, deletes drop the entity.",
)
def win_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_by on the (ts, event_id) order key instead of a row_number
    # window: a hash aggregate with map-side partials — each partition
    # reduces to one candidate row per entity before the exchange,
    # where the window formulation (the oracle's) must shuffle and
    # sort every event. Same result, far cheaper at 100 TB.
    ev = load_table(spark, sf_dir, "events").withColumn("cdc_type", F.expr(CDC_TYPE_EXPR))
    latest = ev.groupBy(F.col("user_id").alias("entity_id")).agg(
        F.max_by(
            F.struct("event_id", "ts", "cdc_type", "value", "props"),
            F.struct("ts", "event_id"),
        ).alias("last")
    )
    return latest.filter(F.col("last.cdc_type") != "delete").select(
        "entity_id",
        F.col("last.event_id").alias("last_seq"),
        F.col("last.ts").alias("last_ts"),
        F.col("last.cdc_type").alias("last_type"),
        F.col("last.value").alias("last_value"),
        F.col("last.props").alias("item"),
    )


@query(
    "agg_tx_commit_ts",
    oracle="""
    SELECT user_id AS tx_id,
           max(ts) AS commit_ts,
           count(*) AS n_items
    FROM events
    GROUP BY user_id
    """,
    operator="win_commit_ts",
    doc="Commit-timestamp assignment: tx stamped with its commit "
    "event's timestamp (postgresql.js:457-464) → per-group max(ts).",
)
def agg_tx_commit_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("tx_id")).agg(
        F.max("ts").alias("commit_ts"),
        F.count("*").alias("n_items"),
    )


@query(
    "agg_type_counts",
    oracle="""
    SELECT event_type AS type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    operator="sink_emit",
    doc="Per-type dispatch monitoring view (dispatch block "
    "postgresql.js:487-547): how many events each emitter would see.",
)
def agg_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("type")).agg(F.count("*").alias("n_events"))
