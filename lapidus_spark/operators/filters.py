"""Filter operators (SURVEY.md §2.2): the reference's per-event guards.

All are single ``df.filter`` expressions — Catalyst pushes them into
the parquet scan (verify with .explain → PushedFilters), so at 100 TB
these cost a pruned scan, never a full materialize-then-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

#: configured exclusion list, modeling `excludeTables`
#: (reference: src/postgresql.js:393-397, src/mysql.js:107-111).
EXCLUDED_TYPES = ("error", "view")

#: "system table" marker, modeling the pg_temp filter's
#: substring-contains check (reference: src/postgresql.js:386-391
#: uses indexOf('pg_temp_') !== -1).
SYSTEM_MARKER = "err"

#: enabled event types, modeling emitInsert/emitUpdate/... gates
#: (reference: src/postgresql.js:88-97,153-170).
ENABLED_TYPES = ("click", "purchase", "signup")


def exclude_tables(df: DataFrame, excluded=EXCLUDED_TYPES, col: str = "event_type") -> DataFrame:
    """flt_exclude: anti-isin on the table-role column."""
    return df.filter(~F.col(col).isin(list(excluded)))


def system_tables(df: DataFrame, marker: str = SYSTEM_MARKER, col: str = "event_type") -> DataFrame:
    """flt_systbl: drop rows whose name *contains* the system marker."""
    return df.filter(~F.col(col).contains(marker))


def event_gate(df: DataFrame, enabled=ENABLED_TYPES, col: str = "event_type") -> DataFrame:
    """flt_evtype: keep only enabled types (per-sink gating)."""
    return df.filter(F.col(col).isin(list(enabled)))


@query(
    "src_scan_events",
    oracle="""
    SELECT event_id AS event_seq, ts, user_id AS entity_id,
           event_type AS type, value, props AS item
    FROM events
    """,
    operator="src_pg/src_decode",
    doc="Typed scan + projection of the event stream (postgresql.js:607-611).",
)
def src_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("event_seq"),
        F.col("ts"),
        F.col("user_id").alias("entity_id"),
        F.col("event_type").alias("type"),
        F.col("value"),
        F.col("props").alias("item"),
    )


@query(
    "flt_exclude_tables",
    oracle=f"""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE event_type NOT IN {EXCLUDED_TYPES!r}
    """,
    operator="flt_exclude",
    doc="excludeTables anti-filter (postgresql.js:393-397).",
)
def flt_exclude_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return exclude_tables(ev).select("event_id", "event_type", "user_id")


@query(
    "flt_system_tables",
    oracle=f"""
    SELECT event_id, event_type
    FROM events
    WHERE NOT contains(event_type, '{SYSTEM_MARKER}')
    """,
    operator="flt_systbl",
    doc="pg_temp_* substring-contains drop (postgresql.js:386-391).",
)
def flt_system_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return system_tables(ev).select("event_id", "event_type")


@query(
    "flt_drop_blank",
    oracle="""
    SELECT event_id, props
    FROM events
    WHERE props IS NOT NULL AND trim(props) <> ''
    """,
    operator="flt_empty",
    doc="Blank-payload skip (postgresql.js:199-201 ignores empty "
    "lines): drop events with null/whitespace-only row images.",
)
def flt_drop_blank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("props").isNotNull() & (F.trim(F.col("props")) != "")
    ).select("event_id", "props")


@query(
    "flt_event_gate",
    oracle=f"""
    SELECT event_id, event_type, user_id, ts
    FROM events
    WHERE event_type IN {ENABLED_TYPES!r}
    """,
    operator="flt_evtype",
    doc="emitInsert/emitUpdate/... per-type gating (postgresql.js:153-170).",
)
def flt_event_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return event_gate(ev).select("event_id", "event_type", "user_id", "ts")
