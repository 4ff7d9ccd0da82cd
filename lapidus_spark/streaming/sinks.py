"""Sink factories (SURVEY.md §2.7).

The reference fans one event stream out to an EventEmitter, per-type
callbacks, NATS subjects, cache-invalidation topics, and a console
logger (dispatch block postgresql.js:487-547; src/plugins/nats.js;
src/plugins/debug.js). Spark-side each sink is a ``writeStream``
built from the same envelope DataFrame; per-type gating
(emitInsert/emitUpdate/... postgresql.js:88-97,153-170) is a filter
on the sink's input, so disabled types cost nothing downstream.

A sink factory is ``make(df, **cfg) -> DataStreamWriter``; the
pipeline starts them and ``awaitAnyTermination()`` (the rebuild's
ctl_fork: one query per backend/sink inside one SparkSession instead
of one OS process per backend, lapidus.js:88-109).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

#: cache-action intent (nats.js:25-28) — documented intent, not the
#: reference's `event.action` bug that routed deletes to populate.
CACHE_ACTION = (
    "CASE type WHEN 'update' THEN 'invalidate' "
    "WHEN 'delete' THEN 'purge' ELSE 'populate' END"
)


def with_subject(df: DataFrame) -> DataFrame:
    """NATS-style routing subject schema.table.pk (nats.js:17-21)."""
    return df.withColumn(
        "subject",
        F.concat_ws(".", F.col("schema_name"), F.col("table_name"), F.col("pk")),
    )


def with_cache_topic(df: DataFrame, cache_prefix: str = "cache") -> DataFrame:
    """Second publish topic {prefix}.{action}.{subject} (nats.js:25-28)."""
    df = with_subject(df)
    return df.withColumn(
        "cache_topic",
        F.concat_ws(".", F.lit(cache_prefix), F.expr(CACHE_ACTION), F.col("subject")),
    )


def gate_types(df: DataFrame, enabled_types: list[str] | None) -> DataFrame:
    """flt_evtype per-sink gating; None = all types enabled."""
    if enabled_types is None:
        return df
    return df.filter(F.col("type").isin(enabled_types))


def console_sink(df: DataFrame, enabled_types: list[str] | None = None) -> DataStreamWriter:
    """sink_debug (src/plugins/debug.js): log events to console."""
    return gate_types(df, enabled_types).writeStream.format("console").outputMode("append")


def subject_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    enabled_types: list[str] | None = None,
    cache_prefix: str | None = None,
) -> DataStreamWriter:
    """sink_nats analog without a broker: events keyed by subject (+
    optional cache topic) to a parquet stream. On a cluster this is
    ``format("kafka")`` with key=subject, value=to_json(struct(*)) —
    the column layout is already Kafka-shaped."""
    out = gate_types(df, enabled_types)
    out = with_cache_topic(out, cache_prefix) if cache_prefix else with_subject(out)
    return (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def memory_sink(df: DataFrame, table_name: str) -> DataStreamWriter:
    """In-memory sink for tests / the driver's batch-compare."""
    return df.writeStream.format("memory").queryName(table_name).outputMode("append")


def foreach_batch_sink(
    df: DataFrame,
    handler: Callable[[DataFrame, int], None],
    enabled_types: list[str] | None = None,
) -> DataStreamWriter:
    """sink_cb (onInsert/onUpdate/... postgresql.js:99-106): user
    callback per micro-batch. The reference's per-event-wrapper
    machinery (onEventsWrapper, postgresql.js:108-122) has no analog —
    Spark owns scheduling."""
    return gate_types(df, enabled_types).writeStream.foreachBatch(handler)


def kafka_frame(
    df: DataFrame,
    topic_prefix: str = "cdc",
    publish_event_data: bool = True,
    cache_prefix: str | None = None,
) -> DataFrame:
    """Envelope → the Kafka writer's required column contract
    (key/value/topic) — the broker form of the NATS publish
    (src/plugins/nats.js:17-23):

    - ``key``   = the routing subject ``schema.table.pk`` (Kafka key
      ⇒ per-entity partition ordering, the same per-subject ordering
      NATS consumers see),
    - ``value`` = event JSON, or the empty string when
      ``publish_event_data`` is false (signal-only mode,
      nats.js:22-23 publishes an empty payload). NOT null: a
      null-valued Kafka record is a tombstone, so on a log-compacted
      topic signal-only events would delete each other's keys,
    - ``topic`` = ``{prefix}.{schema}.{table}`` (topic-per-table),
      or the cache-invalidation topic ``{cache_prefix}.{action}.
      {subject}`` when ``cache_prefix`` is set (nats.js:25-28,
      documented intent — deletes purge, not populate).

    Pure projection: fully testable without the Kafka connector jar.
    """
    out = with_cache_topic(df, cache_prefix) if cache_prefix else with_subject(df)
    value = (
        F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        if publish_event_data
        else F.lit("").cast("string")
    )
    topic = (
        F.col("cache_topic")
        if cache_prefix
        else F.concat_ws(".", F.lit(topic_prefix), F.col("schema_name"), F.col("table_name"))
    )
    return out.select(
        F.col("subject").cast("string").alias("key"),
        value.alias("value"),
        topic.alias("topic"),
    )


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint: str,
    enabled_types: list[str] | None = None,
    topic_prefix: str = "cdc",
    publish_event_data: bool = True,
    cache_prefix: str | None = None,
) -> DataStreamWriter:
    """sink_nats on a real broker: subject-keyed, topic-per-table
    Kafka publish (``format("kafka")``). Constructing the writer is
    plan-only — ``.start()`` is what needs the connector jar and a
    broker, so the whole pipeline through the Kafka frame is
    assertable in any environment."""
    framed = kafka_frame(
        gate_types(df, enabled_types),
        topic_prefix=topic_prefix,
        publish_event_data=publish_event_data,
        cache_prefix=cache_prefix,
    )
    return (
        framed.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


# ---------------------------------------------------------------- plugins
#: sink factory registry (sink_plugin, lapidus.js:28-49): third-party
#: sinks register a factory ``(df, **options) -> DataStreamWriter``
#: under a name usable in config ``sinks: [{"type": "<name>", ...}]``.
#: Replaces the reference's require()-by-filename plugin loading with
#: an explicit registry (no file-existence checks, validated upfront).
SINK_FACTORIES: dict[str, Callable[..., DataStreamWriter]] = {}


def register_sink(name: str):
    """Decorator: register a sink factory under ``name``."""

    def deco(fn: Callable[..., DataStreamWriter]):
        SINK_FACTORIES[name] = fn
        return fn

    return deco


def make_sink(name: str, df: DataFrame, **options) -> DataStreamWriter:
    """Instantiate a registered sink (plugin init, lapidus.js:66-79)."""
    if name not in SINK_FACTORIES:
        raise KeyError(
            f"unknown sink {name!r}; registered: {sorted(SINK_FACTORIES)}"
        )
    return SINK_FACTORIES[name](df, **options)


register_sink("console")(console_sink)
register_sink("subject_file")(subject_file_sink)
register_sink("memory")(memory_sink)
register_sink("foreach_batch")(foreach_batch_sink)
register_sink("kafka")(kafka_sink)
