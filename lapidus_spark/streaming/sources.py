"""Streaming sources (SURVEY.md §2.1 → Structured Streaming).

The reference captures changes by tailing pg_recvlogical / binlog /
oplog (src/postgresql.js:550-619, src/mysql.js:272-289,
src/mongo.js:108-286). In the rebuild, capture stays external
(Debezium→Kafka in production, per BASELINE.json); the engine's
contract starts at "an ordered stream of change records". Locally we
replay the ``events`` fixture as a file-source stream — the same
envelope pipeline runs unchanged on a Kafka source (swap
``readStream.format``; the normalizer only needs columns).

Slot semantics (src_slot, postgresql.js:290-354): the replication
slot is a durable cursor ⇒ Spark ``checkpointLocation``. Restart
resumes from the checkpoint — at-least-once upgraded to effectively
exactly-once with idempotent sinks, vs the reference's
at-most-once MySQL restart (`startAtEnd: true`, mysql.js:282).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.sources.tables import load_table


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replay the events table as a file-source stream.

    Schema comes from the batch loader (single source of truth, incl.
    the nanos→long handling); the file source needs a directory-or-glob
    path and an explicit schema.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    reader = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        # file source requires a directory; glob-filter to the events
        # file(s) — the star admits multi-file replay dirs
        # (events.parquet, events1.parquet, ...) so maxFilesPerTrigger
        # can split history into micro-batches; sf dirs contain
        # exactly one match
        .option("pathGlobFilter", "events*.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(sf_dir)
    if dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def kafka_raw_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The production capture feed: ``readStream.format("kafka")``
    over the Debezium topic (src_pg production path, SURVEY §2.1 —
    capture is external, the engine's contract starts at the ordered
    change-record stream). Plan-only constructible: ``.load()``
    resolves the source and fixes the Kafka schema (key/value binary,
    topic/partition/offset, timestamp) without contacting a broker;
    it raises only if the spark-sql-kafka connector jar is absent
    (tests skip on that).

    ``max_offsets_per_trigger`` is the admission-control knob
    (VERDICT r10 #6, the lake source's ``maxVersionsPerBatch``
    mirrored onto the live path): at most N records per micro-batch
    across the topic's partitions, so a daemon restarted against a
    deep backlog catches up in bounded steps — each an atomic,
    checkpointed commit — instead of one giant batch that overruns
    executor memory. ``starting_offsets`` additionally accepts the
    Kafka JSON offset spec for exact per-partition starts."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_envelope_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    source: str = "pg_main",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka feed → canonical envelope: the broker analog of
    ``stream_jsoncdc_envelope`` (value bytes are the same LDJSON line
    the reference reads off the pg_recvlogical pipe,
    src/postgresql.js:607-611 — one JSON object per Kafka record).
    The daemon's ``backend.type == "kafka"`` resolves here
    (streaming/pipeline.py), making live capture a config entry:
    Debezium/pg_recvlogical publishes to the topic, the engine
    consumes with checkpointed offsets (src_slot's durable cursor)."""
    from lapidus_spark.sources.jsoncdc import decode_jsoncdc, normalize_jsoncdc

    raw = kafka_raw_source(
        spark, bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
    )
    lines = raw.select(F.col("value").cast("string").alias("value"))
    return normalize_jsoncdc(decode_jsoncdc(lines), source=source)


def stream_json_dir(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """LDJSON directory source — the streaming analog of the
    reference's one-JSON-object-per-line wire format (src_decode,
    postgresql.js:607-611 via ldjson-stream)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def stream_rate(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic rate source for soak/throughput testing (the
    reference's TPC-C-generator role, README.md:241-245)."""
    return (
        spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load()
    )


def batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream_events — identical schema and semantics,
    used to verify stream/batch parity."""
    return load_table(spark, sf_dir, "events")


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the documents table as a file-source stream — the
    ingestion feed for continuous corpus builds (crawl snapshots
    arriving as files; in production a Kafka/object-store listing
    source with the same columns)."""
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the embeddings table as a file-source stream (same
    single-source-of-truth schema rule as stream_events)."""
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).schema
    return (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )
