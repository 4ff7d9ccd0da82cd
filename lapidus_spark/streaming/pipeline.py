"""Streaming pipeline orchestration (§3.1 daemon lifecycle, Spark-first).

config → N backend streams → envelope normalization → filters →
sink fan-out → ``awaitAnyTermination``. The reference forks one OS
process per backend and one JS event loop per process
(lapidus.js:88-109); here every backend is a StreamingQuery inside
one SparkSession — Spark owns parallelism, checkpointing, and
restart.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lapidus_spark.config import BackendConfig, EngineConfig, SinkConfig
from lapidus_spark.sources.cdc import normalize_events
from lapidus_spark.streaming import sinks as sink_mod
from lapidus_spark.streaming.sources import stream_events


def envelope_stream(spark: SparkSession, backend: BackendConfig) -> DataFrame:
    """Build the normalized envelope stream for one backend, with the
    reference's pre-dispatch filters applied early (pushed to the
    scan): pg_temp system tables (postgresql.js:386-391) and
    excludeTables (postgresql.js:393-397)."""
    if backend.type == "jsoncdc":
        # faithful wire format: LDJSON capture dir (pg_recvlogical
        # --plugin jsoncdc output) → stateless decode → envelope
        from lapidus_spark.sources.jsoncdc import stream_jsoncdc_envelope

        env = stream_jsoncdc_envelope(
            spark,
            backend.path,
            source=backend.name,
            max_files_per_trigger=backend.max_files_per_trigger,
        )
    elif backend.type == "file":
        raw = stream_events(
            spark, backend.path, max_files_per_trigger=backend.max_files_per_trigger
        )
        env = normalize_events(raw, source=backend.name)
    elif backend.type == "kafka":
        # the production capture feed (VERDICT r9 #3): the Debezium→
        # Kafka posture is the declared src_pg mapping (SURVEY §2.1,
        # postgresql.js:550-619's live pipe externalized) — each Kafka
        # record's value is the same LDJSON line the reference reads
        # off pg_recvlogical, so the decode→normalize pipeline is the
        # jsoncdc one unchanged. Plan-level constructible without a
        # broker (.load() fixes the Kafka schema; only .start()
        # connects), exactly like the kafka SINK.
        from lapidus_spark.streaming.sources import kafka_envelope_source

        env = kafka_envelope_source(
            spark,
            backend.bootstrap_servers,
            backend.topic,
            source=backend.name,
            starting_offsets=backend.starting_offsets,
            max_offsets_per_trigger=backend.max_offsets_per_trigger,
        )
    else:
        raise NotImplementedError(
            f"backend type {backend.type!r}: live capture is external "
            "(Debezium->Kafka — declare it as a 'kafka' backend reading "
            "the connector's topic); only the 'file', 'jsoncdc' and "
            "'kafka' backends construct streams in this container"
        )
    # null-safe: tx markers (begin/commit) carry no table_name and
    # must pass table filters (they are events in their own right)
    no_table = F.col("table_name").isNull()
    env = env.filter(no_table | ~F.col("table_name").contains("pg_temp_"))
    if backend.exclude_tables:
        env = env.filter(no_table | ~F.col("table_name").isin(backend.exclude_tables))
    return env


def start_sink(
    env: DataFrame, backend: BackendConfig, sink: SinkConfig, checkpoint_root: str, idx: int
) -> StreamingQuery:
    enabled = sink.enabled_types if sink.enabled_types is not None else backend.enabled_types()
    ckpt = os.path.join(checkpoint_root, f"{backend.name}-{sink.type}-{idx}")
    if sink.type == "console":
        writer = sink_mod.console_sink(env, enabled)
    elif sink.type == "parquet":
        writer = sink_mod.subject_file_sink(
            env,
            path=sink.options["path"],
            checkpoint=ckpt,
            enabled_types=enabled,
            cache_prefix=sink.cache_prefix,
        )
    elif sink.type == "memory":
        writer = sink_mod.memory_sink(
            sink_mod.gate_types(env, enabled), sink.options.get("table", backend.name)
        )
    elif sink.type == "lake":
        # the MERGE materialization as a daemon sink (sink_cache's
        # populate/invalidate/purge intent on a TABLE, nats.js:25-28):
        # each micro-batch LWW-merges into the bucket-partitioned
        # parquet lake at options.path; deletes become retained
        # tombstones (read_lake_snapshot filters them)
        from lapidus_spark.streaming.materialize import merge_lake_sink

        # buckets absent from config → None: adopt the layout pinned
        # in the lake's manifest (follows rebucket_lake changes across
        # daemon restarts; MERGE_LAKE_BUCKETS only for a brand-new lake)
        # options.concurrency = "optimistic" lets several daemons
        # share one lake table (stage unlocked, lock only the flip,
        # rebase across disjoint/physical-only commits)
        writer = merge_lake_sink(
            sink_mod.gate_types(env, enabled),
            sink.options["path"],
            n_buckets=sink.options.get("buckets"),
            retain_versions=sink.options.get("retainVersions", 1),
            compact_every=sink.options.get("compactEvery"),
            concurrency=sink.options.get("concurrency", "locked"),
            # options.extraColumns: envelope attributes accreted into
            # the lake row — schema evolution on MERGE (see
            # merge_batch_into_lake)
            extra_cols=tuple(sink.options.get("extraColumns", [])),
            # options.txnAppId: idempotence-by-marker (Delta txnAppId/
            # txnVersion) — a restarted daemon's redelivered epoch is
            # skipped outright instead of re-merged to identical bytes
            txn_app_id=sink.options.get("txnAppId"),
        )
    elif sink.type == "kafka":
        # sink_nats on a real broker (src/plugins/nats.js) — plan
        # construction needs no connector; .start() does
        writer = sink_mod.kafka_sink(
            env,
            bootstrap_servers=sink.options["bootstrap_servers"],
            checkpoint=ckpt,
            enabled_types=enabled,
            topic_prefix=sink.options.get("topic_prefix", "cdc"),
            publish_event_data=sink.options.get("publish_event_data", True),
            cache_prefix=sink.cache_prefix,
        )
    else:
        # plugin sink (sink_plugin): resolved from the factory registry
        opts = {k: v for k, v in sink.options.items() if k != "trigger"}
        writer = sink_mod.make_sink(sink.type, sink_mod.gate_types(env, enabled), **opts)
    if sink.type not in ("parquet", "kafka"):  # those set ckpt themselves
        writer = writer.option("checkpointLocation", ckpt)
    trigger = sink.options.get("trigger", "availableNow")
    if trigger == "availableNow":
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()


def run(
    spark: SparkSession,
    cfg: EngineConfig,
    checkpoint_root: str | None = None,
    await_termination: bool = True,
) -> list[StreamingQuery]:
    """Start one query per (backend, sink); optionally block. The
    checkpoint root resolves: explicit argument → config's
    ``checkpointRoot`` (durable daemon restarts, the slot-cursor
    analog) → ephemeral tempdir."""
    checkpoint_root = checkpoint_root or cfg.checkpoint_root or tempfile.mkdtemp(prefix="lapidus_ckpt_")
    queries: list[StreamingQuery] = []
    for backend in cfg.backends:
        env = envelope_stream(spark, backend)
        for i, sink in enumerate(backend.sinks or cfg.sinks):
            queries.append(start_sink(env, backend, sink, checkpoint_root, i))
    if await_termination:
        for q in queries:
            q.awaitTermination()
    return queries
