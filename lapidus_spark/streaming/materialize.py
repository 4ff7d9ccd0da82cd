"""Streaming snapshot materialization — the canonical CDC consumer.

The whole point of the reference's event stream is to keep a
downstream copy current (the NATS cache populate/invalidate/purge
semantics, src/plugins/nats.js:25-28). The rebuild ships that
consumer: a last-write-wins snapshot maintained incrementally by a
streaming aggregation in update output mode, merged into the target
by an idempotent upsert sink — together with checkpointed offsets
this is the exactly-once delivery story (re-delivered batches
overwrite with identical values instead of duplicating).

At scale the upsert target is Kafka-compacted / a key-value store /
MERGE INTO a table format; locally it's any dict-like store. The
update-mode aggregation emits only entities whose state changed in
the micro-batch — O(changed keys) per trigger, not O(all keys).
"""

from __future__ import annotations

from collections.abc import Callable, MutableMapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def snapshot_stream(envelopes: DataFrame) -> DataFrame:
    """Incremental last-write-wins state per entity over the envelope
    stream (same semantics as the batch win_cdc_snapshot query,
    including delete tombstones — kept so the sink can purge)."""
    return envelopes.groupBy(F.col("pk").alias("entity_id")).agg(
        F.max_by(
            F.struct("event_seq", "ts", "type", "item"),
            F.struct("ts", "event_seq"),
        ).alias("last")
    ).select(
        "entity_id",
        F.col("last.event_seq").alias("last_seq"),
        F.col("last.ts").alias("last_ts"),
        F.col("last.type").alias("last_type"),
        F.col("last.item").alias("item"),
    )


def upsert_sink(
    snapshot: DataFrame,
    store: MutableMapping,
    on_delete: str = "purge",
) -> DataStreamWriter:
    """foreachBatch idempotent upsert into ``store``: updates replace,
    deletes purge (the cache-intent mapping, nats.js:25-28). Replayed
    micro-batches re-apply identical upserts — exactly-once effect on
    the target without transactional coordination."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        for row in batch_df.collect():
            if row["last_type"] == "delete" and on_delete == "purge":
                store.pop(row["entity_id"], None)
            else:
                store[row["entity_id"]] = row.asDict()

    return snapshot.writeStream.foreachBatch(merge).outputMode("update")


def materialize(
    envelopes: DataFrame,
    store: MutableMapping,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> Callable[[], None]:
    """Wire snapshot_stream → upsert_sink and start; returns a join
    function that blocks until the stream drains."""
    writer = upsert_sink(snapshot_stream(envelopes), store).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query.awaitTermination
