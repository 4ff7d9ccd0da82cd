"""Streaming snapshot materialization — the canonical CDC consumer.

The whole point of the reference's event stream is to keep a
downstream copy current (the NATS cache populate/invalidate/purge
semantics, src/plugins/nats.js:25-28). The rebuild ships that
consumer: a last-write-wins snapshot maintained incrementally by a
streaming aggregation in update output mode, merged into the target
by an idempotent upsert sink — together with checkpointed offsets
this is the exactly-once delivery story (re-delivered batches
overwrite with identical values instead of duplicating).

Two sink shapes:

- ``partitioned_upsert_sink`` — the SCALE path. Each executor
  partition opens its own store connection from a picklable factory
  and applies only its rows; the driver never sees the data. The
  update-mode aggregation hash-partitions output by the group key, so
  within one micro-batch a key is written by exactly one task (no
  cross-partition write conflicts), and across batches last-write-wins
  replays make the merge idempotent. At 100 TB the target is a KV
  service / Kafka-compacted topic / MERGE INTO a table format; the
  per-partition connection amortizes over the partition's rows.
- ``upsert_sink`` — dict-backed driver-side variant for tests and
  demos ONLY (a plain dict lives in the driver process, so the rows
  must cross to the driver by construction). Kept because the
  idempotency/restart tests want to inspect the final map in-process.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable, Iterable, MutableMapping

from pyspark.sql import DataFrame, Row
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


class DirKVStore:
    """Filesystem-backed KV store: one JSON file per key, atomic
    tmp+rename writes. A stand-in for a real KV service that is valid
    from *executor* processes (no shared driver memory) — proves the
    partitioned upsert path without a database in the container.
    Picklable by construction (holds only the root path)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key) -> str:
        return os.path.join(self.root, f"{key}.json")

    def put(self, key, value: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(value, f, default=str, sort_keys=True)
        os.replace(tmp, self._path(key))

    def delete(self, key) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    def close(self) -> None:
        pass

    # driver-side inspection helpers (tests)
    def keys(self) -> list[str]:
        return sorted(os.path.splitext(f)[0] for f in os.listdir(self.root) if f.endswith(".json"))

    def get(self, key) -> dict:
        with open(self._path(key)) as f:
            return json.load(f)


def partitioned_upsert_sink(
    snapshot: DataFrame,
    store_factory: Callable[[], object],
    on_delete: str = "purge",
) -> DataStreamWriter:
    """Distributed idempotent upsert: ``foreachBatch`` →
    ``foreachPartition``, so every executor task opens its own store
    via ``store_factory()`` (must be picklable; returned object needs
    ``put(key, dict)`` / ``delete(key)`` / ``close()``) and applies
    its slice of the changed keys. Updates replace, deletes purge
    (the cache-intent mapping, nats.js:25-28); replayed micro-batches
    re-apply identical upserts — exactly-once effect on the target
    without transactional coordination, and no driver-side collect."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        def write_partition(rows: Iterable[Row]) -> None:
            store = store_factory()
            try:
                for row in rows:
                    if row["last_type"] == "delete" and on_delete == "purge":
                        store.delete(row["entity_id"])
                    else:
                        store.put(row["entity_id"], row.asDict())
            finally:
                store.close()

        batch_df.foreachPartition(write_partition)

    return snapshot.writeStream.foreachBatch(merge).outputMode("update")


def upsert_sink(
    snapshot: DataFrame,
    store: MutableMapping,
    on_delete: str = "purge",
) -> DataStreamWriter:
    """Driver-side dict upsert for tests/demos ONLY — a plain dict
    lives in the driver, so rows must cross to the driver by
    construction (streamed via ``toLocalIterator``, never a full
    ``collect``). Production targets use ``partitioned_upsert_sink``."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        for row in batch_df.toLocalIterator():
            if row["last_type"] == "delete" and on_delete == "purge":
                store.pop(row["entity_id"], None)
            else:
                store[row["entity_id"]] = row.asDict()

    return snapshot.writeStream.foreachBatch(merge).outputMode("update")


def materialize(
    envelopes: DataFrame,
    store: MutableMapping | None = None,
    checkpoint: str = "",
    trigger_available_now: bool = True,
    store_factory: Callable[[], object] | None = None,
) -> Callable[[], None]:
    """Wire snapshot_stream → upsert sink and start; returns a join
    function that blocks until the stream drains. Pass ``store`` (a
    dict-like, driver-side, test path) or ``store_factory`` (picklable
    factory, partition-parallel scale path) — exactly one."""
    if (store is None) == (store_factory is None):
        raise ValueError("pass exactly one of store / store_factory")
    snap = snapshot_stream(envelopes)
    if store_factory is not None:
        writer = partitioned_upsert_sink(snap, store_factory)
    else:
        writer = upsert_sink(snap, store)
    writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query.awaitTermination


# --- MERGE-style lake materialization (the table-format consumer) ---

#: physical layout key for the lake snapshot: hash-bucket of the
#: entity id. At 100 TB this is the table's partition/cluster key —
#: a micro-batch rewrites only the buckets its keys fall in, and a
#: point lookup prunes to one bucket. The count is a FIXED property
#: of a given lake's layout (the hash derivation must never change
#: under a table once written); it is the knob that makes merge cost
#: proportional to the BATCH, not the table: a batch touching k of B
#: buckets reads+rewrites k·(table/B) — size B so that a typical
#: batch's keys land in a small fraction of buckets
#: (experiments/merge_scaling.py measures the curve). 8 suits the
#: ~6k-entity replay fixture; a 100 TB table wants 10^4-10^5.
MERGE_LAKE_BUCKETS = 8


def _lww_combine(envelopes_or_rows: DataFrame) -> DataFrame:
    """Last-write-wins combine over snapshot-shaped rows: one row per
    entity_id, winner by (last_ts, last_seq). A semilattice join —
    commutative, associative, idempotent — which is what makes the
    merge correct under ANY batch arrival order and under replays."""
    return (
        envelopes_or_rows.groupBy("entity_id")
        .agg(
            F.max_by(
                F.struct("last_seq", "last_ts", "last_type", "item", "bucket"),
                F.struct("last_ts", "last_seq"),
            ).alias("last")
        )
        .select(
            "entity_id",
            F.col("last.last_seq").alias("last_seq"),
            F.col("last.last_ts").alias("last_ts"),
            F.col("last.last_type").alias("last_type"),
            F.col("last.item").alias("item"),
            F.col("last.bucket").alias("bucket"),
        )
    )


def merge_batch_into_lake(
    batch_df: DataFrame, lake_dir: str, n_buckets: int = MERGE_LAKE_BUCKETS
) -> None:
    """One MERGE step (steps 1-4 of merge_lake_sink's contract),
    callable directly on a batch DataFrame — the unit the idempotency
    and order-independence tests drive without a streaming harness.
    ``n_buckets`` must be the SAME value for every merge into a given
    ``lake_dir`` (it defines the table's physical layout)."""
    spark = batch_df.sparkSession
    updates = snapshot_stream(batch_df).withColumn(
        "bucket",
        F.pmod(F.xxhash64("entity_id"), F.lit(n_buckets)).cast("int"),
    )
    updates = updates.persist()
    try:
        buckets = [r["bucket"] for r in updates.select("bucket").distinct().collect()]
        if not buckets:
            return
        from pyspark.errors import AnalysisException

        try:
            current = spark.read.parquet(lake_dir).filter(F.col("bucket").isin(buckets))
            merged = _lww_combine(current.unionByName(updates))
        except AnalysisException:
            # Only the first batch (no table yet) may fall through to
            # a batch-only merge — if bucket dirs already exist, this
            # is a DAMAGED read of real data and overwriting the
            # affected buckets with batch-only content would silently
            # destroy previously merged rows. Any non-analysis error
            # (IO, permissions) propagates for the same reason.
            if os.path.isdir(lake_dir) and any(
                e.startswith("bucket=") for e in os.listdir(lake_dir)
            ):
                raise
            merged = _lww_combine(updates)
        # eager pin BEFORE the overwrite deletes the input files
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(lake_dir)
        )
    finally:
        updates.unpersist()


def merge_lake_sink(
    envelopes: DataFrame, lake_dir: str, n_buckets: int = MERGE_LAKE_BUCKETS
) -> DataStreamWriter:
    """Idempotent MERGE-style CDC materialization into a bucketed
    parquet lake table via ``foreachBatch`` + DYNAMIC partition
    overwrite — the production consumer of the snapshot semantics
    (sink_cache's populate/invalidate/purge intent, nats.js:25-28)
    expressed as a table format instead of a KV service.

    Per micro-batch MERGE:

    1. combine the batch to ≤1 row per key (last-write-wins), stamp
       the hash bucket;
    2. read back ONLY the affected buckets from the lake (literal
       ``bucket IN (...)`` on the partition column → partition-pruned
       scan; the bucket list is metadata-sized, like the IVF probe's
       cell list);
    3. LWW-merge existing rows with the batch rows — delete
       tombstones are RETAINED in the lake (a tombstone must keep
       winning over late-arriving older updates and over replays;
       consumers filter ``last_type != 'delete'``, the purge view);
    4. pin the merged result with an eager ``localCheckpoint`` (it is
       about to overwrite the very files it reads — lineage must not
       reach back into them) and write with
       ``partitionOverwriteMode=dynamic``, which replaces exactly the
       bucket directories present in the output.

    Because step 3 is a semilattice join, a re-delivered micro-batch
    rewrites the affected buckets with byte-identical content —
    exactly-once effect on the table from at-least-once delivery,
    the same contract Delta/Iceberg MERGE INTO provides, built from
    primitives available to plain parquet. On a real table format,
    step 2-4 collapse into one ``MERGE INTO`` with the same combine."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        merge_batch_into_lake(batch_df, lake_dir, n_buckets=n_buckets)

    # append mode: the stateful combine lives INSIDE the batch merge,
    # not in a streaming state store — the lake IS the state.
    return envelopes.writeStream.foreachBatch(merge).outputMode("append")


def read_lake_snapshot(spark, lake_dir: str) -> DataFrame:
    """Consumer view of the merged lake table: tombstones filtered
    (purge semantics); partition-pruned by bucket for point reads."""
    return spark.read.parquet(lake_dir).filter(F.col("last_type") != "delete")
