"""The lake as a streaming SOURCE (format ``lake_cdf``): Spark 4
Python streaming data source whose offsets are manifest versions —
the durable-cursor contract the reference gives downstream consumers
(src_slot, postgresql.js:290-354; nats.js:23-28 subscribers react to
changes, never rescan). Batch/stream parity, resume-from-checkpoint,
startingVersion, and the rebucket failure posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lapidus_spark.sources.cdc import normalize_events
from lapidus_spark.sources.tables import load_table
from lapidus_spark.streaming.lake_source import register_lake_cdf
from tests.conftest import SF_DIR

CDF_COLS = ["entity_id", "change_type", "last_seq", "last_ts", "last_type", "item", "ver"]


def _build_lake(spark, lake_dir: str, n_batches: int = 3) -> None:
    from lapidus_spark.streaming.materialize import merge_batch_into_lake

    env = normalize_events(load_table(spark, SF_DIR, "events"))
    for i in range(n_batches):
        merge_batch_into_lake(
            env.filter(F.col("event_seq") % n_batches == i),
            lake_dir,
            retain_versions=n_batches + 2,
        )


def _drain(spark, lake_dir: str, name: str, ckpt: str, **opts) -> list:
    """Run the lake_cdf stream into a memory sink until caught up;
    return the collected rows (sorted)."""
    register_lake_cdf(spark)
    reader = spark.readStream.format("lake_cdf").option("path", lake_dir)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return sorted(map(tuple, spark.table(name).select(*CDF_COLS).collect()))


def _batch_feed(spark, lake_dir: str, versions) -> list:
    """The batch-side truth: union of lake_changes over each single
    version step, labeled with the producing version."""
    from lapidus_spark.streaming.materialize import lake_changes

    rows = []
    for v in versions:
        step = lake_changes(spark, lake_dir, from_version=v - 1, to_version=v)
        rows.extend(
            map(tuple, step.withColumn("ver", F.lit(v).cast("int")).select(*CDF_COLS).collect())
        )
    return sorted(rows)


def test_stream_feed_matches_batch_diffs(spark, tmp_path):
    """Streaming consumption from version 0 emits exactly the union
    of the per-version batch change feeds — and does it across THREE
    rate-limited triggers, not one catch-up batch."""
    from lapidus_spark.plans.audit import STREAM_RUN_FACTS
    from lapidus_spark.plans.registry import load_all

    lake = str(tmp_path / "lake")
    _build_lake(spark, lake)
    got = _drain(
        spark, lake, "cdf_full", str(tmp_path / "ck"), maxVersionsPerBatch="1"
    )
    assert got == _batch_feed(spark, lake, [1, 2, 3])
    assert len(got) > 0
    # every change_type appears (inserts at v1; the sf0.001 history
    # contains updates and error-tombstones in later batches)
    assert {r[1] for r in got} == {"insert", "update", "delete"}

    # the registered query wires the same source through the runner
    # and records stream facts for the plan contract
    reg = load_all()
    out = reg["stream_lake_cdf"].fn(spark, SF_DIR)
    assert out.columns == CDF_COLS
    facts = STREAM_RUN_FACTS["stream_lake_cdf"]
    assert facts.n_batches >= 3 and facts.n_exchanges == 0 and not facts.state_ops


def test_starting_version_skips_history(spark, tmp_path):
    """startingVersion=2 is the 'subscribe from here' cursor: only
    the version-3 delta arrives, matching the batch CDF."""
    lake = str(tmp_path / "lake")
    _build_lake(spark, lake)
    got = _drain(
        spark, lake, "cdf_from2", str(tmp_path / "ck"), startingVersion="2"
    )
    assert got == _batch_feed(spark, lake, [3])
    assert len(got) > 0


def test_restart_resumes_at_committed_version(spark, tmp_path):
    """A restarted consumer resumes from the checkpointed offset:
    after draining versions 1-3 into a fault-tolerant (parquet) sink,
    a fourth merge lands, and the restarted stream appends ONLY the
    version-4 delta — no re-emits, no gaps (exactly-once incremental
    consumption; the memory sink cannot recover a checkpoint, so this
    is also the real deployment shape)."""
    from lapidus_spark.streaming.materialize import merge_batch_into_lake

    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _build_lake(spark, lake)
    register_lake_cdf(spark)

    def drain_to_parquet():
        q = (
            spark.readStream.format("lake_cdf")
            .option("path", lake)
            .option("maxVersionsPerBatch", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        return sorted(map(tuple, spark.read.parquet(out).select(*CDF_COLS).collect()))

    first = drain_to_parquet()
    assert first == _batch_feed(spark, lake, [1, 2, 3])

    env = normalize_events(load_table(spark, SF_DIR, "events"))
    merge_batch_into_lake(
        env.filter(F.col("event_seq") % 3 == 1).withColumn(
            "event_seq", F.col("event_seq") + 1_000_000
        ),
        lake,
        retain_versions=6,
    )
    second = drain_to_parquet()
    # the sink accumulates: exactly the old rows plus ONLY the v4 delta
    assert second == sorted(first + _batch_feed(spark, lake, [4]))
    assert len(second) > len(first)


def test_diff_is_exact_above_2_53(tmp_path):
    """The per-bucket diff must compare seqs as exact integers. A left
    merge with any missing entity upcasts the old seq column to
    float64, where 2^53 and 2^53+1 collide — the update would silently
    vanish while the batch-side lake_changes (bigint <>) emits it.
    Executor-side logic, tested directly (plain pyarrow/pandas)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lapidus_spark.streaming.lake_source import (
        LakeCDFPartition,
        LakeCDFStreamReader,
    )

    ts = pa.array([1_700_000_000_000_000] * 2, type=pa.timestamp("us"))
    old_f = str(tmp_path / "old.parquet")
    new_f = str(tmp_path / "new.parquet")
    pq.write_table(
        pa.table(
            {
                "entity_id": ["e", "stable"],
                "last_seq": pa.array([2**53, 7], type=pa.int64()),
                "last_ts": ts,
                "last_type": ["update", "update"],
            }
        ),
        old_f,
    )
    pq.write_table(
        pa.table(
            {
                # "n" is NEW: its absence from the old side is what
                # forces the float64 upcast in an unprotected merge
                "entity_id": ["e", "stable", "n"],
                "last_seq": pa.array([2**53 + 1, 7, 1], type=pa.int64()),
                "last_ts": pa.concat_arrays([ts, ts[:1]]),
                "last_type": ["update", "update", "insert"],
                "item": ["i1", "i2", "i3"],
            }
        ),
        new_f,
    )
    reader = LakeCDFStreamReader({"path": str(tmp_path)})
    part = LakeCDFPartition(ver=2, bucket=0, new_files=[new_f], old_files=[old_f])
    batches = list(reader.read(part))
    assert len(batches) == 1
    rows = {
        r["entity_id"]: (r["change_type"], r["last_seq"])
        for r in batches[0].to_pylist()
    }
    assert rows == {"e": ("update", 2**53 + 1), "n": ("insert", 1)}
    assert "stable" not in rows  # unchanged row stays suppressed


def test_missing_bucket_dir_fails_fast(tmp_path):
    """A retained manifest pointing at an absent bucket dir is lake
    corruption: reading it as 'empty' would re-emit the whole bucket
    as inserts, so _bucket_files raises instead."""
    from lapidus_spark.streaming.lake_source import _bucket_files

    manifest = {"buckets": {"0": "gone_dir"}}
    with pytest.raises(ValueError, match="missing bucket dir"):
        _bucket_files(str(tmp_path), manifest, 0)
    # an unwritten bucket (no pointer) is genuinely empty, not corrupt
    assert _bucket_files(str(tmp_path), {"buckets": {}}, 0) == []


def test_lake_changes_rejects_negative_from_version(spark, tmp_path):
    """Only 0 is the from-empty sentinel: a negative from_version is a
    caller bug and must raise, not return a duplicate full load."""
    from lapidus_spark.streaming.materialize import lake_changes

    lake = str(tmp_path / "lake")
    _build_lake(spark, lake, n_batches=1)
    with pytest.raises(ValueError, match="from_version must be >= 0"):
        lake_changes(spark, lake, from_version=-1)


def test_rebucket_between_versions_raises(spark, tmp_path):
    """Bucket ids are not comparable across layouts: a rebucket inside
    the consumed range fails fast with the restart-from-snapshot
    instruction instead of silently mis-diffing."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from lapidus_spark.streaming.materialize import rebucket_lake

    lake = str(tmp_path / "lake")
    _build_lake(spark, lake, n_batches=2)
    rebucket_lake(spark, lake, new_n_buckets=4, retain_versions=4)
    with pytest.raises(StreamingQueryException, match="rebucket"):
        _drain(spark, lake, "cdf_rebucket", str(tmp_path / "ck"))
