"""Write-side governance for the lake: idempotent writer commits
(Delta's txnAppId/txnVersion — replays skip instead of re-merging),
CHECK constraints enforced at write time (SQL-standard: NULL passes,
only FALSE violates; tombstones exempt), and commit-instant bounds
for the change feeds (TIMESTAMP AS OF each end).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import lapidus_spark.streaming.materialize as M


def _env(spark, n=120):
    return spark.range(n).select(
        F.format_string("k%04d", F.col("id")).alias("pk"),
        F.col("id").alias("event_seq"),
        F.timestamp_seconds(F.col("id") * 3600 + 1_700_000_000)
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit("insert").alias("type"),
        F.format_string("payload-%04d", F.col("id")).alias("item"),
    )


def _snap(spark, lake):
    return sorted(
        tuple(r)
        for r in M.read_lake_snapshot(spark, lake)
        .select("entity_id", "last_seq", "item")
        .collect()
    )


# ---------------------------------------------------------------------------
# txn idempotence markers
# ---------------------------------------------------------------------------


def test_locked_merge_skips_applied_txn(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env = _env(spark)
    b0 = env.filter(F.col("event_seq") % 2 == 0)
    b1 = env.filter(F.col("event_seq") % 2 == 1)
    M.merge_batch_into_lake(b0, lake, n_buckets=4, retain_versions=4, txn=("sinkA", 0))
    M.merge_batch_into_lake(b1, lake, n_buckets=None, retain_versions=4, txn=("sinkA", 1))
    want = _snap(spark, lake)
    m = M._read_manifest(lake)
    assert m["version"] == 2 and m["txns"] == {"sinkA": 1}
    # replay epoch 1 (and an older 0): SKIPPED — no new version
    M.merge_batch_into_lake(b1, lake, n_buckets=None, retain_versions=4, txn=("sinkA", 1))
    M.merge_batch_into_lake(b0, lake, n_buckets=None, retain_versions=4, txn=("sinkA", 0))
    m2 = M._read_manifest(lake)
    assert m2["version"] == 2 and _snap(spark, lake) == want
    # a NEWER epoch applies; an unmarked merge is never gated
    M.merge_batch_into_lake(
        b0.withColumn("event_seq", F.col("event_seq") + 9000),
        lake,
        n_buckets=None,
        retain_versions=4,
        txn=("sinkA", 2),
    )
    assert M._read_manifest(lake)["txns"] == {"sinkA": 2}
    assert M._read_manifest(lake)["version"] == 3


def test_optimistic_merge_skips_at_stage_and_flip(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env = _env(spark)
    M.merge_batch_into_lake(env, lake, n_buckets=4, retain_versions=4, txn=("app", 0))
    want = _snap(spark, lake)
    # stage-time skip: marker already recorded
    res = M.merge_batch_optimistic(
        env, lake, n_buckets=None, retain_versions=4, txn=("app", 0)
    )
    assert res["version"] == 1 and _snap(spark, lake) == want

    # flip-time skip: a same-app sibling commits the marker mid-race
    def sibling(attempt: int):
        if attempt == 0:
            M.merge_batch_into_lake(
                env.withColumn("event_seq", F.col("event_seq") + 5000),
                lake,
                n_buckets=None,
                retain_versions=4,
                txn=("app", 1),
            )

    res2 = M.merge_batch_optimistic(
        env.withColumn("event_seq", F.col("event_seq") + 7777),
        lake,
        n_buckets=None,
        retain_versions=4,
        txn=("app", 1),
        _race_hook=sibling,
    )
    # the sibling's epoch-1 content won; ours was dropped as a replay
    assert res2["version"] == 2 and res2["txns"] == {"app": 1}
    assert all(r[1] >= 5000 for r in _snap(spark, lake))
    assert not any(r[1] >= 7777 for r in _snap(spark, lake))


def test_rebase_preserves_sibling_app_watermark(spark, tmp_path):
    """An optimistic flip REBASING onto a manifest that moved under
    the staging must keep the intervening writer's txn watermark —
    the first-class delta merge, not an extra-map clobber."""
    lake = str(tmp_path / "lake")
    env = _env(spark)
    M.merge_batch_into_lake(
        env.filter(F.col("pk") == "k0000"), lake, n_buckets=4, retain_versions=4
    )

    def sibling(attempt: int):
        if attempt == 0:
            # disjoint key → (very likely) disjoint bucket; marker B
            M.merge_batch_into_lake(
                env.filter(F.col("pk") == "k0001"),
                lake,
                n_buckets=None,
                retain_versions=4,
                txn=("sinkB", 7),
            )

    before = M.OCC_REBASES
    res = M.merge_batch_optimistic(
        env.filter(F.col("pk") == "k0000").withColumn(
            "event_seq", F.col("event_seq") + 100
        ),
        lake,
        n_buckets=None,
        retain_versions=4,
        txn=("sinkA", 3),
        _race_hook=sibling,
    )
    assert res["txns"] == {"sinkA": 3, "sinkB": 7}
    # proves the interleave really was a rebase (or a recompute that
    # still merged both maps — either way both watermarks survive)
    assert M.OCC_REBASES >= before


def test_txn_validation(spark, tmp_path):
    lake = str(tmp_path / "lake")
    for bad in (("", 1), ("a", "1"), ("a",), ("a", True), "a:1"):
        with pytest.raises(ValueError, match="txn"):
            M.merge_batch_into_lake(_env(spark, 5), lake, txn=bad)


def test_sink_txn_app_id_config_plumbing(tmp_path):
    """options.txnAppId flows daemon config → merge_lake_sink; bad
    values fail at --validate-only time."""
    import json

    from lapidus_spark.config import ConfigError, parse_config

    def cfg(opts):
        return json.dumps(
            {
                "backends": [
                    {
                        "name": "pg_main",
                        "type": "file",
                        "path": str(tmp_path),
                        "sinks": [{"type": "lake", "options": opts}],
                    }
                ]
            }
        )

    parsed = parse_config(cfg({"path": str(tmp_path / "lake"), "txnAppId": "d1"}))
    sink = parsed.backends[0].sinks[0]
    assert sink.options["txnAppId"] == "d1"
    with pytest.raises(ConfigError, match="txnAppId"):
        parse_config(cfg({"path": str(tmp_path / "lake"), "txnAppId": ""}))
    with pytest.raises(ConfigError, match="txnAppId"):
        parse_config(cfg({"path": str(tmp_path / "lake"), "txnAppId": 7}))


# ---------------------------------------------------------------------------
# CHECK constraints
# ---------------------------------------------------------------------------


def test_constraint_enforced_on_merge(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env = _env(spark, 60)
    M.merge_batch_into_lake(env, lake, n_buckets=4, retain_versions=4)
    res = M.add_constraint(spark, lake, "item_present", "item IS NOT NULL")
    assert res["version"] == 2 and res["constraints"] == {
        "item_present": "item IS NOT NULL"
    }
    # conforming batch passes
    M.merge_batch_into_lake(
        env.withColumn("event_seq", F.col("event_seq") + 100),
        lake,
        n_buckets=None,
        retain_versions=4,
    )
    v = M._read_manifest(lake)["version"]
    # violating batch refused, table unchanged
    bad = env.withColumn("item", F.lit(None).cast("string"))
    with pytest.raises(M.ConstraintViolationError, match="item_present"):
        M.merge_batch_into_lake(bad, lake, n_buckets=None, retain_versions=4)
    assert M._read_manifest(lake)["version"] == v
    # ... in the optimistic path too
    with pytest.raises(M.ConstraintViolationError, match="item_present"):
        M.merge_batch_optimistic(bad, lake, n_buckets=None, retain_versions=4)
    assert M._read_manifest(lake)["version"] == v
    # tombstones are exempt: delete envelopes carry a null payload
    dels = env.limit(5).withColumn("type", F.lit("delete")).withColumn(
        "item", F.lit(None).cast("string")
    ).withColumn("event_seq", F.col("event_seq") + 500)
    M.merge_batch_into_lake(dels, lake, n_buckets=None, retain_versions=4)
    assert M._read_manifest(lake)["version"] == v + 1


def test_constraint_null_passes_sql_standard(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env = _env(spark, 20)
    M.merge_batch_into_lake(
        env.filter(F.col("event_seq") > 5), lake, n_buckets=2, retain_versions=4
    )
    M.add_constraint(spark, lake, "seq_big", "last_seq > 5", retain_versions=4)
    # NULL (unknown) passes; only FALSE violates
    nulls = env.withColumn("event_seq", F.lit(None).cast("bigint"))
    M.merge_batch_into_lake(nulls, lake, n_buckets=None, retain_versions=4)
    with pytest.raises(M.ConstraintViolationError):
        M.merge_batch_into_lake(
            env.withColumn("event_seq", F.lit(1)), lake, n_buckets=None
        )


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env = _env(spark, 30)
    M.merge_batch_into_lake(env, lake, n_buckets=2, retain_versions=4)
    with pytest.raises(M.ConstraintViolationError, match="existing"):
        M.add_constraint(spark, lake, "impossible", "last_seq > 1000")
    # the failed add committed nothing
    assert M._read_manifest(lake)["version"] == 1
    assert "constraints" not in M._read_manifest(lake)


def test_constraint_add_drop_lifecycle(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(_env(spark, 10), lake, n_buckets=2, retain_versions=6)
    M.add_constraint(spark, lake, "c1", "last_seq >= 0", retain_versions=6)
    # idempotent re-add of the same expr: no new version
    res = M.add_constraint(spark, lake, "c1", "last_seq >= 0", retain_versions=6)
    assert res["version"] == 2
    with pytest.raises(ValueError, match="already exists"):
        M.add_constraint(spark, lake, "c1", "last_seq >= 1")
    res = M.drop_constraint(lake, "c1", retain_versions=6)
    assert res["version"] == 3 and res["constraints"] == {}
    assert M.drop_constraint(lake, "nope")["version"] == 3  # IF EXISTS posture
    # constraint versions are metadata-only: CDF consumers skip them
    assert (
        M.lake_changes_rows(spark, lake, from_version=1, to_version=3).count() == 0
    )
    # and they survive ordinary merges (carried by _apply_delta)
    M.add_constraint(spark, lake, "c2", "item IS NOT NULL", retain_versions=6)
    M.merge_batch_into_lake(
        _env(spark, 10).withColumn("event_seq", F.col("event_seq") + 50),
        lake,
        n_buckets=None,
        retain_versions=6,
    )
    assert M._read_manifest(lake)["constraints"] == {"c2": "item IS NOT NULL"}


def test_constraint_added_mid_race_revalidates(spark, tmp_path):
    """An optimistic merge staged before a constraint add must NOT
    flip unvalidated rows past it: the changed constraint set is an
    OCC conflict, and the recompute re-validates (raising here,
    because the staged batch violates the new constraint)."""
    lake = str(tmp_path / "lake")
    env = _env(spark, 40)
    M.merge_batch_into_lake(env, lake, n_buckets=4, retain_versions=4)

    def add_mid_race(attempt: int):
        if attempt == 0:
            M.add_constraint(spark, lake, "no_null_item", "item IS NOT NULL")

    before = M.OCC_CONFLICTS
    with pytest.raises(M.ConstraintViolationError, match="no_null_item"):
        M.merge_batch_optimistic(
            env.withColumn("item", F.lit(None).cast("string")),
            lake,
            n_buckets=None,
            retain_versions=4,
            _race_hook=add_mid_race,
        )
    assert M.OCC_CONFLICTS > before


# ---------------------------------------------------------------------------
# timestamp-bounded change feeds
# ---------------------------------------------------------------------------


def test_changes_by_timestamp(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env = _env(spark, 90)
    for i in range(3):
        M.merge_batch_into_lake(
            env.filter(F.col("event_seq") % 3 == i),
            lake,
            n_buckets=4,
            retain_versions=4,
        )
    hist = {r["version"]: r["committed_at"] for r in M.describe_history(lake)}
    by_v = M.lake_changes(spark, lake, from_version=2, to_version=3).collect()
    by_ts = M.lake_changes(
        spark, lake, from_timestamp=hist[2], to_timestamp=hist[3]
    ).collect()
    assert sorted(map(tuple, by_v)) == sorted(map(tuple, by_ts))
    rows_ts = M.lake_changes_rows(spark, lake, from_timestamp=hist[2]).collect()
    rows_v = M.lake_changes_rows(spark, lake, from_version=2).collect()
    assert sorted(map(tuple, rows_ts)) == sorted(map(tuple, rows_v))
    with pytest.raises(ValueError, match="not both"):
        M.lake_changes(spark, lake, from_version=1, from_timestamp=hist[1])
    with pytest.raises(ValueError, match="from_version or from_timestamp"):
        M.lake_changes(spark, lake)


def test_stream_starting_timestamp(spark, tmp_path):
    """lake_cdf's startingTimestamp resolves the diff base once at
    stream start — the feed is exactly 'changes after the instant'."""
    import tempfile

    lake = str(tmp_path / "lake")
    env = _env(spark, 90)
    for i in range(3):
        M.merge_batch_into_lake(
            env.filter(F.col("event_seq") % 3 == i),
            lake,
            n_buckets=4,
            retain_versions=4,
        )
    hist = {r["version"]: r["committed_at"] for r in M.describe_history(lake)}
    from lapidus_spark.streaming.lake_source import register_lake_cdf

    register_lake_cdf(spark)
    ckpt = tempfile.mkdtemp(prefix="gov_sts_ckpt_")
    q = (
        spark.readStream.format("lake_cdf")
        .option("path", lake)
        .option("startingTimestamp", hist[2])
        .load()
        .writeStream.format("memory")
        .queryName("gov_sts_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["entity_id"] for r in spark.table("gov_sts_out").collect()}
    want = {
        r["entity_id"]
        for r in M.lake_changes(spark, lake, from_version=2).collect()
    }
    assert got == want and len(got) == 30
    with pytest.raises(Exception, match="not both"):
        (
            spark.readStream.format("lake_cdf")
            .option("path", lake)
            .option("startingVersion", 1)
            .option("startingTimestamp", hist[2])
            .load()
            .writeStream.format("noop")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="gov_sts2_")
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def test_starting_timestamp_resolves_lazily(spark, tmp_path):
    """Regression (round-9 review): startingTimestamp must resolve in
    initialOffset (first start only), NOT the reader constructor — a
    checkpointed restart reconstructs the reader after retention has
    GC'd the commits at/before the instant, and an eager resolve
    would kill the restart even though the committed offset wins."""
    from lapidus_spark.streaming.lake_source import LakeCDFStreamReader

    lake = str(tmp_path / "lake")
    env = _env(spark, 60)
    for i in range(3):
        M.merge_batch_into_lake(
            env.filter(F.col("event_seq") % 3 == i),
            lake,
            n_buckets=4,
            retain_versions=4,
        )
    hist = {r["version"]: r["committed_at"] for r in M.describe_history(lake)}
    opts = {"path": lake, "startingtimestamp": hist[1]}
    r = LakeCDFStreamReader(opts)
    assert r.initialOffset() == {"version": 1}
    # expire the instant, as a long-running lake would
    M.vacuum_lake(lake, retain_versions=1)
    # the restart path: constructing the reader must NOT resolve
    r2 = LakeCDFStreamReader(opts)
    # only a FIRST start (initialOffset) pays the retention error
    with pytest.raises(ValueError, match="no retained version committed"):
        r2.initialOffset()


def test_cloned_from_survives_later_commits(spark, tmp_path):
    src = str(tmp_path / "src")
    M.merge_batch_into_lake(_env(spark, 40), src, n_buckets=4, retain_versions=4)
    dst = str(tmp_path / "dst")
    M.clone_lake(src, dst)
    M.merge_batch_into_lake(
        _env(spark, 40).withColumn("event_seq", F.col("event_seq") + 100),
        dst,
        n_buckets=None,
        retain_versions=4,
    )
    d = M.describe_detail(dst)
    assert d["version"] == 2 and d["cloned_from"]["version"] == 1


def test_clone_carries_constraints_and_txn_watermarks(spark, tmp_path):
    """Regression (round-10 review): a shallow clone reads the
    source's data, so the source's write-side governance must ride
    along — dropping the CHECK set would let a merge into the clone
    commit rows the source forbids, and dropping the txn watermarks
    would make a resumed txn-marked writer re-apply batches already
    present in the cloned data."""
    lake, dst = str(tmp_path / "lake"), str(tmp_path / "clone")
    M.merge_batch_into_lake(
        _env(spark, 20), lake, n_buckets=4, retain_versions=2, txn=("app", 5)
    )
    M.add_constraint(spark, lake, "seq_cap", "last_seq < 1000000")
    M.clone_lake(lake, dst)
    m = M._read_manifest(dst)
    assert m["constraints"] == {"seq_cap": "last_seq < 1000000"}
    assert m["txns"] == {"app": 5}
    bad = _env(spark, 5).withColumn("event_seq", F.col("event_seq") + 2_000_000)
    with pytest.raises(M.ConstraintViolationError):
        M.merge_batch_into_lake(bad, dst, n_buckets=None, retain_versions=2)
    # a replayed epoch against the clone is a free skip, not a re-merge
    before = M._read_manifest(dst)["version"]
    M.merge_batch_into_lake(
        _env(spark, 5), dst, n_buckets=None, retain_versions=2, txn=("app", 5)
    )
    assert M._read_manifest(dst)["version"] == before
