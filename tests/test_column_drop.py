"""DROP COLUMN — metadata-only schema lifecycle completion (VERDICT
r10 #3; Delta column-mapping's drop posture). The rename design
leaned on drop's absence for its alias-safety argument; drop
re-proves it by QUARANTINE: a dropped column's entire name set
(current name + rename aliases) can never be reused by accretion or
rename, so any name ever written still denotes exactly one column's
data and the read-side coalesce stays exact.

Pinned here: the zero-data-byte contract, reads stop returning the
column immediately, pre-drop versions time-travel WITH the column,
the quarantine guard rails (re-accretion and rename-target refusal,
covering aliases too), the constraint interlock, rename→drop
interplay, CDF silence across the drop commit, OPTIMIZE physically
shedding the dead bytes, the CLI, and core-column refusal.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import lapidus_spark.streaming.materialize as M

COLS = ["entity_id", "last_seq", "last_ts", "last_type", "item"]


def _env(spark, n=60, start=0, extra=None, extra_name=None):
    cols = [
        F.format_string("k%04d", F.col("id") % 24).alias("pk"),
        F.col("id").alias("event_seq"),
        F.timestamp_seconds(F.col("id") * 3600 + 1_700_000_000)
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit("insert").alias("type"),
        F.format_string("payload-%04d", F.col("id")).alias("item"),
    ]
    if extra is not None:
        cols.append(extra.alias(extra_name))
    return spark.range(start, start + n).select(*cols)


def _build(spark, lake, retain=8):
    """shard accreted alongside keep_me, then shard dropped."""
    M.merge_batch_into_lake(
        _env(spark, 30, 0, (F.col("id") % 7).cast("bigint"), "shard")
        .withColumn("keep_me", (F.col("event_seq") % 3).cast("int")),
        lake,
        n_buckets=4,
        retain_versions=retain,
        extra_cols=("shard", "keep_me"),
    )
    return M.drop_lake_column(lake, "shard", retain_versions=retain)


def _files(lake):
    out = []
    for root, _dirs, files in os.walk(lake):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def test_drop_is_metadata_only_and_reads_lose_the_column(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _env(spark, 30, 0, (F.col("id") % 7).cast("bigint"), "shard")
        .withColumn("keep_me", (F.col("event_seq") % 3).cast("int")),
        lake,
        n_buckets=4,
        retain_versions=8,
        extra_cols=("shard", "keep_me"),
    )
    before = _files(lake)
    res = M.drop_lake_column(lake, "shard", retain_versions=8)
    assert _files(lake) == before  # zero data bytes moved
    assert [c["name"] for c in res["columns"]] == ["keep_me"]
    assert res["dropped"] == [{"name": "shard", "type": "bigint", "aliases": []}]
    snap = M.read_lake_snapshot(spark, lake)
    assert "shard" not in snap.columns and "keep_me" in snap.columns
    assert snap.count() == 24


def test_pre_drop_versions_time_travel_with_the_column(spark, tmp_path):
    lake = str(tmp_path / "lake")
    res = _build(spark, lake)
    v_drop = res["version"]
    old = M.read_lake_snapshot(spark, lake, version=v_drop - 1)
    assert "shard" in old.columns
    assert old.filter(F.col("shard").isNotNull()).count() == 24
    new = M.read_lake_snapshot(spark, lake, version=v_drop)
    assert "shard" not in new.columns


def test_quarantine_blocks_reaccretion_and_rename_target(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _build(spark, lake)
    with pytest.raises(ValueError, match="quarantined"):
        M.merge_batch_into_lake(
            _env(spark, 10, 100, F.lit(7).cast("bigint"), "shard"),
            lake,
            n_buckets=4,
            retain_versions=8,
            extra_cols=("shard",),
        )
    with pytest.raises(ValueError, match="quarantined"):
        M.rename_lake_column(lake, "keep_me", "shard", retain_versions=8)
    # a fresh, never-used name still accretes normally
    M.merge_batch_into_lake(
        _env(spark, 10, 100, F.lit(7).cast("bigint"), "slot"),
        lake,
        n_buckets=4,
        retain_versions=8,
        extra_cols=("slot",),
    )
    assert "slot" in M.read_lake_snapshot(spark, lake).columns


def test_quarantine_covers_rename_aliases(spark, tmp_path):
    """Dropping a RENAMED column quarantines every name it was ever
    written under — old files carry data under the former name too."""
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _env(spark, 30, 0, (F.col("id") % 7).cast("bigint"), "shard"),
        lake,
        n_buckets=4,
        retain_versions=8,
        extra_cols=("shard",),
    )
    M.rename_lake_column(lake, "shard", "zone", retain_versions=8)
    res = M.drop_lake_column(lake, "zone", retain_versions=8)
    assert res["dropped"] == [
        {"name": "zone", "type": "bigint", "aliases": ["shard"]}
    ]
    for dead in ("zone", "shard"):
        with pytest.raises(ValueError, match="quarantined"):
            M.merge_batch_into_lake(
                _env(spark, 5, 100, F.lit(1).cast("bigint"), dead),
                lake,
                n_buckets=4,
                retain_versions=8,
                extra_cols=(dead,),
            )


def test_constraint_interlock_and_core_refusal(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _env(spark, 30, 0, (F.col("id") % 7).cast("bigint"), "shard"),
        lake,
        n_buckets=4,
        retain_versions=8,
        extra_cols=("shard",),
    )
    M.add_constraint(spark, lake, "shard_ok", "SHARD >= 0")  # case-variant
    with pytest.raises(ValueError, match="CHECK constraint 'shard_ok'"):
        M.drop_lake_column(lake, "shard", retain_versions=8)
    M.drop_constraint(lake, "shard_ok")
    with pytest.raises(ValueError, match="no extra column 'item'"):
        M.drop_lake_column(lake, "item", retain_versions=8)
    with pytest.raises(ValueError, match="no extra column 'nope'"):
        M.drop_lake_column(lake, "nope", retain_versions=8)
    M.drop_lake_column(lake, "shard", retain_versions=8)


def test_drop_is_silent_for_change_feeds(spark, tmp_path):
    lake = str(tmp_path / "lake")
    res = _build(spark, lake)
    v = res["version"]
    assert M.lake_changes(spark, lake, v - 1, v).count() == 0
    assert M.lake_changes_rows(spark, lake, v - 1, v).count() == 0


def test_optimize_sheds_the_dead_bytes(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _build(spark, lake)
    M.compact_lake(spark, lake, retain_versions=1, target_files_per_bucket=0)
    # rewritten files materialize the live epoch only
    phys = spark.read.parquet(*_files(lake))
    assert "shard" not in phys.columns
    snap = M.read_lake_snapshot(spark, lake)
    assert "keep_me" in snap.columns and snap.count() == 24


def test_cli_drop_column(spark, tmp_path, capsys):
    from lapidus_spark.__main__ import main

    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _env(spark, 30, 0, (F.col("id") % 7).cast("bigint"), "shard"),
        lake,
        n_buckets=4,
        retain_versions=8,
        extra_cols=("shard",),
    )
    assert main(["--drop-column", lake, "--column", "shard"]) == 0
    assert "dropped shard" in capsys.readouterr().out
    assert "shard" not in M.read_lake_snapshot(spark, lake).columns
    detail = M.describe_detail(lake)
    assert detail["dropped_columns"] == ["shard"]


def test_drop_reconciles_declared_stats_columns(spark, tmp_path):
    """A DROPPED column leaves the declared stats_columns in the same
    metadata flip — otherwise every later OPTIMIZE carries a dead name
    forever (and the quarantine covers declarations made under any of
    the column's former names)."""
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _env(spark, 30, 0, (F.col("id") % 7).cast("bigint"), "shard"),
        lake,
        n_buckets=4,
        retain_versions=8,
        extra_cols=("shard",),
    )
    # target_files_per_bucket=0 forces the rewrite: the single-exchange
    # merge staging (round 13) lands one file per bucket on tiny
    # batches (AQE coalescing), so the default target=1 would correctly
    # see nothing degraded and never publish the declaring version.
    M.compact_lake(
        spark, lake, retain_versions=8, max_records_per_file=8,
        target_files_per_bucket=0, stats_columns=("shard",),
    )
    assert M._read_manifest(lake)["stats_columns"] == ["shard"]
    M.drop_lake_column(lake, "shard", retain_versions=8)
    m = M._read_manifest(lake)
    assert m["stats_columns"] == []
    # a later adopting OPTIMIZE runs clean with no dead declaration
    M.compact_lake(spark, lake, retain_versions=8, max_records_per_file=8)
    assert M._read_manifest(lake)["stats_columns"] == []
