"""Deletion vectors — the merge-on-read DELETE (VERDICT r9 #2).

A ``delete_from_lake(..., mode="dv")`` commit records the matched
rows' (entity_id, last_seq, last_ts) triples per bucket in the commit
log and writes ZERO data bytes; every read path applies the vector as
a broadcast mask (rows read as tombstones in their LWW position).
This file pins what the oracle gate cannot see: the zero-byte
contract, the mask's interaction with later updates (resurrection),
the OPTIMIZE purge + VACUUM reclaim lifecycle, CDF pre-images across
a DV commit, restore/clone carrying the vectors, OCC conflicting on
them, and the metadata-size cap.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import lapidus_spark.streaming.materialize as M

COLS = ["entity_id", "last_seq", "last_ts", "last_type", "item"]


def _env(spark, n=96):
    return spark.range(n).select(
        F.format_string("k%04d", F.col("id")).alias("pk"),
        F.col("id").alias("event_seq"),
        F.timestamp_seconds(F.col("id") * 3600 + 1_700_000_000)
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit("insert").alias("type"),
        F.format_string("payload-%04d", F.col("id")).alias("item"),
    )


def _snap(spark, lake, version=None):
    return sorted(
        tuple(r)
        for r in M.read_lake_snapshot(spark, lake, version=version)
        .select(*COLS)
        .collect()
    )


def _build(spark, lake, n=96, retain=6, n_buckets=4):
    env = _env(spark, n)
    M.merge_batch_into_lake(env, lake, n_buckets=n_buckets, retain_versions=retain)
    return env


def _parquet_files(lake):
    return sorted(glob.glob(os.path.join(lake, "commits", "*", "pb=*", "*.parquet")))


def test_dv_delete_writes_zero_data_bytes_and_matches_rewrite(spark, tmp_path):
    """The DV commit moves no pointers and writes no files, yet the
    snapshot equals the rewrite-based delete's bit-for-bit."""
    lake_dv, lake_rw = str(tmp_path / "dv"), str(tmp_path / "rw")
    _build(spark, lake_dv)
    _build(spark, lake_rw)
    pred = "last_seq % 10 = 3"
    files_before = _parquet_files(lake_dv)
    m_before = M._manifest_at(lake_dv, None)
    res = M.delete_from_lake(spark, lake_dv, pred, retain_versions=6, mode="dv")
    m_after = M._manifest_at(lake_dv, None)
    assert res["deleted_rows"] > 0
    assert res["dv_entries"] == res["deleted_rows"]
    assert _parquet_files(lake_dv) == files_before  # zero data bytes
    assert m_after["buckets"] == m_before["buckets"]  # no pointer moved
    # stamps DID move for the touched buckets (CDF/OCC visibility)
    touched = set(m_after["deletion_vectors"])
    for b in touched:
        assert m_after["data_versions"][b] == m_after["version"]
    # zone maps survive a pointer-preserving commit (files unchanged)
    for b in touched & set(m_before.get("file_stats", {})):
        assert m_after["file_stats"][b] == m_before["file_stats"][b]
    M.delete_from_lake(spark, lake_rw, pred, retain_versions=6, mode="rewrite")
    assert _snap(spark, lake_dv) == _snap(spark, lake_rw)


def test_dv_mask_scopes_to_the_row_version_the_delete_saw(spark, tmp_path):
    """A later, higher-(ts, seq) update for a redacted entity reads
    unmasked and wins the LWW combine — redaction never swallows new
    data (the triple match, not a bare entity match)."""
    lake = str(tmp_path / "lake")
    env = _build(spark, lake, n=24)
    M.delete_from_lake(spark, lake, "entity_id = 'k0003'", retain_versions=6, mode="dv")
    assert not any(r[0] == "k0003" for r in _snap(spark, lake))
    resurrect = env.filter(F.col("pk") == "k0003").select(
        "pk",
        (F.col("event_seq") + 1000).alias("event_seq"),
        (F.col("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
        F.lit("update").alias("type"),
        F.lit("reborn").alias("item"),
    )
    M.merge_batch_into_lake(resurrect, lake, n_buckets=None, retain_versions=6)
    rows = [r for r in _snap(spark, lake) if r[0] == "k0003"]
    assert len(rows) == 1 and rows[0][4] == "reborn"


def test_dv_double_redaction_does_not_duplicate_rows(spark, tmp_path):
    """Redact → resurrect → redact again: two triples for one entity
    must not fan out the join (the per-entity collect_list mask)."""
    lake = str(tmp_path / "lake")
    env = _build(spark, lake, n=24)
    M.delete_from_lake(spark, lake, "entity_id = 'k0001'", retain_versions=6, mode="dv")
    res1 = env.filter(F.col("pk") == "k0001").select(
        "pk",
        (F.col("event_seq") + 500).alias("event_seq"),
        (F.col("ts") + F.expr("INTERVAL 5 DAYS")).alias("ts"),
        F.lit("update").alias("type"),
        F.lit("second-life").alias("item"),
    )
    M.merge_batch_into_lake(res1, lake, n_buckets=None, retain_versions=6)
    M.delete_from_lake(spark, lake, "entity_id = 'k0001'", retain_versions=6, mode="dv")
    full = M.read_lake_snapshot(spark, lake)  # visible view
    raw = M._read_live(spark, lake, M._manifest_at(lake, None))
    assert raw.count() == 24  # one physical row per entity, no fan-out
    assert full.filter("entity_id = 'k0001'").count() == 0


def test_dv_redelete_is_a_noop(spark, tmp_path):
    """Re-running the same DV delete matches nothing (the locate pass
    reads through the mask) — no new version, replay-safe."""
    lake = str(tmp_path / "lake")
    _build(spark, lake)
    M.delete_from_lake(spark, lake, "last_seq % 10 = 7", retain_versions=6, mode="dv")
    v = M._manifest_at(lake, None)["version"]
    res = M.delete_from_lake(spark, lake, "last_seq % 10 = 7", retain_versions=6, mode="dv")
    assert res["deleted_rows"] == 0
    assert M._manifest_at(lake, None)["version"] == v


def test_optimize_purges_dv_and_vacuum_reclaims(spark, tmp_path):
    """compact_lake treats DV'd buckets as degraded, materializes the
    tombstones through its masked read, sheds the vector; VACUUM then
    reclaims the pre-purge files. Logical content never changes."""
    lake = str(tmp_path / "lake")
    _build(spark, lake, retain=2)
    M.delete_from_lake(spark, lake, "last_seq % 10 = 1", retain_versions=2, mode="dv")
    want = _snap(spark, lake)
    res = M.compact_lake(spark, lake, retain_versions=2)
    assert res["compacted_buckets"] > 0
    m = M._manifest_at(lake, None)
    assert not m.get("deletion_vectors")  # vectors shed by the rewrite
    assert _snap(spark, lake) == want  # purge is physical, not logical
    # the purged rows are now physical tombstones, visible to a raw read
    raw = M._read_live(spark, lake, m)
    assert raw.filter("last_type = 'delete'").count() >= len(want) // 10
    rep = M.vacuum_lake(lake, retain_versions=1)
    assert rep["floor"] == m["version"]
    assert _snap(spark, lake) == want


def test_cdf_emits_preimage_deletes_across_a_dv_commit(spark, tmp_path):
    """lake_changes_rows across the DV version emits delete rows
    carrying the REMOVED content as the pre-image, exactly like the
    rewrite path — and only for the redacted entities."""
    lake = str(tmp_path / "lake")
    _build(spark, lake)
    res = M.delete_from_lake(spark, lake, "last_seq % 12 = 5", retain_versions=6, mode="dv")
    v = M._manifest_at(lake, None)["version"]
    feed = M.lake_changes_rows(spark, lake, from_version=v - 1, to_version=v)
    rows = feed.collect()
    assert len(rows) == res["deleted_rows"]
    assert all(r["change_type"] == "delete" for r in rows)
    assert all(r["item"] is not None for r in rows)  # pre-image content
    # entity-state feed agrees
    state = M.lake_changes(spark, lake, from_version=v - 1, to_version=v)
    assert state.filter("change_type = 'delete'").count() == res["deleted_rows"]


def test_restore_across_dv_delete_undoes_the_redaction(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _build(spark, lake)
    before = _snap(spark, lake)
    M.delete_from_lake(spark, lake, "last_seq % 10 = 9", retain_versions=6, mode="dv")
    assert _snap(spark, lake) != before
    M.restore_lake(lake, 1, retain_versions=6)
    assert not M._manifest_at(lake, None).get("deletion_vectors")
    assert _snap(spark, lake) == before


def test_clone_carries_deletion_vectors(spark, tmp_path):
    """A shallow clone reads the source's files, so the source's
    read-time redactions must ride along."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build(spark, src)
    M.delete_from_lake(spark, src, "last_seq % 10 = 4", retain_versions=6, mode="dv")
    M.clone_lake(src, dst)
    assert M._manifest_at(dst, None).get("deletion_vectors")
    assert _snap(spark, dst) == _snap(spark, src)


def test_point_and_time_reads_apply_the_mask_on_pruned_files(spark, tmp_path):
    """The zone-map-pruned file paths bypass _read_live; the mask must
    still apply. Cluster first so file pruning is actually exercised."""
    from datetime import datetime, timedelta

    lake = str(tmp_path / "lake")
    _build(spark, lake, n=96)
    M.compact_lake(spark, lake, target_files_per_bucket=0, max_records_per_file=16,
                   retain_versions=6, cluster_by=("entity_id", "last_ts"))
    assert M._manifest_at(lake, None).get("file_stats")  # stats present
    M.delete_from_lake(spark, lake, "entity_id = 'k0010'", retain_versions=6, mode="dv")
    assert M.lake_point_read(spark, lake, ["k0010"]).count() == 0
    lo = datetime(2023, 1, 1)
    hi = lo + timedelta(days=4000)
    tr = M.lake_time_read(spark, lake, lo, hi)
    assert tr.filter("entity_id = 'k0010'").count() == 0
    assert tr.count() == 95  # everyone else still visible


def test_dv_cap_rejects_bulk_deletes(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _build(spark, lake, n=96)
    with pytest.raises(ValueError, match="max_dv_entries"):
        M.delete_from_lake(
            spark, lake, "last_seq >= 0", retain_versions=6, mode="dv",
            max_dv_entries=10,
        )
    # the failed delete committed nothing
    assert M._manifest_at(lake, None)["version"] == 1


def test_dv_commit_conflicts_a_staged_occ_merge(spark, tmp_path):
    """An optimistic merge staged against the pre-DV manifest must
    recompute: the DV changed its buckets' CONTENT without moving
    pointers, which only the DV-aware _bucket_content_changed sees."""
    lake = str(tmp_path / "lake")
    env = _build(spark, lake)
    base = M._read_manifest(lake)
    target = [r["entity_id"] for r in M.read_lake_snapshot(spark, lake).limit(1).collect()]
    assert not M._occ_conflicts(base, base, [0, 1, 2, 3], base["n_buckets"])
    M.delete_from_lake(
        spark, lake, f"entity_id = '{target[0]}'", retain_versions=6, mode="dv"
    )
    cur = M._read_manifest(lake)
    touched = [int(b) for b in cur["deletion_vectors"]]
    assert M._occ_conflicts(base, cur, touched, cur["n_buckets"])
    # and the merge still converges: an OCC merge lands fine after
    out = env.limit(4).select(
        "pk", (F.col("event_seq") + 2000).alias("event_seq"),
        (F.col("ts") + F.expr("INTERVAL 20 DAYS")).alias("ts"),
        F.lit("update").alias("type"), F.lit("post-dv").alias("item"),
    )
    M.merge_batch_optimistic(out, lake, n_buckets=None, retain_versions=6)
    snap = dict((r[0], r[4]) for r in _snap(spark, lake))
    assert snap["k0000"] == "post-dv"


def test_history_and_detail_report_the_dv_commit(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _build(spark, lake)
    M.delete_from_lake(spark, lake, "last_seq % 10 = 2", retain_versions=6, mode="dv")
    hist = M.describe_history(lake)
    assert hist[0]["operation"] == "delete_dv"
    assert hist[0]["data_changed_buckets"] > 0
    detail = M.describe_detail(lake)
    assert detail["dv_entries"] > 0
