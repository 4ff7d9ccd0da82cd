"""Batch ``df.write.format("lake")`` writer (VERDICT r12 #1) — the
producer-side DSv2 twin of the batch reader: an envelope batch MERGEs
into the lake through the same commit protocol as
``merge_batch_into_lake``, with no library import.

Pinned here beyond the oracle gate (``lake_sql_write``): byte-level
twin parity with the library merge over the same batches (snapshot,
CDF rows, manifest semantics), LWW correctness within and across
batches including tombstone retention, CHECK-constraint refusal
through the write path (table unchanged), txn-marker idempotency via
``option("txnAppId"/"txnVersion")``, concurrent-writer serialization
under the lake lock, schema evolution (accretion, widening, type
conflict) inferred from the batch schema, ``mode("overwrite")`` as
the replace-the-table commit, deletion-vector-aware combines, and the
validation failure postures."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import lapidus_spark.streaming.materialize as M
from lapidus_spark.sources.lake_batch import register_lake_batch

COLS = ["entity_id", "last_seq", "last_ts", "last_type", "item", "bucket"]


def _env(spark, n=120, start=0, seq_shift=0, item=None):
    item_col = item if item is not None else F.format_string(
        "payload-%04d", F.col("id")
    )
    return spark.range(start, start + n).select(
        F.format_string("k%04d", F.col("id") % 60).alias("pk"),
        (F.col("id") + seq_shift).alias("event_seq"),
        F.timestamp_seconds((F.col("id") + seq_shift) * 60 + 1_700_000_000)
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit("update").alias("type"),
        item_col.alias("item"),
    )


def _snap(spark, lake, version=None, cols=COLS):
    return sorted(
        tuple(r)
        for r in M.read_lake_snapshot(spark, lake, version=version)
        .select(*cols)
        .collect()
    )


def _write(df, lake, mode="append", **opts):
    w = df.write.format("lake").mode(mode).option("path", lake)
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


def test_twin_parity_with_library_merge(spark, tmp_path):
    """The SAME batches through df.write and merge_batch_into_lake
    produce value-identical snapshots AND identical CDF rows — the
    write path is the library merge, not an approximation of it."""
    register_lake_batch(spark)
    sql_lake, lib_lake = str(tmp_path / "sql"), str(tmp_path / "lib")
    b1 = _env(spark, 120)
    b2 = _env(spark, 60, start=300, seq_shift=1000)  # LWW movers
    b3 = _env(spark, 10, start=25, seq_shift=-500)  # stale: all lose
    _write(b1, sql_lake, retainVersions="6")
    _write(b2, sql_lake, retainVersions="6")
    _write(b3, sql_lake, retainVersions="6")
    for b in (b1, b2, b3):
        M.merge_batch_into_lake(b, lib_lake, n_buckets=8, retain_versions=6)
    assert _snap(spark, sql_lake) == _snap(spark, lib_lake)
    # versions and time travel line up
    assert M._read_manifest(sql_lake)["version"] == 3
    assert _snap(spark, sql_lake, version=1) == _snap(spark, lib_lake, version=1)
    # the stale batch merged as a provable no-op on values
    assert _snap(spark, sql_lake, version=2) == _snap(spark, sql_lake, version=3)

    # CDF: row-level changes across the same commits are identical
    ccols = ["entity_id", "change_type", "last_seq", "last_type", "item"]
    for frm, to in ((1, 2), (2, 3)):
        a = sorted(
            tuple(r)
            for r in M.lake_changes_rows(
                spark, sql_lake, from_version=frm, to_version=to
            ).select(*ccols).collect()
        )
        b = sorted(
            tuple(r)
            for r in M.lake_changes_rows(
                spark, lib_lake, from_version=frm, to_version=to
            ).select(*ccols).collect()
        )
        assert a == b, (frm, to)
    # and the SQL read path closes the loop without the library
    got = (
        spark.read.format("lake").option("path", sql_lake).load()
        .select(*COLS).collect()
    )
    assert sorted(map(tuple, got)) == _snap(spark, lib_lake)


def test_lww_within_batch_and_tombstones(spark, tmp_path):
    """A single staged batch with colliding keys resolves by
    (ts, event_seq) exactly like snapshot_stream; a staged delete
    beats older events, and a STORED tombstone beats an older staged
    event across commits (the combine keeps tombstones — dropping
    them would resurrect)."""
    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    env = _env(spark, 120)  # 60 keys × 2 events each: in-batch LWW
    _write(env, lake, retainVersions="6")
    got = {r["entity_id"]: r["last_seq"] for r in
           M.read_lake_snapshot(spark, lake).collect()}
    assert len(got) == 60 and got["k0000"] == 60 and got["k0059"] == 119
    # delete k0003 with a winning stamp
    tomb = _env(spark, 1, start=3, seq_shift=10_000).withColumn(
        "type", F.lit("delete")
    )
    _write(tomb, lake, retainVersions="6")
    live = {r["entity_id"] for r in M.read_lake_snapshot(spark, lake).collect()}
    assert "k0003" not in live and len(live) == 59
    # an OLDER staged event for k0003 must NOT resurrect it
    stale = _env(spark, 1, start=3, seq_shift=500)
    _write(stale, lake, retainVersions="6")
    live2 = {r["entity_id"] for r in M.read_lake_snapshot(spark, lake).collect()}
    assert "k0003" not in live2


def test_constraint_refusal_through_write_path(spark, tmp_path):
    """A CHECK constraint recorded on the table refuses a violating
    df.write batch with the same error and leaves the table
    unchanged — and NULL passes, only FALSE violates."""
    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    _write(_env(spark, 60), lake, retainVersions="6")
    M.add_constraint(spark, lake, "seq_nonneg", "last_seq >= 0", retain_versions=6)
    want = _snap(spark, lake)
    bad = _env(spark, 5, start=200, seq_shift=-10_000)  # negative seqs
    with pytest.raises(Exception, match="CHECK constraint"):
        _write(bad, lake, retainVersions="6")
    assert _snap(spark, lake) == want
    assert M._read_manifest(lake)["version"] == 2  # commit refused
    # (v2 is add_constraint's own metadata-only commit)
    # NULL item passes a constraint on item (SQL-standard unknown)
    M.add_constraint(spark, lake, "item_prefix", "item LIKE 'payload-%'", retain_versions=6)
    ok = _env(spark, 3, start=400, seq_shift=5000, item=F.lit(None).cast("string"))
    _write(ok, lake, retainVersions="6")
    assert M._read_manifest(lake)["version"] == 4


def test_txn_marker_idempotency(spark, tmp_path):
    """option(txnAppId/txnVersion) is Delta's idempotent-writer
    marker: a replayed version is skipped outright (no version bump),
    a newer version applies, and regressing versions raise."""
    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    b1 = _env(spark, 60)
    _write(b1, lake, retainVersions="6", txnAppId="app", txnVersion="1")
    assert M._read_manifest(lake)["version"] == 1
    # replay: skipped outright
    _write(b1, lake, retainVersions="6", txnAppId="app", txnVersion="1")
    assert M._read_manifest(lake)["version"] == 1
    # next version applies
    _write(
        _env(spark, 60, seq_shift=1000), lake,
        retainVersions="6", txnAppId="app", txnVersion="2",
    )
    m = M._read_manifest(lake)
    assert m["version"] == 2 and m["txns"] == {"app": 2}
    # a DIFFERENT app is independent
    _write(
        _env(spark, 10, start=700, seq_shift=3000), lake,
        retainVersions="6", txnAppId="other", txnVersion="7",
    )
    assert M._read_manifest(lake)["txns"] == {"app": 2, "other": 7}


def test_concurrent_writers_serialize_without_loss(spark, tmp_path):
    """Two df.write commits racing on the same table serialize under
    the lake's writer lock: both land, neither clobbers the other's
    buckets (the conflict-safety the locked merge path guarantees)."""
    from pyspark import InheritableThread

    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    _write(_env(spark, 10), lake, retainVersions="6")  # pin the layout
    lo = _env(spark, 30, start=1000, seq_shift=2000)   # keys k0040..
    hi = _env(spark, 30, start=2030, seq_shift=2000)   # keys k0050..
    errs = []

    def run(df):
        try:
            # the JVM resolves Python data sources through the
            # thread-local active session; a fresh py4j worker thread
            # starts without one
            spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
                spark._jsparkSession
            )
            _write(df, lake, retainVersions="6")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1, t2 = InheritableThread(target=run, args=(lo,)), InheritableThread(
        target=run, args=(hi,)
    )
    t1.start(); t2.start(); t1.join(); t2.join()
    assert errs == []
    m = M._read_manifest(lake)
    assert m["version"] == 3  # both committed, serialized
    live = {r["entity_id"]: r["last_seq"] for r in
            M.read_lake_snapshot(spark, lake).collect()}
    for r in lo.collect():
        assert live[r["pk"]] >= r["event_seq"]
    for r in hi.collect():
        assert live[r["pk"]] >= r["event_seq"]


def test_schema_evolution_accretes_widens_and_refuses(spark, tmp_path):
    """Extra payload columns are inferred from the batch schema: a
    new column accretes a schema epoch (older files null-fill), a
    wider redeclaration widens (int→bigint), an off-chain
    redeclaration refuses — the _evolved_schema rules, reached
    through df.write."""
    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    _write(_env(spark, 60), lake, retainVersions="6")
    with_shard = _env(spark, 60, seq_shift=1000).withColumn(
        "shard", (F.col("event_seq") % 5).cast("int")
    )
    _write(with_shard, lake, retainVersions="6")
    snap = M.read_lake_snapshot(spark, lake)
    assert "shard" in snap.columns
    assert snap.filter(F.col("shard").isNotNull()).count() == 60
    m = M._read_manifest(lake)
    assert m["columns"] == [{"name": "shard", "type": "int"}]
    # time travel reads version 1 under its own (shard-less) epoch
    assert "shard" not in M.read_lake_snapshot(spark, lake, version=1).columns
    # widening: bigint redeclaration moves the epoch
    wide = _env(spark, 10, seq_shift=2000).withColumn(
        "shard", (F.col("event_seq") % 5).cast("bigint")
    )
    _write(wide, lake, retainVersions="6")
    assert M._read_manifest(lake)["columns"] == [
        {"name": "shard", "type": "bigint"}
    ]
    # off-chain type refuses
    bad = _env(spark, 5, seq_shift=3000).withColumn("shard", F.lit("x"))
    with pytest.raises(Exception, match="pinned as"):
        _write(bad, lake, retainVersions="6")


def test_overwrite_replaces_the_table(spark, tmp_path):
    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    _write(_env(spark, 120), lake, retainVersions="6")
    small = _env(spark, 6, start=600, seq_shift=9000)
    _write(small, lake, mode="overwrite", retainVersions="6")
    live = _snap(spark, lake)
    assert len(live) == 6  # the table IS the batch's LWW state
    assert {e for (e, *_r) in live} == {r["pk"] for r in small.collect()}
    # history retained: the pre-overwrite version still time-travels
    assert len(_snap(spark, lake, version=1)) == 60


def test_dv_twin_parity(spark, tmp_path):
    """A follow-up batch into a DV-carrying lake combines identically
    through df.write and the library merge — redacted row versions
    stay gone on both paths."""
    register_lake_batch(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    base = _env(spark, 120)
    _write(base, a, retainVersions="6")
    M.merge_batch_into_lake(base, b, n_buckets=8, retain_versions=6)
    for lk in (a, b):
        M.delete_from_lake(
            spark, lk, "entity_id = 'k0007'", retain_versions=6, mode="dv"
        )
    nxt = _env(spark, 30, start=240, seq_shift=50)  # touches many buckets
    _write(nxt, a, retainVersions="6")
    M.merge_batch_into_lake(nxt, b, n_buckets=None, retain_versions=6)
    assert _snap(spark, a) == _snap(spark, b)
    # the redacted row VERSION stays gone on both paths; k0007 is live
    # again only through the follow-up batch's newer event (seq 290)
    seqs = {e: s for (e, s, *_r) in _snap(spark, a)}
    assert seqs["k0007"] == 247 + 50  # id 247 in the follow-up batch
    # a bucket the follow-up did NOT touch keeps its redaction intact
    untouched = _env(spark, 1, start=3, seq_shift=20_000)
    for lk in (a, b):
        M.delete_from_lake(
            spark, lk, "entity_id = 'k0031'", retain_versions=6, mode="dv"
        )
    _write(untouched, a, retainVersions="6")
    M.merge_batch_into_lake(untouched, b, n_buckets=None, retain_versions=6)
    assert _snap(spark, a) == _snap(spark, b)
    assert all(e != "k0031" for (e, *_r) in _snap(spark, a))


def test_validation_postures(spark, tmp_path):
    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    env = _env(spark, 10)
    with pytest.raises(Exception, match="path"):
        env.write.format("lake").mode("append").save()
    with pytest.raises(Exception, match="missing \\['pk'\\]"):
        _write(env.drop("pk"), lake)
    with pytest.raises(Exception, match="txnAppId AND txnVersion"):
        _write(env, lake, txnAppId="app")
    with pytest.raises(Exception, match="retainVersions"):
        _write(env, lake, retainVersions="0")
    with pytest.raises(Exception, match="non-null"):
        _write(
            env.withColumn(
                "pk", F.when(F.col("event_seq") < 5, F.col("pk"))
            ),
            lake,
        )
    _write(env, lake)  # pins n_buckets=8
    with pytest.raises(Exception, match="n_buckets"):
        _write(_env(spark, 5, start=50), lake, nBuckets="4")
    # extra col colliding with a writer-internal name
    with pytest.raises(Exception, match="collides"):
        _write(env.withColumn("pb", F.lit(1)), lake)


def test_empty_batch_is_a_no_op(spark, tmp_path):
    register_lake_batch(spark)
    lake = str(tmp_path / "lake")
    _write(_env(spark, 10), lake)
    _write(_env(spark, 10).filter(F.lit(False)), lake)
    assert M._read_manifest(lake)["version"] == 1
    # and no staging garbage is left behind
    assert glob.glob(os.path.join(lake, "_staging", "*")) == []


def test_layout_race_refuses(spark, tmp_path):
    """A writer planned against one bucket layout must refuse to
    commit rows staged under it after a concurrent layout change
    (the staged bucket ids are meaningless in the new layout)."""
    from lapidus_spark.sources.lake_write import LakeBatchWriter

    lake = str(tmp_path / "lake")
    _write_df = _env(spark, 10)
    M.merge_batch_into_lake(_write_df, lake, n_buckets=8, retain_versions=6)
    register_lake_batch(spark)
    w = LakeBatchWriter({"path": lake}, _write_df.schema, False)
    assert w.plan_n_buckets == 8
    M.rebucket_lake(spark, lake, 4, retain_versions=6)
    # stage one batch by hand, then commit: the layout moved
    import pyarrow as pa

    rb = pa.RecordBatch.from_pylist(
        [
            {
                "pk": "k0001",
                "event_seq": 99,
                "ts": None,
                "type": "update",
                "item": "x",
            }
        ],
        schema=pa.schema(
            [
                ("pk", pa.string()),
                ("event_seq", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("type", pa.string()),
                ("item", pa.string()),
            ]
        ),
    )
    msg = w.write(iter([rb]))
    with pytest.raises(ValueError, match="layout changed"):
        w.commit([msg])
    # staging cleaned up on the failure path too
    assert glob.glob(os.path.join(lake, "_staging", "*")) == []
