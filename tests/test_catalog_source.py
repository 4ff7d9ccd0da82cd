"""The CATALOG as a streaming source (format ``catalog_cdf``,
VERDICT r10 #7): offsets are catalog versions; each micro-batch is a
tx-consistent multi-table diff — the reference's per-tx atomicity
(DatabaseTransaction, postgresql.js:487-501) carried into a
downstream streaming consumer. Batch/stream parity against
``catalog_changes``, per-tx batch atomicity, startingVersion,
restart-resume on a durable checkpoint, a table first committed
mid-stream, and the retention-floor failure posture."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import lapidus_spark.lake.catalog as C
from lapidus_spark.sources.tables import load_table
from lapidus_spark.streaming.catalog_source import register_catalog_cdf
from tests.conftest import SF_DIR

CAT_COLS = [
    "tbl", "entity_id", "change_type", "last_seq", "last_ts",
    "last_type", "item", "ver",
]


def _halves(spark, mod, rem, seq_shift=0):
    """Per-tx table batches; ``seq_shift`` (monotone per tx) makes
    every key's LWW winner strictly advance each tx, so each catalog
    step changes BOTH tables — the shape the tx-atomicity assertions
    need (without it a tx whose subset carries no newer winner for a
    low-cardinality key legitimately diffs empty)."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") % mod == rem)

    def env(pk_col):
        return ev.select(
            F.col(pk_col).cast("string").alias("pk"),
            (F.col("event_id") + seq_shift).alias("event_seq"),
            (F.col("ts") + F.make_interval(secs=F.lit(seq_shift / 1000)))
            .cast("timestamp_ntz")
            .alias("ts"),
            F.lit("update").alias("type"),
            F.col("props").alias("item"),
        )

    return {"by_user": env("user_id"), "by_type": env("event_type")}


def _build_catalog(spark, cat, n_txs=3):
    mods = [(2, 0), (3, 1), (4, 2), (5, 3)]
    for txid in range(1, n_txs + 1):
        mod, rem = mods[txid - 1]
        C.commit_multi_table_tx(
            cat,
            _halves(spark, mod, rem, seq_shift=txid * 1_000_000),
            txid=txid,
            retain_versions=8,
            n_buckets=4,
        )


def _drain(spark, cat, name, ckpt, **opts):
    register_catalog_cdf(spark)
    reader = spark.readStream.format("catalog_cdf").option("path", cat)
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
    return sorted(map(tuple, spark.table(name).select(*CAT_COLS).collect()))


def _batch_feed(spark, cat, versions):
    """Batch truth: catalog_changes per catalog version step, labeled
    with the producing catalog version."""
    rows = []
    for cv in versions:
        step = C.catalog_changes(spark, cat, from_version=cv - 1, to_version=cv)
        rows.extend(
            map(
                tuple,
                step.withColumn("ver", F.lit(cv).cast("int"))
                .select(*CAT_COLS)
                .collect(),
            )
        )
    return sorted(rows)


def test_stream_matches_batch_catalog_changes(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _build_catalog(spark, cat)
    got = _drain(
        spark, cat, "catcdf_full", str(tmp_path / "ck"), maxVersionsPerBatch="1"
    )
    assert got == _batch_feed(spark, cat, [1, 2, 3])
    assert len(got) > 0
    # both tables flow through one feed
    assert {r[0] for r in got} == {"by_user", "by_type"}


def test_each_version_is_a_tx_consistent_multi_table_unit(spark, tmp_path):
    """Rows sharing ver form one atomic multi-table diff: every
    catalog version's slice contains BOTH tables' halves of its tx —
    the guarantee the per-table feeds, consumed independently, cannot
    give."""
    cat = str(tmp_path / "cat")
    _build_catalog(spark, cat)
    got = _drain(
        spark, cat, "catcdf_tx", str(tmp_path / "ck"), maxVersionsPerBatch="1"
    )
    by_ver = {}
    for r in got:
        by_ver.setdefault(r[-1], set()).add(r[0])
    assert set(by_ver) == {1, 2, 3}
    for ver, tbls in by_ver.items():
        assert tbls == {"by_user", "by_type"}, (ver, tbls)


def test_starting_version_skips_history(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _build_catalog(spark, cat)
    got = _drain(
        spark, cat, "catcdf_from2", str(tmp_path / "ck"), startingVersion="2"
    )
    assert got == _batch_feed(spark, cat, [3])
    assert len(got) > 0


def test_restart_resumes_at_committed_catalog_version(spark, tmp_path):
    """The directive's restart-resume proof: drain txs 1-3 into a
    durable (parquet) sink, commit tx 4, restart — ONLY the tx-4
    multi-table delta appends; no re-emits, no gaps."""
    cat = str(tmp_path / "cat")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _build_catalog(spark, cat)
    register_catalog_cdf(spark)

    def drain_to_parquet():
        q = (
            spark.readStream.format("catalog_cdf")
            .option("path", cat)
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
        return sorted(map(tuple, spark.read.parquet(out).select(*CAT_COLS).collect()))

    first = drain_to_parquet()
    assert first == _batch_feed(spark, cat, [1, 2, 3])
    C.commit_multi_table_tx(
        cat,
        _halves(spark, 5, 3, seq_shift=4_000_000),
        txid=4,
        retain_versions=8,
        n_buckets=4,
    )
    second = drain_to_parquet()
    assert second == sorted(first + _batch_feed(spark, cat, [4]))
    assert len(second) > len(first)


def test_table_first_committed_mid_stream_arrives_whole(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _build_catalog(spark, cat, n_txs=2)
    halves = _halves(spark, 4, 2, seq_shift=3_000_000)
    halves["by_day"] = halves["by_user"].withColumn(
        "pk", F.concat(F.lit("d"), F.col("pk"))
    )
    C.commit_multi_table_tx(cat, halves, txid=3, retain_versions=8, n_buckets=4)
    got = _drain(
        spark, cat, "catcdf_newtbl", str(tmp_path / "ck"), startingVersion="2"
    )
    day_rows = [r for r in got if r[0] == "by_day"]
    assert len(day_rows) > 0
    assert {r[2] for r in day_rows} == {"insert"}  # diffs from empty
    assert got == _batch_feed(spark, cat, [3])


def test_tbl_ver_orders_multi_step_catalog_versions(spark, tmp_path):
    """A member table that receives a DIRECT (non-catalog) data commit
    between txs makes the next catalog step span TWO table-version
    steps: the same entity emits two change rows with identical
    ``ver``. ``tbl_ver`` (the underlying table version each step
    diffed) is the within-``ver`` ordering column — folding per
    (tbl, entity_id) in ``tbl_ver`` order must land on the table's
    live snapshot, which ``ver`` alone cannot promise."""
    from lapidus_spark.lake import merge as M
    from lapidus_spark.lake.stats import read_lake_snapshot

    cat = str(tmp_path / "cat")
    _build_catalog(spark, cat, n_txs=2)
    # direct commit on by_user between tx 2 and tx 3 → table version 3
    # exists with NO catalog entry referencing it
    M.merge_batch_into_lake(
        _halves(spark, 1, 0, seq_shift=3_000_000)["by_user"],
        os.path.join(cat, "by_user"),
        n_buckets=4,
        retain_versions=8,
    )
    C.commit_multi_table_tx(
        cat,
        _halves(spark, 1, 0, seq_shift=4_000_000),
        txid=3,
        retain_versions=8,
        n_buckets=4,
    )
    register_catalog_cdf(spark)
    q = (
        spark.readStream.format("catalog_cdf")
        .option("path", cat)
        .option("startingVersion", "2")
        .load()
        .writeStream.format("memory")
        .queryName("catcdf_tblver")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    rows = spark.table("catcdf_tblver").collect()
    assert all(r["ver"] == 3 for r in rows)
    # the direct commit's step and the tx's step both flow, ordered
    by_user = [r for r in rows if r["tbl"] == "by_user"]
    assert {r["tbl_ver"] for r in by_user} == {3, 4}
    assert {r["tbl_ver"] for r in rows if r["tbl"] == "by_type"} == {3}
    # at least one entity emits BOTH steps' rows under one ver —
    # unorderable without tbl_ver
    per_entity = {}
    for r in by_user:
        per_entity.setdefault(r["entity_id"], []).append(r)
    assert any(len(v) == 2 for v in per_entity.values())
    # folding in tbl_ver order lands on the live snapshot
    folded = {
        e: max(v, key=lambda r: r["tbl_ver"]) for e, v in per_entity.items()
    }
    snap = {
        r["entity_id"]: (r["last_seq"], r["item"])
        for r in read_lake_snapshot(
            spark, os.path.join(cat, "by_user")
        ).collect()
    }
    for e, r in folded.items():
        assert r["change_type"] != "delete"
        assert snap[e] == (r["last_seq"], r["item"]), e


def test_vacuumed_floor_fails_fast(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _build_catalog(spark, cat)
    C.catalog_vacuum(cat, retain_entries=1)
    register_catalog_cdf(spark)
    q = (
        spark.readStream.format("catalog_cdf")
        .option("path", cat)
        .option("startingVersion", "1")
        .load()
        .writeStream.format("memory")
        .queryName("catcdf_floor")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    with pytest.raises(Exception, match="retention floor"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
