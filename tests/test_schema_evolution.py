"""Schema evolution on MERGE (VERDICT r8 directive 4): the lake row
accretes columns beyond the core five-column envelope. The evolving
commit records the new schema epoch in the manifest (carried forward
by the commit-log replay), files older than the evolution null-fill
on read, batches missing a known column null-fill on write, and time
travel reads each version under its own schema. Types never mutate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import lapidus_spark.streaming.materialize as M
from lapidus_spark.sources.cdc import normalize_events
from lapidus_spark.sources.tables import load_table
from tests.conftest import SF_DIR

CORE = ["entity_id", "last_seq", "last_ts", "last_type", "item"]


def _env(spark):
    return normalize_events(load_table(spark, SF_DIR, "events"))


def _with_shard(env):
    return env.withColumn("shard", (F.col("pk").cast("long") % 10).cast("bigint"))


def _snap(spark, lake, cols, version=None):
    return sorted(
        map(
            tuple,
            M.read_lake_snapshot(spark, lake, version=version).select(*cols).collect(),
        )
    )


def test_merge_accretes_column_and_time_travel_keeps_epochs(spark, tmp_path):
    env = _env(spark)
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(env.filter(F.col("event_seq") % 2 == 0), lake, retain_versions=4)
    M.merge_batch_into_lake(
        _with_shard(env.filter(F.col("event_seq") % 2 == 1)),
        lake,
        retain_versions=4,
        extra_cols=("shard",),
    )
    m = M._read_manifest(lake)
    assert m["columns"] == [{"name": "shard", "type": "bigint"}]
    # pre-evolution version reads under ITS schema: no shard column
    v1 = M.read_lake_snapshot(spark, lake, version=1)
    assert "shard" not in v1.columns
    # live: shard populated exactly where the LWW winner came from the
    # evolved batch, null where the pre-evolution file won
    live = M.read_lake_snapshot(spark, lake)
    assert live.columns[-1] == "shard"
    rows = live.select("entity_id", "last_seq", "shard").collect()
    assert rows
    for r in rows:
        if r["last_seq"] % 2 == 1:
            assert r["shard"] == int(r["entity_id"]) % 10
        else:
            assert r["shard"] is None
    assert any(r["shard"] is not None for r in rows)
    assert any(r["shard"] is None for r in rows)
    # core columns unchanged vs the no-evolution oracle
    oracle = str(tmp_path / "oracle")
    M.merge_batch_into_lake(env, oracle)
    assert _snap(spark, lake, CORE) == _snap(spark, oracle, CORE)


def test_known_column_missing_from_batch_null_fills_on_write(spark, tmp_path):
    env = _env(spark)
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _with_shard(env.filter(F.col("event_seq") % 3 == 0)),
        lake,
        extra_cols=("shard",),
        retain_versions=4,
    )
    # a later batch WITHOUT the column: known column null-fills, the
    # schema epoch is unchanged (no new columns record in the delta)
    M.merge_batch_into_lake(
        env.filter(F.col("event_seq") % 3 == 1), lake, retain_versions=4
    )
    m = M._read_manifest(lake)
    assert m["columns"] == [{"name": "shard", "type": "bigint"}]
    import json

    with open(M._delta_path(lake, 2)) as fh:
        assert "columns" not in json.load(fh).get("extra", {})
    rows = M.read_lake_snapshot(spark, lake).select("last_seq", "shard").collect()
    assert all(
        (r["shard"] is None) == (r["last_seq"] % 3 == 1) for r in rows
    )


def test_type_conflict_and_core_collision_raise(spark, tmp_path):
    env = _env(spark)
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _with_shard(env.filter(F.col("event_seq") % 2 == 0)),
        lake,
        extra_cols=("shard",),
    )
    with pytest.raises(ValueError, match="only safe widenings"):
        M.merge_batch_into_lake(
            env.filter(F.col("event_seq") % 2 == 1).withColumn(
                "shard", F.lit("not-a-number")
            ),
            lake,
            extra_cols=("shard",),
        )
    with pytest.raises(ValueError, match="collides with a core lake column"):
        M.merge_batch_into_lake(
            env.withColumn("item", F.lit("x")), lake, extra_cols=("item",)
        )


def test_optimistic_evolution_conflicts_with_concurrent_epoch(spark, tmp_path):
    """Two writers evolving the schema concurrently must not clobber
    each other's columns record: the second flip sees the epoch moved
    and recomputes, so the final schema carries BOTH columns and the
    snapshot converges."""
    env = _env(spark)
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(env.filter(F.col("event_seq") % 3 == 0), lake)

    attempts = []

    def interloper(attempt):
        attempts.append(attempt)
        if attempt == 0:
            M.merge_batch_into_lake(
                env.filter(F.col("event_seq") % 3 == 2).withColumn(
                    "origin", F.lit("replica-b")
                ),
                lake,
                extra_cols=("origin",),
            )

    M.merge_batch_optimistic(
        _with_shard(env.filter(F.col("event_seq") % 3 == 1)),
        lake,
        extra_cols=("shard",),
        _race_hook=interloper,
    )
    assert attempts == [0, 1]  # epoch change forced a recompute
    m = M._read_manifest(lake)
    assert [c["name"] for c in m["columns"]] == ["origin", "shard"]
    live = M.read_lake_snapshot(spark, lake)
    assert {"origin", "shard"} <= set(live.columns)
    # every row carries exactly its winning batch's attribution
    for r in live.select("last_seq", "origin", "shard").collect():
        assert (r["origin"] == "replica-b") == (r["last_seq"] % 3 == 2)
        assert (r["shard"] is not None) == (r["last_seq"] % 3 == 1)


def test_compaction_and_point_read_preserve_evolved_schema(spark, tmp_path):
    env = _env(spark)
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(env.filter(F.col("event_seq") % 2 == 0), lake, retain_versions=4)
    M.merge_batch_into_lake(
        _with_shard(env.filter(F.col("event_seq") % 2 == 1)),
        lake,
        retain_versions=4,
        extra_cols=("shard",),
    )
    before = _snap(spark, lake, CORE + ["shard"])
    res = M.compact_lake(spark, lake, target_files_per_bucket=0, retain_versions=4)
    assert res["compacted_buckets"] > 0
    assert _snap(spark, lake, CORE + ["shard"]) == before  # physical-only
    key = M.read_lake_snapshot(spark, lake).select("entity_id").first()[0]
    pr = M.lake_point_read(spark, lake, [key])
    assert "shard" in pr.columns and pr.count() == 1


def test_partial_bucket_evolution_preserves_values(spark, tmp_path):
    """Regression (round-9 review): a partial-bucket evolution leaves
    the manifest pointing at a MIX of pre- and post-evolution commit
    dirs. Default parquet schema inference samples ONE file — if it
    sampled an old file the accreted column vanished from the
    relation schema and _align_extras null-filled REAL values (and
    the next merge's read-modify-write persisted the loss). The
    evolved read path must use mergeSchema so every epoch's columns
    survive, in reads, point reads and across later merges."""

    def wide(spark, lo, hi):
        return spark.range(lo, hi).select(
            F.format_string("k%04d", F.col("id")).alias("pk"),
            F.col("id").alias("event_seq"),
            F.timestamp_seconds(F.col("id") * 3600 + 1_700_000_000)
            .cast("timestamp_ntz")
            .alias("ts"),
            F.lit("insert").alias("type"),
            F.format_string("p-%04d", F.col("id")).alias("item"),
        )

    lake = str(tmp_path / "lake")
    # v1: 64 entities across all 8 buckets, pre-evolution
    M.merge_batch_into_lake(wide(spark, 0, 64), lake, n_buckets=8, retain_versions=4)
    # v2: ONE entity (one bucket) declares the accreted column
    M.merge_batch_into_lake(
        wide(spark, 64, 65).withColumn("shard", F.lit(7).cast("bigint")),
        lake,
        n_buckets=None,
        retain_versions=4,
        extra_cols=("shard",),
    )
    m = M._read_manifest(lake)
    evolved_buckets = sum(1 for v in m["data_versions"].values() if v == 2)
    assert 0 < evolved_buckets < m["n_buckets"]  # genuinely partial
    snap = M.read_lake_snapshot(spark, lake)
    assert [r["shard"] for r in snap.filter("entity_id = 'k0064'").collect()] == [7]
    assert snap.filter(F.col("shard").isNotNull()).count() == 1
    # the value survives a later merge's read-modify-write
    M.merge_batch_into_lake(wide(spark, 100, 101), lake, n_buckets=None, retain_versions=4)
    assert [
        r["shard"]
        for r in M.read_lake_snapshot(spark, lake)
        .filter("entity_id = 'k0064'")
        .collect()
    ] == [7]
    # ... and through the pruned point-read path
    assert [
        r["shard"] for r in M.lake_point_read(spark, lake, ["k0064"]).collect()
    ] == [7]


def test_extra_cols_reject_writer_internal_names(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env = _with_shard(_env(spark))
    for bad in ("pb", "__z"):
        with pytest.raises(ValueError, match="writer-internal"):
            M.merge_batch_into_lake(
                env.withColumn(bad, F.lit(1)), lake, extra_cols=(bad,)
            )


# ---------------------------------------------------------------------------
# Type widening (VERDICT r9 #4): int→bigint / float→double / decimal
# precision growth are declared-safe epoch changes; everything else
# still raises. Old files read UP under the explicit epoch schema.
# ---------------------------------------------------------------------------


def _amount_env(spark, n, seq0, dtype, bump=0):
    return spark.range(n).select(
        F.format_string("w%03d", F.col("id")).alias("pk"),
        (F.col("id") + seq0).alias("event_seq"),
        F.timestamp_seconds(F.col("id") * 60 + 1_700_000_000 + seq0)
        .cast("timestamp_ntz")
        .alias("ts"),
        F.lit("insert").alias("type"),
        F.lit("x").alias("item"),
        (F.col("id") * 3 + F.lit(bump)).cast(dtype).alias("amount"),
    )


def test_widening_epoch_reads_old_files_up_and_time_travels_narrow(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _amount_env(spark, 20, 0, "int"), lake, n_buckets=4,
        retain_versions=4, extra_cols=("amount",),
    )
    M.merge_batch_into_lake(
        _amount_env(spark, 20, 1000, "bigint", bump=5_000_000_000), lake,
        n_buckets=None, retain_versions=4, extra_cols=("amount",),
    )
    m = M._read_manifest(lake)
    assert m["columns"] == [{"name": "amount", "type": "bigint"}]
    live = M.read_lake_snapshot(spark, lake)
    assert dict(live.dtypes)["amount"] == "bigint"
    # batch-1 files are physically int32; the explicit epoch schema
    # reads them up (mergeSchema would fail outright on mixed widths)
    assert live.agg(F.max("amount")).first()[0] > 5_000_000_000
    assert live.count() == 20  # LWW: batch 2's higher (ts, seq) wins
    # pre-widening version keeps ITS OWN narrower epoch
    v1 = M.read_lake_snapshot(spark, lake, version=1)
    assert dict(v1.dtypes)["amount"] == "int"
    assert v1.count() == 20


def test_narrower_batch_casts_up_without_a_new_epoch(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _amount_env(spark, 10, 0, "bigint"), lake, n_buckets=4,
        retain_versions=4, extra_cols=("amount",),
    )
    M.merge_batch_into_lake(
        _amount_env(spark, 10, 100, "int"), lake, n_buckets=None,
        retain_versions=4, extra_cols=("amount",),
    )
    m = M._read_manifest(lake)
    assert m["columns"] == [{"name": "amount", "type": "bigint"}]  # unchanged
    assert dict(M.read_lake_snapshot(spark, lake).dtypes)["amount"] == "bigint"


def test_float_and_decimal_widening_chains(spark, tmp_path):
    lake = str(tmp_path / "lake")
    env1 = _amount_env(spark, 8, 0, "float").withColumn(
        "price", F.lit(1.25).cast("decimal(5,2)")
    )
    M.merge_batch_into_lake(
        env1, lake, n_buckets=4, retain_versions=4, extra_cols=("amount", "price")
    )
    env2 = _amount_env(spark, 8, 50, "double").withColumn(
        "price", F.lit(123456.75).cast("decimal(12,2)")
    )
    M.merge_batch_into_lake(
        env2, lake, n_buckets=None, retain_versions=4, extra_cols=("amount", "price")
    )
    m = M._read_manifest(lake)
    assert m["columns"] == [
        {"name": "amount", "type": "double"},
        {"name": "price", "type": "decimal(12,2)"},
    ]
    live = M.read_lake_snapshot(spark, lake)
    assert live.count() == 8
    assert live.filter("price = 123456.75").count() == 8
    # decimal SCALE change is not a widening (values would shift)
    env3 = _amount_env(spark, 4, 90, "double").withColumn(
        "price", F.lit(1.5).cast("decimal(12,4)")
    )
    with pytest.raises(ValueError, match="only safe widenings"):
        M.merge_batch_into_lake(
            env3, lake, n_buckets=None, retain_versions=4,
            extra_cols=("amount", "price"),
        )


def test_widening_conflicts_a_staged_occ_merge(spark, tmp_path):
    """A widening is an epoch change like accretion: an optimistic
    merge staged against the narrow manifest must recompute."""
    lake = str(tmp_path / "lake")
    M.merge_batch_into_lake(
        _amount_env(spark, 12, 0, "int"), lake, n_buckets=4,
        retain_versions=4, extra_cols=("amount",),
    )
    base = M._read_manifest(lake)
    M.merge_batch_into_lake(
        _amount_env(spark, 12, 500, "bigint"), lake, n_buckets=None,
        retain_versions=4, extra_cols=("amount",),
    )
    cur = M._read_manifest(lake)
    assert M._occ_conflicts(base, cur, [0], base["n_buckets"])
