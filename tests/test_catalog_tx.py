"""Multi-table transactional commits (VERDICT r9 #6) — the catalog
plane carries the reference's per-tx atomicity (DatabaseTransaction,
src/postgresql.js:487-501) to the lake: one atomic catalog pointer
references N table versions, and a reader resolving through the
catalog can never see table A's half of a transaction without table
B's. This file pins the commit protocol, the reader contract, the
idempotent replay, and — via SIGKILLed subprocess drivers — the two
crash windows: mid-tx (after A's own lake committed, before B's) and
post-merges pre-flip.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

import lapidus_spark.lake.catalog as C
import lapidus_spark.streaming.materialize as M
from lapidus_spark.sources.tables import load_table
from tests.conftest import SF_DIR

TABLES = ("by_user", "by_type")


def _halves(spark, mod, rem):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") % mod == rem)

    def env(pk_col):
        return ev.select(
            F.col(pk_col).cast("string").alias("pk"),
            F.col("event_id").alias("event_seq"),
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            F.lit("update").alias("type"),
            F.col("props").alias("item"),
        )

    return {"by_user": env("user_id"), "by_type": env("event_type")}


def _catalog_rows(spark, cat, table, version=None):
    return sorted(
        tuple(r)
        for r in C.read_catalog_table(spark, cat, table, version)
        .select("entity_id", "last_seq", "item")
        .collect()
    )


def _commit(spark, cat, txid, mod, rem):
    return C.commit_multi_table_tx(
        cat, _halves(spark, mod, rem), txid=txid, retain_versions=4, n_buckets=4
    )


def test_catalog_commit_reader_and_time_travel(spark, tmp_path):
    cat = str(tmp_path / "cat")
    e1 = _commit(spark, cat, 1, 2, 0)
    assert e1.pop("committed_at") > 0  # r13: entries stamp commit instants
    assert e1 == {"version": 1, "txid": 1, "tables": {"by_type": 1, "by_user": 1}}
    v1 = {t: _catalog_rows(spark, cat, t) for t in TABLES}
    e2 = _commit(spark, cat, 2, 2, 1)
    assert e2["version"] == 2 and e2["tables"] == {"by_type": 2, "by_user": 2}
    # live reads see both transactions; catalog version 1 still reads
    # the tx-1-only state of BOTH tables (tx-consistent time travel)
    for t in TABLES:
        assert _catalog_rows(spark, cat, t, version=1) == v1[t]
        assert _catalog_rows(spark, cat, t) != v1[t]
    hist = C.describe_catalog_history(cat)
    assert [h["txid"] for h in hist] == [2, 1]
    # facade re-exports the whole catalog surface
    assert M.read_catalog_pointer(cat)["txid"] == 2


def test_inflight_table_half_is_invisible_through_the_catalog(spark, tmp_path):
    """The core atomicity property, no crash needed: a table's OWN
    lake advancing (tx half merged, catalog not yet flipped) changes
    nothing for catalog readers."""
    cat = str(tmp_path / "cat")
    _commit(spark, cat, 1, 2, 0)
    before = _catalog_rows(spark, cat, "by_user")
    # tx 2's by_user half lands in the table's lake DIRECTLY
    M.merge_batch_into_lake(
        _halves(spark, 2, 1)["by_user"],
        os.path.join(cat, "by_user"),
        n_buckets=None,
        retain_versions=4,
    )
    direct = sorted(
        tuple(r)
        for r in M.read_lake_snapshot(spark, os.path.join(cat, "by_user"))
        .select("entity_id", "last_seq", "item")
        .collect()
    )
    assert direct != before  # the half IS in the table (LWW winners moved)
    assert _catalog_rows(spark, cat, "by_user") == before  # not in the catalog


def test_replayed_txid_is_a_free_noop(spark, tmp_path):
    cat = str(tmp_path / "cat")
    _commit(spark, cat, 1, 2, 0)
    e = _commit(spark, cat, 2, 2, 1)
    want = {t: _catalog_rows(spark, cat, t) for t in TABLES}
    # replay both txids out of a restarted source: nothing moves
    assert _commit(spark, cat, 1, 2, 0) == e
    assert _commit(spark, cat, 2, 2, 1) == e
    assert C.read_catalog_pointer(cat) == {"version": 2, "txid": 2}
    for t in TABLES:
        assert M._read_manifest(os.path.join(cat, t))["version"] == 2
        assert _catalog_rows(spark, cat, t) == want[t]


def test_validation(spark, tmp_path):
    cat = str(tmp_path / "cat")
    with pytest.raises(ValueError, match="positive int"):
        C.commit_multi_table_tx(cat, _halves(spark, 2, 0), txid=0)
    with pytest.raises(ValueError, match="at least one table"):
        C.commit_multi_table_tx(cat, {}, txid=1)
    with pytest.raises(ValueError, match="invalid table name"):
        C.commit_multi_table_tx(cat, {"_catalog_log": None}, txid=1)
    _commit(spark, cat, 1, 2, 0)
    with pytest.raises(ValueError, match="no table"):
        C.read_catalog_table(spark, cat, "nope")


def _run_driver(cat, txid, mod, rem, failpoint=None):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_DRIVER_MEMORY="2g", PYTHONPATH=repo_root)
    if failpoint:
        env["LAPIDUS_FAILPOINT"] = failpoint
    else:
        env.pop("LAPIDUS_FAILPOINT", None)
    return subprocess.run(
        [
            sys.executable,
            "tests/catalog_crash_driver.py",
            cat,
            SF_DIR,
            str(txid),
            str(mod),
            str(rem),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


@pytest.mark.parametrize(
    "failpoint",
    [
        # kill AFTER table A's own lake flipped, BEFORE table B's —
        # the window where per-table atomicity alone would expose
        # half a transaction (tables merge in sorted order, so flip 2
        # of the tx is by_user's; by_type committed, by_user did not)
        "lake_merge.before_manifest_flip:2",
        # kill after BOTH tables committed, before the catalog flip
        "catalog.before_flip",
    ],
)
def test_sigkill_never_exposes_half_a_transaction(spark, tmp_path, failpoint):
    cat = str(tmp_path / "cat")
    p = _run_driver(cat, 1, 2, 0)
    assert "TX_OK" in p.stdout, p.stderr[-2000:]
    before = {t: _catalog_rows(spark, cat, t) for t in TABLES}

    p = _run_driver(cat, 2, 2, 1, failpoint=failpoint)
    assert p.returncode == -signal.SIGKILL, (p.returncode, p.stderr[-1500:])
    # NO reader through the catalog sees any of tx 2 — even though
    # (in the mid-tx case) one table's own lake already advanced
    assert C.read_catalog_pointer(cat) == {"version": 1, "txid": 1}
    for t in TABLES:
        assert _catalog_rows(spark, cat, t) == before[t]

    # replay the killed tx (same txid, the source's redelivery): the
    # already-committed halves skip via their markers, the rest
    # complete, and the flip publishes the WHOLE tx
    p = _run_driver(cat, 2, 2, 1)
    assert "TX_OK" in p.stdout, p.stderr[-2000:]
    assert C.read_catalog_pointer(cat)["txid"] == 2
    for t in TABLES:
        after = _catalog_rows(spark, cat, t)
        assert after != before[t]
    # both tables observed tx 2 under ONE catalog version
    entry = C.catalog_entry(cat)
    assert set(entry["tables"]) == set(TABLES)


def test_empty_batch_for_unknown_table_raises_clearly(spark, tmp_path):
    """Regression (round-10 review): an all-empty batch for a table
    never written before has no version to reference — the tx must
    refuse with a named-table error, not a TypeError off a missing
    manifest (the sibling merges are marker-idempotent, so re-running
    the tx with a non-empty batch is safe)."""
    cat = str(tmp_path / "cat")
    halves = _halves(spark, 2, 0)
    halves["by_type"] = halves["by_type"].filter(F.lit(False))
    with pytest.raises(ValueError, match="'by_type' has no committed version"):
        C.commit_multi_table_tx(cat, halves, txid=1, retain_versions=4, n_buckets=4)


def test_catalog_changes_spans_tables_tx_consistently(spark, tmp_path):
    """catalog_changes diffs every table between its catalog-mapped
    versions: from-empty yields each table's full v1 snapshot as
    inserts, the v1->v2 step yields exactly the keys the second tx
    moved in EITHER table, and a table first committed between the
    endpoints diffs from empty."""
    cat = str(tmp_path / "cat")
    _commit(spark, cat, 1, 2, 0)
    # tx 2 adds a THIRD table alongside the odd halves
    halves = _halves(spark, 2, 1)
    halves["by_day"] = halves["by_user"].withColumn(
        "pk", F.concat(F.lit("d"), F.col("pk"))
    )
    C.commit_multi_table_tx(cat, halves, txid=2, retain_versions=4, n_buckets=4)

    full = C.catalog_changes(spark, cat, from_version=0, to_version=1)
    assert set(r["tbl"] for r in full.select("tbl").distinct().collect()) == {
        "by_user", "by_type",  # by_day does not exist at catalog v1
    }
    assert full.filter(F.col("change_type") != "insert").count() == 0
    assert full.filter(F.col("tbl") == "by_user").count() == len(
        _catalog_rows(spark, cat, "by_user", version=1)
    )

    step = C.catalog_changes(spark, cat, from_version=1, to_version=2)
    by_tbl = {
        r["tbl"]: r["n"]
        for r in step.groupBy("tbl").agg(F.count("*").alias("n")).collect()
    }
    # the new table arrives whole, as inserts
    assert by_tbl["by_day"] == len(_catalog_rows(spark, cat, "by_day", version=2))
    assert (
        step.filter((F.col("tbl") == "by_day") & (F.col("change_type") != "insert")).count()
        == 0
    )
    # the pre-existing tables emit exactly the keys tx 2 moved
    for t in TABLES:
        v1 = dict(
            (e, s) for e, s, _ in _catalog_rows(spark, cat, t, version=1)
        )
        v2 = dict(
            (e, s) for e, s, _ in _catalog_rows(spark, cat, t, version=2)
        )
        moved = {e for e, s in v2.items() if v1.get(e) != s}
        got = {
            r["entity_id"]
            for r in step.filter(F.col("tbl") == t).select("entity_id").collect()
        }
        assert got == moved

    with pytest.raises(ValueError, match="from_version must be >= 0"):
        C.catalog_changes(spark, cat, from_version=-1)


def test_cli_catalog_history(spark, tmp_path, capsys):
    import json as _json

    from lapidus_spark.__main__ import main

    cat = str(tmp_path / "cat")
    _commit(spark, cat, 1, 2, 0)
    _commit(spark, cat, 2, 2, 1)
    assert main(["--catalog-history", cat]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [r["version"] for r in rows] == [2, 1]
    assert rows[0]["txid"] == 2 and set(rows[0]["tables"]) == set(TABLES)


def test_catalog_changes_rejects_inverted_bounds(spark, tmp_path):
    """Regression (round-10 advice): inverted bounds used to produce a
    silently REVERSED diff (inserts/deletes swapped through the
    full-outer join) and dropped tables present only in the from
    entry — they must raise, in the catalog feed and the per-table
    feed alike."""
    cat = str(tmp_path / "cat")
    _commit(spark, cat, 1, 2, 0)
    _commit(spark, cat, 2, 2, 1)
    with pytest.raises(ValueError, match="from_version \\(2\\) > to_version"):
        C.catalog_changes(spark, cat, from_version=2, to_version=1)
    with pytest.raises(ValueError, match="change feeds run forward"):
        M.lake_changes(
            spark, os.path.join(cat, "by_user"), from_version=2, to_version=1
        )
