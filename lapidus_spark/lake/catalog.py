"""Multi-table transactional commits — the CATALOG plane.

The reference assembles per-TRANSACTION batches spanning tables and
emits them atomically (``DatabaseTransaction``, src/postgresql.js:
487-501: items in statement order, one ``transaction`` event at
commit). The per-table lake gives atomicity per TABLE only; this
module carries the reference's per-tx atomicity to the lake
(VERDICT r9 #6): one catalog commit references N table versions, and
a reader resolving THROUGH the catalog gets a tx-consistent snapshot
across tables — it can never see table A's half of a transaction
without table B's.

Layout — a catalog directory containing one ordinary lake per table
plus its own tiny metadata plane::

    catalog_dir/
      <table>/...                 ordinary lakes (own commit logs)
      _catalog_log/<v>.json       {"version", "txid", "tables": {t: v}}
      _lapidus_catalog.json       pointer {"version", "txid"}

Commit protocol (single ordered writer, like the reference's one
replication stream; the catalog lock enforces it):

1. merge each table's batch into ITS lake with the idempotence
   marker ``txn=("catalog", txid)`` — a replayed tx skips the Spark
   work outright (the lake's txn watermark), so crash replays are
   FREE, not merely correct;
2. write the catalog log entry — the FULL table→version map
   (metadata-sized: O(tables), like the reference's per-tx item
   list), fsynced;
3. atomically flip the catalog pointer. The rename IS the tx commit:
   a crash anywhere before it leaves the previous catalog version —
   and therefore the previous tx-consistent view of EVERY table —
   fully intact, even though some tables' own pointers already
   advanced (their new versions are simply not catalog-visible, the
   same not-yet-referenced posture as staged commit dirs).

Ordering contract: txids are committed strictly increasing by ONE
writer — the reference's stream order (``currentTxId ===
line.commit`` assertion, postgresql.js:463). A crashed tx must be
replayed (same txid) before the next txid commits; the source's
checkpointed offsets give exactly that order for free.

Retention contract (ENFORCED since round 11): a catalog version
references table versions, so a member table's retention floor must
never rise past the oldest version a retained catalog entry
references. Three guards make the contract structural instead of
documentary: per-commit GC clamps its floor to the catalog minimum
(``log._catalog_min_referenced``), an uncoordinated ``vacuum_lake``
on a member table REFUSES to cross a retained reference, and
``catalog_vacuum`` is the coordinated trim (catalog floor first —
the crash-safe direction — then per-table vacuums at
exactly-covering floors).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from . import log, merge, stats

from .log import CATALOG_LOG, CATALOG_POINTER  # noqa: E402 — shared with
# the retention guards in log/admin (bottom layer, no import cycle)

#: the per-table txn-marker app id all catalog commits share — one
#: watermark per lake, monotone in txid
CATALOG_APP = "catalog"


def _pointer_path(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, CATALOG_POINTER)


def _entry_path(catalog_dir: str, version: int) -> str:
    return os.path.join(catalog_dir, CATALOG_LOG, f"{version:010d}.json")


def read_catalog_pointer(catalog_dir: str) -> dict | None:
    try:
        with open(_pointer_path(catalog_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def catalog_entry(catalog_dir: str, version: int | None = None) -> dict:
    """The catalog's committed table→version map at ``version`` (live
    by default). Each entry is self-contained (full map), so
    resolution is ONE tiny JSON read — no delta replay."""
    pointer = read_catalog_pointer(catalog_dir)
    if pointer is None:
        raise ValueError(f"{catalog_dir} has no catalog pointer")
    v = int(pointer["version"]) if version is None else int(version)
    if v < 1 or v > int(pointer["version"]):
        raise ValueError(
            f"catalog at {catalog_dir} has no version {v} (live is "
            f"{pointer['version']})"
        )
    floor = int(pointer.get("floor", 1))
    if v < floor:
        raise ValueError(
            f"catalog version {v} at {catalog_dir} is below the retention "
            f"floor {floor} (catalog_vacuum reclaimed it); oldest readable "
            f"catalog version is {floor}"
        )
    with open(_entry_path(catalog_dir, v)) as f:
        return json.load(f)


def catalog_version_at(catalog_dir: str, ts) -> int:
    """Catalog-level TIMESTAMP AS OF (round 13): the NEWEST retained
    catalog version whose commit instant is <= ``ts`` — the catalog
    twin of ``lake_version_at``, so a tx-consistent multi-table
    snapshot is instant-addressable, not just version-addressable.
    ``ts`` is a unix-epoch float, a datetime (naive = UTC), or an ISO
    string. Driver-side entry-JSON reads only, O(retained). Fails
    fast when ``ts`` predates the oldest retained entry's stamp, or
    when the retained range predates stamps entirely (a catalog last
    committed before round 13 — commit one tx to stamp it)."""
    from datetime import datetime, timezone

    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    if isinstance(ts, datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        ts = ts.timestamp()
    pointer = read_catalog_pointer(catalog_dir)
    if pointer is None:
        raise ValueError(f"{catalog_dir} has no catalog pointer")
    floor = int(pointer.get("floor", 1))
    live = int(pointer["version"])
    best, earliest = None, None
    for v in range(floor, live + 1):
        try:
            with open(_entry_path(catalog_dir, v)) as fh:
                at = json.load(fh).get("committed_at")
        except OSError:
            continue
        if at is None:
            continue
        at = float(at)
        if earliest is None or at < earliest:
            earliest = at
        if at <= ts and (best is None or v > best):
            best = v
    if best is None:
        if earliest is None:
            raise ValueError(
                f"catalog at {catalog_dir} has no stamped entries in its "
                "retained range (committed before commit instants existed); "
                "commit one transaction to stamp it, or pass catalogVersion"
            )
        raise ValueError(
            f"timestamp predates the oldest retained catalog entry of "
            f"{catalog_dir} (earliest resolvable instant: {earliest}); "
            "catalog_vacuum reclaimed anything older"
        )
    return best


def commit_multi_table_tx(
    catalog_dir: str,
    batches: dict[str, DataFrame],
    txid: int,
    retain_versions: int = 2,
    n_buckets: int | None = None,
) -> dict:
    """Commit one transaction's per-table batches atomically (see the
    module docstring for the protocol). Returns the committed catalog
    entry; a replayed txid (≤ the committed watermark) returns the
    LIVE entry without touching anything — the whole tx is idempotent
    end to end, markers included."""
    if isinstance(txid, bool) or not isinstance(txid, int) or txid < 1:
        raise ValueError(f"txid must be a positive int, got {txid!r}")
    if not batches:
        raise ValueError("commit_multi_table_tx needs at least one table batch")
    for t in batches:
        if not t or "/" in t or t.startswith("_"):
            raise ValueError(f"invalid table name {t!r}")
    os.makedirs(catalog_dir, exist_ok=True)
    lock = log._acquire_lock(catalog_dir, wait_s=log.LOCKED_WAIT_S)
    try:
        pointer = read_catalog_pointer(catalog_dir)
        last_txid = int(pointer["txid"]) if pointer else 0
        if txid <= last_txid:
            # replayed tx: already atomically visible — a re-commit
            # would double-apply nothing (markers) but would burn a
            # catalog version; skip outright
            return catalog_entry(catalog_dir)
        # 1. per-table merges, marker-idempotent. A crash mid-loop
        # leaves some tables advanced but NOT catalog-visible; the
        # replay's merges skip the done ones (free) and finish the
        # rest before the flip.
        for table in sorted(batches):
            merge.merge_batch_into_lake(
                batches[table],
                os.path.join(catalog_dir, table),
                n_buckets=n_buckets,
                retain_versions=retain_versions,
                txn=(CATALOG_APP, txid),
            )
        # 2. the tx-consistent map: every table this catalog has ever
        # committed, at its current version (tables untouched by this
        # tx carry forward — their versions did not move: the catalog
        # lock is the single writer for every table under it)
        prev_tables = catalog_entry(catalog_dir)["tables"] if pointer else {}
        tables = dict(prev_tables)
        for table in batches:
            m = log._read_manifest(os.path.join(catalog_dir, table))
            if m is None:
                # an all-empty batch for a table never written before:
                # the merge touched no buckets and created no manifest,
                # so there is no version to reference — refuse clearly
                # (the sibling tables' merges are marker-idempotent;
                # re-running the tx with a non-empty batch is safe)
                raise ValueError(
                    f"transaction {txid}: table {table!r} has no committed "
                    "version to reference — its batch was empty and the "
                    "table does not exist yet; drop the table from the tx "
                    "or give it at least one row"
                )
            tables[table] = int(m["version"])
        version = (int(pointer["version"]) if pointer else 0) + 1
        # wall-clock commit instant (round 13, VERDICT r12 stretch):
        # catalog-level TIMESTAMP AS OF resolves through these — the
        # same strictly-increasing µs-rounded stamp rule as table
        # commits (catalog entries serialize under the catalog lock)
        prev_at = None
        if pointer:
            try:
                prev_at = catalog_entry(catalog_dir).get("committed_at")
            except (OSError, ValueError):
                prev_at = None
        entry = {
            "version": version,
            "txid": int(txid),
            "tables": tables,
            "committed_at": log._next_commit_stamp(prev_at),
        }
        os.makedirs(os.path.join(catalog_dir, CATALOG_LOG), exist_ok=True)
        log._atomic_write_json(_entry_path(catalog_dir, version), entry, sync_dir=True)
        # 3. THE tx commit point (crash tests SIGKILL here: the tx
        # must be all-or-nothing across tables at this exact rename)
        log._failpoint("catalog.before_flip")
        flipped = {"version": version, "txid": int(txid)}
        if pointer and "floor" in pointer:
            flipped["floor"] = int(pointer["floor"])  # carry the vacuum floor
        log._atomic_write_json(
            _pointer_path(catalog_dir), flipped, sync_dir=True
        )
        return entry
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def read_catalog_table(
    spark, catalog_dir: str, table: str, catalog_version: int | None = None
) -> DataFrame:
    """Tx-consistent read: resolve ``table`` through the catalog's
    committed map (live or a retained earlier catalog version) and
    time-travel the table's own lake to exactly that version. Two
    tables read under the SAME catalog version always observe the
    same transactions — the reader-side half of the atomicity
    contract."""
    entry = catalog_entry(catalog_dir, catalog_version)
    if table not in entry["tables"]:
        raise ValueError(
            f"catalog at {catalog_dir} (version {entry['version']}) has no "
            f"table {table!r}; tables: {sorted(entry['tables'])}"
        )
    return stats.read_lake_snapshot(
        spark, os.path.join(catalog_dir, table), version=entry["tables"][table]
    )


def catalog_changes(
    spark, catalog_dir: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Tx-consistent multi-table change feed — the CDF analog of
    ``read_catalog_table``: what changed in EVERY table between two
    catalog versions, with a ``tbl`` discriminator column. Each
    table diffs between ITS catalog-mapped versions via
    ``lake_changes`` (all the usual stamp-refined bucket pruning
    applies per table), so the combined frame is exactly the diff of
    two tx-consistent snapshots: a consumer folding it can never
    apply table A's half of a transaction without table B's — the
    per-table feeds, consumed independently, cannot promise that.

    ``from_version=0`` is from-empty (every table's first snapshot
    arrives as inserts). A table first committed between the two
    catalog versions diffs from empty; tables are never dropped, so
    the to-entry's table set is always a superset."""
    entry_to = catalog_entry(catalog_dir, to_version)
    if from_version < 0:
        raise ValueError(
            f"catalog_changes: from_version must be >= 0 (0 = from empty), "
            f"got {from_version}"
        )
    if from_version > int(entry_to["version"]):
        # inverted bounds would invert the per-table diffs (inserts and
        # deletes swapped) AND drop tables present only in the from
        # entry — the documented superset assumption reversed, silently
        raise ValueError(
            f"catalog_changes: from_version ({from_version}) > to_version "
            f"({entry_to['version']}) — the feed runs forward; swap the bounds"
        )
    entry_from = (
        catalog_entry(catalog_dir, from_version)
        if from_version >= 1
        else {"tables": {}}
    )
    from pyspark.sql import functions as F

    parts = []
    for table in sorted(entry_to["tables"]):
        ch = stats.lake_changes(
            spark,
            os.path.join(catalog_dir, table),
            from_version=int(entry_from["tables"].get(table, 0)),
            to_version=int(entry_to["tables"][table]),
        )
        parts.append(ch.select(F.lit(table).alias("tbl"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def describe_catalog_history(catalog_dir: str) -> list[dict]:
    """One row per committed catalog version, newest first — the
    tx-level DESCRIBE HISTORY."""
    pointer = read_catalog_pointer(catalog_dir)
    if pointer is None:
        return []
    out = []
    floor = int(pointer.get("floor", 1))
    for v in range(int(pointer["version"]), floor - 1, -1):
        try:
            out.append(catalog_entry(catalog_dir, v))
        except FileNotFoundError:
            break
    return out


def catalog_vacuum(
    catalog_dir: str, retain_entries: int, dry_run: bool = False
) -> dict:
    """Coordinated retention trim — the ONLY safe way to shrink a
    catalog member table's history (VERDICT r10 #2). Raises the
    CATALOG floor to ``live - retain_entries + 1`` (older catalog
    entries stop being readable and their JSONs are reclaimed), then
    vacuums each member table down to exactly the versions the
    remaining entries reference: per table, retention becomes
    ``table_live - min_referenced + 1``.

    Ordering is the crash-safe direction: the catalog floor flips
    FIRST (atomic pointer rename), so at every instant the table
    versions on disk cover every catalog entry a reader can resolve —
    a crash between the flip and a table vacuum merely leaves extra
    retained table versions (wasted space, never a broken
    ``read_catalog_table``). Uncoordinated per-table ``vacuum_lake``
    calls that would cross a retained entry's reference are REFUSED
    by the table-side interlock; this op computes floors that pass it
    by construction.

    ``dry_run=True`` reports the planned floor and per-table
    retentions without mutating anything. Returns ``{"floor",
    "reclaimed_entries", "tables": {t: {"retain_versions",
    "min_referenced"}}, "dry_run"}``."""
    from . import admin

    if (
        isinstance(retain_entries, bool)
        or not isinstance(retain_entries, int)
        or retain_entries < 1
    ):
        raise ValueError(
            f"retain_entries must be a positive int, got {retain_entries!r}"
        )
    lock = log._acquire_lock(catalog_dir, wait_s=log.LOCKED_WAIT_S)
    try:
        pointer = read_catalog_pointer(catalog_dir)
        if pointer is None:
            raise ValueError(f"{catalog_dir} has no catalog pointer")
        live = int(pointer["version"])
        old_floor = int(pointer.get("floor", 1))
        new_floor = max(old_floor, live - retain_entries + 1)
        retained = [catalog_entry(catalog_dir, v) for v in range(new_floor, live + 1)]
        plan = {}
        for table in sorted(retained[-1]["tables"]):
            refs = [
                int(e["tables"][table]) for e in retained if table in e["tables"]
            ]
            min_ref = min(refs)
            m = log._read_manifest(os.path.join(catalog_dir, table))
            table_live = int(m["version"])
            plan[table] = {
                "retain_versions": table_live - min_ref + 1,
                "min_referenced": min_ref,
            }
        if dry_run:
            return {
                "floor": new_floor,
                "reclaimed_entries": new_floor - old_floor,
                "tables": plan,
                "dry_run": True,
            }
        # 1. the catalog floor flips first (see docstring ordering)
        flipped = dict(pointer)
        flipped["floor"] = new_floor
        log._atomic_write_json(_pointer_path(catalog_dir), flipped, sync_dir=True)
        # 2. reclaim the below-floor entry JSONs (metadata files)
        for v in range(old_floor, new_floor):
            try:
                os.remove(_entry_path(catalog_dir, v))
            except FileNotFoundError:
                pass
        # 3. per-table vacuums, floors that cover every retained entry
        for table, p in plan.items():
            admin.vacuum_lake(
                os.path.join(catalog_dir, table),
                retain_versions=p["retain_versions"],
            )
        return {
            "floor": new_floor,
            "reclaimed_entries": new_floor - old_floor,
            "tables": plan,
            "dry_run": False,
        }
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass
