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


def snapshot_stream(envelopes: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """Incremental last-write-wins state per entity over the envelope
    stream (same semantics as the batch win_cdc_snapshot query,
    including delete tombstones — kept so the sink can purge).
    ``extra_cols`` carries additional envelope attributes into the
    snapshot row alongside the core five — the lake's schema-evolution
    path (the winning event's values ride the same max_by)."""
    return envelopes.groupBy(F.col("pk").alias("entity_id")).agg(
        F.max_by(
            F.struct("event_seq", "ts", "type", "item", *extra_cols),
            F.struct("ts", "event_seq"),
        ).alias("last")
    ).select(
        "entity_id",
        F.col("last.event_seq").alias("last_seq"),
        F.col("last.ts").alias("last_ts"),
        F.col("last.type").alias("last_type"),
        F.col("last.item").alias("item"),
        *[F.col(f"last.{c}").alias(c) for c in extra_cols],
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
#: under a table once written — the manifest persists it and
#: ``merge_batch_into_lake`` raises on mismatch); it is the knob that
#: makes merge cost proportional to the BATCH, not the table: a batch
#: touching k of B buckets reads+rewrites k·(table/B) — size B so
#: that a typical batch's keys land in a small fraction of buckets
#: (experiments/merge_scaling.py measures the curve). 8 suits the
#: ~6k-entity replay fixture; a 100 TB table wants 10^4-10^5.
MERGE_LAKE_BUCKETS = 8

#: the lake's commit POINTER — a tiny JSON file (format 2: just
#: ``{"format": 2, "version": V, "floor": F}``) flipped atomically
#: (tmp + fsync + rename). The rename IS the commit: readers and the
#: merge's own read-back resolve data through it, so files not yet
#: named by a committed version do not exist as far as the table is
#: concerned. The resolved manifest CONTENT (bucket pointers, stamps,
#: zone maps) lives in the incremental commit log under ``_log/`` —
#: see ``LOG_DIR`` — so the per-commit metadata write is O(touched
#: buckets), never O(all buckets + all files). Format-1 lakes (the
#: pre-round-9 monolithic manifest, the full content in this file)
#: remain readable and upgrade in place on their next commit.
MANIFEST_NAME = "_lapidus_manifest.json"

#: the incremental commit log (Delta's ``_delta_log`` analog): one
#: ``<version>.json`` DELTA entry per commit — only the touched
#: bucket pointers, their dataChange stamps, and any file stats for
#: exactly those buckets — plus a periodic ``<version>.checkpoint
#: .json`` holding the fully-resolved manifest (every
#: ``CHECKPOINT_EVERY``-th version, and always at version 1 /
#: at a format-1 migration base). A reader resolves version V from
#: the newest checkpoint ≤ V plus ≤CHECKPOINT_EVERY small delta
#: replays. This is what makes the metadata plane scale: at 10^5
#: buckets / 10^6 files, a commit writes bytes proportional to the
#: BATCH (touched buckets), the pointer flip stays one tiny rename,
#: and only every K-th commit pays the amortized full checkpoint.
LOG_DIR = "_log"
CHECKPOINT_EVERY = 8

#: write-side name of the bucket partition column. partitionBy drops
#: its column from the data files, and readers resolve bucket dirs
#: directly from the manifest (no partition-inference root), so the
#: merge writes the bucket TWICE: as data column ``bucket`` (survives
#: in the files) and as partition column ``pb`` (drives the one-job
#: split into per-bucket directories).
_PARTITION_COL = "pb"

#: committed manifests are retained under ``_history/<version>.json``
#: (written right after each successful flip), which is what makes
#: the lake a VERSIONED table: ``read_lake_snapshot(version=N)`` is
#: time travel and ``lake_changes`` is a change-data-feed between two
#: versions — both resolved purely through manifests, reading only
#: the buckets whose pointers differ. ``retain_versions`` on the
#: merge governs how many versions' data directories GC keeps (1 =
#: live only, today's default; history JSON beyond the horizon is
#: pruned too, so an unretained version fails fast and explicitly).
HISTORY_DIR = "_history"

#: single-writer guard: the merge takes a lock file for the duration
#: of a commit, published via os.link of a pre-written body (atomic
#: create-with-content — no reader can see a torn lock) with the
#: holder's pid recorded, so a crashed holder's lock is detected as
#: stale (dead pid, same host) and broken by an atomic tombstone
#: rename (one winner among racing breakers). Cross-host writers on
#: shared storage cannot check liveness and fail closed; that
#: deployment wants a real table format's commit service or an
#: external lock.
LOCK_NAME = "_lapidus_lock.json"

#: fault-injection point for crash tests: set the env var
#: LAPIDUS_FAILPOINT=<name>[:<nth>] in a *subprocess* and the process
#: SIGKILLs itself at the nth traversal of that failpoint — a genuine
#: kill-mid-commit, not an exception the code could catch.
_FAILPOINT_HITS: dict[str, int] = {}


class ConcurrentMergeError(RuntimeError):
    """Another live writer holds the lake's merge lock."""


class CommitConflictError(RuntimeError):
    """An optimistic merge lost every retry to concurrent commits
    that data-changed its buckets (or to a held flip lock)."""


#: process-level OCC outcome counters (observability for multi-writer
#: deployments and the two-daemon E2E test): a CONFLICT is a staged
#: merge dropped and recomputed because a concurrent commit
#: data-changed its buckets (a real lost race); a REBASE is a flip
#: applied onto a manifest that moved under the staging without
#: touching this merge's buckets' content (the cheap win).
OCC_CONFLICTS = 0
OCC_REBASES = 0


#: How long LOCKED writers (merge_batch_into_lake, compact_lake,
#: rebucket_lake) re-contend for the writer lock before raising
#: ConcurrentMergeError. Nonzero so a locked daemon's micro-batch
#: rides out an optimistic sibling's flip-lock hold (a JSON rename
#: plus GC, milliseconds) instead of dying on a transient — a LIVE
#: long holder (another locked writer mid-merge) still raises, just
#: after the wait. Streaming sinks rely on this: the CLI's
#: ``--optimistic`` contract is that a running locked daemon keeps
#: committing while an optimistic writer flips.
LOCKED_WAIT_S = 5.0

#: Unreferenced ``commits/`` dirs younger than this are NOT garbage:
#: an optimistic writer stages its commit directory BEFORE taking the
#: flip lock, so a concurrent committer's GC must leave fresh staged
#: dirs alone (a crashed writer's orphan ages past the grace and is
#: collected by any later commit — same shape as Delta VACUUM's
#: retention window protecting in-flight, not-yet-committed files).
GC_GRACE_SECONDS = 3600.0


def _failpoint(name: str) -> None:
    spec = os.environ.get("LAPIDUS_FAILPOINT", "")
    if not spec:
        return
    target, _, nth = spec.partition(":")
    if target != name:
        return
    _FAILPOINT_HITS[name] = _FAILPOINT_HITS.get(name, 0) + 1
    if _FAILPOINT_HITS[name] >= int(nth or "1"):
        import signal

        os.kill(os.getpid(), signal.SIGKILL)


def _read_pointer(lake_dir: str) -> dict | None:
    """Raw commit-pointer JSON: a format-2 pointer ``{format, version,
    floor}``, a format-1 FULL manifest (``buckets`` present), or None
    for a lake with no manifest yet."""
    try:
        with open(os.path.join(lake_dir, MANIFEST_NAME)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _delta_path(lake_dir: str, version: int) -> str:
    return os.path.join(lake_dir, LOG_DIR, f"{version:010d}.json")


def _checkpoint_path(lake_dir: str, version: int) -> str:
    return os.path.join(lake_dir, LOG_DIR, f"{version:010d}.checkpoint.json")


def _checkpoint_versions(lake_dir: str) -> list[int]:
    """Sorted versions with a checkpoint in ``_log/`` (driver-side
    listing, proportional to retained log entries)."""
    try:
        names = os.listdir(os.path.join(lake_dir, LOG_DIR))
    except FileNotFoundError:
        return []
    return sorted(
        int(n.split(".", 1)[0]) for n in names if n.endswith(".checkpoint.json")
    )


def _apply_delta(base: dict | None, delta: dict) -> dict:
    """Fold one commit-log delta entry onto a resolved manifest — THE
    definition of what a commit changes, shared by the writer (which
    derives the next live manifest from it) and readers (which replay
    deltas from a checkpoint). Only the delta's ``touched`` buckets'
    pointers / stamps / stats move; a ``replace_all`` delta (rebucket)
    starts the maps fresh because bucket ids change meaning."""
    version = delta["version"]
    replace_all = delta.get("replace_all", False)
    new_manifest: dict = {
        "format": 2,
        "version": version,
        "n_buckets": delta["n_buckets"],
        "buckets": {} if replace_all or base is None else dict(base["buckets"]),
    }
    if "committed_at" in delta:  # the version's own commit instant
        new_manifest["committed_at"] = delta["committed_at"]
    # the last-compaction record, the schema epoch, the constraint
    # set, the writer-txn watermarks and the clone provenance carry
    # through merges (a rebucket drops the compaction record: layout
    # changed; provenance stays — buckets may still reference the
    # source by absolute path, the dependency operators must track)
    if base is not None:
        if not replace_all and "compaction" in base:
            new_manifest["compaction"] = base["compaction"]
        for carried in ("columns", "constraints", "txns", "cloned_from"):
            if carried in base:
                new_manifest[carried] = base[carried]
    if delta.get("extra"):
        new_manifest.update(delta["extra"])
    if delta.get("txn"):
        # first-class MERGE into the map (never a wholesale replace
        # via extra): an optimistic REBASE applies this delta onto a
        # manifest that moved under the staging, and a sibling app's
        # watermark recorded in between must survive the flip
        app, txv = delta["txn"]
        txns = dict(new_manifest.get("txns", {}))
        txns[app] = txv
        new_manifest["txns"] = txns
    data_versions = (
        {} if replace_all or base is None else dict(base.get("data_versions", {}))
    )
    zone_maps = (
        {} if replace_all or base is None else dict(base.get("file_stats", {}))
    )
    for b, rel in delta["touched"].items():
        new_manifest["buckets"][b] = rel
        if delta["data_change"]:
            data_versions[b] = version
        zone_maps.pop(b, None)  # pointer moved: old stats are stale
    if delta.get("file_stats"):
        zone_maps.update(delta["file_stats"])
    new_manifest["data_versions"] = data_versions
    if zone_maps:
        new_manifest["file_stats"] = zone_maps
    return new_manifest


def _no_retained_version(lake_dir: str, version: int, live) -> ValueError:
    return ValueError(
        f"lake at {lake_dir} has no retained version {version} "
        f"(live is {live if live is not None else 'absent'}; older versions "
        "exist only inside the merge's retain_versions horizon)"
    )


def _resolve_version(
    lake_dir: str, pointer: dict, version: int, _retry: bool = True
) -> dict:
    """Resolve a committed version of a format-2 lake: newest
    checkpoint ≤ version, then replay the ≤CHECKPOINT_EVERY delta
    entries up to it. Versions below the pointer's retention ``floor``
    fail fast (their log entries and data are GC'd); versions from a
    migrated lake's format-1 era (older than the migration checkpoint)
    fall back to their retained ``_history/`` JSONs.

    Reader-vs-GC contract: the log is listed and read with no lock, so
    a concurrent committer's GC can prune entries a slightly-stale
    pointer still references. A missing entry therefore re-reads the
    pointer ONCE and re-resolves — if retention moved past the target,
    that surfaces as the honest retention error; only a miss that
    persists under the fresh pointer is reported as corruption."""
    live_v = int(pointer["version"])
    if version > live_v or version < 1:
        raise _no_retained_version(lake_dir, version, live_v)
    if version < int(pointer.get("floor", 1)):
        raise _no_retained_version(lake_dir, version, live_v)
    try:
        cp = max(
            (v for v in _checkpoint_versions(lake_dir) if v <= version), default=None
        )
        if cp is None:
            # format-1 era of a migrated lake: the full manifest was
            # retained under _history/ by the pre-migration commits
            with open(
                os.path.join(lake_dir, HISTORY_DIR, f"{version:010d}.json")
            ) as f:
                return json.load(f)
        with open(_checkpoint_path(lake_dir, cp)) as f:
            manifest = json.load(f)
        for v in range(cp + 1, version + 1):
            with open(_delta_path(lake_dir, v)) as f:
                manifest = _apply_delta(manifest, json.load(f))
    except FileNotFoundError as e:
        if _retry:
            fresh = _read_pointer(lake_dir)
            if fresh is not None and "buckets" not in fresh:
                return _resolve_version(lake_dir, fresh, version, _retry=False)
        raise ValueError(
            f"lake at {lake_dir}: commit log is missing an entry needed to "
            f"resolve version {version} ({e.filename}) — log corrupted "
            "(partial restore, manual deletion?)"
        ) from None
    return manifest


def _read_manifest(lake_dir: str) -> dict | None:
    """The LIVE resolved manifest (None when the lake has none):
    format-2 pointers resolve through the commit log (one checkpoint +
    ≤CHECKPOINT_EVERY small deltas — the Delta log/checkpoint read
    path); format-1 pointers ARE the manifest."""
    pointer = _read_pointer(lake_dir)
    if pointer is None or "buckets" in pointer:
        return pointer
    return _resolve_version(lake_dir, pointer, int(pointer["version"]))


def _manifest_at(lake_dir: str, version: int | None) -> dict | None:
    """Manifest for a specific committed version (None → live),
    resolved through the commit log (format 2) or ``_history/``
    (format 1); unretained versions fail fast and explicitly."""
    pointer = _read_pointer(lake_dir)
    if pointer is not None and "buckets" not in pointer:
        return _resolve_version(
            lake_dir, pointer, int(pointer["version"]) if version is None else version
        )
    live = pointer
    if version is None or (live is not None and live["version"] == version):
        return live
    path = os.path.join(lake_dir, HISTORY_DIR, f"{version:010d}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        raise _no_retained_version(
            lake_dir, version, live["version"] if live else None
        ) from None


def _atomic_write_json(path: str, obj: dict, sync_dir: bool = False) -> None:
    """The one stage-fsync-rename JSON writer: stage next to the
    target, fsync the bytes, one atomic ``os.replace``; with
    ``sync_dir`` also fsync the containing directory so the rename
    itself survives power loss (a SIGKILL can't lose a rename, but
    an unjournaled directory entry can). The staged temp is removed
    on any failure — no leaked ``.tmp`` files."""
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        if sync_dir:
            dfd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def _write_history(lake_dir: str, manifest: dict) -> None:
    """Record a just-committed manifest under ``_history/``. Runs
    AFTER the flip, so history ⊆ committed versions; a crash between
    flip and this write is healed by the next merge (which re-records
    the live manifest before building on it)."""
    hist = os.path.join(lake_dir, HISTORY_DIR)
    os.makedirs(hist, exist_ok=True)
    _atomic_write_json(
        os.path.join(hist, f"{manifest['version']:010d}.json"), manifest
    )


def _acquire_lock(lake_dir: str, wait_s: float = 0.0) -> str:
    """Take the single-writer merge lock, re-contending against LIVE
    holders for up to ``wait_s`` seconds (optimistic writers use this
    for the manifest flip — the critical section is a JSON rename,
    so a short bounded wait rides out another writer's flip instead
    of failing; the default 0 keeps the classic fail-fast posture).
    See ``_acquire_lock_once`` for the lock protocol itself."""
    import time

    deadline = time.monotonic() + wait_s
    while True:
        try:
            return _acquire_lock_once(lake_dir)
        except ConcurrentMergeError:
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.05)


def _acquire_lock_once(lake_dir: str) -> str:
    """Take the single-writer merge lock. The lock body is staged in
    a private temp file and PUBLISHED with ``os.link`` — atomic
    create-with-content, so a reader can never observe a torn or
    empty lock from a live writer (an unreadable lock is therefore
    always a crashed one). A lock whose recorded pid is dead on THIS
    host is stale (a SIGKILLed writer) and is broken by an atomic
    rename to a unique tombstone — of N racing breakers exactly one
    wins the rename, the losers see FileNotFoundError and re-contend
    on the link, so two writers can never both hold the lock. A live
    holder — or any holder on another host, whose liveness we cannot
    check — raises ``ConcurrentMergeError`` so writers never
    interleave read-back and flip (lost-update protection)."""
    import socket

    os.makedirs(lake_dir, exist_ok=True)
    path = os.path.join(lake_dir, LOCK_NAME)
    me = {"pid": os.getpid(), "host": socket.gethostname()}
    fd, tmp = tempfile.mkstemp(dir=lake_dir, suffix=".lock.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(me, f)
        for _attempt in range(3):
            try:
                os.link(tmp, path)
                return path
            except FileExistsError:
                try:
                    with open(path) as f:
                        holder = json.load(f)
                except (OSError, ValueError):
                    holder = None  # unreadable ⇒ crashed writer (see above)
                if holder is not None and holder.get("host") == me["host"]:
                    try:
                        os.kill(int(holder["pid"]), 0)
                        alive = True
                    except (ProcessLookupError, ValueError):
                        alive = False
                    except PermissionError:
                        alive = True
                    if alive:
                        raise ConcurrentMergeError(
                            f"lake at {lake_dir} is locked by live writer "
                            f"pid {holder['pid']} ({LOCK_NAME})"
                        ) from None
                elif holder is not None:
                    raise ConcurrentMergeError(
                        f"lake at {lake_dir} is locked by writer on host "
                        f"{holder.get('host')!r}; cross-host liveness is "
                        "unknowable on plain files — break the lock manually "
                        f"or use an external commit service ({LOCK_NAME})"
                    ) from None
                # stale: break via atomic rename (single winner), retry
                tomb = os.path.join(lake_dir, f"{LOCK_NAME}.stale.{os.getpid()}")
                try:
                    os.rename(path, tomb)
                    os.remove(tomb)
                except FileNotFoundError:
                    pass  # another breaker won the rename; re-contend
        raise ConcurrentMergeError(f"could not acquire {path}")
    finally:
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass


def _commit_manifest(lake_dir: str, pointer: dict) -> None:
    """THE commit point: stage the new commit POINTER next to the old
    one, fsync, one atomic ``os.replace``, then fsync the lake
    directory so the rename itself is journaled — without the
    directory fsync a power loss (not a mere crash) after the flip
    could resurrect the old pointer while the source has already
    acked the batch. Every byte of merged data AND every commit-log
    entry is written before this runs (data-file sync rides on
    Spark's committer / the filesystem; log entries are fsynced by
    ``_atomic_write_json``); a crash anywhere before the replace
    leaves the previous version — and therefore the previous table
    contents — fully intact, with any orphan log entries above it
    overwritten by the next committer."""
    _failpoint("lake_merge.before_manifest_flip")
    _atomic_write_json(
        os.path.join(lake_dir, MANIFEST_NAME), pointer, sync_dir=True
    )


#: substrings identifying a missing-input failure surfacing from the
#: JVM (Spark wraps the executor's FileNotFoundException in analysis /
#: Py4J error text) — the signature of the documented GC-vs-read race.
_MISSING_FILE_MARKERS = (
    "FileNotFoundException",
    "FILE_NOT_FOUND",
    "PATH_NOT_FOUND",
    "No such file",
    "does not exist",
)


def _is_missing_file_error(exc: BaseException) -> bool:
    """Is this the GC-vs-read race (a concurrent committer collected
    files the unlocked staging was reading)? Only such failures are
    worth retrying against a fresh manifest — a deterministic staging
    failure (schema bug, bad input) must surface immediately instead
    of burning retries and masquerading as a commit conflict."""
    if isinstance(exc, FileNotFoundError):
        return True
    msg = str(exc)
    return any(m in msg for m in _MISSING_FILE_MARKERS)


def _newest_mtime(root: str) -> float:
    """Newest mtime anywhere under ``root`` (inclusive): the liveness
    signal for an in-flight staging, since writes inside subdirs do
    not touch the top-level directory's own mtime."""
    newest = os.stat(root).st_mtime
    for dirpath, dirnames, filenames in os.walk(root):
        for name in dirnames + filenames:
            try:
                newest = max(newest, os.stat(os.path.join(dirpath, name)).st_mtime)
            except OSError:
                continue
    return newest


def _gc_unreferenced(
    lake_dir: str,
    manifest: dict,
    retain_versions: int = 1,
    grace_seconds: float | None = None,
) -> None:
    """Best-effort removal of commit dirs / legacy bucket dirs that no
    RETAINED version references (orphans from crashed merges, versions
    beyond the retention horizon), plus pruning of commit-log entries
    below the newest checkpoint ≤ the retention floor and of
    format-1-era ``_history`` JSONs below the floor — so an expired
    time-travel read fails fast instead of hitting missing files.
    Runs only AFTER a successful flip; deletes only paths no retained
    version names. Failures are swallowed — an orphan is wasted
    space, never wrong data. Unreferenced commit dirs younger than
    ``grace_seconds`` (default ``GC_GRACE_SECONDS``) are spared: they
    may be an optimistic writer's staged-not-yet-flipped commit."""
    import shutil

    if grace_seconds is None:
        grace_seconds = GC_GRACE_SECONDS

    # Collect the retained manifests FAIL-CLOSED: if any retained
    # version cannot be resolved, skip GC entirely — deleting from an
    # under-filled retained set would destroy data still inside the
    # retention horizon (an orphan is wasted space; a deleted
    # retained version is wrong data). Only the deletions themselves
    # are best-effort.
    pointer = _read_pointer(lake_dir)
    if pointer is None or "buckets" in pointer:
        return  # only the log-format flip calls GC; a torn state fails closed
    floor, live_v = int(pointer.get("floor", 1)), int(pointer["version"])
    retained = []
    try:
        # forward fold: resolve the floor once (one checkpoint read),
        # then apply each retained delta exactly once — O(retained)
        # small reads, not O(retained × checkpoint) re-resolutions.
        # A version without a delta entry (a migrated lake's format-1
        # era) resolves individually through its history fallback.
        m = None
        for v in range(floor, live_v + 1):
            if v == manifest["version"]:
                m = manifest
            elif m is not None:
                try:
                    with open(_delta_path(lake_dir, v)) as f:
                        m = _apply_delta(m, json.load(f))
                except FileNotFoundError:
                    m = _resolve_version(lake_dir, pointer, v)
            else:
                m = _resolve_version(lake_dir, pointer, v)
            retained.append(m)
    except (OSError, ValueError):
        return
    # prune the log below the newest checkpoint ≤ floor (everything at
    # or above it is needed to resolve the floor version), and the
    # format-1-era history JSONs below the floor
    cp_floor = max((v for v in _checkpoint_versions(lake_dir) if v <= floor), default=None)
    log_root = os.path.join(lake_dir, LOG_DIR)
    try:
        if cp_floor is not None:
            for fn in os.listdir(log_root):
                if fn.endswith(".json") and int(fn.split(".", 1)[0]) < cp_floor:
                    os.remove(os.path.join(log_root, fn))
        hist_root = os.path.join(lake_dir, HISTORY_DIR)
        if os.path.isdir(hist_root):
            for fn in os.listdir(hist_root):
                if fn.endswith(".json") and int(fn.split(".")[0]) < floor:
                    os.remove(os.path.join(hist_root, fn))
    except (OSError, ValueError):
        pass
    live_commits = {
        p.split("/", 2)[1]
        for m in retained
        for p in m["buckets"].values()
        if p.startswith("commits/")
    }
    live_legacy = {
        p for m in retained for p in m["buckets"].values() if p.startswith("bucket=")
    }
    try:
        for d in _reclaimable_commit_dirs(lake_dir, live_commits, grace_seconds):
            shutil.rmtree(os.path.join(lake_dir, "commits", d), ignore_errors=True)
        for d in os.listdir(lake_dir):
            if d.startswith("bucket=") and d not in live_legacy:
                shutil.rmtree(os.path.join(lake_dir, d), ignore_errors=True)
    except OSError:
        pass


def _reclaimable_commit_dirs(
    lake_dir: str, live_commits: set, grace_seconds: float
) -> list[str]:
    """Commit dirs under ``commits/`` that no retained manifest
    references and the staging grace does not spare — the ONE
    enumeration shared by the post-flip GC and the explicit VACUUM
    (including its dry run), so the report and the deletions can
    never drift. Grace applies to OPTIMISTIC commit dirs only
    (nonce-suffixed names): such a dir may be a concurrent writer's
    staged-not-yet-flipped commit — staging runs outside the lock —
    so only ones older than the grace are certainly crashed-writer
    orphans. A live staging keeps SOME entry fresh (Spark writes
    land in pb=K/_temporary subtrees, which do NOT bump the
    top-level dir's mtime — so take the newest mtime in the whole
    tree, a walk bounded by the orphan's own file count).
    Locked-path dirs (plain zero-padded names) are never in flight
    outside the lock and reclaim immediately."""
    import time

    commits_root = os.path.join(lake_dir, "commits")
    try:
        names = sorted(os.listdir(commits_root))
    except FileNotFoundError:
        return []
    now = time.time()
    out = []
    for d in names:
        if d in live_commits:
            continue
        if "." in d:
            try:
                if now - _newest_mtime(os.path.join(commits_root, d)) < grace_seconds:
                    continue
            except OSError:
                continue
        out.append(d)
    return out


def _live_paths(lake_dir: str, manifest: dict | None, buckets=None) -> tuple[list[str], list[str]]:
    """Resolve (legacy_paths, commit_paths) for ``buckets`` (all live
    buckets when None). Legacy paths are pre-manifest root
    ``bucket=K`` dirs — their bucket value is partition-encoded, so
    they read with ``basePath`` inference; commit paths carry
    ``bucket`` as a data column and read directly."""
    if manifest is None:
        return [], []
    legacy, commits = [], []
    for b, rel in manifest["buckets"].items():
        if buckets is not None and int(b) not in buckets:
            continue
        (legacy if rel.startswith("bucket=") else commits).append(os.path.join(lake_dir, rel))
    return sorted(legacy), sorted(commits)


_LAKE_COLS = ["entity_id", "last_seq", "last_ts", "last_type", "item", "bucket"]


def _manifest_columns(manifest: dict | None) -> list[dict]:
    """The lake's evolved-schema epoch: columns ACCRETED beyond the
    core five-column envelope, as ``[{"name", "type"}]`` in accretion
    order. Recorded in the manifest by the evolving commit and carried
    forward by ``_apply_delta``, so every retained version reads under
    its own schema (time travel to a pre-evolution version returns the
    pre-evolution shape)."""
    return list((manifest or {}).get("columns", []))


def _align_extras(df: DataFrame, extras: list[dict]) -> DataFrame:
    """Null-fill declared extra columns a frame predates (files
    written before a schema evolution lack the accreted columns —
    Delta/parquet schema-evolution read semantics), then project the
    canonical column order."""
    have = set(df.columns)
    for c in extras:
        if c["name"] not in have:
            df = df.withColumn(c["name"], F.lit(None).cast(c["type"]))
    return df.select(*_LAKE_COLS, *[c["name"] for c in extras])


def _read_live(spark, lake_dir: str, manifest: dict, buckets=None) -> DataFrame | None:
    """Manifest-resolved read of the live table (optionally pruned to
    ``buckets`` — path-level pruning, stronger than a pushed filter:
    unreferenced and orphaned files are never opened at all). Columns
    follow THIS manifest's schema epoch: accreted columns are
    null-filled for files older than their evolution.

    Evolved epochs read with ``mergeSchema=true``: a partial-bucket
    evolution leaves the manifest pointing at a MIX of pre- and
    post-evolution commit dirs, and default schema inference samples
    ONE data file — sampling an old file would drop the accreted
    column from the relation schema entirely, so ``_align_extras``
    would null-fill real values (and the next merge would PERSIST
    the loss through its read-modify-write). The footer merge costs
    metadata reads proportional to the file count, paid only when
    the epoch actually has accreted columns."""
    legacy, commits = _live_paths(lake_dir, manifest, buckets)
    extras = _manifest_columns(manifest)
    parts = []
    if legacy:
        parts.append(
            spark.read.option("basePath", lake_dir)
            .parquet(*legacy)
            .withColumn("bucket", F.col("bucket").cast("int"))
        )
    if commits:
        reader = spark.read
        if extras:
            reader = reader.option("mergeSchema", "true")
        parts.append(reader.parquet(*commits))
    if not parts:
        return None
    parts = [_align_extras(p, extras) for p in parts]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _lww_combine(envelopes_or_rows: DataFrame, extra_names: tuple = ()) -> DataFrame:
    """Last-write-wins combine over snapshot-shaped rows: one row per
    entity_id, winner by (last_ts, last_seq). A semilattice join —
    commutative, associative, idempotent — which is what makes the
    merge correct under ANY batch arrival order and under replays.
    Accreted extra columns ride the winner's struct."""
    return (
        envelopes_or_rows.groupBy("entity_id")
        .agg(
            F.max_by(
                F.struct("last_seq", "last_ts", "last_type", "item", "bucket", *extra_names),
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
            *[F.col(f"last.{c}").alias(c) for c in extra_names],
        )
    )


def merge_batch_into_lake(
    batch_df: DataFrame,
    lake_dir: str,
    n_buckets: int | None = MERGE_LAKE_BUCKETS,
    retain_versions: int = 1,
    extra_cols: tuple = (),
    txn: tuple | None = None,
) -> None:
    """One MERGE step (steps 1-4 of merge_lake_sink's contract),
    callable directly on a batch DataFrame — the unit the idempotency,
    order-independence, and crash tests drive without a streaming
    harness.

    ``n_buckets`` defines the table's physical layout, so it is
    pinned in the manifest on first write; a later merge with a
    different value raises instead of silently corrupting the table
    (updates would hash to new buckets while stored rows keep their
    old ones, so the affected-bucket read-back would miss them).
    Pass ``n_buckets=None`` to ADOPT the pinned layout — the right
    call for writers that should follow ``rebucket_lake`` layout
    changes instead of asserting a fixed one.

    ``retain_versions`` is an operational knob (not pinned): how many
    committed versions' data GC keeps after this merge. 1 = live
    only; K > 1 enables ``read_lake_snapshot(version=...)`` time
    travel and ``lake_changes`` over the last K versions.

    ``extra_cols`` names envelope attributes to carry into the lake
    row beyond the core five — SCHEMA EVOLUTION ON MERGE: a column
    the lake has not seen accretes a new schema epoch (recorded in
    the manifest, so time travel reads each version under its own
    schema); files older than the evolution null-fill on read; a
    known column missing from this batch null-fills on write. Types
    never mutate — a redeclared column with a different type
    raises.

    ``txn=(app_id, version)`` makes the merge IDEMPOTENT BY MARKER
    (Delta's txnAppId/txnVersion): the manifest records each app's
    high-water version, and a merge whose version is ≤ the recorded
    one is SKIPPED outright — no Spark job, no bucket rewrite, no new
    version. The LWW combine already makes replays CORRECT; the
    marker makes them FREE, which is what a restarted foreachBatch
    sink redelivering its last epoch wants at 100 TB (re-merging a
    replayed batch would otherwise rewrite its touched buckets to
    produce identical bytes). Versions must be monotonically
    increasing per app."""
    _validate_merge_args(n_buckets, retain_versions)
    _validate_extra_cols(extra_cols)
    _validate_txn(txn)
    spark = batch_df.sparkSession
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        _merge_locked(
            spark, batch_df, lake_dir, n_buckets, retain_versions, extra_cols, txn
        )
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def _healed_manifest(lake_dir: str) -> dict | None:
    """Live manifest, with the format-1 flip→history crash window
    healed (the live manifest must be recorded in ``_history/`` before
    any op builds the next version on it). Format-2 lakes have no such
    window — the log entry is written BEFORE the pointer flip — so
    healing is a plain resolve."""
    pointer = _read_pointer(lake_dir)
    if pointer is None:
        return None
    if "buckets" not in pointer:
        return _resolve_version(lake_dir, pointer, int(pointer["version"]))
    hist = os.path.join(lake_dir, HISTORY_DIR, f"{pointer['version']:010d}.json")
    if not os.path.exists(hist):
        _write_history(lake_dir, pointer)
    return pointer


def _validate_merge_args(n_buckets, retain_versions) -> None:
    if n_buckets is not None and (
        isinstance(n_buckets, bool) or not isinstance(n_buckets, int) or n_buckets < 1
    ):
        raise ValueError(f"n_buckets must be a positive int or None, got {n_buckets!r}")
    if (
        isinstance(retain_versions, bool)
        or not isinstance(retain_versions, int)
        or retain_versions < 1
    ):
        raise ValueError(f"retain_versions must be a positive int, got {retain_versions!r}")


def _resolve_base(lake_dir: str, n_buckets: int | None, adopt_legacy: bool):
    """Shared merge preamble: the healed base manifest plus the
    resolved bucket count (pinned layout wins; a mismatch raises).
    A pre-manifest legacy layout (root bucket=K dirs, no manifest) is
    ADOPTED as version 0 on the locked path; the optimistic path
    REFUSES it instead (``adopt_legacy=False``) — silently treating
    the un-manifested table as empty would replace it with the batch
    and GC the standing files."""
    manifest = _healed_manifest(lake_dir)
    if n_buckets is None:
        n_buckets = manifest["n_buckets"] if manifest else MERGE_LAKE_BUCKETS
    if manifest is not None and manifest["n_buckets"] != n_buckets:
        raise ValueError(
            f"lake at {lake_dir} has n_buckets={manifest['n_buckets']} "
            f"(pinned in {MANIFEST_NAME}); merge called with {n_buckets} — "
            "the bucket layout only changes through rebucket_lake "
            "(pass n_buckets=None to adopt the pinned layout)"
        )
    if manifest is None and os.path.isdir(lake_dir):
        # pre-manifest layout (root bucket=K dirs from the r6 dynamic-
        # overwrite scheme): adopt the existing dirs as the live set;
        # subsequent merges migrate touched buckets into commit dirs.
        legacy = sorted(
            d for d in os.listdir(lake_dir) if d.startswith("bucket=") and "=" in d
        )
        if legacy:
            if not adopt_legacy:
                raise ValueError(
                    f"lake at {lake_dir} has a pre-manifest legacy layout "
                    f"({len(legacy)} root bucket= dirs, no {MANIFEST_NAME}); "
                    "the optimistic merge cannot adopt it safely — run one "
                    "locked merge_batch_into_lake first to migrate it"
                )
            manifest = {
                "format": 1,
                "version": 0,
                "n_buckets": n_buckets,
                "buckets": {d.split("=", 1)[1]: d for d in legacy},
            }
    return manifest, n_buckets


def _merged_for_batch(
    spark, lake_dir: str, manifest: dict | None, updates, n_buckets: int, all_extras=()
):
    """Shared merge compute: the touched-bucket list (metadata-sized
    collect) and the LWW combine of the affected buckets' current
    rows with the batch — everything about a merge EXCEPT the commit
    protocol, so the locked/optimistic twins differ only in locking.
    ``updates`` must already be persisted by the caller. ``all_extras``
    is the POST-merge schema epoch (manifest columns + any accreted by
    this batch); both sides null-fill to it before combining."""
    all_extras = list(all_extras)
    touched = sorted(r["bucket"] for r in updates.select("bucket").distinct().collect())
    if not touched:
        return [], None
    current = _read_live(spark, lake_dir, manifest, set(touched)) if manifest else None
    names = tuple(c["name"] for c in all_extras)
    updates = _align_extras(updates, all_extras)
    if current is not None:
        merged = _lww_combine(
            _align_extras(current, all_extras).unionByName(updates), names
        )
    else:
        merged = _lww_combine(updates, names)
    return touched, merged


def _validate_extra_cols(extra_cols: tuple) -> None:
    """Reject declarations that can never be valid BEFORE any plan is
    built (a colliding name would otherwise surface as an ambiguous-
    field AnalysisException deep inside the snapshot struct; a
    non-identifier name would break the dotted struct-field access in
    ``snapshot_stream`` or the DDL string ``_snapshot_schema``
    interpolates)."""
    import re

    seen = set()
    for name in extra_cols:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name or ""):
            raise ValueError(
                f"extra column {name!r} is not a plain identifier "
                "([A-Za-z_][A-Za-z0-9_]*) — dotted/quoted/spaced names would "
                "break struct-field access and schema DDL downstream"
            )
        if name in _LAKE_COLS or name in ("pk", "event_seq", "ts", "type"):
            raise ValueError(f"extra column {name!r} collides with a core lake column")
        if name in (_PARTITION_COL, "__z"):
            # writer internals: _stage_commit overwrites pb with the
            # bucket id and partitionBy drops it from the data files;
            # a Z-order compact overwrites and drops __z — either way
            # the user's values would be silently destroyed
            raise ValueError(
                f"extra column {name!r} collides with a writer-internal column"
            )
        if name in seen:
            raise ValueError(f"extra column {name!r} declared twice")
        seen.add(name)


def _evolved_schema(manifest: dict | None, updates: DataFrame, extra_cols: tuple):
    """The post-merge schema epoch: the manifest's accreted columns
    plus any NEW ones this batch declares (``(all_extras, evolved)``;
    ``evolved`` is truthy only when the epoch actually changes —
    commits that don't evolve must not rewrite the columns record).
    Redeclaring a known column under a different type raises."""
    base_extras = _manifest_columns(manifest)
    known = {c["name"]: c["type"] for c in base_extras}
    new_cols = []
    for name in extra_cols:
        dtype = updates.schema[name].dataType.simpleString()
        if name in known:
            if known[name] != dtype:
                raise ValueError(
                    f"extra column {name!r} is pinned as {known[name]} in the "
                    f"lake schema; this batch declares {dtype} — column types "
                    "never mutate (add a new column instead)"
                )
        else:
            new_cols.append({"name": name, "type": dtype})
    return base_extras + new_cols, bool(new_cols)


def _merge_locked(
    spark,
    batch_df: DataFrame,
    lake_dir: str,
    n_buckets: int | None,
    retain_versions: int,
    extra_cols: tuple = (),
    txn: tuple | None = None,
) -> None:
    manifest, n_buckets = _resolve_base(lake_dir, n_buckets, adopt_legacy=True)
    if _txn_already_applied(manifest, txn):
        return  # replayed batch: the marker makes the no-op FREE
    updates = snapshot_stream(batch_df, extra_cols).withColumn(
        "bucket",
        F.pmod(F.xxhash64("entity_id"), F.lit(n_buckets)).cast("int"),
    )
    all_extras, evolved = _evolved_schema(manifest, updates, extra_cols)
    updates = updates.persist()
    try:
        _enforce_constraints(manifest, updates, all_extras)
        touched, merged = _merged_for_batch(
            spark, lake_dir, manifest, updates, n_buckets, all_extras
        )
        if not touched:
            return
        _publish_version(
            lake_dir,
            manifest,
            merged,
            touched,
            n_buckets,
            retain_versions,
            extra={"columns": all_extras} if evolved else None,
            txn=txn,
        )
    finally:
        updates.unpersist()


def _validate_txn(txn) -> None:
    if txn is None:
        return
    if (
        not isinstance(txn, (tuple, list))
        or len(txn) != 2
        or not isinstance(txn[0], str)
        or not txn[0]
        or isinstance(txn[1], bool)
        or not isinstance(txn[1], int)
    ):
        raise ValueError(
            f"txn must be (app_id: non-empty str, version: int), got {txn!r}"
        )


def _txn_already_applied(manifest: dict | None, txn: tuple | None) -> bool:
    if txn is None or manifest is None:
        return False
    recorded = manifest.get("txns", {}).get(str(txn[0]))
    return recorded is not None and int(recorded) >= int(txn[1])


class ConstraintViolationError(RuntimeError):
    """A merge batch carries visible rows that fail a table CHECK
    constraint — the commit is refused, the table unchanged."""


def _enforce_constraints(manifest: dict | None, updates: DataFrame, all_extras) -> None:
    """CHECK constraints at write time (Delta's enforcement point):
    every VISIBLE row of the batch must satisfy every recorded
    constraint — one aggregate job over the batch (never the table),
    zero cost when the table has no constraints. SQL-standard CHECK
    semantics: NULL (unknown) passes, only FALSE violates. Tombstones
    are exempt (their payload is nulled by design)."""
    cons = (manifest or {}).get("constraints", {})
    if not cons:
        return
    vis = _align_extras(updates, all_extras).filter(F.col("last_type") != "delete")
    aggs = [
        F.sum(
            F.when(~F.coalesce(F.expr(e), F.lit(True)), 1).otherwise(0)
        ).alias(n)
        for n, e in sorted(cons.items())
    ]
    row = vis.agg(*aggs).first()
    bad = {n: int(row[n]) for n in sorted(cons) if row[n]}
    if bad:
        raise ConstraintViolationError(
            f"merge batch violates CHECK constraint(s) {bad} "
            f"({ {n: cons[n] for n in bad} }); commit refused, table unchanged"
        )


#: one-shot guard for the cross-process race barrier below
_ENV_BARRIER_DONE = False


def _env_race_barrier(attempt: int) -> None:
    """Cross-PROCESS twin of the in-session ``_race_hook`` seam: when
    ``LAPIDUS_OCC_BARRIER=<dir>:<n>`` is set, the FIRST merge of this
    process pauses once between staging and flip until ``n`` processes
    have staged — so a multi-daemon test provably overlaps the
    stage-to-flip windows instead of hoping JVM startup skew lines up.
    Inert without the env var; proceeds after a bounded wait if a
    sibling never arrives (a hung sibling must not deadlock a
    commit)."""
    global _ENV_BARRIER_DONE
    spec = os.environ.get("LAPIDUS_OCC_BARRIER", "")
    if not spec:
        return
    import sys
    import time

    if _ENV_BARRIER_DONE or attempt > 0:
        print(
            f"[occ_barrier {os.getpid()}] skip (done={_ENV_BARRIER_DONE}, "
            f"attempt={attempt})",
            file=sys.stderr,
            flush=True,
        )
        return
    _ENV_BARRIER_DONE = True
    parts = spec.split(":")
    d, n = ":".join(parts[:-2]) if len(parts) > 2 else parts[0], int(parts[-2] if len(parts) > 2 else parts[-1])
    timeout_s = float(parts[-1]) if len(parts) > 2 else 120.0
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"staged.{os.getpid()}"), "w") as fh:
        fh.write("staged")
    print(f"[occ_barrier {os.getpid()}] staged, waiting for {n}", file=sys.stderr, flush=True)
    deadline = time.time() + timeout_s
    while len([f for f in os.listdir(d) if f.startswith("staged.")]) < n:
        if time.time() > deadline:
            print(f"[occ_barrier {os.getpid()}] timeout", file=sys.stderr, flush=True)
            return
        time.sleep(0.05)
    print(f"[occ_barrier {os.getpid()}] released", file=sys.stderr, flush=True)


def _occ_conflicts(base: dict | None, cur: dict | None, touched: list, n_buckets: int) -> bool:
    """Must an optimistic merge computed against ``base`` recompute
    before flipping onto ``cur``? False when nothing landed in
    between, or when everything that landed provably left the
    merge's ``touched`` buckets' CONTENT alone — the per-bucket
    ``data_versions`` stamps prove that across pointer moves, so an
    interleaved compaction (pure physical rewrite) never forces a
    recompute. A layout change (rebucket) always conflicts: bucket
    ids are not comparable across layouts."""
    base_v = base["version"] if base else 0
    cur_v = cur["version"] if cur else 0
    if cur_v == base_v:
        return False
    if cur is None or cur["n_buckets"] != n_buckets:
        return True
    if (cur or {}).get("columns") != (base or {}).get("columns"):
        # an intervening commit EVOLVED the schema: this merge's
        # staged files predate the epoch and its delta would clobber
        # the columns record — recompute under the fresh manifest
        return True
    if (cur or {}).get("constraints") != (base or {}).get("constraints"):
        # the constraint set changed under the staging: the staged
        # rows were validated against the OLD set — recompute (and
        # re-validate) under the fresh manifest
        return True
    if base is None:
        # merged against an empty table: any intervening write to a
        # touched bucket would be lost by our snapshot — conflict.
        return any(str(b) in cur["buckets"] for b in touched)
    return any(_bucket_content_changed(base, cur, str(b)) for b in touched)


def merge_batch_optimistic(
    batch_df: DataFrame,
    lake_dir: str,
    n_buckets: int | None = MERGE_LAKE_BUCKETS,
    retain_versions: int = 1,
    max_attempts: int = 5,
    flip_wait_s: float = 30.0,
    extra_cols: tuple = (),
    txn: tuple | None = None,
    _race_hook: Callable[[int], None] | None = None,
) -> dict | None:
    """MERGE with OPTIMISTIC concurrency control — multiple writers
    share one lake, Delta-style. Where ``merge_batch_into_lake``
    holds the single-writer lock across the whole merge (Spark jobs
    included), this writer:

    1. reads the manifest (the BASE version) with no lock;
    2. computes the merged buckets against base and stages them into
       a uniquely-named commit dir ``commits/<v>.<nonce>`` — the
       expensive Spark work, fully concurrent with other writers
       (the nonce prevents dir collisions; GC's grace window keeps a
       concurrent committer from collecting the staging);
    3. takes the lock only for the FLIP (a JSON rename — the critical
       section shrinks from the whole merge to milliseconds), re-reads
       the manifest, and:
       - unchanged → flip normally;
       - advanced, but every intervening commit left this merge's
         buckets' content alone (disjoint-bucket merges; compactions
         — their ``data_versions`` stamps carry through) → REBASE:
         flip the staged pointers onto the newer manifest;
       - a data change in one of OUR buckets, or a rebucket → the
         merge was computed against stale content: drop the staging,
         recompute against the fresh manifest, retry (bounded by
         ``max_attempts``, then ``CommitConflictError``).

    The flip order serializes writers; each one's LWW combine is a
    semilattice join, so any interleaving converges to the same
    snapshot a serial replay would produce. Reader/GC contract: a
    concurrent commit with ``retain_versions=1`` may GC the base
    version's files while step 2 is still reading them — the staging
    fails and retries against the fresh manifest (run concurrent
    writers with ``retain_versions >= 2`` to make that window a full
    version wide; same posture as Delta VACUUM vs in-flight reads).
    Requires a manifested lake (or an empty/new dir); pre-manifest
    legacy layouts migrate via one locked merge first.

    Returns the committed manifest — or, for an empty batch, the
    base manifest unchanged (None only if the lake is empty too): an
    empty batch commits nothing, and the return mirrors what a reader
    would see. Refuses pre-manifest legacy layouts (run one locked
    merge first — see ``_resolve_base``). ``_race_hook(attempt)`` is
    a test seam invoked between staging and flip — deterministic
    interleave injection.

    ``txn=(app_id, version)`` is the idempotence marker (see
    ``merge_batch_into_lake``): already-applied versions skip at
    stage time (free) AND at flip time (a same-app sibling that
    committed the marker mid-race turns this writer's flip into a
    skip instead of a double apply); the marker merges into the
    manifest's per-app watermark map first-class, so a REBASE onto a
    moved manifest never clobbers a sibling app's watermark."""
    _validate_merge_args(n_buckets, retain_versions)
    _validate_extra_cols(extra_cols)
    _validate_txn(txn)
    import shutil
    import uuid

    spark = batch_df.sparkSession
    snap = snapshot_stream(batch_df, extra_cols)
    #: staging carried across attempts: (base, nb, touched, commit_rel,
    #: all_extras, evolved) — a lock timeout with an UNCHANGED manifest
    #: keeps the staged result (re-running the identical Spark job buys
    #: nothing)
    pending = None
    try:
        for attempt in range(max_attempts):
            live = _read_manifest(lake_dir)
            if pending is not None and (live["version"] if live else 0) == (
                pending[0]["version"] if pending[0] else 0
            ):
                base, nb, touched, commit_rel, all_extras, evolved = pending
            else:
                if pending is not None:
                    shutil.rmtree(
                        os.path.join(lake_dir, pending[3]), ignore_errors=True
                    )
                pending = None
                base, nb = _resolve_base(lake_dir, n_buckets, adopt_legacy=False)
                if _txn_already_applied(base, txn):
                    return base  # replayed batch: skip, zero Spark work
                updates = snap.withColumn(
                    "bucket", F.pmod(F.xxhash64("entity_id"), F.lit(nb)).cast("int")
                ).persist()
                all_extras, evolved = _evolved_schema(base, updates, extra_cols)
                commit_rel = None
                try:
                    _enforce_constraints(base, updates, all_extras)
                    touched, merged = _merged_for_batch(
                        spark, lake_dir, base, updates, nb, all_extras
                    )
                    if not touched:
                        return base
                    commit_rel = (
                        f"commits/{(base['version'] if base else 0) + 1:010d}"
                        f".{uuid.uuid4().hex[:8]}"
                    )
                    _stage_commit(lake_dir, merged, touched, commit_rel)
                except Exception as exc:
                    if commit_rel is not None:
                        shutil.rmtree(
                            os.path.join(lake_dir, commit_rel), ignore_errors=True
                        )
                    # retry ONLY the documented GC-vs-read race: the
                    # manifest moved AND the failure is a missing-file
                    # error. A deterministic staging failure (schema /
                    # analysis bug, bad input) re-raises immediately —
                    # retrying it max_attempts times would surface as
                    # CommitConflictError and mask the root cause.
                    live_now = _read_manifest(lake_dir)
                    if (live_now["version"] if live_now else 0) != (
                        base["version"] if base else 0
                    ) and _is_missing_file_error(exc):
                        continue
                    raise
                finally:
                    updates.unpersist()
            if _race_hook is not None:
                _race_hook(attempt)
            _env_race_barrier(attempt)
            try:
                lock = _acquire_lock(lake_dir, wait_s=flip_wait_s)
            except ConcurrentMergeError:
                # flip lock held past flip_wait_s (e.g. a LOCKED writer
                # holding across its whole Spark job): absorbed by the
                # retry budget, as CommitConflictError's contract says.
                # The staging is KEPT — if the holder commits nothing
                # new on our buckets, the next attempt reuses it
                # instead of re-running the identical merge job.
                pending = (base, nb, touched, commit_rel, all_extras, evolved)
                continue
            try:
                cur = _healed_manifest(lake_dir)
                if _txn_already_applied(cur, txn):
                    # a same-app sibling committed this (or a later)
                    # version mid-race: applying ours on top would be
                    # the exact double apply the marker exists to stop
                    shutil.rmtree(
                        os.path.join(lake_dir, commit_rel), ignore_errors=True
                    )
                    pending = None
                    return cur
                # the staging must still exist before its pointers are
                # published: a stage-to-flip gap longer than the GC
                # grace (suspended process, long lock waits) or skewed
                # mtimes (NFS, cross-host clocks) can let a concurrent
                # committer's GC collect it — flipping then would
                # commit dangling bucket pointers. Treat a missing
                # staging as a conflict and recompute.
                staged_alive = os.path.isdir(os.path.join(lake_dir, commit_rel))
                if staged_alive and not _occ_conflicts(base, cur, touched, nb):
                    pending = None
                    if (cur["version"] if cur else 0) != (
                        base["version"] if base else 0
                    ):
                        global OCC_REBASES
                        OCC_REBASES += 1
                    return _flip_version(
                        lake_dir,
                        cur,
                        commit_rel,
                        touched,
                        nb,
                        retain_versions,
                        extra={"columns": all_extras} if evolved else None,
                        txn=txn,
                    )
            finally:
                try:
                    os.remove(lock)
                except FileNotFoundError:
                    pass
            # a conflicting commit landed between read and flip (or the
            # staging was GC'd out from under us): drop the staging and
            # recompute against the manifest it produced
            global OCC_CONFLICTS
            OCC_CONFLICTS += 1
            pending = None
            shutil.rmtree(os.path.join(lake_dir, commit_rel), ignore_errors=True)
    finally:
        if pending is not None:
            shutil.rmtree(os.path.join(lake_dir, pending[3]), ignore_errors=True)
    raise CommitConflictError(
        f"optimistic merge into {lake_dir} lost {max_attempts} straight races "
        "to concurrent data-changing commits or held flip locks on its buckets"
    )


def _publish_version(
    lake_dir: str,
    manifest: dict | None,
    rows: DataFrame,
    touched: list,
    n_buckets: int,
    retain_versions: int,
    replace_all: bool = False,
    max_records_per_file: int | None = None,
    extra: dict | None = None,
    data_change: bool = True,
    with_file_stats: bool = False,
    txn: tuple | None = None,
) -> dict:
    """The shared publish step of every table-mutating op (merge,
    compact, rebucket): write ``rows`` (bucket column already set) for
    exactly the ``touched`` buckets into a FRESH ``commits/<version>``
    directory — never into live paths, so readers (and a replay after
    a crash) are untouched — then atomically flip the manifest,
    record it in ``_history/``, and GC beyond the retention horizon.
    ``replace_all`` swaps the ENTIRE bucket map (rebucket: the old
    layout's pointers must not survive) instead of updating the
    touched pointers.

    ``data_change=False`` declares the commit a PURE PHYSICAL rewrite
    (compaction): the touched buckets' pointers move, but their
    ``data_versions`` stamps — the per-bucket last data-changing
    commit, Delta's ``dataChange`` bit at bucket granularity — carry
    through unchanged, so change-feed consumers (``lake_changes``,
    the ``lake_cdf`` streaming source) skip the rewritten buckets
    entirely instead of re-reading them to emit zero rows.

    ``with_file_stats=True`` gathers per-file entity_id zone maps
    from the staged footers (metadata-sized driver work) and records
    them in the manifest — the clustered-compaction path."""
    version = (manifest["version"] if manifest else 0) + 1
    commit_rel = f"commits/{version:010d}"
    _stage_commit(lake_dir, rows, touched, commit_rel, max_records_per_file)
    stats = (
        _commit_file_stats(lake_dir, commit_rel, touched) if with_file_stats else None
    )
    return _flip_version(
        lake_dir,
        manifest,
        commit_rel,
        touched,
        n_buckets,
        retain_versions,
        replace_all=replace_all,
        extra=extra,
        data_change=data_change,
        file_stats=stats,
        txn=txn,
    )


def _stage_commit(
    lake_dir: str,
    rows: DataFrame,
    touched: list,
    commit_rel: str,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``rows`` for exactly the ``touched`` buckets into a fresh
    commit directory — all the Spark work of a commit, none of the
    metadata. Runs OUTSIDE any lock: the directory is invisible until
    a manifest flip references it, and GC's grace window protects it
    from a concurrent committer's cleanup meanwhile."""
    commit_abs = os.path.join(lake_dir, commit_rel)
    writer = rows.withColumn(_PARTITION_COL, F.col("bucket")).write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(_PARTITION_COL).parquet(commit_abs)
    written = {
        int(d.split("=", 1)[1])
        for d in os.listdir(commit_abs)
        if d.startswith(f"{_PARTITION_COL}=")
    }
    if written != set(touched):  # layout invariant, not reachable in normal runs
        raise RuntimeError(f"publish wrote buckets {written}, expected {sorted(touched)}")


def _flip_version(
    lake_dir: str,
    manifest: dict | None,
    commit_rel: str,
    touched: list,
    n_buckets: int,
    retain_versions: int,
    replace_all: bool = False,
    extra: dict | None = None,
    data_change: bool = True,
    file_stats: dict | None = None,
    touched_rels: dict | None = None,
    txn: tuple | None = None,
) -> dict:
    """The metadata half of a commit: build the next manifest on
    ``manifest`` with ``touched`` pointed at ``commit_rel`` (or at the
    explicit bucket→rel map ``touched_rels`` for METADATA-ONLY commits
    — ``restore_lake``/``clone_lake`` repoint buckets at dirs staged
    by EARLIER commits, so there is no single fresh commit_rel), flip
    atomically, record history, GC. Must run under the writer lock.
    ``manifest`` need not be the one the staged rows were computed
    against — an optimistic merge REBASES by flipping onto a newer
    manifest once it has proven (via the ``data_versions`` stamps)
    that no intervening commit data-changed its buckets.

    ``file_stats`` (bucket → file → column ranges) are the zone maps
    a CLUSTERED compaction records for its sorted output; carried
    stats for any ``touched`` bucket are dropped (its pointer left
    the commit the stats describe) and the new entries applied — so
    stats are always truthful for the files the manifest names.

    Commit-log protocol (format 2, all under the writer lock):

    1. build the DELTA entry — touched pointers, stamps, stats; bytes
       proportional to the BATCH, never to the table's bucket or file
       count — and derive the next full manifest from it via
       ``_apply_delta`` (writer and readers share the fold);
    2. if the base is a format-1 monolith (or a legacy adoption),
       checkpoint it into ``_log/`` first so replay has a base —
       the in-place migration;
    3. write the periodic checkpoint when due (version 1 and every
       ``CHECKPOINT_EVERY``-th commit — a deterministic rule, so a
       crashed writer's orphan checkpoint above the live pointer is
       always overwritten by whoever actually commits that version);
    4. write the delta entry, then atomically flip the pointer (the
       ONE commit point — a crash before it leaves the old version
       fully live, the orphan log entries are overwritten by the
       next committer);
    5. GC data and log beyond the retention floor."""
    version = (manifest["version"] if manifest else 0) + 1
    delta: dict = {
        "format": 2,
        "version": version,
        "n_buckets": n_buckets,
        "replace_all": replace_all,
        "touched": (
            touched_rels
            if touched_rels is not None
            else {str(b): f"{commit_rel}/{_PARTITION_COL}={b}" for b in touched}
        ),
        "data_change": data_change,
        # wall-clock commit instant — TIMESTAMP AS OF's resolution
        # key. Rounded to microseconds so the float survives the
        # ISO-string round trip (DESCRIBE HISTORY prints µs; a stamp
        # with sub-µs residue would parse back strictly smaller and
        # miss its own version). Monotonic vs the base version
        # (coarse clocks and NTP steps must not make "latest version
        # committed ≤ ts" ambiguous; Delta resolves same-instant
        # commits by version order, which the strict increase
        # preserves).
        "committed_at": _next_commit_stamp(
            (manifest or {}).get("committed_at")
        ),
    }
    if extra:
        delta["extra"] = extra
    if file_stats:
        delta["file_stats"] = file_stats
    if txn:
        delta["txn"] = [str(txn[0]), int(txn[1])]
    new_manifest = _apply_delta(manifest, delta)
    log_dir = os.path.join(lake_dir, LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    pointer = _read_pointer(lake_dir)
    prev_floor = 1
    if manifest is not None and (pointer is None or "buckets" in pointer):
        # migrating a format-1 manifest (or an adopted legacy layout,
        # synthesized version 0): checkpoint the base so replay has a
        # floor; its older retained versions stay readable via their
        # _history JSONs until they age past retention.
        _atomic_write_json(
            _checkpoint_path(lake_dir, manifest["version"]), manifest, sync_dir=True
        )
        if pointer is not None:
            hist = os.path.join(lake_dir, HISTORY_DIR)
            retained_v1 = [
                int(fn.split(".")[0])
                for fn in (os.listdir(hist) if os.path.isdir(hist) else [])
                if fn.endswith(".json")
            ]
            prev_floor = min(retained_v1, default=manifest["version"])
    elif pointer is not None:
        prev_floor = int(pointer.get("floor", 1))
    floor = max(prev_floor, version - retain_versions + 1)
    # sync_dir on the log writes: the pointer flip below is dirent-
    # journaled, so the entries it makes reachable must be too — a
    # power loss that kept the flipped pointer but dropped the
    # un-journaled _log/<v>.json rename would leave an unresolvable
    # live version (every read raising "log corrupted")
    if version == 1 or version % CHECKPOINT_EVERY == 0:
        _atomic_write_json(
            _checkpoint_path(lake_dir, version), new_manifest, sync_dir=True
        )
    _atomic_write_json(_delta_path(lake_dir, version), delta, sync_dir=True)
    _commit_manifest(
        lake_dir, {"format": 2, "version": version, "floor": floor}
    )
    _gc_unreferenced(lake_dir, new_manifest, retain_versions)
    return new_manifest


def merge_lake_sink(
    envelopes: DataFrame,
    lake_dir: str,
    n_buckets: int | None = MERGE_LAKE_BUCKETS,
    retain_versions: int = 1,
    compact_every: int | None = None,
    concurrency: str = "locked",
    extra_cols: tuple = (),
    txn_app_id: str | None = None,
) -> DataStreamWriter:
    """Idempotent, CRASH-ATOMIC MERGE-style CDC materialization into
    a bucketed parquet lake table via ``foreachBatch`` + a manifest
    commit pointer — the production consumer of the snapshot
    semantics (sink_cache's populate/invalidate/purge intent,
    nats.js:25-28) expressed as a table format instead of a KV
    service, modeling the reference's no-loss-after-ack contract
    (slot replay, src/postgresql.js:290-354) on the storage side.

    Per micro-batch MERGE:

    1. combine the batch to ≤1 row per key (last-write-wins), stamp
       the hash bucket;
    2. read back ONLY the affected buckets, resolved through the
       manifest (path-level pruning — the bucket list is
       metadata-sized, like the IVF probe's cell list);
    3. LWW-merge existing rows with the batch rows — delete
       tombstones are RETAINED in the lake (a tombstone must keep
       winning over late-arriving older updates and over replays;
       consumers filter ``last_type != 'delete'``, the purge view);
    4. write the merged buckets to a FRESH ``commits/<version>/``
       directory (live files are never modified), then atomically
       flip ``_lapidus_manifest.json`` to point the affected buckets
       at it. The single ``os.replace`` IS the commit.

    Durability: a crash at ANY point before the flip leaves the
    previous manifest — and therefore the previous table contents —
    fully intact (the half-written commit dir is unreferenced and
    GC'd later); a crash after the flip leaves the merge fully
    applied. Combined with checkpointed offsets (an unflipped merge
    means an uncommitted batch, so the source re-delivers it) and
    step 3's semilattice combine (a re-delivered batch produces
    byte-identical logical content), this is exactly-once effect on
    the table from at-least-once delivery — the contract
    Delta/Iceberg ``MERGE INTO`` provides, built from the one atomic
    primitive plain filesystems offer (rename). Single-writer per
    lake_dir is ENFORCED by a stale-aware lock file (a live second
    writer raises ``ConcurrentMergeError``; a SIGKILLed writer's
    lock is detected dead and broken) — or pass
    ``concurrency="optimistic"`` to let multiple sinks share the
    lake, staging unlocked and locking only the manifest flip
    (``merge_batch_optimistic``). Committed manifests are
    retained under ``_history/`` within the ``retain_versions``
    horizon, giving ``read_lake_snapshot(version=...)`` time travel
    and ``lake_changes`` a bucket-pruned change-data-feed.
    ``compact_every=K`` runs ``compact_lake`` in-line after every
    K-th micro-batch, so a long-running sink heals its own
    small-file accretion without operator cron. On a real table
    format, steps 2-4 collapse into one ``MERGE INTO`` with the
    same combine.

    ``txn_app_id`` turns the exactly-once story from idempotent-by-
    recompute into idempotent-by-marker (Delta's txnAppId/
    txnVersion): every micro-batch merge carries ``(txn_app_id,
    epoch_id)``, the manifest records the app's high-water epoch, and
    a redelivered epoch (restart inside the commit-then-checkpoint
    window, checkpoint rollback) is SKIPPED outright instead of
    re-merged to identical bytes — at 100 TB that is k rewritten
    buckets saved per restart. Must be unique per (sink, lake)
    pair; two sinks sharing an app id would drop each other's
    batches."""
    if concurrency not in ("locked", "optimistic"):
        raise ValueError(
            f"concurrency must be 'locked' or 'optimistic', got {concurrency!r}"
        )

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        txn = (txn_app_id, int(epoch_id)) if txn_app_id else None
        if concurrency == "optimistic":
            # multiple sinks (daemons) sharing one lake: stage
            # unlocked, lock only the manifest flip, rebase across
            # disjoint-bucket / physical-only commits (see
            # merge_batch_optimistic). Each sink still checkpoints
            # its own offsets; the semilattice combine makes any
            # commit interleaving converge.
            merge_batch_optimistic(
                batch_df,
                lake_dir,
                n_buckets=n_buckets,
                retain_versions=retain_versions,
                extra_cols=extra_cols,
                txn=txn,
            )
        else:
            merge_batch_into_lake(
                batch_df,
                lake_dir,
                n_buckets=n_buckets,
                retain_versions=retain_versions,
                extra_cols=extra_cols,
                txn=txn,
            )
        # opportunistic maintenance: every compact_every-th micro-batch
        # heals the sink's own small-file accretion in-line (a no-op —
        # no new version — when nothing is degraded, so checkpoint
        # replays of a compacting epoch stay idempotent). Runs between
        # this batch's commit and the next batch's lock acquisition,
        # so it never interleaves with a merge.
        # guard: all-empty/gated batches so far mean no manifest yet —
        # skip rather than kill the stream on "no manifest to compact"
        if (
            compact_every is not None
            and (epoch_id + 1) % compact_every == 0
            and _read_manifest(lake_dir) is not None
        ):
            # optimistic sinks compact optimistically too: a sibling
            # sink's mid-flight merge just drops those buckets from
            # this compaction instead of deadlocking on the lock
            compact_lake(
                batch_df.sparkSession,
                lake_dir,
                retain_versions=retain_versions,
                concurrency=concurrency,
            )

    # append mode: the stateful combine lives INSIDE the batch merge,
    # not in a streaming state store — the lake IS the state.
    return envelopes.writeStream.foreachBatch(merge).outputMode("append")


#: dimensions an OPTIMIZE may cluster on — exactly the columns
#: ``_commit_file_stats`` records zone maps for (clustering on a
#: column the manifest carries no ranges for would sort bytes
#: nobody can prune on)
_CLUSTERABLE = ("entity_id", "last_ts")


def _cluster_sorted(rows: DataFrame, n_partitions: int, cluster_by: tuple) -> DataFrame:
    """Bucket-partitioned, cluster-sorted rewrite rows for an
    OPTIMIZE. ONE dimension sorts lexically — a total order, so the
    valve's sequential file splits carry DISJOINT ranges and a point
    read overlaps ≤1 file per key. TWO dimensions sort by a 32-bit
    Morton (Z-order) interleave of per-bucket rank-scaled positions —
    OPTIMIZE ZORDER BY: no file split is disjoint in either single
    dimension, but every file's [min, max] stays NARROW on BOTH axes
    at once, so the same footer zone maps prune point reads AND time
    windows from one layout. Ranks come from ``percent_rank`` over
    the bucket (a window on the key the rewrite shuffles on anyway),
    which makes the interleave robust to skewed value distributions —
    the reason Delta z-orders range-ids rather than raw bytes."""
    if tuple(cluster_by) == ("entity_id",):
        return rows.repartition(n_partitions, F.col("bucket")).sortWithinPartitions(
            "bucket", "entity_id"
        )
    from pyspark.sql import Window

    def spread(x):  # 16-bit value → even bit positions (Morton spread)
        for sh, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
            x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(F.lit(mask))
        return x

    z = None
    for i, c in enumerate(cluster_by):
        w = Window.partitionBy("bucket").orderBy(F.col(c))
        r16 = F.floor(F.percent_rank().over(w) * F.lit(65535)).cast("long")
        lane = F.shiftleft(spread(r16), i)
        z = lane if z is None else z.bitwiseOR(lane)
    return (
        rows.withColumn("__z", z)
        .repartition(n_partitions, F.col("bucket"))
        .sortWithinPartitions("bucket", "__z")
        .drop("__z")
    )


def _validate_cluster_by(cluster_by) -> tuple:
    cols = tuple(cluster_by)
    if not 1 <= len(cols) <= 2 or any(c not in _CLUSTERABLE for c in cols) or len(
        set(cols)
    ) != len(cols):
        raise ValueError(
            f"cluster_by must be 1-2 distinct columns from {_CLUSTERABLE}, "
            f"got {cluster_by!r}"
        )
    return cols


def compact_lake(
    spark,
    lake_dir: str,
    target_files_per_bucket: int = 1,
    max_records_per_file: int | None = None,
    retain_versions: int = 1,
    concurrency: str = "locked",
    cluster_by: tuple = ("entity_id",),
) -> dict:
    """OPTIMIZE for the lake: rewrite the buckets whose physical
    layout has degraded — more than ``target_files_per_bucket``
    parquet files (each micro-batch overwrite leaves one file per
    writing task, so a long-running merge sink accretes small files),
    or a pre-manifest legacy ``bucket=K`` dir — into one fresh commit
    directory, published through the SAME atomic manifest flip as a
    merge. Logical content is untouched (a pure physical rewrite):
    the new version's snapshot is bit-identical to the old one.

    Scale contract: only degraded buckets are read and rewritten
    (k·(table/B) bytes, never a full-table pass unless every bucket
    is degraded); the rewrite repartitions on the bucket column so
    each bucket lands in exactly one task → one output file, with
    ``max_records_per_file`` as the splitting valve for buckets too
    large for a single file. Crash-safe like the merge: all new
    bytes go to ``commits/<version>`` and the flip publishes them
    atomically; a crash leaves the old layout fully live. Takes the
    single-writer lock (compaction and merges never interleave).

    Returns ``{"version", "compacted_buckets"}`` — version unchanged
    when nothing needed work (no empty commits). Convergent under a
    valve: the committed manifest records which commit was a
    compaction and with what valve, so a bucket the valve split into
    several files is NOT re-counted as degraded by the next
    compaction (same valve) — no endless rewrite/version churn; a
    merge that rewrites the bucket moves its pointer off the
    compaction commit and re-arms the check.

    ``concurrency="optimistic"`` removes the LONGEST lock-hold in the
    system: the rewrite stages unlocked (writers keep committing) and
    the flip applies PARTIALLY — any bucket a concurrent commit
    data-changed mid-flight is simply dropped from the compaction
    (the merge's pointer wins; the bucket re-arms for the next
    OPTIMIZE). No retry loop is ever needed because partial
    application is CORRECT for a pure physical rewrite — unlike a
    merge, losing a race loses no data, only deferred maintenance.
    Adds ``skipped_buckets`` to the result.

    ``cluster_by`` picks the sort: the default single dimension
    (``entity_id``) gives range-DISJOINT file splits (point reads
    open ≤1 file per key); two dimensions (``("entity_id",
    "last_ts")``) Z-order the bucket so both axes' zone maps stay
    narrow at once — OPTIMIZE ZORDER BY, trading the single-axis
    disjointness guarantee for multi-axis prunability. Changing
    ``cluster_by`` re-arms convergence (a requested re-layout)."""
    if concurrency not in ("locked", "optimistic"):
        raise ValueError(
            f"concurrency must be 'locked' or 'optimistic', got {concurrency!r}"
        )
    cluster_by = _validate_cluster_by(cluster_by)
    if concurrency == "optimistic":
        return _compact_optimistic(
            spark,
            lake_dir,
            target_files_per_bucket,
            max_records_per_file,
            retain_versions,
            cluster_by=cluster_by,
        )
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        manifest = _healed_manifest(lake_dir)
        if manifest is None:
            raise ValueError(f"lake at {lake_dir} has no manifest to compact")
        degraded = _degraded_buckets(
            lake_dir, manifest, target_files_per_bucket, max_records_per_file, cluster_by
        )
        if not degraded:
            return {"version": manifest["version"], "compacted_buckets": 0}
        rows = _read_live(spark, lake_dir, manifest, set(degraded))
        # CLUSTERED rewrite: one task per bucket, sorted on the
        # cluster dimensions (lexical for one, Z-order for two), so
        # the valve's file splits carry prunable ranges — the zone
        # maps recorded from the staged footers make lake_point_read
        # / lake_time_read open a file subset instead of bucket dirs.
        packed = _cluster_sorted(rows, len(degraded), cluster_by)
        version = manifest["version"] + 1
        _publish_version(
            lake_dir,
            manifest,
            packed,
            degraded,
            manifest["n_buckets"],
            retain_versions,
            max_records_per_file=max_records_per_file,
            extra={
                "compaction": {
                    "version": version,
                    "valve": max_records_per_file,
                    "rel": f"commits/{version:010d}",
                    "cluster_by": list(cluster_by),
                }
            },
            data_change=False,
            with_file_stats=True,
        )
        return {"version": version, "compacted_buckets": len(degraded)}
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def _ts_iso(v) -> str:
    """Normalize a parquet-footer timestamp stat to a naive-UTC ISO
    string with fixed microsecond precision — lexicographic order ==
    instant order, so zone-map JSON stays engine-portable."""
    from datetime import timezone

    if v.tzinfo is not None:
        v = v.astimezone(timezone.utc).replace(tzinfo=None)
    return v.isoformat(timespec="microseconds")


def _commit_file_stats(lake_dir: str, commit_rel: str, buckets: list) -> dict:
    """Per-file zone maps for a staged commit: bucket → file →
    ``{"entity_id": [min, max], "last_ts": [min, max]}``, read from
    the parquet FOOTERS only (driver-side, metadata-sized —
    proportional to the file count, never the data). entity_id ranges
    are only worth recording for CLUSTERED output (compaction sorts
    each bucket by entity_id, so the valve's sequential file splits
    carry disjoint ranges and a point read overlaps ≤1 file per key);
    last_ts ranges prune time-bounded reads (``lake_time_read``) and
    pay off whenever keys correlate with time — unsorted on that
    axis, they are still CORRECT, just possibly wide. A file without
    usable entity_id min/max drops the whole bucket's entry; a file
    without usable last_ts stats just omits that column's range —
    readers fall back to reading it, conservative, never wrong.
    Timestamps are stored as naive-UTC ISO strings (fixed precision,
    lexicographically ordered)."""
    import pyarrow.parquet as pq

    out: dict = {}
    for b in buckets:
        d = os.path.join(lake_dir, commit_rel, f"{_PARTITION_COL}={b}")
        stats: dict = {}
        usable = True
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, f))
            mins: list = []
            maxs: list = []
            ts_mins: list = []
            ts_maxs: list = []
            ts_usable = True
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                cols = {
                    grp.column(i).path_in_schema: grp.column(i)
                    for i in range(grp.num_columns)
                }
                st = cols["entity_id"].statistics if "entity_id" in cols else None
                if st is None or not st.has_min_max:
                    usable = False
                    break
                # parquet writers may TRUNCATE long binary min/max
                # (a truncated max can undershoot the real one, which
                # would make pruning drop a file that holds the key).
                # Values short of the common 64-byte truncation floor
                # cannot have been truncated; longer ones are rejected
                # — conservative fallback to the full dir.
                if len(str(st.min)) >= 64 or len(str(st.max)) >= 64:
                    usable = False
                    break
                mins.append(st.min)
                maxs.append(st.max)
                ts_st = cols["last_ts"].statistics if "last_ts" in cols else None
                if ts_st is None or not ts_st.has_min_max:
                    ts_usable = False  # fixed-width: no truncation risk
                else:
                    ts_mins.append(ts_st.min)
                    ts_maxs.append(ts_st.max)
            if not usable or not mins:
                usable = False
                break
            entry = {"entity_id": [min(mins), max(maxs)]}
            if ts_usable and ts_mins:
                entry["last_ts"] = [_ts_iso(min(ts_mins)), _ts_iso(max(ts_maxs))]
            stats[f] = entry
        if usable and stats:
            out[str(b)] = stats
    return out


def _file_key_range(entry) -> tuple:
    """A zone-map entry's entity_id [min, max] — handles both the
    current dict form and the pre-round-9 bare-list form carried by
    migrated format-1 manifests."""
    return tuple(entry["entity_id"] if isinstance(entry, dict) else entry)


def _degraded_buckets(
    lake_dir: str,
    manifest: dict,
    target_files_per_bucket: int,
    max_records_per_file: int | None,
    cluster_by: tuple = ("entity_id",),
) -> list:
    """Buckets whose physical layout needs an OPTIMIZE under this
    valve: legacy root dirs (always migrate), else more parquet files
    than the target — excluding buckets still pointing into the last
    compaction commit under the SAME valve AND cluster dimensions
    (the convergence check; keyed on the recorded commit ``rel`` so
    it survives nonce-named optimistic compaction dirs, with the
    version-derived name as the pre-``rel`` manifest fallback —
    switching ``cluster_by`` re-arms every bucket: a re-cluster is a
    requested layout change, not churn)."""
    comp = manifest.get("compaction")
    comp_prefix = None
    if (
        comp is not None
        and comp.get("valve") == max_records_per_file
        and comp.get("cluster_by", ["entity_id"]) == list(cluster_by)
    ):
        comp_prefix = (comp.get("rel") or f"commits/{comp['version']:010d}") + "/"
    degraded = []
    for b, rel in manifest["buckets"].items():
        if rel.startswith("bucket="):
            degraded.append(int(b))  # legacy layout: always migrate
            continue
        if comp_prefix is not None and rel.startswith(comp_prefix):
            continue  # already compacted under this exact valve
        try:
            nfiles = sum(
                1
                for f in os.listdir(os.path.join(lake_dir, rel))
                if f.endswith(".parquet")
            )
        except FileNotFoundError:
            nfiles = 0
        if nfiles > target_files_per_bucket:
            degraded.append(int(b))
    return sorted(degraded)


def _compact_optimistic(
    spark,
    lake_dir: str,
    target_files_per_bucket: int,
    max_records_per_file: int | None,
    retain_versions: int,
    flip_wait_s: float = 30.0,
    _race_hook: Callable[[], None] | None = None,
    cluster_by: tuple = ("entity_id",),
) -> dict:
    """Lock-free-staging OPTIMIZE (see ``compact_lake``): read and
    rewrite the degraded buckets with NO lock held, then under the
    flip lock apply only the buckets no concurrent commit
    data-changed meanwhile (the ``data_versions`` stamps decide; a
    concurrent COMPACTION's equal stamps are also a skip-free apply —
    two racing optimizers both land, the second a harmless no-op
    rewrite). Dropped buckets' staged files stay inside the commit
    dir as dead weight until the dir leaves every retained manifest —
    wasted space bounded by the lost buckets, never wrong data."""
    import shutil
    import uuid

    base = _healed_manifest(lake_dir)
    if base is None:
        raise ValueError(f"lake at {lake_dir} has no manifest to compact")
    degraded = _degraded_buckets(
        lake_dir, base, target_files_per_bucket, max_records_per_file, cluster_by
    )
    if not degraded:
        return {"version": base["version"], "compacted_buckets": 0, "skipped_buckets": 0}
    commit_rel = f"commits/{base['version'] + 1:010d}.{uuid.uuid4().hex[:8]}"
    try:
        rows = _read_live(spark, lake_dir, base, set(degraded))
        # clustered, like the locked path — zone maps from the footers
        packed = _cluster_sorted(rows, len(degraded), cluster_by)
        _stage_commit(lake_dir, packed, degraded, commit_rel, max_records_per_file)
        staged_stats = _commit_file_stats(lake_dir, commit_rel, degraded)
    except Exception:
        # a concurrent commit (retain_versions=1) can GC the base
        # version's files out from under the unlocked rewrite.
        # Compaction is deferrable maintenance: if the manifest moved,
        # drop the half-staged work and report zero-compacted (the
        # degraded buckets stay armed) instead of killing the caller
        # — the same race the merge twin absorbs by retrying.
        shutil.rmtree(os.path.join(lake_dir, commit_rel), ignore_errors=True)
        live_now = _read_manifest(lake_dir)
        if (live_now["version"] if live_now else 0) != base["version"]:
            return {
                "version": live_now["version"] if live_now else base["version"],
                "compacted_buckets": 0,
                "skipped_buckets": len(degraded),
            }
        raise
    if _race_hook is not None:
        _race_hook()
    try:
        lock = _acquire_lock(lake_dir, wait_s=flip_wait_s)
    except ConcurrentMergeError:
        # flip lock held past flip_wait_s: compaction is deferrable
        # maintenance, so drop the work instead of raising — the
        # degraded buckets stay armed for the next OPTIMIZE.
        shutil.rmtree(os.path.join(lake_dir, commit_rel), ignore_errors=True)
        live_now = _read_manifest(lake_dir)
        return {
            "version": (live_now or base)["version"],
            "compacted_buckets": 0,
            "skipped_buckets": len(degraded),
        }
    try:
        cur = _healed_manifest(lake_dir)
        if not os.path.isdir(os.path.join(lake_dir, commit_rel)):
            # staged rewrite GC'd mid-gap (grace expiry / mtime skew):
            # flipping would publish dangling pointers — defer instead
            return {
                "version": cur["version"],
                "compacted_buckets": 0,
                "skipped_buckets": len(degraded),
            }
        if cur["n_buckets"] != base["n_buckets"]:
            # a rebucket rewrote the whole layout mid-flight: nothing
            # to salvage (bucket ids changed meaning) — drop the work
            shutil.rmtree(os.path.join(lake_dir, commit_rel), ignore_errors=True)
            return {
                "version": cur["version"],
                "compacted_buckets": 0,
                "skipped_buckets": len(degraded),
            }
        keep = [
            b for b in degraded if not _bucket_content_changed(base, cur, str(b))
        ]
        if not keep:
            shutil.rmtree(os.path.join(lake_dir, commit_rel), ignore_errors=True)
            return {
                "version": cur["version"],
                "compacted_buckets": 0,
                "skipped_buckets": len(degraded),
            }
        version = cur["version"] + 1
        _flip_version(
            lake_dir,
            cur,
            commit_rel,
            keep,
            cur["n_buckets"],
            retain_versions,
            extra={
                "compaction": {
                    "version": version,
                    "valve": max_records_per_file,
                    "rel": commit_rel,
                    "cluster_by": list(cluster_by),
                }
            },
            data_change=False,
            file_stats={b: s for b, s in staged_stats.items() if int(b) in set(keep)},
        )
        return {
            "version": version,
            "compacted_buckets": len(keep),
            "skipped_buckets": len(degraded) - len(keep),
        }
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def rebucket_lake(
    spark, lake_dir: str, new_n_buckets: int, retain_versions: int = 1
) -> dict:
    """Change the lake's pinned bucket layout — the scale-out path
    when a table outgrows the ``n_buckets`` chosen at creation (each
    merge rewrites whole touched buckets, so oversized buckets make
    every merge's write amplification worse; more buckets restore
    the k·(table/B) contract). A rebucket is necessarily a one-time
    full-table rewrite (every row re-hashes), published as ONE
    atomic manifest flip that swaps the entire bucket map and the
    pinned ``n_buckets`` together: readers and crash-replays see
    either the old layout or the new, never a mix, and retained
    older versions still time-travel through their own manifests
    (a version's manifest carries its own layout). Subsequent
    merges must pass the new ``n_buckets`` — or ``None`` to adopt
    whatever layout is pinned. Takes the single-writer lock."""
    if (
        isinstance(new_n_buckets, bool)
        or not isinstance(new_n_buckets, int)
        or new_n_buckets < 1
    ):
        raise ValueError(f"new_n_buckets must be a positive int, got {new_n_buckets!r}")
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        manifest = _healed_manifest(lake_dir)
        if manifest is None:
            raise ValueError(f"lake at {lake_dir} has no manifest to rebucket")
        if manifest["n_buckets"] == new_n_buckets:
            return {"version": manifest["version"], "n_buckets": new_n_buckets}
        rows = _read_live(spark, lake_dir, manifest)
        if rows is None:  # empty table: the layout change is pure metadata
            version = manifest["version"] + 1
            _flip_version(
                lake_dir,
                manifest,
                f"commits/{version:010d}",  # unused: nothing touched
                [],
                new_n_buckets,
                retain_versions,
                replace_all=True,
                extra={
                    "rebucket": {
                        "version": version,
                        "from": manifest["n_buckets"],
                        "to": new_n_buckets,
                    }
                },
            )
            return {"version": version, "n_buckets": new_n_buckets}
        rehashed = rows.withColumn(
            "bucket",
            F.pmod(F.xxhash64("entity_id"), F.lit(new_n_buckets)).cast("int"),
        ).repartition(new_n_buckets, F.col("bucket"))
        rehashed = rehashed.persist()
        try:
            touched = sorted(
                r["bucket"] for r in rehashed.select("bucket").distinct().collect()
            )
            _publish_version(
                lake_dir,
                manifest,
                rehashed,
                touched,
                new_n_buckets,
                retain_versions,
                replace_all=True,
                # the rebucket marker lets the streaming CDF source
                # recognize this exact version step as a snapshot-
                # identical layout swap (zero change rows) instead of
                # demanding a full-snapshot restart; data stamps still
                # reset (data_change=True) because bucket ids change
                # meaning across the swap.
                extra={
                    "rebucket": {
                        "version": manifest["version"] + 1,
                        "from": manifest["n_buckets"],
                        "to": new_n_buckets,
                    }
                },
            )
        finally:
            rehashed.unpersist()
        return {"version": manifest["version"] + 1, "n_buckets": new_n_buckets}
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def restore_lake(lake_dir: str, version: int, retain_versions: int = 2) -> dict:
    """RESTORE TABLE ... TO VERSION AS OF — Delta RESTORE's analog as
    a METADATA-ONLY commit (no Spark session, no data bytes written):
    a new version whose bucket pointers are the target version's, so
    the live snapshot reverts while history stays append-only (the
    undone versions remain time-travelable inside retention, and the
    restore itself is one more commit a CDF subscriber consumes as an
    ordinary diff — the inverse of the undone batches' effect).

    Scale contract: cost is O(buckets whose CONTENT differs between
    live and target), proven by the ``data_versions`` stamps — a
    bucket that diverged only through compactions (physical-only
    rewrites) KEEPS its live pointer (the better-packed files; the
    rows are identical by the stamp proof), so a restore never undoes
    maintenance work and never touches a data file at all. Zone maps
    for repointed buckets are taken from the target manifest (they
    describe exactly the files being repointed); the schema epoch
    reverts with the data (a restore across a schema evolution reads
    under the target's columns again, while the evolved versions keep
    their own epoch for time travel). A rebucket (or any bucket-set
    change) between target and live swaps the ENTIRE map back
    (``replace_all`` — bucket ids are not comparable across layouts).

    Runs under the writer lock; an optimistic merge staged against
    the pre-restore manifest sees the moved stamps (or the reverted
    columns epoch) and recomputes — a restore is a data change like
    any other. The target must still be retained; size the merges'
    ``retain_versions`` to cover your undo horizon. Returns
    ``{"version", "restored_from", "restored_buckets",
    "replace_all"}`` — version unchanged when live content already
    equals the target (no empty commits)."""
    _validate_merge_args(None, retain_versions)
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        live = _healed_manifest(lake_dir)
        if live is None:
            raise ValueError(f"lake at {lake_dir} has no manifest to restore")
        target = _manifest_at(lake_dir, version)  # unretained → fails fast
        live_v = int(live["version"])
        if version == live_v:
            return {
                "version": live_v,
                "restored_from": version,
                "restored_buckets": 0,
                "replace_all": False,
            }
        replace_all = target["n_buckets"] != live["n_buckets"] or set(
            target["buckets"]
        ) != set(live["buckets"])
        if replace_all:
            touched_rels = dict(target["buckets"])
        else:
            touched_rels = {
                b: rel
                for b, rel in target["buckets"].items()
                if _bucket_content_changed(live, target, b)
            }
        if not touched_rels:
            # only physical-only commits landed since the target:
            # live content is already the target snapshot
            return {
                "version": live_v,
                "restored_from": version,
                "restored_buckets": 0,
                "replace_all": False,
            }
        stats = {
            b: target["file_stats"][b]
            for b in touched_rels
            if b in target.get("file_stats", {})
        }
        extra = None
        if target.get("columns", []) != live.get("columns", []):
            extra = {"columns": list(target.get("columns", []))}
        new_manifest = _flip_version(
            lake_dir,
            live,
            commit_rel="",
            touched=[],
            n_buckets=target["n_buckets"],
            retain_versions=retain_versions,
            replace_all=replace_all,
            extra=extra,
            data_change=True,
            file_stats=stats or None,
            touched_rels=touched_rels,
        )
        return {
            "version": int(new_manifest["version"]),
            "restored_from": version,
            "restored_buckets": len(touched_rels),
            "replace_all": replace_all,
        }
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def vacuum_lake(
    lake_dir: str,
    retain_versions: int = 1,
    dry_run: bool = False,
    grace_seconds: float | None = None,
) -> dict:
    """Delta VACUUM's analog as an EXPLICIT command: raise the
    retention floor to ``live - retain_versions + 1`` and reclaim
    everything no remaining retained version references — commit
    dirs, commit-log entries below the floor's checkpoint, format-1
    ``_history`` JSONs. Per-commit GC already enforces each merge's
    own ``retain_versions`` as it goes; this is the administrative
    override for shrinking a horizon after the fact (a table merged
    with ``retain_versions=24`` for a backfill audit, vacuumed back
    to 1 when the audit closes) and for reclaiming crashed writers'
    aged-out staging orphans without waiting for the next commit.

    METADATA-ONLY and version-preserving: the pointer's ``floor``
    moves, the version does not (an expired time-travel read fails
    fast with the retention error, exactly as if per-commit GC had
    pruned it). ``dry_run=True`` measures without mutating. Orphan
    commit dirs younger than ``grace_seconds`` (default
    ``GC_GRACE_SECONDS``) are spared — they may be a live optimistic
    writer's staged-not-yet-flipped commit. Reader contract is
    Delta's: a concurrent reader still scanning a version this
    vacuum expires can lose files mid-scan — size the horizon to
    cover the longest reader.

    Returns ``{"version", "floor", "reclaimable_dirs",
    "reclaimable_files", "reclaimable_bytes", "dry_run"}`` (counts
    are commit-dir scoped — what THIS call can free)."""
    _validate_merge_args(None, retain_versions)
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        pointer = _read_pointer(lake_dir)
        if pointer is None:
            raise ValueError(f"lake at {lake_dir} has no manifest to vacuum")
        if "buckets" in pointer:
            raise ValueError(
                f"lake at {lake_dir} still carries a format-1 monolithic "
                "manifest; commit once (merge/compact) to migrate it to the "
                "commit-log format before vacuuming"
            )
        live_v = int(pointer["version"])
        old_floor = int(pointer.get("floor", 1))
        new_floor = max(old_floor, live_v - retain_versions + 1)
        # fail-closed like GC: if any version that must REMAIN
        # retained cannot be resolved, vacuum nothing
        retained = [
            _resolve_version(lake_dir, pointer, v)
            for v in range(new_floor, live_v + 1)
        ]
        live_commits = {
            p.split("/", 2)[1]
            for m in retained
            for p in m["buckets"].values()
            if p.startswith("commits/")
        }
        if grace_seconds is None:
            grace_seconds = GC_GRACE_SECONDS
        # the same enumeration the GC below will delete from — shared
        # so the (dry-run) report and the deletions can never drift
        candidates = _reclaimable_commit_dirs(lake_dir, live_commits, grace_seconds)
        commits_root = os.path.join(lake_dir, "commits")
        nbytes = nfiles = 0
        for d in candidates:
            for root, _dirs, files in os.walk(os.path.join(commits_root, d)):
                for f in files:
                    try:
                        nbytes += os.path.getsize(os.path.join(root, f))
                        nfiles += 1
                    except OSError:
                        pass
        report = {
            "version": live_v,
            "floor": new_floor,
            "reclaimable_dirs": len(candidates),
            "reclaimable_files": nfiles,
            "reclaimable_bytes": nbytes,
            "dry_run": dry_run,
        }
        if dry_run:
            return report
        if new_floor != old_floor:
            _commit_manifest(
                lake_dir, {"format": 2, "version": live_v, "floor": new_floor}
            )
        _gc_unreferenced(lake_dir, retained[-1], grace_seconds=grace_seconds)
        return report
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def delete_from_lake(
    spark,
    lake_dir: str,
    predicate: str,
    retain_versions: int = 2,
    max_records_per_file: int | None = None,
) -> dict:
    """DELETE FROM ... WHERE — row-level deletes by SQL predicate
    over the snapshot columns (``entity_id, last_seq, last_ts,
    last_type, item`` + the epoch's accreted columns). Matching
    VISIBLE rows flip to tombstones (``last_type='delete'``, payload
    columns nulled) keeping their LWW position (seq/ts unchanged — a
    retroactive redaction, the GDPR-purge shape): the key stays
    physically present so change feeds keep their new ⊇ old
    completeness invariant, and ``lake_changes_rows`` emits the
    redaction as ``delete`` rows carrying the removed content as the
    pre-image (visible→invisible is a delete regardless of seq/ts).

    Scale contract: one full-table locate pass (predicate pushed into
    the parquet scan where pushable — same as Delta DELETE's find-
    matching-files scan) whose only driver-side result is the
    METADATA-SIZED set of matching buckets + a count, then a rewrite
    of ONLY those buckets (k·(table/B) bytes) published through the
    same atomic flip as a merge. Buckets with no matches keep their
    pointers, stamps and zone maps untouched — a CDF consumer reads
    only the redacted buckets. Returns ``{"version",
    "deleted_buckets", "deleted_rows"}`` (version unchanged when
    nothing matched)."""
    _validate_merge_args(None, retain_versions)
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        manifest = _healed_manifest(lake_dir)
        if manifest is None:
            raise ValueError(f"lake at {lake_dir} has no manifest to delete from")
        rows = _read_live(spark, lake_dir, manifest)
        if rows is None:
            return {"version": manifest["version"], "deleted_buckets": 0, "deleted_rows": 0}
        hit = F.expr(predicate) & (F.col("last_type") != F.lit("delete"))
        located = rows.filter(hit).agg(
            F.count(F.lit(1)).alias("n"), F.collect_set("bucket").alias("bs")
        ).first()
        touched = sorted(located["bs"] or [])
        if not touched:
            return {"version": manifest["version"], "deleted_buckets": 0, "deleted_rows": 0}
        extras = _manifest_columns(manifest)
        bucket_rows = _read_live(spark, lake_dir, manifest, set(touched))
        rewritten = bucket_rows.select(
            "entity_id",
            "last_seq",
            "last_ts",
            F.when(hit, F.lit("delete")).otherwise(F.col("last_type")).alias("last_type"),
            F.when(hit, F.lit(None).cast("string")).otherwise(F.col("item")).alias("item"),
            "bucket",
            *[
                F.when(hit, F.lit(None).cast(c["type"]))
                .otherwise(F.col(c["name"]))
                .alias(c["name"])
                for c in extras
            ],
        ).repartition(len(touched), F.col("bucket"))
        new_manifest = _publish_version(
            lake_dir,
            manifest,
            rewritten,
            touched,
            manifest["n_buckets"],
            retain_versions,
            max_records_per_file=max_records_per_file,
            data_change=True,
        )
        return {
            "version": int(new_manifest["version"]),
            "deleted_buckets": len(touched),
            "deleted_rows": int(located["n"]),
        }
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def add_constraint(
    spark, lake_dir: str, name: str, expr: str, retain_versions: int = 2
) -> dict:
    """ALTER TABLE ... ADD CONSTRAINT ... CHECK — record a SQL
    predicate every future merge batch's visible rows must satisfy
    (enforced at write time by ``_enforce_constraints``; SQL-standard
    semantics — NULL passes, only FALSE violates). Like Delta, the
    EXISTING table is validated first (one scan of the visible rows —
    the honest cost of promising the invariant holds), then the
    constraint set is published as a METADATA-ONLY commit. A
    concurrent optimistic merge staged against the pre-constraint
    manifest detects the changed set at flip time and recomputes —
    re-validating under the new constraints — so no unvalidated batch
    can slip past the add."""
    if not name or not isinstance(name, str):
        raise ValueError(f"constraint name must be a non-empty string, got {name!r}")
    if not expr or not isinstance(expr, str):
        raise ValueError(f"constraint expr must be a non-empty SQL string, got {expr!r}")
    _validate_merge_args(None, retain_versions)
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        manifest = _healed_manifest(lake_dir)
        if manifest is None:
            raise ValueError(f"lake at {lake_dir} has no manifest to constrain")
        cons = dict(manifest.get("constraints", {}))
        if cons.get(name) == expr:
            return {"version": int(manifest["version"]), "constraints": cons}
        if name in cons:
            raise ValueError(
                f"constraint {name!r} already exists as {cons[name]!r}; "
                "drop it first (constraints never mutate in place)"
            )
        live = _read_live(spark, lake_dir, manifest)
        if live is not None:
            n_bad = (
                live.filter(F.col("last_type") != "delete")
                .filter(~F.coalesce(F.expr(expr), F.lit(True)))
                .count()
            )
            if n_bad:
                raise ConstraintViolationError(
                    f"cannot add constraint {name!r} ({expr!r}): {n_bad} existing "
                    "visible row(s) violate it"
                )
        cons[name] = expr
        new_manifest = _flip_version(
            lake_dir,
            manifest,
            commit_rel="",
            touched=[],
            n_buckets=manifest["n_buckets"],
            retain_versions=retain_versions,
            extra={"constraints": cons},
            data_change=False,  # pure metadata: CDF consumers skip it
            touched_rels={},
        )
        return {"version": int(new_manifest["version"]), "constraints": cons}
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def drop_constraint(lake_dir: str, name: str, retain_versions: int = 2) -> dict:
    """ALTER TABLE ... DROP CONSTRAINT — metadata-only commit
    removing one CHECK predicate; unknown names are a no-op returning
    the live version (Delta's IF EXISTS posture)."""
    _validate_merge_args(None, retain_versions)
    lock = _acquire_lock(lake_dir, wait_s=LOCKED_WAIT_S)
    try:
        manifest = _healed_manifest(lake_dir)
        if manifest is None:
            raise ValueError(f"lake at {lake_dir} has no manifest")
        cons = dict(manifest.get("constraints", {}))
        if name not in cons:
            return {"version": int(manifest["version"]), "constraints": cons}
        del cons[name]
        new_manifest = _flip_version(
            lake_dir,
            manifest,
            commit_rel="",
            touched=[],
            n_buckets=manifest["n_buckets"],
            retain_versions=retain_versions,
            extra={"constraints": cons},
            data_change=False,
            touched_rels={},
        )
        return {"version": int(new_manifest["version"]), "constraints": cons}
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def clone_lake(src_dir: str, dst_dir: str, version: int | None = None) -> dict:
    """SHALLOW CLONE — a zero-copy fork of the table at a version:
    the clone is a fresh lake whose version-1 commit repoints every
    bucket at the SOURCE's data directories by absolute path; no data
    bytes move. Writes to the clone are copy-on-write at bucket
    granularity — a merge/compact/delete repoints only its touched
    buckets at clone-local commit dirs, untouched buckets keep
    reading the source's files — and never touch the source (the
    clone's GC collects only clone-local dirs: absolute references
    are structurally outside its ``commits/`` namespace). The clone
    starts its own history at version 1 (expressed as an ordinary
    ``replace_all`` commit-log delta, so readers, CDF, OCC and GC
    need no special casing), carrying the source's schema epoch and
    zone maps (they describe exactly the referenced files).

    The Delta shallow-clone hazard carries over verbatim: the clone
    does NOT pin the source's files. A source VACUUM (or merge-GC)
    that expires the cloned version breaks the clone's unrewritten
    buckets — size the source's retention to cover the clone's
    lifetime, or compact the clone (a full physical rewrite
    localizes every bucket and severs the dependency). Returns
    ``{"version": 1, "n_buckets", "cloned_from"}``."""
    src_abs = os.path.abspath(src_dir)
    m = _manifest_at(src_abs, version)
    if m is None:
        raise ValueError(f"lake at {src_dir} has no manifest to clone")
    legacy = sorted(
        b for b, rel in m["buckets"].items() if rel.startswith("bucket=")
    )
    if legacy:
        # legacy root dirs partition-encode the bucket value (read
        # with basePath inference); an absolute clone reference would
        # read them as commit paths and lose the bucket column —
        # fail fast instead of committing unreadable pointers
        raise ValueError(
            f"lake at {src_dir} still carries pre-manifest legacy bucket "
            f"dirs ({len(legacy)}); run one merge/compact to migrate them "
            "into commit dirs before cloning"
        )
    os.makedirs(dst_dir, exist_ok=True)
    if _read_pointer(dst_dir) is not None:
        raise ValueError(f"clone destination {dst_dir} is already a lake")
    touched = {
        b: rel if os.path.isabs(rel) else os.path.join(src_abs, rel)
        for b, rel in m["buckets"].items()
    }
    extra: dict = {"cloned_from": {"source": src_abs, "version": int(m["version"])}}
    if m.get("columns"):
        extra["columns"] = list(m["columns"])
    delta = {
        "format": 2,
        "version": 1,
        "n_buckets": m["n_buckets"],
        "replace_all": True,
        "touched": touched,
        "data_change": True,
        "extra": extra,
        "committed_at": _next_commit_stamp(None),
    }
    if m.get("file_stats"):
        delta["file_stats"] = {
            b: st for b, st in m["file_stats"].items() if b in touched
        }
    manifest = _apply_delta(None, delta)
    os.makedirs(os.path.join(dst_dir, LOG_DIR), exist_ok=True)
    _atomic_write_json(_checkpoint_path(dst_dir, 1), manifest, sync_dir=True)
    _atomic_write_json(_delta_path(dst_dir, 1), delta, sync_dir=True)
    _commit_manifest(dst_dir, {"format": 2, "version": 1, "floor": 1})
    return {
        "version": 1,
        "n_buckets": int(m["n_buckets"]),
        "cloned_from": extra["cloned_from"],
    }


def lake_version_at(lake_dir: str, ts) -> int:
    """TIMESTAMP AS OF resolution: the NEWEST retained version whose
    commit instant is ≤ ``ts`` (Delta's rule; same-instant ties are
    impossible — commit stamps are strictly increasing by
    construction). ``ts`` is a unix-epoch float, a datetime (naive =
    UTC), or an ISO string. Driver-side commit-log reads only,
    O(retained). Fails fast when ``ts`` predates the oldest retained
    commit (its stamp is the earliest instant still resolvable) or
    when the retained range predates commit stamps entirely (a lake
    last written before stamps existed — commit once to stamp it)."""
    from datetime import datetime, timezone

    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    if isinstance(ts, datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        ts = ts.timestamp()
    pointer = _read_pointer(lake_dir)
    if pointer is None:
        raise ValueError(f"lake at {lake_dir} has no manifest")
    if "buckets" in pointer:
        raise ValueError(
            f"lake at {lake_dir} still carries a format-1 monolithic manifest "
            "(no commit stamps); commit once (merge/compact) to migrate"
        )
    floor, live_v = int(pointer.get("floor", 1)), int(pointer["version"])
    best, earliest = None, None
    for v in range(floor, live_v + 1):
        try:
            with open(_delta_path(lake_dir, v)) as fh:
                at = json.load(fh).get("committed_at")
        except FileNotFoundError:
            continue  # format-1 era of a migrated lake: unstamped
        if at is None:
            continue
        earliest = at if earliest is None else min(earliest, at)
        if at <= ts:
            best = v
    if best is None:
        if earliest is None:
            raise ValueError(
                f"lake at {lake_dir} has no commit stamps in its retained "
                "range (written before TIMESTAMP AS OF existed); commit once "
                "to stamp it"
            )
        raise ValueError(
            f"lake at {lake_dir}: no retained version committed at or before "
            f"{ts} (oldest retained commit is {earliest}; older versions are "
            "GC'd past the retention horizon)"
        )
    return best


def describe_detail(lake_dir: str, version: int | None = None) -> dict:
    """DESCRIBE DETAIL for the lake (the Delta command's analog):
    layout, physical footprint and schema epoch of one committed
    version (live by default) — version, commit instant, bucket
    count, file/byte/row totals, accreted columns, retention floor,
    and clone provenance when present. Bytes come from the
    filesystem, row counts from the parquet FOOTERS — driver-side
    metadata reads proportional to the version's file count, never
    the data (the explicit-command analog of the zone-map
    collection)."""
    import pyarrow.parquet as pq

    manifest = _manifest_at(lake_dir, version)
    if manifest is None:
        raise ValueError(f"lake at {lake_dir} has no manifest to describe")
    pointer = _read_pointer(lake_dir) or {}
    legacy, commits = _live_paths(lake_dir, manifest)
    nfiles = nbytes = nrows = 0
    for d in legacy + commits:
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(d, f)
            nfiles += 1
            nbytes += os.path.getsize(p)
            nrows += pq.read_metadata(p).num_rows
    out = {
        "version": int(manifest["version"]),
        "n_buckets": int(manifest["n_buckets"]),
        "num_files": nfiles,
        "size_bytes": nbytes,
        "num_rows": nrows,  # physical rows incl. tombstones
        "columns": [c["name"] for c in _manifest_columns(manifest)],
        "floor": int(pointer.get("floor", 1)) if "buckets" not in pointer else 1,
    }
    if manifest.get("committed_at") is not None:
        out["committed_at"] = _epoch_iso(manifest["committed_at"])
    if manifest.get("cloned_from"):
        out["cloned_from"] = dict(manifest["cloned_from"])
    return out


def _epoch_iso(at: float) -> str:
    from datetime import datetime, timezone

    return datetime.fromtimestamp(float(at), tz=timezone.utc).isoformat(
        timespec="microseconds"
    )


def _next_commit_stamp(base_at) -> float:
    """µs-rounded wall clock, strictly greater than the base
    version's stamp (see the ``committed_at`` comment in
    ``_flip_version``)."""
    import time

    at = round(time.time(), 6)
    if base_at is not None and at <= float(base_at):
        at = round(float(base_at) + 1e-6, 6)
    return at


def read_lake_snapshot(
    spark, lake_dir: str, buckets=None, version: int | None = None, timestamp=None
) -> DataFrame:
    """Consumer view of the merged lake table, resolved through the
    manifest (orphaned / half-committed files are invisible by
    construction): tombstones filtered (purge semantics). Pass
    ``buckets`` to prune a point read to the key's bucket — path
    pruning, no file outside those buckets is even opened. Pass
    ``version`` to time-travel to an earlier committed snapshot (the
    version must be inside the merge's ``retain_versions`` horizon),
    or ``timestamp`` (TIMESTAMP AS OF — resolved to the newest
    retained version committed at or before it, ``lake_version_at``);
    a version is just a different manifest, so the read plan is
    identical to a live read. Reader-vs-GC contract (same as Delta
    VACUUM): the manifest is resolved at open, so a writer GC'ing
    that version can invalidate an in-flight scan — size
    ``retain_versions`` to cover the longest concurrent reader.
    Falls back to a direct read for pre-manifest lakes."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version or timestamp, not both")
        version = lake_version_at(lake_dir, timestamp)
    manifest = _manifest_at(lake_dir, version)
    if manifest is None:
        if version is not None:
            raise ValueError(f"lake at {lake_dir} has no manifest to time-travel in")
        df = spark.read.parquet(lake_dir)
    else:
        df = _read_live(spark, lake_dir, manifest, set(buckets) if buckets is not None else None)
        if df is None:
            raise ValueError(f"lake at {lake_dir} has an empty manifest bucket set")
    return df.filter(F.col("last_type") != "delete")


#: canonical snapshot-row schema (what _read_live returns)
_SNAPSHOT_SCHEMA = (
    "entity_id string, last_seq bigint, last_ts timestamp_ntz, "
    "last_type string, item string, bucket int"
)


def _snapshot_schema(extras: list[dict]) -> str:
    """The core snapshot schema extended with a manifest's accreted
    columns — for building empty frames under the right epoch."""
    return _SNAPSHOT_SCHEMA + "".join(f", {c['name']} {c['type']}" for c in extras)


def lake_point_read(
    spark, lake_dir: str, keys: list, version: int | None = None
) -> DataFrame:
    """Pruned point read: hash the requested keys to their buckets
    under the manifest's pinned layout (a metadata-sized computation
    on the key list itself — the one driver-side step, proportional
    to the keys you asked for, never the table) and read ONLY those
    bucket directories, then filter to the keys. This is the lookup
    path a serving layer uses: at 100 TB a k-key read opens
    ≤k·(table/B) bytes regardless of table size, and stays correct
    across ``rebucket_lake`` layout changes because the manifest is
    resolved ONCE and both the bucket computation and the read use
    that same manifest (a rebucket committing between two separate
    resolutions could otherwise prune under the wrong layout). Keys
    hashing to never-written buckets simply contribute no rows —
    the normal missing-key lookup outcome.

    Below the bucket pruning sits FILE pruning: buckets last written
    by a clustered compaction carry per-file entity_id zone maps in
    the manifest (``file_stats``), so only the files whose [min, max]
    range overlaps a requested key are opened — after an OPTIMIZE, a
    key touches ≤1 file of its bucket no matter how many the valve
    split it into. Buckets without stats (fresh merges) read whole,
    conservative."""
    manifest = _manifest_at(lake_dir, version)
    if manifest is None:
        raise ValueError(f"lake at {lake_dir} has no manifest for point reads")
    key_strs = [str(k) for k in keys]
    bucket_keys: dict[int, list] = {}
    if key_strs:
        kdf = spark.createDataFrame([(k,) for k in key_strs], "entity_id string")
        for r in kdf.select(
            "entity_id",
            F.pmod(F.xxhash64("entity_id"), F.lit(manifest["n_buckets"]))
            .cast("int")
            .alias("b"),
        ).collect():
            bucket_keys.setdefault(r["b"], []).append(r["entity_id"])
    zone_maps = manifest.get("file_stats", {})
    plain, pruned_files = set(), []
    for b, b_keys in bucket_keys.items():
        stats = zone_maps.get(str(b))
        rel = manifest["buckets"].get(str(b))
        if stats is None or rel is None or rel.startswith("bucket="):
            plain.add(b)  # no stats (or legacy layout): whole bucket
            continue
        # prune each bucket's files against ITS OWN resident keys
        # only — a foreign key's range overlap in another bucket is
        # meaningless (the key cannot live there) and testing it
        # would open up to |keys| files per bucket instead of ≤1 per
        # resident key.
        for f, entry in sorted(stats.items()):
            mn, mx = _file_key_range(entry)
            if any(mn <= k <= mx for k in b_keys):
                pruned_files.append(os.path.join(lake_dir, rel, f))
    extras = _manifest_columns(manifest)
    parts = []
    base = _read_live(spark, lake_dir, manifest, plain) if plain else None
    if base is not None:
        parts.append(base)  # already schema-epoch aligned
    if pruned_files:
        reader = spark.read
        if extras:  # mixed-epoch files: see _read_live's mergeSchema note
            reader = reader.option("mergeSchema", "true")
        parts.append(_align_extras(reader.parquet(*pruned_files), extras))
    if not parts:  # every requested bucket unwritten / fully pruned
        df = spark.createDataFrame([], _snapshot_schema(extras))
    else:
        from functools import reduce

        df = reduce(lambda a, b: a.unionByName(b), parts)
    return df.filter(
        (F.col("last_type") != "delete") & F.col("entity_id").isin(key_strs)
    )


def lake_time_read(
    spark, lake_dir: str, ts_from, ts_to, version: int | None = None
) -> DataFrame:
    """Time-bounded lake read: consumer-view rows whose ``last_ts``
    falls in ``[ts_from, ts_to)``. Below the manifest resolution sits
    FILE pruning on the time axis: buckets whose zone maps carry
    per-file ``last_ts`` [min, max] ranges (recorded from the parquet
    footers by a clustered OPTIMIZE) open only the files overlapping
    the requested window — when keys correlate with time (the common
    case for id-assigned-over-time entities), a narrow window opens a
    small fraction of each bucket instead of the whole dir. Buckets
    without stats read whole and filter — conservative, never wrong
    (the predicate is re-applied to every row either way, so pruning
    is purely an I/O optimization). Bounds accept datetimes (naive =
    UTC) or ISO strings; this is the read path a CDF backfill or a
    time-sliced export uses at 100 TB."""
    from datetime import datetime, timezone

    def norm(v) -> datetime:
        if isinstance(v, str):
            v = datetime.fromisoformat(v)
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v

    lo, hi = norm(ts_from), norm(ts_to)
    manifest = _manifest_at(lake_dir, version)
    if manifest is None:
        raise ValueError(f"lake at {lake_dir} has no manifest for time reads")
    zone_maps = manifest.get("file_stats", {})
    plain, pruned_files = set(), []
    for b_str, rel in manifest["buckets"].items():
        stats = zone_maps.get(b_str)
        if (
            stats is None
            or rel.startswith("bucket=")
            or not all(isinstance(e, dict) and "last_ts" in e for e in stats.values())
        ):
            plain.add(int(b_str))  # no time stats: whole bucket
            continue
        for f, entry in sorted(stats.items()):
            mn, mx = (datetime.fromisoformat(x) for x in entry["last_ts"])
            if mx >= lo and mn < hi:
                pruned_files.append(os.path.join(lake_dir, rel, f))
    extras = _manifest_columns(manifest)
    parts = []
    base = _read_live(spark, lake_dir, manifest, plain) if plain else None
    if base is not None:
        parts.append(base)  # already schema-epoch aligned
    if pruned_files:
        reader = spark.read
        if extras:  # mixed-epoch files: see _read_live's mergeSchema note
            reader = reader.option("mergeSchema", "true")
        parts.append(_align_extras(reader.parquet(*pruned_files), extras))
    if not parts:
        df = spark.createDataFrame([], _snapshot_schema(extras))
    else:
        from functools import reduce

        df = reduce(lambda a, b: a.unionByName(b), parts)
    # compare in NTZ: the lake's last_ts may be LTZ or NTZ depending
    # on the producing envelope; the session TZ is pinned UTC so the
    # cast is value-preserving either way, and mixed NTZ/LTZ
    # comparisons are a type error in Spark 4
    ts = F.col("last_ts").cast("timestamp_ntz")
    return df.filter(
        (F.col("last_type") != "delete")
        & (ts >= F.lit(lo).cast("timestamp_ntz"))
        & (ts < F.lit(hi).cast("timestamp_ntz"))
    )


def describe_history(lake_dir: str, limit: int | None = None) -> list[dict]:
    """DESCRIBE HISTORY for the lake (the Delta command's analog):
    one row per RETAINED committed version, newest first — version,
    operation kind (merge / compact / rebucket, inferred from the
    commit markers), layout, how many buckets the commit
    data-changed (0 for a compaction: physical-only), and whether it
    is the live version. Driver-side JSON reads only — proportional
    to the retention horizon, never the data. Versions GC'd past
    ``retain_versions`` are absent by construction (their history
    JSON is pruned with their data)."""

    def hist_row(
        v: int,
        markers: dict,
        n_buckets: int,
        data_changed: int,
        is_live: bool,
        committed_at=None,
    ) -> dict:
        if int(markers.get("rebucket", {}).get("version", -1)) == v:
            op = "rebucket"
        elif int(markers.get("compaction", {}).get("version", -1)) == v:
            op = "compact"
        else:
            op = "merge"
        row = {
            "version": v,
            "operation": op,
            "n_buckets": n_buckets,
            "data_changed_buckets": data_changed,
            "is_live": is_live,
        }
        if committed_at is not None:
            row["committed_at"] = _epoch_iso(committed_at)
        return row

    pointer = _read_pointer(lake_dir)
    if pointer is not None and "buckets" not in pointer:
        # format 2: one row per retained commit-LOG entry — the delta
        # already carries the op markers and the touched-bucket count,
        # so no full manifest is resolved (O(retained) tiny JSON reads)
        floor, live_v = int(pointer.get("floor", 1)), int(pointer["version"])
        out = []
        for v in range(live_v, floor - 1, -1):
            if limit is not None and len(out) >= limit:
                break
            try:
                with open(_delta_path(lake_dir, v)) as fh:
                    delta = json.load(fh)
            except FileNotFoundError:
                # format-1 era of a migrated lake: its retained
                # _history manifest still describes it
                try:
                    with open(
                        os.path.join(lake_dir, HISTORY_DIR, f"{v:010d}.json")
                    ) as fh:
                        m = json.load(fh)
                except FileNotFoundError:
                    continue
                dv = m.get("data_versions", {})
                out.append(
                    hist_row(
                        v, m, m["n_buckets"],
                        sum(1 for x in dv.values() if x == v), False,
                    )
                )
                continue
            out.append(
                hist_row(
                    v,
                    delta.get("extra", {}),
                    delta["n_buckets"],
                    len(delta["touched"]) if delta["data_change"] else 0,
                    v == live_v,
                    committed_at=delta.get("committed_at"),
                )
            )
        return out
    live = pointer
    hist = os.path.join(lake_dir, HISTORY_DIR)
    try:
        names = sorted(os.listdir(hist), reverse=True)
    except FileNotFoundError:
        names = []

    def row(m: dict) -> dict:
        v = m["version"]
        return hist_row(
            v,
            m,
            m["n_buckets"],
            sum(1 for dv in m.get("data_versions", {}).values() if dv == v),
            bool(live) and live["version"] == v,
        )

    out: list[dict] = []
    # a writer killed between the flip and the history write leaves
    # the LIVE version absent from _history/ until the next op heals
    # it — report it anyway (the manifest is authoritative)
    if live is not None and f"{live['version']:010d}.json" not in names:
        out.append(row(live))
    for fn in names:
        if not fn.endswith(".json"):
            continue
        if limit is not None and len(out) >= limit:
            break
        with open(os.path.join(hist, fn)) as fh:
            m = json.load(fh)
        out.append(row(m))
    return out[:limit] if limit is not None else out


def _bucket_content_changed(m_old: dict | None, m_new: dict, b_str: str) -> bool:
    """Can bucket ``b_str``'s CONTENT differ between two committed
    manifests of the same layout? Pointer equality proves identity
    (commit dirs are immutable). A moved pointer with EQUAL
    ``data_versions`` stamps proves the move came only from
    physical-only commits (compaction) — skip it: this is Delta CDF's
    ``dataChange=false`` skip at bucket granularity, and it is what
    keeps a routine OPTIMIZE from costing every change-feed consumer
    a full re-read of the compacted buckets to emit zero rows. A
    missing stamp on either side (pre-``data_versions`` manifests)
    falls back to the conservative pointer comparison."""
    if m_old is None:
        return True
    rel = m_new["buckets"].get(b_str)
    if m_old["buckets"].get(b_str) == rel:
        return False
    dv_new = m_new.get("data_versions", {}).get(b_str)
    dv_old = m_old.get("data_versions", {}).get(b_str)
    if dv_new is not None and dv_old is not None and dv_new == dv_old:
        return False
    return True


def _cdf_frames(
    spark, lake_dir: str, from_version: int, to_version: int | None, caller: str
):
    """Shared preamble of both change feeds: resolve the two
    manifests, compute the data-changed bucket set (pointer diff
    refined by the ``data_versions`` stamps — physical-only pointer
    moves are skipped; a rebucket degrades to a layout-independent
    full diff, each side through its OWN manifest), and return
    ``(new_df, old_df)`` pruned to those buckets — ``(None, None)``
    when nothing data-changed. Ordinary commits never physically drop
    rows (tombstones persist), so new ⊇ old keys — but a RESTORE
    reverts the table to a version predating some keys' first
    appearance, so the bucket walk takes the UNION of both manifests'
    bucket sets and the feeds join FULL OUTER: vanished keys surface
    as deletes instead of silently disappearing."""
    m_new = _manifest_at(lake_dir, to_version)
    if m_new is None:
        raise ValueError(f"lake at {lake_dir} has no manifest")
    # from_version=0 = "from empty" (Delta CDF's startingVersion=0):
    # the first version's whole snapshot arrives as inserts/deletes.
    # Only 0 is the from-empty sentinel — a negative from_version is a
    # caller bug and must not silently return a full load.
    if from_version < 0:
        raise ValueError(
            f"{caller}: from_version must be >= 0 (0 = from empty), "
            f"got {from_version}"
        )
    m_old = _manifest_at(lake_dir, from_version) if from_version >= 1 else None
    if m_old is not None and m_old["n_buckets"] != m_new["n_buckets"]:
        # a rebucket between the versions: bucket ids mean different
        # hash ranges, so pointer-diff pruning is meaningless — read
        # both sides fully (each through its OWN manifest, so old-
        # layout-only buckets are not dropped). The entity-level join
        # below is layout-independent; a rebucket is a rare full
        # rewrite anyway, so the feed matching its cost is honest.
        changed_new = {int(b) for b in m_new["buckets"]}
        changed_old = {int(b) for b in m_old["buckets"]}
    else:
        # pointer diff refined by the per-bucket dataChange stamps:
        # a bucket whose pointer moved only through physical-only
        # commits (compaction) in (from, to] is provably identical
        # and is neither read nor joined. The union of both bucket
        # sets matters only across a restore (a bucket first written
        # after the restored-to version exists in old but not new —
        # its keys vanished and must emit deletes).
        all_b = set(m_new["buckets"]) | set(m_old["buckets"] if m_old else ())
        changed_new = {
            int(b) for b in all_b if _bucket_content_changed(m_old, m_new, b)
        }
        changed_old = changed_new
    if not changed_new:
        return None, None
    new_df = _read_live(spark, lake_dir, m_new, changed_new)
    old_df = _read_live(spark, lake_dir, m_old, changed_old) if m_old else None
    if new_df is None and old_df is None:
        return None, None
    if new_df is None:
        new_df = spark.createDataFrame([], old_df.schema)
    if old_df is None:
        old_df = spark.createDataFrame([], new_df.schema)
    return new_df, old_df


def _resolve_change_bounds(
    lake_dir: str,
    from_version,
    to_version,
    from_timestamp,
    to_timestamp,
    caller: str,
) -> tuple:
    """Version bounds for a change feed, from versions or commit
    instants (TIMESTAMP AS OF each end: the snapshot state AT the
    instant is the diff endpoint — 'what changed between instant A
    and instant B')."""
    if from_version is not None and from_timestamp is not None:
        raise ValueError(f"{caller}: pass from_version or from_timestamp, not both")
    if from_version is None and from_timestamp is None:
        raise ValueError(f"{caller}: pass from_version or from_timestamp")
    if to_version is not None and to_timestamp is not None:
        raise ValueError(f"{caller}: pass to_version or to_timestamp, not both")
    if from_timestamp is not None:
        from_version = lake_version_at(lake_dir, from_timestamp)
    if to_timestamp is not None:
        to_version = lake_version_at(lake_dir, to_timestamp)
    return from_version, to_version


def lake_changes(
    spark,
    lake_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
    from_timestamp=None,
    to_timestamp=None,
) -> DataFrame:
    """Change-data-feed between two committed versions: one row per
    entity whose snapshot state differs, with the POST-image and a
    ``change_type`` (insert / update / delete — delete meaning the
    entity's latest state became a tombstone).

    Scale contract: versions are manifests, so the changed-entity set
    is computed by reading ONLY the buckets whose manifest pointers
    differ between the two versions (path-level pruning — a merge
    that touched k of B buckets makes this a k·(table/B) read, never
    a table scan), then an entity-level anti-equality join of old vs
    new within those buckets. Ordinary commits never physically drop
    rows (tombstones persist), so new ⊇ old keys — except across a
    RESTORE, which reverts the table to a version predating some
    keys' first appearance: the join is FULL OUTER, and a VANISHED
    key (present and visible in old, physically absent in new) emits
    ``change_type='delete'`` with NULL post-image columns (there is
    no post-image — consumers keyed on entity_id drop the key; a
    restore is the only producer of such rows). Bounds are versions
    or commit instants (``from_timestamp``/``to_timestamp`` —
    TIMESTAMP AS OF each end)."""
    from_version, to_version = _resolve_change_bounds(
        lake_dir, from_version, to_version, from_timestamp, to_timestamp, "lake_changes"
    )
    new_df, old_df = _cdf_frames(spark, lake_dir, from_version, to_version, "lake_changes")
    schema = (
        "entity_id string, change_type string, last_seq bigint, "
        "last_ts timestamp_ntz, last_type string, item string"
    )
    if new_df is None:
        return spark.createDataFrame([], schema)
    n, o = new_df.alias("n"), old_df.select("entity_id", "last_seq", "last_ts", "last_type").alias("o")
    new_exists = F.col("n.last_seq").isNotNull()
    old_exists = F.col("o.last_seq").isNotNull()
    return (
        n.join(o, "entity_id", "full_outer")
        .filter(
            ~old_exists
            | (~new_exists & (F.col("o.last_type") != "delete"))
            | (F.col("o.last_seq") != F.col("n.last_seq"))
            | (F.col("o.last_ts") != F.col("n.last_ts"))
        )
        .select(
            "entity_id",
            F.when(~new_exists | (F.col("n.last_type") == "delete"), F.lit("delete"))
            .when(
                ~old_exists | (F.col("o.last_type") == "delete"),
                F.lit("insert"),
            )
            .otherwise(F.lit("update"))
            .alias("change_type"),
            F.col("n.last_seq").alias("last_seq"),
            F.col("n.last_ts").alias("last_ts"),
            F.col("n.last_type").alias("last_type"),
            F.col("n.item").alias("item"),
        )
    )


def lake_changes_rows(
    spark,
    lake_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
    from_timestamp=None,
    to_timestamp=None,
) -> DataFrame:
    """Row-level change feed WITH PRE-IMAGES — Delta CDF's full
    ``_change_type`` vocabulary over the consumer view (tombstones
    filtered on both sides):

    - visible in new only            → one ``insert`` row (new values)
    - visible in both, values differ → ``update_preimage`` (old
      values) + ``update_postimage`` (new values)
    - visible in old only            → one ``delete`` row (OLD values
      — the content that was removed, not the tombstone)

    Pre-images are what make downstream aggregates INCREMENTALLY
    maintainable without keeping per-entity state: every emitted row
    carries a sign (+1 for insert/update_postimage, -1 for
    delete/update_preimage), so ``gold += sign · f(row)`` folds the
    feed into any group-by sum/count — the retraction algebra
    streaming engines call upsert→retract conversion. The old rows
    are already in the buckets this feed must read for the diff, so
    pre-images cost ZERO extra I/O over ``lake_changes``; the same
    stamp-refined pointer pruning applies (compactions skipped,
    k·(table/B) reads). A tombstone refreshed by a newer tombstone is
    logically absent→absent and emits NOTHING here (the entity-state
    feed ``lake_changes`` reports it; this feed is the logical-row
    view). Emission is one pass: the joined row builds an array of
    candidate change structs, filters nulls, explodes — no
    re-reading the join output per change type."""
    from_version, to_version = _resolve_change_bounds(
        lake_dir,
        from_version,
        to_version,
        from_timestamp,
        to_timestamp,
        "lake_changes_rows",
    )
    new_df, old_df = _cdf_frames(
        spark, lake_dir, from_version, to_version, "lake_changes_rows"
    )
    schema = (
        "entity_id string, change_type string, last_seq bigint, "
        "last_ts timestamp_ntz, last_type string, item string"
    )
    if new_df is None:
        return spark.createDataFrame([], schema)
    n = new_df.alias("n")
    o = old_df.select("entity_id", "last_seq", "last_ts", "last_type", "item").alias("o")
    # old-row existence via a never-null payload column: the USING
    # join coalesces entity_id itself, so the o-side key is not
    # addressable after the join
    old_vis = F.col("o.last_seq").isNotNull() & (F.col("o.last_type") != "delete")
    # null-guarded: across a RESTORE a key can be physically ABSENT
    # on the new side (the table reverted to before its first
    # appearance) — visible→absent is a delete like any other, and
    # the old values are already in hand for the pre-image
    new_vis = F.col("n.last_seq").isNotNull() & (F.col("n.last_type") != "delete")
    updated = (
        old_vis
        & new_vis
        & (
            (F.col("o.last_seq") != F.col("n.last_seq"))
            | (F.col("o.last_ts") != F.col("n.last_ts"))
        )
    )

    def change(kind: str, side: str):
        return F.struct(
            F.lit(kind).alias("change_type"),
            F.col(f"{side}.last_seq").alias("last_seq"),
            F.col(f"{side}.last_ts").alias("last_ts"),
            F.col(f"{side}.last_type").alias("last_type"),
            F.col(f"{side}.item").alias("item"),
        )

    null_change = F.lit(None).cast(
        "struct<change_type:string,last_seq:bigint,last_ts:timestamp_ntz,"
        "last_type:string,item:string>"
    )
    changes = F.array(
        F.when(~old_vis & new_vis, change("insert", "n")).otherwise(null_change),
        F.when(updated, change("update_preimage", "o")).otherwise(null_change),
        F.when(updated, change("update_postimage", "n")).otherwise(null_change),
        F.when(old_vis & ~new_vis, change("delete", "o")).otherwise(null_change),
    )
    return (
        n.join(o, "entity_id", "full_outer")
        .select(
            "entity_id",
            F.explode(F.filter(changes, lambda c: c.isNotNull())).alias("c"),
        )
        .select("entity_id", "c.*")
    )
