"""Streaming change-data-feed SOURCE over the manifest-versioned lake
— the ``spark.readStream.format("delta").option("readChangeFeed", ...)``
analog for the plain-parquet lake, built on Spark 4's Python streaming
Data Source API (``pyspark.sql.datasource``).

This closes the loop the reference's consumers rely on: downstream
subscribers incrementally react to committed changes (the cache /
bus consumers of ``src/plugins/nats.js:23-28``) instead of rescanning
the table. Offsets are manifest VERSIONS (each ``merge_batch_into_lake``
commit is one version, ``materialize.py``), so the streaming
checkpoint's offset log gives exactly-once incremental consumption:
a restarted consumer resumes at the committed version and never
re-emits or skips a change.

Scale contract (the same one ``lake_changes`` documents):

- ``latestOffset`` is a driver-side JSON read of
  ``_lapidus_manifest.json`` — no file listing, no scan.
- ``partitions(start, end)`` expands the version range into one input
  partition per (version step, changed bucket), where "changed" is a
  manifest POINTER diff — a merge that touched k of B buckets yields
  k partitions reading k·(table/B) bytes, never a table scan, and the
  per-version stepping makes the emitted row set independent of how
  versions group into micro-batches (deterministic replay).
- ``read`` runs on executors: pyarrow reads the old/new bucket files
  (column-pruned), diffs per entity in pandas, and yields one Arrow
  RecordBatch — the layout pins an entity to its bucket, so the
  per-bucket diff equals the global diff.

Physical-only commits are free: a compaction (OPTIMIZE) moves bucket
pointers without changing content, and the manifest's per-bucket
``data_versions`` stamps prove it — those version steps plan ZERO
partitions (Delta CDF's ``dataChange=false`` skip), so routine table
maintenance never costs subscribers a re-read. A marked rebucket
commit is likewise snapshot-identical (a pure layout swap) and its
step is skipped; consumers stream straight across it.

Failure posture: a layout change WITHOUT a rebucket marker (foreign
writer, manual surgery) is not interpretable, so the source raises
and the consumer restarts from a full snapshot; a version GC'd past
``retain_versions`` raises with the retention knob named. Rate
limiting via ``maxVersionsPerBatch`` is admission control only —
content is per-version either way.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

#: source schema. last_ts is the stored instant (the queries cast to
#: timestamp_ntz at the edge, like every other lake read); ver is the
#: manifest version whose commit produced the change.
CDF_SCHEMA = (
    "entity_id string, change_type string, last_seq bigint, "
    "last_ts timestamp, last_type string, item string, ver int"
)

_NEW_COLS = ["entity_id", "last_seq", "last_ts", "last_type", "item"]
_OLD_COLS = ["entity_id", "last_seq", "last_ts", "last_type"]
#: rowChanges=true needs the old payload too: pre-image rows carry
#: the OLD values in the same value columns
_OLD_COLS_PRE = ["entity_id", "last_seq", "last_ts", "last_type", "item"]


def _live_version(lake_dir: str, default: int = 0) -> int:
    """Driver-side read of the live manifest version (one JSON open,
    the whole latestOffset cost model); ``default`` for a lake with
    no manifest yet."""
    try:
        with open(os.path.join(lake_dir, "_lapidus_manifest.json")) as fh:
            return int(json.load(fh)["version"])
    except FileNotFoundError:
        return default


class LakeCDFPartition(InputPartition):
    """One (version step, changed bucket): absolute parquet paths for
    the bucket's state at ``ver`` (new) and ``ver - 1`` (old)."""

    def __init__(self, ver: int, bucket: int, new_files: list, old_files: list):
        self.ver = ver
        self.bucket = bucket
        self.new_files = new_files
        self.old_files = old_files


def _bucket_files(lake_dir: str, manifest: dict | None, bucket: int) -> list:
    """Driver-side: the parquet files backing one bucket of one
    committed version (manifest pointers are dirs; commit dirs carry
    ``bucket`` as a data column, legacy ``bucket=K`` dirs encode it in
    the path — the diff needs neither, only the entity columns)."""
    if manifest is None:
        return []
    rel = manifest["buckets"].get(str(bucket))
    if rel is None:
        return []
    d = os.path.join(lake_dir, rel)
    if not os.path.isdir(d):
        # a retained manifest's pointers are covered by the reader-vs-GC
        # contract: a missing dir is corruption (partial restore, manual
        # deletion), and reading it as "empty" would silently re-emit the
        # whole bucket as inserts — fail fast instead.
        raise ValueError(
            f"lake_cdf: manifest of {lake_dir} references missing bucket "
            f"dir {rel!r} — lake corrupted (partial restore?); restore the "
            "dir or restart the consumer from a full snapshot"
        )
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _read_side(files: list, cols: list):
    """Executor-side: one side of a bucket diff as pandas
    (column-pruned pyarrow reads; empty typed frame for no files)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not files:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    tbl = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
    return tbl.to_pandas()


def _entity_state_changes(m):
    """Executor-side entity-state diff over an outer-merged frame
    (suffixes ("", "_o")): keep entities whose (last_seq, last_ts)
    changed, type the change. Returns ``{"m": filtered_frame,
    "change_type": np.array}`` or None when nothing changed — shared
    by the per-table and catalog-level CDF sources."""
    import numpy as np

    missing_old = m["last_seq_o"].isna().to_numpy(dtype=bool)
    missing_new = m["last_seq"].isna().to_numpy(dtype=bool)
    changed = (
        missing_old
        | missing_new
        | m["last_seq_o"].ne(m["last_seq"]).fillna(False).to_numpy(dtype=bool)
        | (m["last_ts_o"] != m["last_ts"]).to_numpy(dtype=bool)
    )
    # a vanished TOMBSTONE is absent→absent: emit nothing (the
    # visible-vanished keys keep their delete row below)
    old_invisible = missing_old | m["last_type_o"].eq("delete").to_numpy(dtype=bool)
    m = m[changed & ~(missing_new & old_invisible)]
    if m.empty:
        return None
    vanished = m["last_seq"].isna().to_numpy(dtype=bool)
    is_tomb = m["last_type"].eq("delete").to_numpy(dtype=bool) | vanished
    was_absent = m["last_seq_o"].isna() | m["last_type_o"].eq("delete")
    change_type = np.where(
        is_tomb, "delete", np.where(was_absent, "insert", "update")
    )
    return {"m": m, "change_type": change_type}


def _state_record_batch(
    m, change_type, ver: int, tbl: str | None = None, tbl_ver: int | None = None
):
    """One Arrow batch of entity-state change rows; with ``tbl`` the
    catalog-level feed's discriminator column leads, and ``tbl_ver``
    appends the underlying TABLE version the step diffed — the
    within-catalog-version ordering column (one catalog step can span
    several table-version steps when a member table received direct
    non-catalog data commits between txs; without it a folding
    consumer could not apply same-``ver`` rows in commit order)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # stored instants are UTC-normalized (Spark parquet writer);
    # stamping the zone makes the Arrow->Catalyst handoff
    # session-timezone-proof.
    ts = pc.assume_timezone(
        pa.Array.from_pandas(m["last_ts"], type=pa.timestamp("us")), "UTC"
    )
    arrays = [
        pa.Array.from_pandas(m["entity_id"], type=pa.string()),
        pa.array(change_type, type=pa.string()),
        pa.Array.from_pandas(m["last_seq"], type=pa.int64()),
        ts,
        pa.Array.from_pandas(m["last_type"], type=pa.string()),
        pa.Array.from_pandas(m["item"], type=pa.string()),
        pa.array([ver] * len(m), type=pa.int32()),
    ]
    names = ["entity_id", "change_type", "last_seq", "last_ts",
             "last_type", "item", "ver"]
    if tbl_ver is not None:
        arrays.append(pa.array([tbl_ver] * len(m), type=pa.int32()))
        names.append("tbl_ver")
    if tbl is not None:
        arrays = [pa.array([tbl] * len(m), type=pa.string()), *arrays]
        names = ["tbl", *names]
    return pa.record_batch(arrays, names=names)


def _plan_version_steps(lake_dir: str, s: int, e: int, caller: str = "lake_cdf"):
    """Driver-side planning shared by the per-table and catalog-level
    CDF sources: expand the version range (s, e] into
    ``(ver, bucket, new_files, old_files)`` tuples — one per (version
    step, data-changed bucket). All the scale properties live here:
    per-version stepping (deterministic replay independent of batch
    grouping), pointer-diff bucket pruning refined by the
    ``data_versions`` stamps (physical-only commits plan ZERO
    partitions), marked-rebucket steps skipped as snapshot-identical,
    unmarked layout changes refused."""
    from lapidus_spark.streaming.materialize import (
        _bucket_content_changed,
        _manifest_at,
    )

    parts = []
    m_prev: dict | None = None
    for v in range(s + 1, e + 1):
        # _manifest_at raises for a GC'd version, naming the
        # retain_versions horizon — the consumer lagged past
        # retention and must restart from a full snapshot.
        # Carrying m_new forward as the next step's m_old halves
        # the driver-side manifest reads on long catch-ups.
        m_new = _manifest_at(lake_dir, v)
        m_old = (
            m_prev
            if m_prev is not None
            else (_manifest_at(lake_dir, v - 1) if v - 1 >= 1 else None)
        )
        m_prev = m_new
        if m_old is not None and m_old["n_buckets"] != m_new["n_buckets"]:
            reb = m_new.get("rebucket")
            if reb is not None and int(reb.get("version", -1)) == v:
                # marked rebucket commit: rebucket_lake reads the
                # live snapshot and only re-hashes the bucket
                # column, published as one atomic flip — the step
                # is snapshot-identical, so the correct change feed
                # for it is ZERO rows. Skip it (zero partitions,
                # zero bucket reads) and keep streaming; the next
                # step diffs within the new layout. This matches
                # the batch twin's layout-independent diff (which
                # would read both sides in full to emit the same
                # zero rows) at none of its cost.
                continue
            raise ValueError(
                f"{caller}: bucket layout changed between versions {v - 1} "
                f"and {v} ({m_old['n_buckets']} -> {m_new['n_buckets']} "
                "buckets) without a rebucket marker — bucket ids are not "
                "comparable across layouts; restart the consumer from a "
                "full snapshot at or after the layout change"
            )
        # union of both bucket sets: a RESTORE can revert to a
        # version predating a bucket's first write — its keys
        # VANISHED and the old-only bucket must still be diffed
        # (new side empty → delete rows), or subscribers would
        # silently keep the retracted keys.
        all_b = set(m_new["buckets"]) | set(m_old["buckets"] if m_old else ())
        for b_str in sorted(all_b, key=int):
            b = int(b_str)
            if not _bucket_content_changed(m_old, m_new, b_str):
                # pointer unchanged, or moved only by physical-only
                # commits (compaction — dataChange=false): content
                # provably identical, skip without reading.
                continue
            parts.append(
                (
                    v,
                    b,
                    _bucket_files(lake_dir, m_new, b),
                    _bucket_files(lake_dir, m_old, b),
                )
            )
    return parts



def _row_change_batches(m, ver: int) -> Iterator:
    """rowChanges=true executor path: the row-level Delta-CDF
    vocabulary over the consumer view (the executor-side twin of
    ``lake_changes_rows``, same semantics test-pinned there —
    SHARED by the streaming ``lake_cdf`` source and the batch
    ``format("lake")`` changes relation, so a drained stream and a
    catch-up batch read emit identical pre/post-image rows):
    insert = appeared visible (new values); update = visible both
    sides with changed (seq, ts) → pre-image row (OLD values) +
    post-image row (new values); delete = went invisible (the
    REMOVED content, not the tombstone). A tombstone refreshed by
    a newer tombstone is absent→absent and emits nothing."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    present = ~m["last_seq_o"].isna()
    old_vis = (present & m["last_type_o"].ne("delete")).to_numpy(dtype=bool)
    # null-guarded: a RESTORE can leave the new side ABSENT
    # (key vanished) — visible→absent is a delete with the old
    # values as the pre-image, like the batch lake_changes_rows
    new_vis = (
        ~m["last_seq"].isna() & m["last_type"].ne("delete")
    ).to_numpy(dtype=bool)
    changed = (
        old_vis
        & new_vis
        & (
            m["last_seq_o"].ne(m["last_seq"]).fillna(False).to_numpy(dtype=bool)
            | (m["last_ts_o"] != m["last_ts"]).to_numpy(dtype=bool)
        )
    )

    def frame(mask, side: str, kind: str) -> pd.DataFrame | None:
        sub = m[mask]
        if sub.empty:
            return None
        return pd.DataFrame(
            {
                "entity_id": sub["entity_id"].to_numpy(),
                "change_type": kind,
                "last_seq": sub["last_seq" + side].astype("Int64").to_numpy(),
                "last_ts": sub["last_ts" + side].to_numpy(),
                "last_type": sub["last_type" + side].to_numpy(),
                "item": sub["item" + side].to_numpy(),
            }
        )

    frames = [
        f
        for f in (
            frame(~old_vis & new_vis, "", "insert"),
            frame(changed, "_o", "update_preimage"),
            frame(changed, "", "update_postimage"),
            frame(old_vis & ~new_vis, "_o", "delete"),
        )
        if f is not None
    ]
    if not frames:
        return
    out = pd.concat(frames, ignore_index=True)
    ts = pc.assume_timezone(
        pa.Array.from_pandas(out["last_ts"], type=pa.timestamp("us")), "UTC"
    )
    yield pa.record_batch(
        [
            pa.Array.from_pandas(out["entity_id"], type=pa.string()),
            pa.Array.from_pandas(out["change_type"], type=pa.string()),
            pa.Array.from_pandas(out["last_seq"], type=pa.int64()),
            ts,
            pa.Array.from_pandas(out["last_type"], type=pa.string()),
            pa.Array.from_pandas(out["item"], type=pa.string()),
            pa.array([ver] * len(out), type=pa.int32()),
        ],
        names=["entity_id", "change_type", "last_seq", "last_ts",
               "last_type", "item", "ver"],
    )


class LakeCDFStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.lake_dir = options.get("path")
        if not self.lake_dir:
            raise ValueError("lake_cdf source requires option 'path' (the lake dir)")
        raw_start = options.get("startingversion", 0)
        #: "latest" (Delta parity) is resolved INSIDE initialOffset —
        #: Spark calls initialOffset only on a first start, so a
        #: checkpointed restart never resolves it, the committed
        #: offset wins, and the admission-control floor re-climbs
        #: from 0 in maxVersionsPerBatch steps like a numeric start
        #: (resolving at __init__ would jump the floor to NOW-latest
        #: on restart and plan the whole backlog as one batch).
        self._latest_start = str(raw_start).lower() == "latest"
        self.starting_version = 0 if self._latest_start else int(raw_start)
        #: TIMESTAMP AS OF the diff base: the snapshot state AT the
        #: instant is the exclusive starting point, so the feed is
        #: "everything that changed after ts". Resolved LAZILY in
        #: initialOffset (like 'latest'): Spark only calls
        #: initialOffset on a first start, so a checkpointed restart
        #: never re-resolves — which matters once retention GC's the
        #: commits at/before the instant (resolution would raise the
        #: retention error and kill a restart whose committed offset
        #: is already far past it).
        self._start_ts = options.get("startingtimestamp")
        if self._start_ts is not None and (raw_start != 0 or self._latest_start):
            raise ValueError(
                "lake_cdf: pass startingVersion or startingTimestamp, not both"
            )
        self.max_versions = int(options.get("maxversionsperbatch", 0))
        #: rowChanges=true switches the feed from entity-state rows
        #: (one post-image row per changed entity) to the row-level
        #: Delta-CDF vocabulary WITH pre-images over the consumer
        #: view: insert / update_preimage / update_postimage / delete
        #: — the streaming twin of lake_changes_rows, same schema
        #: (pre-image rows carry the old values in the value columns).
        self.row_changes = str(options.get("rowchanges", "false")).lower() == "true"
        #: admission-control frontier (driver-side only — NOT the
        #: committed offset, which lives in the checkpoint). After a
        #: restart it re-climbs from startingVersion; partitions()
        #: clamps it to every planned range so at most one empty
        #: trigger is wasted and no version is ever re-emitted (the
        #: checkpointed start of each planned batch is authoritative).
        self._floor = self.starting_version

    def initialOffset(self) -> dict:
        if self._latest_start:
            v = _live_version(self.lake_dir)
            self._floor = max(self._floor, v)
            return {"version": v}
        if self._start_ts is not None:
            from lapidus_spark.streaming.materialize import lake_version_at

            v = lake_version_at(self.lake_dir, self._start_ts)
            self._floor = max(self._floor, v)
            return {"version": v}
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        cur = _live_version(self.lake_dir, default=self.starting_version)
        if self.max_versions > 0:
            cur = min(cur, self._floor + self.max_versions)
        self._floor = max(self._floor, cur)
        return {"version": cur}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = int(start["version"]), int(end["version"])
        self._floor = max(self._floor, s, e)
        return [
            LakeCDFPartition(ver=v, bucket=b, new_files=nf, old_files=of)
            for v, b, nf, of in _plan_version_steps(self.lake_dir, s, e)
        ]

    def read(self, partition: LakeCDFPartition) -> Iterator:
        """Executor-side per-bucket diff: read the bucket's old and
        new state (column-pruned), keep entities whose (last_seq,
        last_ts) changed, type the change, emit one Arrow batch.
        Ordinary commits never physically drop keys (tombstones
        persist, new ⊇ old) — but a RESTORE reverts to a version
        predating some keys' first appearance, so the merge is FULL
        OUTER and a vanished visible key emits ``delete`` (NULL
        post-image columns here; the row-level path carries the old
        values as the pre-image, matching the batch twins)."""
        new = _read_side(partition.new_files, _NEW_COLS)
        old = _read_side(
            partition.old_files, _OLD_COLS_PRE if self.row_changes else _OLD_COLS
        )
        if new.empty and old.empty:
            return
        # nullable Int64 BEFORE the merge: a plain outer merge upcasts
        # the missing side to float64, which loses seq exactness above
        # 2^53 and could silently drop a change the batch-side
        # lake_changes (exact bigint <>) would emit.
        new["last_seq"] = new["last_seq"].astype("Int64")
        old["last_seq"] = old["last_seq"].astype("Int64")
        m = new.merge(old, on="entity_id", how="outer", suffixes=("", "_o"))
        if self.row_changes:
            yield from self._row_change_batches(m, partition.ver)
            return
        out = _entity_state_changes(m)
        if out is None:
            return
        yield _state_record_batch(out["m"], out["change_type"], partition.ver)

    def _row_change_batches(self, m, ver: int) -> Iterator:
        yield from _row_change_batches(m, ver)

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor, int(end["version"]))


class LakeChangeFeedDataSource(DataSource):
    """``spark.readStream.format("lake_cdf").option("path", lake)`` —
    options: ``startingVersion`` (diff base, exclusive; default 0 =
    from empty, i.e. the full first version arrives as inserts;
    ``"latest"`` = subscribe-from-now, resolved once at stream start)
    or ``startingTimestamp`` (TIMESTAMP AS OF the diff base — the
    feed emits everything that changed after the instant; mutually
    exclusive with startingVersion),
    ``maxVersionsPerBatch`` (admission control; 0 = unbounded), and
    ``rowChanges`` (true = the row-level pre/post-image vocabulary of
    ``lake_changes_rows`` instead of entity-state rows; same schema,
    pre-image rows carry the old values).

    Trigger caveat: python streaming sources have no
    ``Trigger.AvailableNow`` support — Spark falls back to a SINGLE
    batch, which a nonzero ``maxVersionsPerBatch`` then clips to the
    first N versions (silent truncation). Catch-up consumers should
    drain via ``query.processAllAvailable()`` (or run untriggered);
    only an uncapped stream may use availableNow."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self) -> str:
        return CDF_SCHEMA

    def streamReader(self, schema) -> LakeCDFStreamReader:
        return LakeCDFStreamReader(dict(self.options))


def register_lake_cdf(spark) -> None:
    """Idempotent registration of the ``lake_cdf`` streaming format."""
    spark.dataSource.register(LakeChangeFeedDataSource)
