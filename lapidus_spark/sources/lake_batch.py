"""Batch DataSource for the lake — ``spark.read.format("lake")`` (and
``CREATE TEMPORARY VIEW v USING lake OPTIONS (path '…')``), the batch
DSv2 twin of the streaming ``lake_cdf``/``catalog_cdf`` sources
(VERDICT r11 #1).

Every *streaming* consumption path of the lake already speaks a
registered Spark format; this module makes the *batch* side equally
self-describing: snapshots, time travel (``version`` /
``timestampAsOf``) and change feeds (``changes=true``) become
SQL-addressable relations that need no ``import lapidus_spark``. That
is the reference's consumer posture carried to the lake plane — its
downstream consumers speak the wire format, not the producer's
library (reference ``src/plugins/nats.js:23-28`` publishes frames to
whoever listens; the lake analog of "whoever listens" is a plain
``spark.read``).

Options
-------
- ``path`` (required): the lake directory.
- ``version`` (int) or ``timestampAsOf`` (ISO instant): time travel —
  mutually exclusive, resolved through the commit log exactly like
  ``read_lake_snapshot`` (unretained versions fail fast).
- ``changes`` = true: change-feed mode between ``startingVersion``
  (exclusive, default 0 = since empty) and ``endingVersion``
  (inclusive, default the live version) — the batch twin of the
  ``lake_cdf`` stream, same per-version-step planner and executor
  diff, so the emitted row set is identical to draining the stream
  over that range.

Scale contract
--------------
- Planning is driver-side metadata only: one manifest resolution
  (tiny JSONs), one parquet-footer probe for the epoch's physical
  types, zero data reads.
- Snapshot partitions are one per live parquet FILE (commit dirs) or
  one per legacy ``bucket=`` dir — the natural parallelism of the
  table's physical layout; executors read their file(s) with
  column-pruned pyarrow and emit Arrow batches.
- **Filter pushdown prunes I/O, never correctness**: ``pushFilters``
  returns every filter back to Spark (re-applied exactly), but uses
  equality/range predicates to skip work — entity keys hash to
  buckets (a Spark-parity pure-Python xxhash64, pinned against
  ``F.xxhash64`` in tests) so point probes open only their bucket,
  and recorded per-file zone maps (``stats_columns`` min/max from
  OPTIMIZE) prune at file granularity, the same decisions
  ``lake_point_read`` / ``lake_skip_read`` make. Buckets without
  stats read whole — conservative, never wrong.
- Deletion vectors apply executor-side from the (metadata-sized)
  manifest entries each partition carries; snapshot mode then drops
  tombstones — row-for-row the ``read_lake_snapshot`` consumer view.

The helper path (``read_lake_snapshot`` et al.) remains the
JVM-native fast path; this format is the interoperability path and
must agree with it bit-for-bit (pinned by the ``lake_sql_read``
oracle query and tests/test_lake_batch_source.py).
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

#: canonical column order of the snapshot relation (matches
#: ``read_lake_snapshot``: core envelope + accreted extras)
_CORE = ["entity_id", "last_seq", "last_ts", "last_type", "item", "bucket"]

#: change-feed relation (matches the streaming ``lake_cdf`` schema)
_CHANGES_DDL = (
    "entity_id string, change_type string, last_seq bigint, "
    "last_ts timestamp, last_type string, item string, ver int"
)

# ---------------------------------------------------------------------------
# Spark-parity xxhash64 (seed 42) — pure Python, so the PLANNING
# process (no SparkSession) can hash entity keys to buckets exactly
# like ``F.pmod(F.xxhash64("pk"), n_buckets)`` does at write time.
# Standard XXH64 over the key's UTF-8 bytes; parity with Spark is
# pinned in tests/test_lake_batch_source.py across ASCII, multi-byte
# UTF-8 and >32-byte inputs.
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as Spark's signed-64 ``xxhash64``."""
    n = len(data)
    i = 0

    def u64(j):
        return int.from_bytes(data[j : j + 8], "little")

    def u32(j):
        return int.from_bytes(data[j : j + 4], "little")

    def rnd(acc, val):
        acc = (acc + val * _P2) & _M64
        return (_rotl(acc, 31) * _P1) & _M64

    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = rnd(v1, u64(i))
            v2 = rnd(v2, u64(i + 8))
            v3 = rnd(v3, u64(i + 16))
            v4 = rnd(v4, u64(i + 24))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h = ((_rotl(h ^ rnd(0, u64(i)), 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ (u32(i) * _P1) & _M64, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M64, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _bucket_of(key: str, n_buckets: int) -> int:
    """``pmod(xxhash64(key), n_buckets)`` — the write-side bucket
    assignment, recomputed plan-side."""
    h = _xxh64(key.encode("utf-8"))
    return ((h % n_buckets) + n_buckets) % n_buckets


# ---------------------------------------------------------------------------
# DDL ↔ Arrow type mapping (the epoch's column types are recorded as
# Spark DDL strings in the manifest; the emitted Arrow batches must
# carry the exact declared types)
# ---------------------------------------------------------------------------


def _arrow_type(ddl: str):
    import pyarrow as pa

    t = ddl.lower().strip()
    if t.startswith("decimal"):
        p, s = (int(x) for x in t[t.index("(") + 1 : t.index(")")].split(","))
        return pa.decimal128(p, s)
    return {
        "string": pa.string(),
        "binary": pa.binary(),
        "bigint": pa.int64(),
        "long": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }[t]


def _ddl_of_arrow(t) -> str:
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz is not None else "timestamp_ntz"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    raise ValueError(f"lake batch source: unmapped parquet type {t!r}")


def _epoch_ddl(lake_dir: str, manifest: dict) -> tuple[str, list[dict]]:
    """Driver-side: the snapshot relation's DDL under this manifest's
    epoch — core columns at their PHYSICAL types (one pyarrow footer
    probe; ts may be LTZ or NTZ by producer, item any scalar) plus the
    accreted extras at their recorded epoch types. Returns
    ``(ddl, extras_spec)`` where extras_spec rows carry every name the
    column was ever written under (rename aliases) for the read-side
    coalesce."""
    import pyarrow.parquet as pq

    from lapidus_spark.lake import log

    ts_ddl, item_ddl = "timestamp_ntz", "string"
    for b, rel in sorted(manifest["buckets"].items()):
        d = os.path.join(lake_dir, rel)
        if not os.path.isdir(d):
            continue
        files = [f for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not files:
            continue
        sch = pq.ParquetFile(os.path.join(d, files[0])).schema_arrow
        if "last_ts" in sch.names and "item" in sch.names:
            ts_ddl = _ddl_of_arrow(sch.field("last_ts").type)
            item_ddl = _ddl_of_arrow(sch.field("item").type)
            break
    extras = [
        {
            "name": c["name"],
            "type": c["type"],
            "names": log._column_names(c),
        }
        for c in log._manifest_columns(manifest)
    ]
    ddl = (
        f"entity_id string, last_seq bigint, last_ts {ts_ddl}, "
        f"last_type string, item {item_ddl}, bucket int"
        + "".join(f", {c['name']} {c['type']}" for c in extras)
    )
    return ddl, extras


# ---------------------------------------------------------------------------
# Pushed-filter normalization + file/bucket pruning (driver-side)
# ---------------------------------------------------------------------------


def _pushed_ranges(filters) -> tuple[dict, set | None, dict]:
    """Fold supported pushed filters into per-column conjunctive
    ranges ``{col: (lo, hi)}``, the entity_id equality key set
    (``None`` = no equality constraint), and per-column VALUE SETS
    ``{col: frozenset}`` from ``EqualTo``/``In`` conjuncts (round 13,
    VERDICT r12 #4 — an ``In`` collapsed to its [min, max] envelope
    defeats Bloom pruning; the set lets the reader skip a file when
    EVERY listed value misses its filter). Only top-level single-name
    attributes participate; everything else is ignored here (Spark
    re-applies all filters regardless — pruning is I/O-only)."""
    ranges: dict[str, list] = {}
    eq_keys: set | None = None
    value_sets: dict[str, frozenset] = {}

    def narrow(col, lo, hi):
        cur = ranges.setdefault(col, [None, None])
        if lo is not None and (cur[0] is None or lo > cur[0]):
            cur[0] = lo
        if hi is not None and (cur[1] is None or hi < cur[1]):
            cur[1] = hi

    def restrict(col, vs):
        s = frozenset(vs)
        if col in value_sets:
            s = value_sets[col] & s  # conjunctive: intersect
        value_sets[col] = s

    for f in filters:
        col = f.attribute[0] if len(getattr(f, "attribute", ())) == 1 else None
        if col is None:
            continue
        if isinstance(f, EqualTo):
            narrow(col, f.value, f.value)
            if f.value is not None:
                restrict(col, [f.value])
            if col == "entity_id":
                ks = {str(f.value)}
                eq_keys = ks if eq_keys is None else (eq_keys & ks)
        elif isinstance(f, In):
            # the dataclass field is ``value`` (a tuple of listed values)
            vs = [v for v in f.value if v is not None]
            if vs:
                narrow(col, min(vs), max(vs))
                restrict(col, vs)
                if col == "entity_id":
                    ks = {str(v) for v in vs}
                    eq_keys = ks if eq_keys is None else (eq_keys & ks)
        elif isinstance(f, GreaterThan) or isinstance(f, GreaterThanOrEqual):
            narrow(col, f.value, None)
        elif isinstance(f, LessThan) or isinstance(f, LessThanOrEqual):
            narrow(col, None, f.value)
    return {c: (lo, hi) for c, (lo, hi) in ranges.items()}, eq_keys, value_sets


def _file_overlaps(entry, ranges: dict, value_sets: dict | None = None) -> bool:
    """Zone-map overlap test for one file's recorded stats — same
    semantics as ``lake_skip_read``: an unmapped column cannot prune;
    incomparable bound/stat types fall back to 'overlaps' (pruning
    must never be wrong, and pushed filters re-apply anyway). An
    ``In`` conjunct's value set prunes when NO listed value lies in
    the file's [min, max] — stronger than the set's envelope, which
    a scattered set straddling the file defeats."""
    from datetime import datetime

    for col, vs in (value_sets or {}).items():
        rng = entry.get(col) if isinstance(entry, dict) else None
        if col == "entity_id" and rng is None and not isinstance(entry, dict):
            rng = entry
        if rng is None or not vs or col == "last_ts":
            continue  # last_ts sets keep the plain envelope path below
        mn, mx = rng
        try:
            if not any(mn <= v <= mx for v in vs):
                return False
        except TypeError:
            continue  # incomparable: conservative, keep the file

    for col, (lo, hi) in ranges.items():
        rng = entry.get(col) if isinstance(entry, dict) else None
        if col == "entity_id" and rng is None and not isinstance(entry, dict):
            rng = entry  # pre-round-9 bare-list form
        if rng is None:
            continue
        mn, mx = rng
        if col == "last_ts":
            try:
                mn, mx = (datetime.fromisoformat(x) for x in (mn, mx))
            except (TypeError, ValueError):
                continue
            from datetime import timezone

            if hasattr(lo, "tzinfo") and lo.tzinfo is not None:
                lo = lo.astimezone(timezone.utc).replace(tzinfo=None)
            if hasattr(hi, "tzinfo") and hi.tzinfo is not None:
                hi = hi.astimezone(timezone.utc).replace(tzinfo=None)
        try:
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                return False
        except TypeError:
            continue  # incomparable: conservative, keep the file
    return True


def _bloom_rules_in(fblooms: dict, ranges: dict, value_sets: dict | None = None) -> bool:
    """True unless some equality probe's recorded per-file Bloom
    filter PROVES the value absent (same decision as
    ``lake_skip_read``), or — for an ``In`` conjunct — EVERY listed
    value misses the filter (each miss is individually proof of
    absence, so the conjunction of misses refutes the whole
    disjunction). Files without filters always rule in."""
    if not fblooms:
        return True
    from lapidus_spark.lake.stats import _bloom_might_contain

    for col, (lo, hi) in ranges.items():
        if lo is not None and lo == hi and col in fblooms:
            if not _bloom_might_contain(fblooms[col], lo):
                return False
    for col, vs in (value_sets or {}).items():
        if vs and col in fblooms:
            if all(not _bloom_might_contain(fblooms[col], v) for v in vs):
                return False
    return True


class LakeFilePartition(InputPartition):
    """One snapshot read unit: the parquet files of one bucket slice,
    with everything the executor needs (epoch extras spec, declared
    core types, the bucket's deletion-vector triples, and — for
    legacy ``bucket=`` dirs — the path-encoded bucket value)."""

    def __init__(self, files, extras, ts_ddl, item_ddl, dv, bucket=None):
        self.files = files
        self.extras = extras
        self.ts_ddl = ts_ddl
        self.item_ddl = item_ddl
        self.dv = dv
        self.bucket = bucket


class LakeChangesPartition(InputPartition):
    """One (version step, changed bucket) of the change feed — the
    batch twin of the streaming ``LakeCDFPartition``."""

    def __init__(self, ver, bucket, new_files, old_files):
        self.ver = ver
        self.bucket = bucket
        self.new_files = new_files
        self.old_files = old_files


class LakeBatchReader(DataSourceReader):
    """Snapshot / time-travel reader with prune-only filter pushdown."""

    def __init__(self, options: dict):
        self.lake_dir = options.get("path")
        if not self.lake_dir:
            raise ValueError("format('lake') requires option 'path'")
        version = options.get("version")
        ts_as_of = options.get("timestampasof")
        if version is not None and ts_as_of is not None:
            raise ValueError(
                "format('lake'): pass option version OR timestampAsOf, not both"
            )
        from lapidus_spark.lake import log
        from lapidus_spark.lake.stats import lake_version_at

        if ts_as_of is not None:
            version = lake_version_at(self.lake_dir, ts_as_of)
        self.manifest = log._manifest_at(
            self.lake_dir, int(version) if version is not None else None
        )
        if self.manifest is None:
            raise ValueError(
                f"lake at {self.lake_dir} has no manifest — nothing to read"
            )
        _, self.extras = _epoch_ddl(self.lake_dir, self.manifest)
        self.ranges: dict = {}
        self.eq_keys: set | None = None
        self.value_sets: dict = {}

    def pushFilters(self, filters):
        """Record prunable predicates, hand EVERY filter back to Spark
        (it re-applies them exactly): pushdown here is an I/O
        optimization with zero correctness surface."""
        self.ranges, self.eq_keys, self.value_sets = _pushed_ranges(filters)
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        m = self.manifest
        lake_dir = self.lake_dir
        dvs = m.get("deletion_vectors", {})
        zone_maps = m.get("file_stats", {})
        n_buckets = int(m["n_buckets"])
        want_buckets = None
        if self.eq_keys is not None:
            # point probe: hash the requested keys to their buckets —
            # path-level pruning, identical to lake_point_read
            want_buckets = {_bucket_of(k, n_buckets) for k in self.eq_keys}
        parts: list[InputPartition] = []
        ts_ddl, item_ddl = None, None
        # the declared core types are probed once and shipped to every
        # partition (executors must emit the exact declared schema)
        import pyarrow.parquet as pq

        for b_str, rel in sorted(m["buckets"].items()):
            if want_buckets is not None and int(b_str) not in want_buckets:
                continue
            d = os.path.join(lake_dir, rel)
            if not os.path.isdir(d):
                raise ValueError(
                    f"format('lake'): manifest of {lake_dir} references "
                    f"missing bucket dir {rel!r} — lake corrupted"
                )
            files = sorted(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
            if not files:
                continue
            if ts_ddl is None:
                sch = pq.ParquetFile(files[0]).schema_arrow
                if "last_ts" in sch.names and "item" in sch.names:
                    ts_ddl = _ddl_of_arrow(sch.field("last_ts").type)
                    item_ddl = _ddl_of_arrow(sch.field("item").type)
            dv = dvs.get(b_str, [])
            if rel.startswith("bucket="):
                # legacy layout: bucket is path-encoded, no zone maps
                parts.append(
                    LakeFilePartition(
                        files, self.extras, ts_ddl, item_ddl, dv,
                        bucket=int(rel.split("=", 1)[1].split("/")[0]),
                    )
                )
                continue
            stats = zone_maps.get(b_str)
            blooms: dict = {}
            if (
                self.ranges
                and any(
                    lo is not None and lo == hi
                    for lo, hi in self.ranges.values()
                )
            ) or any(vs for vs in self.value_sets.values()):
                # equality and IN probes consult the commit dir's
                # Bloom sidecar exactly like lake_skip_read — the SQL
                # path prunes files the helper path prunes
                from lapidus_spark.lake.stats import _load_bloom_index

                blooms = _load_bloom_index(lake_dir, rel)
            for f in files:
                fname = os.path.basename(f)
                if stats is not None and (self.ranges or self.value_sets):
                    entry = stats.get(fname)
                    if entry is not None and not _file_overlaps(
                        entry, self.ranges, self.value_sets
                    ):
                        continue  # provably disjoint: never opened
                if blooms and not _bloom_rules_in(
                    blooms.get(fname, {}), self.ranges, self.value_sets
                ):
                    continue  # filter misses prove absence
                parts.append(
                    LakeFilePartition(
                        [f], self.extras, ts_ddl, item_ddl, dv
                    )
                )
        if ts_ddl is None:
            ts_ddl, item_ddl = "timestamp_ntz", "string"
            for p in parts:
                p.ts_ddl, p.item_ddl = ts_ddl, item_ddl
        return parts

    def read(self, partition: LakeFilePartition) -> Iterator:
        """Executor-side: column-pruned pyarrow read of the
        partition's files, aligned to the schema epoch (null-fill
        accreted columns older files predate, coalesce rename aliases,
        cast widened types up), deletion-vector mask applied, then the
        snapshot's tombstone filter — row-for-row
        ``read_lake_snapshot``."""
        for f in partition.files:
            out = _aligned_file_table(
                f,
                partition.extras,
                partition.ts_ddl,
                partition.item_ddl,
                partition.dv,
                bucket=partition.bucket,
            )
            for rb in out.to_batches():
                if rb.num_rows:
                    yield rb


def _aligned_file_table(
    f: str,
    extras,
    ts_ddl: str,
    item_ddl: str,
    dv,
    bucket=None,
    keep_tombstones: bool = False,
):
    """ONE stored parquet file as an Arrow table aligned to the
    schema epoch (null-fill accreted columns older files predate,
    coalesce rename aliases, cast widened types up) with the bucket's
    deletion-vector mask applied — the shared read unit of the batch
    reader AND the ``df.write.format("lake")`` combine step. The
    writer passes ``keep_tombstones=True``: an LWW combine that
    cannot see a stored delete tombstone would resurrect any older
    staged event for that entity.

    Deletion vectors probe VECTORIZED (VERDICT r12 #3): rows are
    first restricted to entities the vector names (``pc.is_in`` —
    one Arrow kernel, no per-row Python for the overwhelmingly common
    DV-free row), and only those candidates replay the
    (entity, seq, ts_iso) triple probe. The Python-loop work scales
    with the DV's entity hit count, never with the file's row
    count."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out_fields = [
        pa.field("entity_id", pa.string()),
        pa.field("last_seq", pa.int64()),
        pa.field("last_ts", _arrow_type(ts_ddl)),
        pa.field("last_type", pa.string()),
        pa.field("item", _arrow_type(item_ddl)),
        pa.field("bucket", pa.int32()),
        *[pa.field(c["name"], _arrow_type(c["type"])) for c in extras],
    ]
    schema = pa.schema(out_fields)
    dv_keys = {(str(e[0]), int(e[1]), str(e[2])) for e in (dv or ())}
    pf = pq.ParquetFile(f)
    present = set(pf.schema_arrow.names)
    need = [c for c in _CORE if c in present]
    need += [n for c in extras for n in c["names"] if n in present]
    tbl = pf.read(columns=need)

    def cast_ts(arr, target):
        t = arr.type
        if pa.types.is_timestamp(target) and pa.types.is_timestamp(t):
            if target.tz is not None and t.tz is None:
                arr = pc.assume_timezone(
                    arr.cast(pa.timestamp(t.unit)), "UTC"
                )
            elif target.tz is None and t.tz is not None:
                # stored instants are UTC-normalized
                arr = arr.cast(pa.timestamp(t.unit, tz="UTC")).cast(
                    pa.timestamp(t.unit)
                )
        return arr.cast(target)

    def col(name, target):
        if name in tbl.column_names:
            arr = tbl.column(name).combine_chunks()
            if pa.types.is_timestamp(target):
                return cast_ts(arr, target)
            return arr.cast(target)
        return pa.nulls(len(tbl), target)

    arrays = [
        col("entity_id", pa.string()),
        col("last_seq", pa.int64()),
        col("last_ts", _arrow_type(ts_ddl)),
        col("last_type", pa.string()),
        col("item", _arrow_type(item_ddl)),
        (
            pa.array([bucket] * len(tbl), pa.int32())
            if bucket is not None
            else col("bucket", pa.int32())
        ),
    ]
    for c in extras:
        target = _arrow_type(c["type"])
        have = [n for n in c["names"] if n in tbl.column_names]
        if not have:
            arrays.append(pa.nulls(len(tbl), target))
        elif len(have) == 1:
            arrays.append(col(have[0], target))
        else:
            # a file carries the column under exactly one of
            # its names; coalesce is exact (log._align_extras)
            acc = col(have[0], target)
            for n in have[1:]:
                acc = pc.coalesce(acc, col(n, target))
            arrays.append(acc)
    out = pa.table(dict(zip(schema.names, arrays)))
    # snapshot visibility: stored tombstones drop, and rows a
    # deletion vector redacts drop with them (the DV turns the
    # exact (entity, seq, ts) row version into a tombstone)
    mask = None
    if not keep_tombstones:
        mask = pc.not_equal(out.column("last_type"), "delete")
    if dv_keys:
        import numpy as np

        ents = out.column("entity_id").combine_chunks()
        dv_ents = pa.array(sorted({e for e, _, _ in dv_keys}), pa.string())
        cand = pc.is_in(ents, value_set=dv_ents)
        if pc.any(cand).as_py():
            idx = pc.indices_nonzero(cand).to_numpy()
            sub = out.take(pa.array(idx))
            # arrow's %S already renders the full fractional part
            # at the column's unit — "…:20.000000" matches the DV
            # entries' yyyy-MM-dd'T'HH:mm:ss.SSSSSS ts_iso exactly
            ts_iso = pc.strftime(
                sub.column("last_ts").cast(
                    pa.timestamp("us")
                    if _arrow_type(ts_ddl).tz is None
                    else pa.timestamp("us", tz="UTC")
                ),
                format="%Y-%m-%dT%H:%M:%S",
            )
            hits = np.fromiter(
                (
                    (e, s, t) in dv_keys
                    for e, s, t in zip(
                        sub.column("entity_id").to_pylist(),
                        sub.column("last_seq").to_pylist(),
                        ts_iso.to_pylist(),
                    )
                ),
                dtype=bool,
                count=len(idx),
            )
            hit_np = np.zeros(len(out), dtype=bool)
            hit_np[idx[hits]] = True
            dv_mask = pc.invert(pa.array(hit_np))
            mask = dv_mask if mask is None else pc.and_(mask, dv_mask)
    if mask is not None:
        out = out.filter(mask)
    return out.cast(schema).combine_chunks()


class LakeChangesReader(DataSourceReader):
    """``changes=true``: the batch change feed between two committed
    versions — the same per-version-step planner and executor diff as
    the streaming ``lake_cdf`` source, so a catch-up batch read and a
    drained stream emit identical rows."""

    def __init__(self, options: dict):
        self.lake_dir = options.get("path")
        if not self.lake_dir:
            raise ValueError("format('lake') requires option 'path'")
        if options.get("version") or options.get("timestampasof"):
            raise ValueError(
                "format('lake'): changes=true takes startingVersion/"
                "endingVersion, not version/timestampAsOf"
            )
        #: rowChanges=true switches the relation from entity-state
        #: diffs to the row-level Delta-CDF vocabulary with
        #: pre-images (insert / update_preimage / update_postimage /
        #: delete) — same option name, same executor diff, same rows
        #: as the streaming lake_cdf source (VERDICT r12 #2)
        self.row_changes = str(options.get("rowchanges", "false")).lower() == "true"
        from lapidus_spark.streaming.lake_source import _live_version

        self.start = int(options.get("startingversion", 0))
        end = options.get("endingversion")
        self.end = int(end) if end is not None else _live_version(self.lake_dir)
        if self.end < self.start:
            raise ValueError(
                f"format('lake'): endingVersion {self.end} < "
                f"startingVersion {self.start}"
            )

    def partitions(self) -> Sequence[InputPartition]:
        from lapidus_spark.streaming.lake_source import _plan_version_steps

        return [
            LakeChangesPartition(v, b, nf, of)
            for v, b, nf, of in _plan_version_steps(
                self.lake_dir, self.start, self.end, caller="lake (batch)"
            )
        ]

    def read(self, partition: LakeChangesPartition) -> Iterator:
        from lapidus_spark.streaming.lake_source import (
            _NEW_COLS,
            _OLD_COLS,
            _OLD_COLS_PRE,
            _entity_state_changes,
            _read_side,
            _row_change_batches,
            _state_record_batch,
        )

        new = _read_side(partition.new_files, _NEW_COLS)
        old = _read_side(
            partition.old_files,
            _OLD_COLS_PRE if self.row_changes else _OLD_COLS,
        )
        if new.empty and old.empty:
            return
        new["last_seq"] = new["last_seq"].astype("Int64")
        old["last_seq"] = old["last_seq"].astype("Int64")
        m = new.merge(old, on="entity_id", how="outer", suffixes=("", "_o"))
        if self.row_changes:
            yield from _row_change_batches(m, partition.ver)
            return
        out = _entity_state_changes(m)
        if out is None:
            return
        yield _state_record_batch(out["m"], out["change_type"], partition.ver)


class LakeDataSource(DataSource):
    """``spark.read.format("lake").option("path", dir)`` — see the
    module docstring for options and the scale contract."""

    @classmethod
    def name(cls) -> str:
        return "lake"

    def _opts(self) -> dict:
        return {str(k).lower(): v for k, v in dict(self.options).items()}

    def schema(self) -> str:
        opts = self._opts()
        if str(opts.get("changes", "")).lower() == "true":
            return _CHANGES_DDL
        path = opts.get("path")
        if not path:
            raise ValueError("format('lake') requires option 'path'")
        from lapidus_spark.lake import log
        from lapidus_spark.lake.stats import lake_version_at

        version = opts.get("version")
        if version is not None and opts.get("timestampasof") is not None:
            raise ValueError(
                "format('lake'): pass option version OR timestampAsOf, not both"
            )
        if opts.get("timestampasof") is not None:
            version = lake_version_at(path, opts["timestampasof"])
        manifest = log._manifest_at(
            path, int(version) if version is not None else None
        )
        if manifest is None:
            raise ValueError(f"lake at {path} has no manifest — nothing to read")
        ddl, _ = _epoch_ddl(path, manifest)
        return ddl

    def reader(self, schema) -> DataSourceReader:
        opts = self._opts()
        if str(opts.get("changes", "")).lower() == "true":
            return LakeChangesReader(opts)
        return LakeBatchReader(opts)

    def writer(self, schema, overwrite: bool):
        """``df.write.format("lake")`` — the producer-side MERGE of an
        envelope batch into the table (``mode("append")``; overwrite
        replaces the table with the batch's LWW state). See
        lake_write.py for the architecture and the session-less
        commit-worker constraint that shapes it."""
        from lapidus_spark.sources.lake_write import LakeBatchWriter

        return LakeBatchWriter(self._opts(), schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        """``df.writeStream.format("lake")`` — per-micro-batch MERGE
        through the same machinery; ``option("txnAppId", ...)`` makes
        restarted-query redelivery exactly-once via (appId, batchId)
        markers. See LakeStreamWriter."""
        from lapidus_spark.sources.lake_write import LakeStreamWriter

        return LakeStreamWriter(self._opts(), schema, overwrite)


def register_lake_batch(spark) -> None:
    """Idempotent registration of the batch ``lake`` format (the
    streaming formats register separately: ``lake_cdf`` /
    ``catalog_cdf``). Also enables Python data-source filter pushdown
    for the session: Spark REFUSES to plan a reader that implements
    ``pushFilters`` while ``spark.sql.python.filterPushdown.enabled``
    is false (a [DATA_SOURCE_PUSHDOWN_DISABLED] assertion, not a
    silent fallback), and the flag is runtime-settable — registration
    is the one seam every consumer passes through."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeDataSource)
