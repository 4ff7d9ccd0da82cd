"""Batch DataSource for the multi-table CATALOG —
``spark.read.format("catalog")`` (and ``CREATE TEMPORARY VIEW v USING
catalog OPTIONS (...)``), completing the round-12 "ordinary Spark
user" story on the tx-consistent plane: the batch twin of the
``catalog_cdf`` streaming source, just as ``format("lake")`` is the
batch twin of ``lake_cdf``.

Options
-------
- ``path`` (required): the catalog directory.
- ``table``: member table name → the TX-CONSISTENT snapshot — the
  table's lake time-traveled to exactly the version the catalog entry
  references (``read_catalog_table`` semantics: two tables read under
  the same catalog version always observe the same transactions).
- ``catalogVersion``: resolve through a retained earlier catalog
  entry instead of the live one.
- ``changes`` = true: the tx-consistent multi-table diff between
  ``startingVersion`` (exclusive, default 0) and ``endingVersion``
  (inclusive, default live) — rows carry the ``tbl`` discriminator,
  the catalog ``ver`` and the underlying ``tbl_ver`` ordering column,
  exactly the streaming ``catalog_cdf`` vocabulary (draining the
  stream over the same range emits identical rows: same planner, same
  executor diff).

Implementation is almost entirely REUSE: snapshot mode resolves the
catalog entry driver-side (one tiny JSON) and then IS a
``LakeBatchReader`` pinned to the member table's mapped version —
filter pushdown (bucket hash, zone maps, Bloom sidecars) included;
changes mode reuses the streaming source's per-version-step planner
and executor diff.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from lapidus_spark.sources.lake_batch import LakeBatchReader, _epoch_ddl


def _entry(catalog_dir: str, version=None) -> dict:
    from lapidus_spark.lake.catalog import catalog_entry

    return catalog_entry(
        catalog_dir, int(version) if version is not None else None
    )


def _resolve_table(opts: dict) -> tuple[str, int]:
    path, table = opts.get("path"), opts.get("table")
    if not path:
        raise ValueError("format('catalog') requires option 'path'")
    if not table:
        raise ValueError(
            "format('catalog') requires option 'table' (snapshot mode) "
            "or changes=true"
        )
    cat_ver = opts.get("catalogversion")
    ts_as_of = opts.get("timestampasof")
    if cat_ver is not None and ts_as_of is not None:
        raise ValueError(
            "format('catalog'): pass option catalogVersion OR "
            "timestampAsOf, not both"
        )
    if ts_as_of is not None:
        # catalog-level TIMESTAMP AS OF (round 13): resolve the
        # commit INSTANT to a catalog version, then read the member
        # table at exactly the version that tx-consistent entry maps
        from lapidus_spark.lake.catalog import catalog_version_at

        cat_ver = catalog_version_at(path, ts_as_of)
    entry = _entry(path, cat_ver)
    if table not in entry["tables"]:
        raise ValueError(
            f"catalog at {path} (version {entry['version']}) has no "
            f"table {table!r} (tables: {sorted(entry['tables'])})"
        )
    return os.path.join(path, table), int(entry["tables"][table])


class CatalogChangesPartition(InputPartition):
    def __init__(self, tbl, cat_ver, ver, bucket, new_files, old_files):
        self.tbl = tbl
        self.cat_ver = cat_ver
        self.ver = ver
        self.bucket = bucket
        self.new_files = new_files
        self.old_files = old_files


class CatalogChangesBatchReader(DataSourceReader):
    """``changes=true``: the batch tx-consistent multi-table diff —
    the same catalog-entry walk and per-table version-step planner as
    the streaming ``catalog_cdf`` source, collapsed to one batch."""

    def __init__(self, options: dict):
        self.catalog_dir = options.get("path")
        if not self.catalog_dir:
            raise ValueError("format('catalog') requires option 'path'")
        if options.get("table") or options.get("catalogversion"):
            raise ValueError(
                "format('catalog'): changes=true takes startingVersion/"
                "endingVersion, not table/catalogVersion"
            )
        from lapidus_spark.streaming.catalog_source import _catalog_pointer

        self.start = int(options.get("startingversion", 0))
        end = options.get("endingversion")
        if end is not None:
            self.end = int(end)
        else:
            p = _catalog_pointer(self.catalog_dir)
            self.end = int(p["version"]) if p else 0
        if self.end < self.start:
            raise ValueError(
                f"format('catalog'): endingVersion {self.end} < "
                f"startingVersion {self.start}"
            )

    def partitions(self) -> Sequence[InputPartition]:
        from lapidus_spark.streaming.catalog_source import _catalog_entry
        from lapidus_spark.streaming.lake_source import _plan_version_steps

        parts: list[InputPartition] = []
        entry_prev: dict | None = None
        for cv in range(self.start + 1, self.end + 1):
            entry_new = _catalog_entry(self.catalog_dir, cv)
            entry_old = (
                entry_prev
                if entry_prev is not None
                else (
                    _catalog_entry(self.catalog_dir, cv - 1)
                    if cv - 1 >= 1
                    else {"tables": {}}
                )
            )
            entry_prev = entry_new
            for tbl in sorted(entry_new["tables"]):
                tv_old = int(entry_old["tables"].get(tbl, 0))
                tv_new = int(entry_new["tables"][tbl])
                if tv_new == tv_old:
                    continue
                for v, b, nf, of in _plan_version_steps(
                    os.path.join(self.catalog_dir, tbl),
                    tv_old,
                    tv_new,
                    caller="catalog (batch)",
                ):
                    parts.append(
                        CatalogChangesPartition(tbl, cv, v, b, nf, of)
                    )
        return parts

    def read(self, partition: CatalogChangesPartition) -> Iterator:
        from lapidus_spark.streaming.lake_source import (
            _NEW_COLS,
            _OLD_COLS,
            _entity_state_changes,
            _read_side,
            _state_record_batch,
        )

        new = _read_side(partition.new_files, _NEW_COLS)
        old = _read_side(partition.old_files, _OLD_COLS)
        if new.empty and old.empty:
            return
        new["last_seq"] = new["last_seq"].astype("Int64")
        old["last_seq"] = old["last_seq"].astype("Int64")
        m = new.merge(old, on="entity_id", how="outer", suffixes=("", "_o"))
        out = _entity_state_changes(m)
        if out is None:
            return
        yield _state_record_batch(
            out["m"],
            out["change_type"],
            partition.cat_ver,
            tbl=partition.tbl,
            tbl_ver=partition.ver,
        )


class CatalogDataSource(DataSource):
    """``spark.read.format("catalog").option("path", dir)`` — see the
    module docstring for options."""

    @classmethod
    def name(cls) -> str:
        return "catalog"

    def _opts(self) -> dict:
        return {str(k).lower(): v for k, v in dict(self.options).items()}

    def schema(self) -> str:
        opts = self._opts()
        if str(opts.get("changes", "")).lower() == "true":
            from lapidus_spark.streaming.catalog_source import (
                CATALOG_CDF_SCHEMA,
            )

            return CATALOG_CDF_SCHEMA
        lake_dir, version = _resolve_table(opts)
        from lapidus_spark.lake import log

        manifest = log._manifest_at(lake_dir, version)
        if manifest is None:
            raise ValueError(
                f"catalog member table at {lake_dir} has no manifest"
            )
        ddl, _ = _epoch_ddl(lake_dir, manifest)
        return ddl

    def reader(self, schema) -> DataSourceReader:
        opts = self._opts()
        if str(opts.get("changes", "")).lower() == "true":
            return CatalogChangesBatchReader(opts)
        lake_dir, version = _resolve_table(opts)
        # snapshot mode IS the lake batch reader pinned to the
        # catalog-mapped table version — pushdown pruning included
        return LakeBatchReader({"path": lake_dir, "version": str(version)})


def register_catalog_batch(spark) -> None:
    """Idempotent registration of the batch ``catalog`` format (the
    streaming twin registers as ``catalog_cdf``). Enables Python
    data-source filter pushdown like ``register_lake_batch`` — the
    snapshot reader implements ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CatalogDataSource)
