"""The lake table format, split by plane (VERDICT r9 #8):

- ``log``   — commit pointer, incremental commit log + checkpoints,
  version resolution, writer lock, GC, publish/stage/flip machinery,
  manifest-resolved reads. Bottom layer; imports no sibling.
- ``merge`` — LWW combine, locked + optimistic (OCC) merge writers,
  schema evolution on merge, CHECK enforcement, txn markers, the
  streaming ``merge_lake_sink``.
- ``admin`` — OPTIMIZE/Z-order, rebucket, RESTORE, VACUUM,
  DELETE WHERE, constraint DDL, SHALLOW CLONE.
- ``stats`` — snapshot/time-travel/point/time-window reads, zone
  maps, TIMESTAMP AS OF, DESCRIBE HISTORY/DETAIL, change-data feeds.
- ``catalog`` — multi-table transactional commits: one atomic
  catalog pointer referencing N table versions (per-tx atomicity
  across tables).

``lapidus_spark.streaming.materialize`` remains the public facade —
it re-exports every name, so existing imports keep working.
"""

from . import admin, catalog, log, merge, stats  # noqa: F401
