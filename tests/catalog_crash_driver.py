"""Subprocess driver for the multi-table-tx SIGKILL crash tests.

Commits ONE catalog transaction spanning two tables so the parent
test can arm a failpoint and observe a genuine kill:

- ``LAPIDUS_FAILPOINT=lake_merge.before_manifest_flip:2`` kills the
  process mid-tx — AFTER table A's own lake committed, BEFORE table
  B's — the exact window where per-table atomicity is not enough;
- ``LAPIDUS_FAILPOINT=catalog.before_flip`` kills between the catalog
  log-entry write and the pointer flip — both tables committed,
  nothing catalog-visible.

    python tests/catalog_crash_driver.py <catalog_dir> <sf_dir> <txid> <mod> <rem>

Merges events rows with ``event_seq % mod == rem`` into tables
``by_user`` (pk = user) and ``by_type`` (pk = event type) as one tx.
Prints TX_OK on success.
"""

from __future__ import annotations

import sys


def main() -> None:
    catalog_dir, sf_dir = sys.argv[1], sys.argv[2]
    txid, mod, rem = int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
    from pyspark.sql import functions as F

    from lapidus_spark.lake.catalog import commit_multi_table_tx
    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.tables import load_table

    spark = get_spark("catalog_crash_driver", cpus=4)
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % mod == rem)
    by_user = ev.select(
        F.col("user_id").cast("string").alias("pk"),
        F.col("event_id").alias("event_seq"),
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.lit("update").alias("type"),
        F.col("props").alias("item"),
    )
    by_type = ev.select(
        F.col("event_type").alias("pk"),
        F.col("event_id").alias("event_seq"),
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.lit("update").alias("type"),
        F.col("props").alias("item"),
    )
    commit_multi_table_tx(
        catalog_dir,
        {"by_user": by_user, "by_type": by_type},
        txid=txid,
        retain_versions=4,
        n_buckets=4,
    )
    spark.stop()
    print("TX_OK")


if __name__ == "__main__":
    main()
