"""Subprocess driver for the medallion-chain crash test: the MIDDLE
consumer of a bronze→silver chain. Subscribes to the source lake's
change feed (``format("lake_cdf")``, offsets = manifest versions) and
MERGEs each micro-batch into a DERIVED lake through the same
``merge_lake_sink`` commit protocol.

Run in its own process so the parent test can arm
``LAPIDUS_FAILPOINT=lake_merge.before_manifest_flip:N`` and SIGKILL
this consumer mid-commit of its N-th derived-lake merge — a genuine
kill across BOTH exactly-once layers at once (streaming checkpoint
offsets upstream, atomic manifest flip downstream).

    python tests/medallion_crash_driver.py <src_lake> <derived_lake> <ckpt> [concurrency]

``concurrency`` defaults to "locked"; pass "optimistic" to run the
derived-lake merges through the OCC commit protocol — the redundant-
consumer HA test races two of these processes against one silver lake.

Prints CHAIN_OK after a clean catch-up drain.
"""

from __future__ import annotations

import sys


def main() -> None:
    src_lake, derived_lake, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
    concurrency = sys.argv[4] if len(sys.argv) > 4 else "locked"
    from pyspark.sql import functions as F

    from lapidus_spark.session import get_spark
    from lapidus_spark.streaming.lake_source import register_lake_cdf
    from lapidus_spark.streaming.materialize import merge_lake_sink

    spark = get_spark("medallion_crash_driver", cpus=4)
    register_lake_cdf(spark)
    feed = (
        spark.readStream.format("lake_cdf")
        .option("path", src_lake)
        .option("maxVersionsPerBatch", "1")  # one source version per trigger
        .load()
    )
    # change rows carry the post-image, so they re-enter the envelope
    # contract directly: the derived merge's LWW combine over them
    # reproduces the source snapshot (deletes stay tombstones).
    env = feed.select(
        F.col("entity_id").alias("pk"),
        F.col("last_seq").alias("event_seq"),
        F.col("last_ts").alias("ts"),
        F.col("last_type").alias("type"),
        "item",
    )
    q = (
        merge_lake_sink(env, derived_lake, concurrency=concurrency)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    spark.stop()
    print("CHAIN_OK")


if __name__ == "__main__":
    main()
