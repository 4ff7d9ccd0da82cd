"""Subprocess driver for the UPDATE-MODE gold-layer crash test: the
tail consumer of a silver→gold medallion chain. Subscribes to the
silver lake's row-level change feed (``rowChanges=true`` — pre/post
images), folds the signed rows into the gold aggregate in UPDATE
output mode (each trigger emits only the changed gold groups), and
upserts those rows into a SECOND lake through the same MERGE commit
protocol, composed with schema evolution (the measures ride as
accreted columns).

Run in its own process so the parent test can arm
``LAPIDUS_FAILPOINT=lake_merge.before_manifest_flip:N`` and SIGKILL
this consumer mid-commit of its N-th gold-lake merge — a genuine kill
across the streaming state store, the checkpointed source offsets,
and the atomic manifest flip at once.

    python tests/gold_crash_driver.py <silver_lake> <gold_lake> <ckpt>

Prints GOLD_OK after a clean catch-up drain.
"""

from __future__ import annotations

import sys


def main() -> None:
    src_lake, gold_lake, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
    from pyspark.sql import functions as F

    from lapidus_spark.session import get_spark
    from lapidus_spark.streaming.lake_source import register_lake_cdf
    from lapidus_spark.streaming.materialize import merge_batch_into_lake

    spark = get_spark("gold_crash_driver", cpus=4)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    register_lake_cdf(spark)
    feed = (
        spark.readStream.format("lake_cdf")
        .option("path", src_lake)
        .option("maxVersionsPerBatch", "1")
        .option("rowChanges", "true")
        .load()
    )
    sign = F.when(
        F.col("change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1)).cast("long")
    gold = (
        feed.select(
            (F.col("entity_id").cast("long") % 10).alias("shard"),
            sign.alias("sign"),
            "last_seq",
            "ver",
        )
        .groupBy("shard")
        .agg(
            F.sum("sign").alias("n_entities"),
            F.sum(F.col("sign") * F.col("last_seq")).alias("sum_seq"),
            F.max("ver").alias("gold_ver"),
        )
    )

    def upsert_gold(batch_df, epoch_id: int) -> None:
        env_rows = batch_df.select(
            F.col("shard").cast("string").alias("pk"),
            F.col("gold_ver").cast("long").alias("event_seq"),
            F.to_timestamp(F.lit("2020-01-01 00:00:00")).alias("ts"),
            F.lit("update").alias("type"),
            F.lit(None).cast("string").alias("item"),
            "n_entities",
            "sum_seq",
        )
        merge_batch_into_lake(env_rows, gold_lake, extra_cols=("n_entities", "sum_seq"))

    q = (
        gold.writeStream.outputMode("update")
        .foreachBatch(upsert_gold)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    spark.stop()
    print("GOLD_OK")


if __name__ == "__main__":
    main()
