"""The "ordinary Spark user" lake round trip — ZERO lapidus_spark
imports after registration: produce with ``df.write.format("lake")``,
consume with ``spark.read.format("lake")`` (snapshot, time travel,
change feed with pre-images), and replicate with
``readStream.format("lake_cdf")`` → ``writeStream.format("lake")``.

Usage: python examples/sql_lake_roundtrip.py [SF_DIR]
(defaults to /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("sql-lake-roundtrip")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    # the ONE library call: register the formats for this session
    from lapidus_spark.sources.lake_batch import register_lake_batch
    from lapidus_spark.streaming.lake_source import register_lake_cdf

    register_lake_batch(spark)
    register_lake_cdf(spark)

    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table

    env = normalize_events(load_table(spark, sf_dir, "events")).select(
        "pk", "event_seq", "ts", "type", "item"
    )
    lake = tempfile.mkdtemp(prefix="roundtrip_lake_")
    shutil.rmtree(lake)

    # -- produce: two txn-marked commits through plain df.write
    for i, part in enumerate((env.filter(F.col("event_seq") % 2 == 0),
                              env.filter(F.col("event_seq") % 2 == 1))):
        (
            part.write.format("lake")
            .mode("append")
            .option("path", lake)
            .option("retainVersions", "4")
            .option("txnAppId", "roundtrip")
            .option("txnVersion", str(i + 1))
            .save()
        )

    # -- consume: plain SQL over a USING-lake view
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW lake_v "
        f"USING lake OPTIONS (path '{lake}')"
    )
    n_live = spark.sql("SELECT count(*) AS n FROM lake_v").first()["n"]
    n_v1 = (
        spark.read.format("lake").option("path", lake).option("version", "1")
        .load().count()
    )
    print(f"== snapshot == live entities: {n_live} (version 1 had {n_v1})")

    # -- change feed with pre-images between the two commits
    feed = (
        spark.read.format("lake")
        .option("path", lake)
        .option("changes", "true")
        .option("rowChanges", "true")
        .option("startingVersion", "1")
        .load()
        .groupBy("change_type")
        .count()
        .orderBy("change_type")
    )
    print("== change feed (v1 -> v2) ==")
    for r in feed.collect():
        print(f"  {r['change_type']}: {r['count']}")

    # -- replicate: lake -> lake, streaming, zero imports
    replica = tempfile.mkdtemp(prefix="roundtrip_replica_")
    shutil.rmtree(replica)
    ckpt = tempfile.mkdtemp(prefix="roundtrip_ckpt_")
    q = (
        spark.readStream.format("lake_cdf")
        .option("path", lake)
        .load()
        .select(
            F.col("entity_id").alias("pk"),
            F.col("last_seq").alias("event_seq"),
            F.col("last_ts").alias("ts"),
            F.col("last_type").alias("type"),
            "item",
        )
        .writeStream.format("lake")
        .option("path", replica)
        .option("retainVersions", "2")
        .option("txnAppId", "roundtrip_replica")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    src = spark.read.format("lake").option("path", lake).load()
    dst = spark.read.format("lake").option("path", replica).load()
    cols = ["entity_id", "last_seq", "last_type", "item"]
    same = sorted(map(tuple, src.select(*cols).collect())) == sorted(
        map(tuple, dst.select(*cols).collect())
    )
    print(f"== replication == replica matches source: {same}")
    assert same, "replica diverged from source"


if __name__ == "__main__":
    main()
