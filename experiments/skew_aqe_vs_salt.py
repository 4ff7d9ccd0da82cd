"""When does manual salting beat AQE's built-in skew-join split?

``salted_join`` (operators/joins.py) documents itself as "the manual
fallback when AQE's skew-join split can't help". VERDICT r6 #7 asks
for the measurement behind that sentence: the same adversarial
distribution joined three ways —

  plain    — shuffle join, AQE skew handling OFF (the pain baseline)
  aqe      — shuffle join, AQE skew split ON
  salted   — salted_join (fact salted into 8, dim replicated ×8)

on a fact table where ONE key owns half the rows (hot partition ≈
50% of the table vs a uniform remainder over 1M keys), dim too large
to broadcast (broadcast thresholds -1, as at cluster scale where the
dim side is TBs). Each variant runs count-only (no result transfer).

The decision rule this measures (documented in BENCH.md):

- AQE's split triggers only when a partition exceeds BOTH
  ``skewedPartitionFactor`` × median AND
  ``skewedPartitionThresholdInBytes`` (default 256 MB). Above those,
  the built-in wins: it splits only the hot partition, adds zero
  shuffle volume, and needs no code change.
- Below the byte threshold (hot partition 10-100× the median but
  still "small" in absolute bytes — the common shape on a fixture or
  a fine-partitioned table), AQE declines to act and the hot task
  serializes; salting spreads it at the cost of dim ×SALT_BUCKETS
  shuffle volume. That regime is where the manual recipe earns its
  place.

Prints one markdown table; run on a quiet machine.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lapidus_spark.operators.joins import salted_join
from lapidus_spark.session import get_spark

N_FACT = 20_000_000
N_DIM = 1_000_000
HOT_FRACTION = 2  # 1/2 of fact rows on key 0


def build(spark):
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % HOT_FRACTION == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), N_DIM))
        .cast("long")
        .alias("user_id"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).cast("int").alias("segment")
    )
    f, d = "/tmp/skew_fact.parquet", "/tmp/skew_dim.parquet"
    fact.write.mode("overwrite").parquet(f)
    dim.write.mode("overwrite").parquet(d)
    return f, d


def run_variant(spark, f, d, mode: str) -> float:
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled", "true" if mode != "plain" else "false"
    )
    if mode == "aqe":
        # let the split trigger at fixture scale: the default 256 MB
        # byte floor is the knob that decides whether AQE acts at all
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    elif mode == "aqe_default":
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    fact = spark.read.parquet(f)
    dim = spark.read.parquet(d)
    if mode == "salted":
        j = salted_join(fact, dim, "user_id")
    else:
        j = fact.join(dim, "user_id")
    t0 = time.perf_counter()
    j.groupBy("segment").agg(F.count("*").alias("n"), F.sum("v").alias("sv")).collect()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("skew_aqe_vs_salt", cpus=16)
    f, d = build(spark)
    print(f"| variant | sec (best of 3) | fact {N_FACT/1e6:.0f}M rows, 1 key = 1/{HOT_FRACTION} |")
    print("|---|---|---|")
    for mode, note in [
        ("plain", "skew handling off — the straggler baseline"),
        ("aqe_default", "AQE on, DEFAULT 256 MB byte floor"),
        ("aqe", "AQE on, byte floor lowered to 8 MB"),
        ("salted", "manual salted_join (dim replicated x8)"),
    ]:
        run_variant(spark, f, d, mode)  # warm
        best = min(run_variant(spark, f, d, mode) for _ in range(3))
        print(f"| {mode} | {best:.2f} | {note} |", flush=True)


if __name__ == "__main__":
    main()
