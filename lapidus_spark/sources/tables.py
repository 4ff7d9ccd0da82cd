"""Batch loaders for the driver-generated parquet fixtures (TESTDATA.md).

At 100 TB these reads are partitioned parquet scans; we rely on
Catalyst for predicate pushdown and column pruning, so loaders return
the raw scan DataFrame and *operators* select/filter — never the other
way around (pushdown reaches the scan automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Load a fixture table.

    ``parallel=True`` repartitions the scan to the session's default
    parallelism. Use it for CPU-heavy per-row work (hashing, shingling,
    LSH signatures): the small fixture tables are single parquet files
    → a single input split → one task, which serializes the whole
    stage on one core. At real scale the same operator needs the same
    property — compute-bound stages must not inherit the file layout's
    partitioning.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; valid: {TABLES}")
    # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects; read nanos as long and truncate to micros (the
    # same conversion DuckDB applies implicitly on read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if parallel:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
