"""Scale techniques as reusable helpers (100 TB posture, SURVEY §4.2).

The reference's only scale lever is process-per-backend
(lapidus.js:88-109). At 100 TB the levers that matter are shuffle
shape and skew, so the rebuild ships them as first-class helpers:

- ``salted_agg``: two-stage aggregation for skewed keys. Stage 1
  aggregates on (key, salt) — the hot key's rows spread over
  ``n_salts`` reducers — stage 2 merges the per-salt partials. Use
  when one key holds a double-digit share of rows and AQE's skew
  handling (joins only) can't help; results are identical to the
  direct groupBy for any decomposable aggregate.
- ``bucket_table``: persist a DataFrame bucketed by the join key.
  Two tables bucketed the same way equi-join with ZERO exchanges —
  the co-located-join strategy for repeatedly-joined 100 TB facts
  (e.g. the CDC event log joined to its snapshot every batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (decomposable aggregates: the
    merge stage reuses sum/min/max over stage-1 partials).
    """
    stage1_exprs: list[Column] = []
    stage2_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        inp = F.expr(col) if col != "*" else F.lit(1)
        if fn == "count":
            stage1_exprs.append(F.count(inp).alias(out))
            stage2_exprs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            stage1_exprs.append(getattr(F, fn)(inp).alias(out))
            stage2_exprs.append(getattr(F, fn)(out).alias(out))
        else:  # pragma: no cover
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    # the salt must be ROW-derived, not key-derived — hashing the key
    # would map every row of the hot key to one salt and spread
    # nothing. monotonically_increasing_id is deterministic for a
    # fixed partition layout, and any layout yields the same final
    # aggregate (stage 2 merges whatever stage 1 produced).
    salt = (F.monotonically_increasing_id() % n_salts).alias("_salt")
    return (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*stage1_exprs)
        .groupBy(key)
        .agg(*stage2_exprs)
    )


def bucket_table(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Persist ``df`` as a bucketed+sorted table and return the scan.

    Joining two tables bucketed by the same key and bucket count
    plans a SortMergeJoin with no Exchange on either side (verify:
    .explain has no Exchange above the scans).
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # a previous session may have left the managed location behind
    # (fresh in-memory catalog, surviving warehouse dir)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{loc.path}/{name}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )
    return spark.table(name)


def colocated_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Equi-join two same-bucketed tables (shuffle-free)."""
    return spark.table(left).join(spark.table(right), key)
