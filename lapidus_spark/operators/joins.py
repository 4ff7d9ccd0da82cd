"""Join operators beyond plain equi-join (SURVEY.md §2.5 gap).

The reference has no joins at all (grep-verified, SURVEY §2.5); the
rebuild proves the full join surface a CDC consumer needs: semi/anti
(change-feed reconciliation), as-of (event → latest dimension version
at event time — the temporal generalization of win_schema's "attach
the latest schema", postgresql.js:477), and range/band joins
(bucketing continuous values against a rule table).

Scale notes (100 TB posture):
- semi/anti joins shuffle once on the key and never materialize the
  probe side's payload.
- the as-of join is implemented as union + cumulative window (one
  shuffle on the key, per-partition streaming max) — NOT as an
  inequality join + group-by, which explodes to |events| × |orders
  per key| intermediate rows. The DuckDB oracle *is* the quadratic
  formulation, which is exactly why it's only the oracle.
- the band join broadcasts the (tiny) band table; a nested-loop join
  against a broadcast of k rows is O(n·k) with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

#: value bands for the range join (cover all doubles).
BANDS = [
    ("low", float("-inf"), 50.0),
    ("mid", 50.0, 200.0),
    ("high", 200.0, float("inf")),
]


@query(
    "join_semi_active",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
    operator="semi join (gap §2.5)",
    doc="Customers with at least one change event (left-semi): the "
    "'which entities did the feed touch' reconciliation question.",
)
def join_semi_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    return c.join(e, c.c_custkey == e.user_id, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti_silent",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
    operator="anti join (gap §2.5)",
    doc="Customers with no change events (left-anti): the missed-"
    "delivery / dead-entity audit a CDC consumer runs.",
)
def join_anti_silent(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    return c.join(e, c.c_custkey == e.user_id, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_asof_order",
    oracle="""
    WITH best AS (
      SELECT e.event_id, e.user_id, e.ts,
             max(o.o_orderdate) AS asof_order_date
      FROM events e
      LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      GROUP BY e.event_id, e.user_id, e.ts
    )
    SELECT b.event_id, b.user_id AS entity_id, b.ts AS event_ts,
           b.asof_order_date,
           max(o2.o_orderkey) AS asof_orderkey
    FROM best b
    LEFT JOIN orders o2
      ON o2.o_custkey = b.user_id AND o2.o_orderdate = b.asof_order_date
    GROUP BY b.event_id, b.user_id, b.ts, b.asof_order_date
    """,
    operator="as-of join (gap §2.5; win_schema temporal generalization)",
    doc="Each event joined to the entity's latest order at-or-before "
    "the event time — 'attach the latest version as of now' "
    "(postgresql.js:477) generalized to event time. Implemented as "
    "union + cumulative struct-max window: one shuffle, no row "
    "explosion; ties on order date resolved to the max orderkey.",
)
def join_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("struct<d:timestamp,key:bigint>").alias("ord"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.struct(
            F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("key")
        ).alias("ord"),
    )
    # order rows sort before event rows at the same instant (is_event
    # ASC), so an order placed exactly at the event time is visible.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = e.unionByName(o).withColumn("asof", F.max("ord").over(w))
    return u.filter(F.col("is_event") == 1).select(
        F.col("event_id"),
        F.col("k").alias("entity_id"),
        F.col("t").alias("event_ts"),
        F.col("asof.d").alias("asof_order_date"),
        F.col("asof.key").alias("asof_orderkey"),
    )


@query(
    "join_range_band",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', CAST('-infinity' AS DOUBLE), 50.0),
             ('mid', 50.0, 200.0),
             ('high', 200.0, CAST('infinity' AS DOUBLE))
    )
    SELECT b.band, count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
    operator="range/band join (gap §2.5)",
    doc="Continuous values bucketed against a rule table via an "
    "inequality join; the band side is broadcast (k rows), so the "
    "plan is a no-shuffle nested loop over the fact scan.",
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    return (
        e.join(
            F.broadcast(bands),
            (e.value >= bands.lo) & (e.value < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


#: salt fan-out for the skew-buster join (cluster knob: roughly the
#: ratio of the hottest key's row count to a healthy task's share).
SALT_BUCKETS = 8


def salted_join(fact: DataFrame, dim: DataFrame, key: str, salt_buckets: int = SALT_BUCKETS):
    """Skew-buster equi-join: the fact side gets a deterministic salt
    in [0, salt_buckets), the dim side is replicated once per salt
    value, and the join runs on (key, salt) — a hot key's rows spread
    across ``salt_buckets`` tasks instead of serializing through one.
    Result rows are identical to the unsalted join (each fact row
    still matches exactly its key's dim row, at exactly one salt).

    At 100 TB this is the manual fallback when AQE's skew-join split
    can't help (e.g. the skew is in a broadcast-ineligible dim or a
    bucketed table whose layout AQE won't break); salt only the keys
    you must — replicating the dim multiplies its shuffle volume."""
    salts = fact.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), salt_buckets).cast("int")
    )
    salted_dim = dim.crossJoin(F.broadcast(salts))
    joined = salted_fact.join(salted_dim, [key, "_salt"])
    return joined.drop("_salt")


@query(
    "join_skew_salted",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    operator="skew-mitigated join (salting — gap §2.5 at-scale technique)",
    doc="The salting skew-buster proven CORRECT, not just fast: events "
    "join customer on the entity key through salted_join (fact rows "
    "deterministically salted, dim replicated per salt, join on "
    "(key, salt)), then aggregate per market segment. The oracle is "
    "the PLAIN unsalted join — parity proves salting changes the "
    "physical distribution and nothing else. Exact-decimal sum keeps "
    "the double deterministic under the altered partitioning.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(e, c, "user_id")
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
