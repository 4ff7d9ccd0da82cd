"""Relational capability proofs (SURVEY.md §2.5 gap → Spark-native).

The reference has no joins/aggregations (grep-verified, SURVEY §2.5);
the rebuild gets them from Catalyst. These queries prove the surface
on the TPC-H-ish fixtures and pin the physical plans we want at scale:

- ``join_enrich_dim``: events⋈customer is a shuffle join (both sides
  large at 100 TB; AQE may still broadcast at small SF), while
  nation/region are explicitly ``broadcast()`` — no shuffle for dims.
- ``agg_rollup_revenue``: partial (map-side) aggregation before the
  exchange — Catalyst does this automatically for sum/count.
- ``top_k_entities``: groupBy + orderBy + limit → Spark plans
  TakeOrderedAndProject, which keeps only k rows per partition.

Float determinism: double sums are order-dependent, so every double
aggregate here is computed as an *exact* DECIMAL sum (bit-identical
regardless of partitioning) then cast to double; averages divide two
exact quantities in IEEE double, which is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

TOP_K = 10

#: range partitions for the distributed global rank — tracks cluster
#: parallelism at scale (one range slice per concurrent task wave).
RANK_PARTITIONS = 32


def dec(col: str, scale: int = 2) -> F.Column:
    """Exact-decimal view of a 2-dp double column (deterministic sum)."""
    return F.col(col).cast(f"decimal(18,{scale})")


@query(
    "join_enrich_dim",
    oracle="""
    SELECT e.event_id, e.user_id AS entity_id, e.event_type AS type,
           e.value, c.c_name, c.c_mktsegment, n.n_name AS nation,
           r.r_name AS region
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    operator="join_enrich_dim (win_schema at scale)",
    doc="Debezium-style dimension enrichment: event entity → customer "
    "→ nation → region; dims broadcast, fact never shuffled twice.",
)
def join_enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        e.join(c, e.user_id == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            e.event_id,
            e.user_id.alias("entity_id"),
            e.event_type.alias("type"),
            e.value,
            c.c_name,
            c.c_mktsegment,
            n.n_name.alias("nation"),
            r.r_name.alias("region"),
        )
    )


@query(
    "agg_rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    operator="agg_rollup (gap §2.5)",
    doc="TPC-H-Q1-style rollup over lineitem; exact-decimal sums cast "
    "to double for order-independent determinism.",
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(12,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (one - F.col("l_discount").cast("decimal(12,2)"))
        )
        .cast("double")
        .alias("sum_disc_price"),
        (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_join_revenue",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_mktsegment
    """,
    operator="fact-fact shuffle join (gap §2.5)",
    doc="TPC-H-Q3-style revenue by market segment: lineitem⋈orders is "
    "a fact-fact join (sort-merge at scale — neither side broadcasts "
    "at 100 TB), the date filter pushes into the orders scan ahead of "
    "the shuffle, and customer joins after the heavy join to keep the "
    "exchange thin. Cutoff 1998-01-01 sits inside the fixture's "
    "orderdate range [1995-01-01, 2001-08-01] and selects ~10% of "
    "orders (679/6800/68522 at sf0.001/0.01/0.1) — the original "
    "1995-01-01 cutoff selected ZERO rows at every sf, making the "
    "query vacuously green for eight rounds (VERDICT r9 #1).",
)
def agg_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01 00:00:00"
    )
    c = load_table(spark, sf_dir, "customer")
    one = F.lit(1).cast("decimal(12,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (one - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "agg_brand_nation_margin",
    oracle="""
    SELECT p.p_brand, n.n_name AS supplier_nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY p.p_brand, n.n_name
    """,
    operator="star-schema multi-dim join (gap §2.5)",
    doc="Revenue by part brand × supplier nation: the classic "
    "star-schema shape — one fact scan, every dimension broadcast, "
    "zero fact shuffles before the final aggregation exchange.",
)
def agg_brand_nation_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("p_brand"), F.col("n_name").alias("supplier_nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (one - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "agg_distinct_users",
    oracle="""
    SELECT event_type AS type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    operator="distinct aggregation (gap §2.5)",
    doc="Distinct entities per event type — count(DISTINCT) plans a "
    "two-phase aggregate (partial distinct per partition before the "
    "exchange); at 100 TB the approximate twin is approx_count_"
    "distinct (HLL) when exactness isn't required.",
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("type")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "set_except_intersect",
    oracle="""
    SELECT user_id AS entity_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    GROUP BY user_id HAVING count(*) > 13
    """,
    operator="set operations (gap §2.5)",
    doc="INTERSECT/EXCEPT surface: clicking purchasers minus HEAVILY "
    "errored entities (>13 error events) — the audience-segmentation "
    "set algebra the reference has no analog for. The EXCEPT leg is "
    "selective by design: in the fixture EVERY clicking purchaser has "
    "≥4 error events (min 6 at sf0.001, median ~13-14 at all sfs), so "
    "the original unconditional leg emptied the result at every sf and "
    "the query was vacuously green for eight rounds (VERDICT r9 #2). "
    "With the >13 threshold all three legs contribute: 15→7 rows kept "
    "at sf0.001, 150→82 at sf0.01, 1500→819 at sf0.1.",
)
def set_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select(
            F.col("user_id").alias("entity_id")
        )

    heavy_err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("entity_id"))
        .agg(F.count("*").alias("n_err"))
        .filter(F.col("n_err") > 13)
        .select("entity_id")
    )
    return users("click").intersect(users("purchase")).exceptAll(heavy_err).distinct()


@query(
    "agg_value_percentiles",
    oracle="""
    SELECT event_type AS type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           max(value) AS vmax
    FROM events
    GROUP BY event_type
    """,
    operator="percentiles (gap §2.5)",
    doc="Exact interpolated percentiles per event type — Spark's "
    "percentile() and DuckDB's quantile_cont share the linear-"
    "interpolation definition, so values match bit-for-bit. At "
    "100 TB the one-pass sketch twin is percentile_approx (KLL).",
)
def agg_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("type")).agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.max("value").alias("vmax"),
    )


@query(
    "sort_global_events",
    oracle="""
    SELECT event_id, user_id AS entity_id, value,
           row_number() OVER (ORDER BY value DESC, event_id ASC) AS rank
    FROM events
    WHERE value > 100
    """,
    operator="global sort (gap §2.5)",
    doc="Total order over the filtered stream with dense global ranks, "
    "computed WITHOUT a single-partition window: a range exchange on "
    "the sort key spreads the order across partitions, each partition "
    "ranks locally, and per-partition row counts (k rows of metadata) "
    "turn local ranks into global ones via cumulative offsets — the "
    "classic zipWithIndex formulation, fully distributed at 100 TB. "
    "The filter still pushes into the scan.",
)
def sort_global_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    order = [F.desc("value"), F.asc("event_id")]
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 100)
    # Pass 1: range-partition on the sort key — partition i holds
    # strictly higher-ranked rows than partition i+1, so the partition
    # id is the coarse rank. (RANK_PARTITIONS tracks cluster
    # parallelism at scale; the fixture uses the test session's 32.)
    #
    # localCheckpoint is CORRECTNESS, not caching: the pid column
    # feeds two branches (the offset counts and the local ranks), and
    # range-exchange bounds come from run-time SAMPLING — without a
    # materialization the two branches may re-execute the exchange
    # with differently-sampled bounds, silently mis-offsetting ranks.
    # Caught by an sf0.1 full-corpus parity sweep (multi-split input
    # is what makes the two samplings diverge; single-split fixtures
    # can never trip it); pinning the assignment once makes any
    # consistent bound choice produce the exact global order.
    parts = (
        ev.repartitionByRange(RANK_PARTITIONS, *order)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # Pass 2a: per-partition row counts → cumulative offsets. ≤k rows
    # of metadata; the triangular join stays broadcast (never a
    # single-partition window, which would serialize the whole rank).
    counts = parts.groupBy("pid").agg(F.count("*").alias("n"))
    offsets = (
        counts.alias("a")
        .join(F.broadcast(counts.alias("b")), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.n"), F.lit(0)).alias("offset"))
    )
    # Pass 2b: local rank within each range partition + offset.
    w = Window.partitionBy("pid").orderBy(*order)
    return (
        parts.withColumn("local_rank", F.row_number().over(w))
        .join(F.broadcast(offsets), "pid")
        .select(
            "event_id",
            F.col("user_id").alias("entity_id"),
            "value",
            (F.col("offset") + F.col("local_rank")).cast("int").alias("rank"),
        )
    )


@query(
    "top_k_entities",
    oracle=f"""
    SELECT user_id AS entity_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, entity_id ASC
    LIMIT {TOP_K}
    """,
    operator="top_k (gap §2.5)",
    doc="Top-N entities by activity; deterministic tie-break on key so "
    "the result *set* is stable under any partitioning.",
)
def top_k_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("user_id").alias("entity_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("entity_id"))
        .limit(TOP_K)
    )


@query(
    "agg_cube_matrix",
    oracle="""
    SELECT event_type AS type,
           month(ts) AS mon,
           GROUPING(event_type, month(ts)) AS gid,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, month(ts))
    """,
    operator="grouping sets / CUBE (gap §2.5)",
    doc="Full CUBE over (type, month) with the grouping-id bitmask: "
    "all four grouping sets — detail, per-type, per-month, grand "
    "total — produced by ONE exchange (Spark expands grouping sets "
    "map-side before the shuffle, it does not union four scans). "
    "Sums via exact DECIMAL so every rollup level is bit-identical.",
)
def agg_cube_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("mon", F.month("ts"))
    return (
        ev.cube(F.col("event_type").alias("type"), "mon")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select("type", "mon", "gid", "n", "total_value")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type AS type,
           count(DISTINCT user_id) AS n_exact,
           TRUE AS sketch_ok
    FROM events
    GROUP BY event_type
    """,
    operator="HLL sketch distinct-count (pipeline ops — the 100 TB cardinality path)",
    doc="Sketch-accuracy GATE for approximate distinct counting: at "
    "100 TB, count(DISTINCT) is a full two-phase distinct shuffle, so "
    "the production path is approx_count_distinct — HyperLogLog++, "
    "fixed-size mergeable registers, one normal aggregation exchange. "
    "This query computes BOTH in one pass and emits the exact count "
    "plus a boolean asserting the sketch landed within 5%% of it at "
    "rsd=0.02 (the oracle pins the flag TRUE, so a sketch regression "
    "fails parity, not just drifts). Deterministic: HLL++ register "
    "state is a pure function of the value set, independent of "
    "partitioning/order.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("type"))
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
        )
        .select(
            "type",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= F.lit(0.05) * F.col("n_exact")
            ).alias("sketch_ok"),
        )
    )


@query(
    "agg_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate
    GROUP BY l.l_linestatus
    """,
    operator="fact-to-fact co-keyed join + conditional agg (TPC-H Q12 shape)",
    doc="Late-shipment priority audit (TPC-H Q12 adapted to the "
    "fixture's columns): orders joined to lineitem on the order key — "
    "both sides fact-sized at 100 TB, so this is the canonical "
    "co-partitioned shuffle join (bucket both tables by orderkey in a "
    "warehouse and the exchange disappears); the l_shipdate > "
    "o_orderdate predicate applies post-join on columns from both "
    "sides, and the conditional counts compile to a single partial-"
    "aggregated CASE sum, no second pass.",
)
def agg_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("bigint")).alias("high_priority_lines"),
            F.sum((~high).cast("bigint")).alias("low_priority_lines"),
        )
    )


@query(
    "agg_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS yr,
             p.p_brand,
             sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) -
                  CAST(l.l_discount AS DECIMAL(12,2)))) AS r
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT yr,
           CAST(sum(CASE WHEN p_brand = 'Brand#23' THEN r ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE) AS brand_revenue,
           CAST(sum(r) AS DOUBLE) AS total_revenue,
           CAST(sum(CASE WHEN p_brand = 'Brand#23' THEN r ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
             / CAST(sum(r) AS DOUBLE) AS share
    FROM rev
    GROUP BY yr
    """,
    operator="multi-join market share with exact-decimal ratio (TPC-H Q8 shape)",
    doc="Per-year revenue share of one brand (TPC-H Q8 adapted): "
    "lineitem x broadcast(part) for the brand, then the orderkey "
    "shuffle join to orders for the year — the fact is shuffled "
    "exactly once, the dim never. Revenue accumulates in exact "
    "DECIMAL (partition-order-independent) on both engines; the "
    "share divides the two exact totals in IEEE double, which is "
    "deterministic. Group-then-reaggregate keeps the CASE split "
    "after one combined pass rather than scanning twice.",
)
def agg_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    one = F.lit(1).cast("decimal(12,2)")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("yr"), "p_brand")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (one - F.col("l_discount").cast("decimal(12,2)"))
            ).alias("r")
        )
    )
    is_brand = F.col("p_brand") == "Brand#23"
    zero = F.lit(0).cast("decimal(24,4)")
    out = rev.groupBy("yr").agg(
        F.sum(F.when(is_brand, F.col("r")).otherwise(zero)).alias("br"),
        F.sum("r").alias("tr"),
    )
    return out.select(
        "yr",
        F.col("br").cast("double").alias("brand_revenue"),
        F.col("tr").cast("double").alias("total_revenue"),
        (F.col("br").cast("double") / F.col("tr").cast("double")).alias("share"),
    )


@query(
    "agg_hll_union",
    oracle="""
    SELECT event_type AS type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS sketch_ok
    FROM events
    GROUP BY event_type
    """,
    operator="mergeable HLL sketches (partial sketch store + union — the 100 TB rollup path)",
    doc="The sketch WAREHOUSE pattern, not just a one-shot estimate: "
    "per (type, week) Datasketches HLL sketches built with "
    "hll_sketch_agg — the granularity you would PERSIST — then "
    "rolled up per type with hll_union_agg and estimated. Users "
    "spanning many weeks are deduplicated by the register-wise "
    "union, which is exactly the property that lets 100 TB "
    "pipelines precompute daily sketch partials and answer any "
    "date-range distinct query without touching raw data. The gate "
    "asserts the union's estimate lands within 5% of the exact "
    "distinct (lgConfigK=12, ~1.6% rse); the oracle pins the flag "
    "TRUE. Deterministic: sketch state is a pure function of the "
    "value set.",
)
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.col("event_type").alias("type"), F.date_trunc("week", "ts").alias("wk")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = weekly.groupBy("type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_approx")
    )
    exact = ev.groupBy(F.col("event_type").alias("type")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(rolled, "type").select(
        "type",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= F.lit(0.05) * F.col("n_exact")
        ).alias("sketch_ok"),
    )
