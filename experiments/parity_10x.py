"""Oracle PARITY (values, not just wall-clock) at 10x derived data
for the heavy blocked-join cohort — the operators whose 100 TB story
rests on blocking/banding, and the exact class where the round-4
multi-split-only nondeterminism bug lived (VERDICT r5 directive #5).

The scaling-curve probes measure *time* at 10x/100x; this runs the
full driver-style compare (rows + columns + exact values) against a
DuckDB oracle over the SAME derived parquet, so any layout- or
split-count-dependent divergence (re-sampled exchanges, bucket-guard
threshold flips, fold-order drift) shows up as a value mismatch.

Derivation mirrors experiments/scaling_curve_corpus.py: 10 copies
with shifted keys and a per-copy suffix token on document text (so
duplicate density stays realistic), written as multi-split parquet —
8 splits minimum, which is what made the r4 bug reproducible.
Orders/lineitem get consistent key shifts so the trade graph becomes
10 disjoint shifted replicas (bigger joins, more splits, same
per-replica fixed-point trajectory).

Writes PARITY_10X.json at the repo root.
"""

import json
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import load_all
from lapidus_spark.session import get_spark
from lapidus_spark.sources.tables import TABLES, load_table
from tests.oracle_utils import compare

SF = "/root/testdata/sf0.1"
MULT = 10
SPLITS = 8
SHIFT = 10_000_000

# The blocked-join cohort and the tables each derives from — plus
# (round-6 extension) the RANGE/SAMPLED-EXCHANGE class: queries whose
# plans sample partition bounds or assign global offsets, the exact
# family where the r4 multi-split-only nondeterminism bug lived
# (sort_global_events). Multi-split 10x events data is the layout
# that reproduces that class; none of these had value parity above
# sf0.1 before.
COHORT = [
    "ext_dedup_minhash",
    "ext_dedup_ngram",
    "ext_semdedup",
    "ext_dup_span",
    "ext_dup_span_trim",
    "ext_dedup_components",
    "ext_pagerank",
    # range/sampled-exchange + per-group-fold class (events side)
    "sort_global_events",
    "agg_tx_assembly",
    "win_ema",
    "win_running_total",
    # range-exchange offsets + hive-layout round trips (docs side)
    "ext_seq_pack",
    "ext_corpus_shard",
    "ext_domain_cap",
    "ext_domain_gini",
    "ext_split_hash",
    # round-7 lake surface: the manifest commit protocol under 10x
    # multi-split envelopes — merge/compact/rebucket lifecycle,
    # retained-version time travel, and the bucket-pruned change feed
    # all value-compared against the same DuckDB snapshot oracles
    "stream_merge_lake",
    "lake_time_travel",
    "lake_changes_feed",
    "lake_compaction",
    "lake_rebucket",
    # round-8 surface: optimistic multi-writer commits, the row-level
    # pre/post-image feed, the incremental gold fold (batch + its
    # streaming twin), and the incrementally-appended ANN index —
    # each value-compared at 10x/8-split layouts where buckets and
    # cells span splits and every interleave crosses real parallelism
    "lake_concurrent_merge",
    "lake_cdf_preimages",
    "lake_gold_incremental",
    "stream_lake_gold",
    "ext_ann_incremental",
    "lake_zonemap_read",
    # round-9 surface: the incremental manifest commit log under 10x
    # multi-split envelopes (every lake query above now resolves
    # versions through checkpoint+delta replay), plus the new column-
    # accretion, time-zone-map, and update-mode-gold paths
    "lake_schema_evolution",
    "lake_time_read",
    "stream_lake_gold_update",
    # round-9 table administration: RESTORE's metadata-only undo (and
    # the full-outer CDF it forces), explicit VACUUM's floor raise,
    # predicate DELETE's tombstone rewrite, the Z-ordered OPTIMIZE
    # (per-bucket rank windows + Morton sort under real parallelism),
    # and the shallow clone's absolute-pointer reads + COW merge
    "lake_restore",
    "lake_vacuum_read",
    "lake_delete_where",
    "lake_zorder_read",
    "lake_clone",
    "lake_timestamp_travel",
    # write-side governance at 10x: replayed-epoch skips under real
    # bucket counts; constraint validation riding every merge
    "lake_txn_idempotent",
    "lake_constraint_merge",
    # round-10 surface: deletion-vector reads (the broadcast mask must
    # suppress the same LWW winners whatever the split layout), the
    # widened-epoch read (int32 files promoted to bigint across real
    # multi-split buckets), the catalog's tx-consistent two-table
    # resolve, recall@10 of the ANN probes vs the exact ranking at a
    # 10x corpus, and the de-vacuo-fixed set-operation battery (its
    # EXCEPT leg now contributes rows at every scale — 10x included)
    "lake_delete_dv",
    "lake_type_widening",
    "lake_multi_table_tx",
    "ext_ann_eval",
    "set_except_intersect",
    # the rename's alias-coalesce read over multi-split mixed-epoch
    # files, and the PQ codes/ADC/shortlist under real parallelism
    # (the shortlist cut is a global top-50 across 8 splits)
    "lake_column_rename",
    "ext_ann_pq",
    # the resync retirement anti-join across 10x multi-split buckets
    # (batch + its streaming twin)
    "lake_snapshot_sync",
    "stream_snapshot_sync",
    # the catalog CDF's per-table full-outer diffs at 10x/multi-split
    "lake_catalog_cdf",
    # round-11 surface: the general-predicate MERGE's clause CASE
    # tree + two-pass bucket-pruned join at 10x, DROP COLUMN's
    # stop-requesting read over multi-split mixed-epoch files, the
    # per-column skip read (file pruning on the declared column must
    # select the same rows whatever the valve split layout), the
    # trained-PQ Lloyd update + re-code + ADC at a 10x corpus, and
    # the catalog-level streaming CDF's tx-consistent multi-table
    # diffs
    "lake_merge_predicates",
    "lake_column_drop",
    "lake_column_skipping",
    "ext_ann_pq_trained",
    "stream_catalog_cdf",
    # the streaming predicate MERGE: clause routing + source-derived
    # stamps across three 10x multi-split micro-batches
    "stream_merge_predicates",
    # round-12 surface: the batch DSv2 read path (SELECT over the
    # USING-lake relation) — the python-source partition planning,
    # bucket/zone-map pruning and arrow alignment must return the
    # same LWW snapshot whatever the 10x multi-split file layout —
    # and the lake→lake replication chain (per-version diffs fed
    # through the clause MERGE must land the same replica snapshot
    # at 10x bucket/file counts)
    "lake_sql_read",
    "stream_lake_replicate",
    # Bloom-pruned equality reads: the per-file filters must keep
    # zero false negatives (and the in-query fewer-files assert must
    # hold) whatever the 10x valve split layout
    "lake_bloom_read",
    # the batch catalog relation: tx-consistent member-table resolve
    # + the pinned-version python scan at 10x bucket/file counts
    "catalog_sql_read",
    # round-13 surface: the batch DSv2 WRITE path — three txn-marked
    # df.write commits (executor staging + session-less commit-worker
    # combine) must land the same LWW snapshot at 10x envelope counts
    # and multi-file staging layouts
    "lake_sql_write",
    # the pre/post-image batch relation: per-(step, bucket) executor
    # diffs must emit the exact vocabulary at 10x file counts
    "lake_sql_changes_images",
    # the streaming DataSource sink: per-micro-batch commit-worker
    # merges must land the full-history LWW snapshot at 10x
    "stream_lake_sink_sql",
]
DERIVED_TABLES = ("documents", "embeddings", "orders", "lineitem", "events")


def build_derived(spark) -> str:
    out = tempfile.mkdtemp(prefix="lapidus_parity10x_")

    def shifted(name: str, i: int):
        t = load_table(spark, SF, name)
        if name == "documents":
            return t.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT)).withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copytok{i}"))
            )
        if name == "embeddings":
            return t.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        if name == "orders":
            return t.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * SHIFT)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(i * SHIFT))
        if name == "lineitem":
            return t.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT)
            ).withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * SHIFT))
        if name == "events":
            # shifted ids, UNSHIFTED ts: the copies interleave in event
            # time, so the global sort / range exchange cannot fall
            # back to per-copy runs — ties across copies are broken by
            # the shifted event_id, keeping the total order exact.
            return t.withColumn(
                "event_id", F.col("event_id") + F.lit(i * SHIFT)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * SHIFT))
        raise KeyError(name)

    for name in DERIVED_TABLES:
        reduce(
            lambda a, b: a.unionByName(b), [shifted(name, i) for i in range(MULT)]
        ).repartition(SPLITS).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    return out


def duck_connection_10x(derived_dir: str) -> duckdb.DuckDBPyConnection:
    """Views over the derived multi-split tables; the untouched
    tables fall back to the sf0.1 single-file originals."""
    con = duckdb.connect()
    for t in TABLES:
        if t in DERIVED_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{derived_dir}/{t}.parquet/*.parquet')"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
    return con


#: queries whose 10x RESULT SET is too large to ship driver-side
#: (the derivation makes every doc a 10-way near-dup, so the
#: qualifying pair set grows ~quadratically in the copy count —
#: ext_dedup_ngram emitted >1 GiB of pairs and tripped
#: spark.driver.maxResultSize). For these, both engines aggregate an
#: order-independent VALUE DIGEST of the full pair set internally —
#: count, per-column sums, and a modular pair-hash sum — so any
#: differing/missing/extra pair flips the comparison without a
#: driver-side row transfer. (The per-pair jaccard value itself is
#: float and excluded from the digest — it is value-verified by the
#: exact compare at sf0.001/sf0.01/sf0.1; the 10x question is
#: whether the multi-split candidate generation yields the same
#: PAIR SET.)
PAIR_DIGEST = {"ext_dedup_ngram"}
_HP, _HM = 1_000_003, 2_147_483_647


def digest_spark(df):
    return df.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("doc_a").cast("long").alias("sum_a"),
        F.sum("doc_b").cast("long").alias("sum_b"),
        F.sum(F.pmod(F.col("doc_a") * F.lit(_HP) + F.col("doc_b"), F.lit(_HM)))
        .cast("long")
        .alias("pair_hash"),
    )


def digest_sql(sql: str) -> str:
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(doc_a) AS BIGINT) AS sum_a,
           CAST(sum(doc_b) AS BIGINT) AS sum_b,
           CAST(sum((doc_a * {_HP} + doc_b) % {_HM}) AS BIGINT) AS pair_hash
    FROM ({sql})
    """


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="subset to (re)run; merges into PARITY_10X.json")
    only = ap.parse_args().queries
    spark = get_spark("parity_10x", cpus=32)
    reg = load_all()
    derived = build_derived(spark)
    con = duck_connection_10x(derived)
    results: dict[str, dict] = {}
    if only:
        try:
            with open("/root/repo/PARITY_10X.json") as f:
                results = json.load(f)["results"]
        except FileNotFoundError:
            pass
    for name in only or COHORT:
        spec = reg[name]
        t0 = time.time()
        try:
            if name in PAIR_DIGEST:
                r = compare(digest_spark(spec.fn(spark, derived)), con, digest_sql(spec.oracle))
                r["detail"] = (r.get("detail") or "") + " [pair-set digest]"
            else:
                r = compare(spec.fn(spark, derived), con, spec.oracle)
            results[name] = {
                "ok": bool(r["ok"]),
                "detail": r.get("detail") or None,
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 — isolate per query
            results[name] = {
                "ok": False,
                "detail": str(e)[:300],
                "sec": round(time.time() - t0, 2),
            }
        print(name, results[name]["ok"], results[name]["sec"], flush=True)
    bad = [n for n, r in results.items() if not r["ok"]]
    out = {
        "base_sf": SF,
        "mult": MULT,
        "splits": SPLITS,
        "derived_tables": list(DERIVED_TABLES),
        "n": len(results),
        "failures": bad,
        "results": results,
    }
    with open("/root/repo/PARITY_10X.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"PARITY_10X DONE {len(results)} queries, {len(bad)} failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
