"""100x VALUE parity via engine-portable row digests.

PARITY_10X compares full result sets (or a pair digest) at 10x; at
100x (10M events / 50k docs, 32 splits) the driver-side comparator is
impossible for row-per-input queries — a 10M-row toPandas plus a
Python per-value loop. Instead BOTH engines aggregate an exact
order-independent digest of the whole result internally:

    row_term  = sum over columns of ((norm(col) % M + M) % M * P_i) % M
    digest    = (count(*), SUM(row_term mod M), per-column checks)

with M = 2^31 - 1 and distinct small primes P_i per (name-sorted)
column. norm() makes each type engine-portable and EXACT:

- integers: the value itself (mod'd before multiplying so the
  arithmetic stays in int64 on both engines — Spark wraps silently
  on bigint overflow, DuckDB promotes to HUGEINT; pre-mod avoids
  ever relying on either);
- strings: first 15 hex digits of md5 (identical md5 both sides,
  15 digits < 2^60);
- timestamps: microseconds since epoch (unix_micros / epoch_us —
  never the string form, whose trailing-zero formatting differs);
- NULLs: per-type sentinel via coalesce, applied before hashing;
- doubles: EXCLUDED from the digest (there is no portable SQL way to
  hash IEEE bits, and string forms differ in trailing-zero
  formatting) — excluded columns are recorded per query in the
  output so the omission is visible. In this cohort that drops 4
  double columns (value, running_value, avg_chars, avg_tokens), all
  deterministic functions of digested columns and all exactly
  value-compared by the full comparator at sf0.001/0.01/0.1; the
  keys, counts, orderings, and every integer/string/timestamp output
  are digested exactly.

Any missing/extra/different row flips the digest with overwhelming
probability, at O(1) driver transfer. The cohort is the
range/sampled-exchange + per-group-fold class — the r4
nondeterminism family — at the 100x/32-split layout the scaling
curve runs time-only. Writes PARITY_100X.json.
"""

import json
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from lapidus_spark.plans.registry import load_all
from lapidus_spark.session import get_spark
from lapidus_spark.sources.tables import TABLES, load_table

SF = "/root/testdata/sf0.1"
MULT = 100
SPLITS = 32
SHIFT = 10_000_000
M = 2_147_483_647
PRIMES = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41]

#: float-free queries in the range/sampled-exchange + fold class —
#: plus (round 7, VERDICT r6 #6) the first BLOCKED-JOIN operator:
#: ext_dedup_minhash's (doc_a, doc_b) candidate-pair set is integer-
#: only, so the generic in-engine row digest compares the full pair
#: set (~25M pairs at 100x: 5k clusters × C(100,2)) with O(1) driver
#: transfer — value parity for the banded bucket-join itself, at a
#: layout where every cluster spans splits.
COHORT = [
    "sort_global_events",
    "win_running_total",
    "agg_tx_assembly",
    "ext_split_hash",
    "ext_domain_cap",
    "ext_dedup_exact",
    "ext_token_count",
    "ext_text_stats",
    "ext_dedup_minhash",
    # round-7 lake surface (all-digestable schemas: string/bigint/
    # timestamp): the manifest commit protocol's full lifecycle —
    # streamed MERGE, retained-version time travel, bucket-pruned
    # change feed, compaction, rebucket + point read — value-digested
    # at 10M envelopes / 32 splits, where every bucket spans splits
    "stream_merge_lake",
    "lake_time_travel",
    "lake_changes_feed",
    "lake_compaction",
    "lake_rebucket",
    # round-8 surface (all-digestable schemas): OCC commit protocol,
    # row-level pre/post-image feed, and the incremental gold fold
    # (batch + streaming twin — the gold schema is pure bigint) at
    # 10M envelopes / 32 splits
    "lake_concurrent_merge",
    "lake_cdf_preimages",
    "lake_gold_incremental",
    "stream_lake_gold",
    "lake_zonemap_read",
    # round-9 surface (all-digestable schemas): the commit-log
    # manifest under 10M envelopes / 32 splits (every resolution is
    # checkpoint + delta replay), column accretion across epochs
    # (nullable bigint digests), time-zone-map pruned reads, and the
    # update-mode gold chain upserting into a second lake
    "lake_schema_evolution",
    "lake_time_read",
    "stream_lake_gold_update",
    # round-9 table administration at 100x: RESTORE's stamp-proven
    # metadata-only repoint (and the full-outer CDF), VACUUM's floor
    # raise over a 10M-envelope history, predicate DELETE's pruned
    # tombstone rewrite, the Z-ordered OPTIMIZE's per-bucket rank
    # windows at real bucket sizes, and the shallow clone's
    # absolute-pointer reads + COW merge
    "lake_restore",
    "lake_vacuum_read",
    "lake_delete_where",
    "lake_zorder_read",
    "lake_clone",
    "lake_timestamp_travel",
    "lake_txn_idempotent",
    "lake_constraint_merge",
    # round-10 surface (all-digestable schemas): deletion-vector
    # masked reads at real bucket sizes (the broadcast mask must
    # suppress the same winners at 10M envelopes), widened-epoch
    # reads across mixed int32/int64 files, the catalog's
    # two-table tx-consistent resolve, the rename's alias-coalesce
    # over mixed-epoch files, and the resync retirement anti-join
    "lake_delete_dv",
    "lake_type_widening",
    "lake_multi_table_tx",
    "lake_column_rename",
    "lake_snapshot_sync",
    "stream_snapshot_sync",
    # round-11 surface (all-digestable schemas; the embeddings-side
    # ext_ann_pq_trained lives in the 10x cohort — 100x derives only
    # documents/events): the predicate MERGE's conditional clause
    # outcomes over 10M envelopes, DROP COLUMN's epoch-less read,
    # per-column skip reads at real file counts, and the catalog
    # streaming CDF's per-tx multi-table diffs
    "lake_merge_predicates",
    "lake_column_drop",
    "lake_column_skipping",
    "stream_catalog_cdf",
    # the streaming predicate MERGE: clause routing + source-derived
    # stamps across three 10x multi-split micro-batches
    "stream_merge_predicates",
    # round-12 surface (all-digestable schemas): the batch DSv2 read
    # path over 10M envelopes — per-file partitions at real file
    # counts, pruning decisions and arrow alignment value-compared —
    # and the lake→lake replication chain's replica snapshot
    "lake_sql_read",
    "stream_lake_replicate",
    # Bloom-pruned equality reads at 10M envelopes / real file counts
    "lake_bloom_read",
    # the batch catalog relation at 10M envelopes
    "catalog_sql_read",
    # round-13: the batch DSv2 WRITE path at 10M envelopes — real
    # multi-task staging, commit-worker combine at real bucket sizes
    "lake_sql_write",
    # pre/post-image batch relation at 10M envelopes
    "lake_sql_changes_images",
    # streaming DataSource sink at 10M envelopes
    "stream_lake_sink_sql",
]
DERIVED_TABLES = ("documents", "events")

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)


def build_derived(spark) -> str:
    out = tempfile.mkdtemp(prefix="lapidus_parity100x_")

    def shifted(name: str, i: int):
        t = load_table(spark, SF, name)
        if name == "documents":
            return t.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT)).withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copytok{i}"))
            )
        # events: shifted ids, UNSHIFTED ts — copies interleave in
        # event time so the range exchange cannot fall back to
        # per-copy runs (same rule as parity_10x)
        return t.withColumn("event_id", F.col("event_id") + F.lit(i * SHIFT)).withColumn(
            "user_id", F.col("user_id") + F.lit(i * SHIFT)
        )

    for name in DERIVED_TABLES:
        reduce(
            lambda a, b: a.unionByName(b), [shifted(name, i) for i in range(MULT)]
        ).repartition(SPLITS).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    return out


def duck_connection_100x(derived_dir: str) -> duckdb.DuckDBPyConnection:
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


def _terms(schema):
    """(column, spark_term_sql, duck_term_sql, prime) per digestable
    column, name-sorted; plus the list of excluded (float) columns."""
    cols = sorted(schema.fields, key=lambda f: f.name)
    spark_terms, duck_terms, excluded = [], [], []
    for i, f in enumerate(cols):
        p = PRIMES[i % len(PRIMES)]
        c = f.name
        if isinstance(f.dataType, _INT_TYPES):
            s = f"coalesce(CAST({c} AS BIGINT), -987654321987654321L)"
            d = f"coalesce(CAST({c} AS BIGINT), -987654321987654321)"
        elif isinstance(f.dataType, StringType):
            s = f"CAST(conv(substring(md5(coalesce({c}, '<NULL>')), 1, 15), 16, 10) AS BIGINT)"
            d = f"CAST(concat('0x', substr(md5(coalesce({c}, '<NULL>')), 1, 15)) AS BIGINT)"
        elif isinstance(f.dataType, (TimestampType, TimestampNTZType)):
            # NTZ → LTZ cast is value-preserving under the pinned-UTC
            # session; epoch micros are format-free on both engines
            s = f"coalesce(unix_micros(CAST({c} AS TIMESTAMP)), -1L)"
            d = f"coalesce(epoch_us({c}), -1)"
        elif isinstance(f.dataType, DateType):
            s = f"coalesce(CAST(datediff({c}, DATE'1970-01-01') AS BIGINT), -1L)"
            d = f"coalesce(CAST({c} - DATE '1970-01-01' AS BIGINT), -1)"
        else:
            excluded.append(f"{c}:{f.dataType.simpleString()}")
            continue
        spark_terms.append(f"((((({s}) % {M}) + {M}) % {M}) * {p}) % {M}")
        duck_terms.append(f"((((({d}) % {M}) + {M}) % {M}) * {p}) % {M}")
    return spark_terms, duck_terms, excluded


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="subset to (re)run; merges into PARITY_100X.json")
    only = ap.parse_args().queries
    spark = get_spark("parity_100x", cpus=32)
    reg = load_all()
    derived = build_derived(spark)
    con = duck_connection_100x(derived)
    results: dict[str, dict] = {}
    if only:
        try:
            with open("/root/repo/PARITY_100X.json") as f:
                results = json.load(f)["results"]
        except FileNotFoundError:
            pass
    for name in only or COHORT:
        spec = reg[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, derived)
            st, dt_, excluded = _terms(df.schema)
            row = f"({' + '.join(st)}) % {M}"
            sdig = df.selectExpr(
                "CAST(count(*) AS BIGINT) AS n_rows",
                f"CAST(sum({row}) AS BIGINT) AS row_hash",
            ).first()
            drow = f"({' + '.join(dt_)}) % {M}"
            odig = con.sql(
                f"SELECT CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(sum({drow}) AS BIGINT) AS row_hash "
                f"FROM ({spec.oracle})"
            ).fetchone()
            ok = (sdig["n_rows"], sdig["row_hash"]) == (odig[0], odig[1])
            results[name] = {
                "ok": bool(ok),
                "n_rows": int(sdig["n_rows"]),
                "excluded_cols": excluded,
                "detail": None
                if ok
                else f"spark={tuple(sdig)} oracle={tuple(odig)}",
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
        "method": "in-engine modular row digest (count + hash-sum); floats excluded by construction",
        "n": len(results),
        "failures": bad,
        "results": results,
    }
    with open("/root/repo/PARITY_100X.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"PARITY_100X DONE {len(results)} queries, {len(bad)} failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
