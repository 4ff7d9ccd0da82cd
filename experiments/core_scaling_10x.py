#!/usr/bin/env python
"""Core-scaling evidence at 10x-derived data (VERDICT r13 #4): the
sf0.1 core-scaling pair is pure noise (every query is overhead-
dominated at ~600k rows — the 8-core run BEAT the 32-core run), so
this times the top-heaviest declared queries on the 10x multi-split
derivation (the PARITY_10X layout: shifted keys, 8 splits) at a given
core count. Run it twice and compare:

    python experiments/core_scaling_10x.py --cpus 32 --out /root/r14/scale10x_c32.json
    python experiments/core_scaling_10x.py --cpus 8  --out /root/r14/scale10x_c8.json

Protocol mirrors bench.py: process-cached fixtures pre-built outside
the timed region, one warm pass at sf0.001, noop-sink actions, batch
cohort before streaming. The derived dir is built once per machine at
a fixed path and reused (it is INPUT data, shared by both runs — not
a result cache; every timed query computes from it)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: top-heaviest queries by the r13 closing floors + driver record,
#: covering every heavy family: the lake merge/commit cohort, the
#:  streaming state cohort, and the ext_* pipeline heads.
QUERIES = [
    "lake_bloom_read",
    "lake_constraint_merge",
    "lake_gold_incremental",
    "lake_merge_predicates",
    "lake_multi_table_tx",
    "lake_snapshot_sync",
    "lake_vacuum_read",
    "ext_ann_eval",
    "ext_ann_pq_trained",
    "ext_dedup_ngram",
    "ext_semdedup",
    "stream_distinct_watermarked",
    "stream_funnel_state",
    "stream_lake_gold",
    "stream_lake_gold_update",
    "stream_lake_replicate",
    "stream_merge_lake",
    "stream_merge_predicates",
    "stream_snapshot_sync",
]
# NOT in the cohort: stream_stream_join / stream_outer_attrib /
# stream_dedup_exact replay via stream_events/stream_documents, whose
# pathGlobFilter ("events*.parquet") matches single-FILE sf layouts —
# a multi-split derived dir yields zero matching files, so their
# "timings" here would measure an empty stream. Their scale story is
# the state-commit floor profiled in profile_stream_heavy.py.


def build_or_reuse_derived(spark, path: str) -> str:
    """10x derivation at a fixed path, PARITY_10X's recipe (shifted
    keys, copy-suffixed doc text, 8 splits per table). Input data, not
    results: every timed query computes from these parquet files."""
    marker = os.path.join(path, "_DERIVED_OK")
    if os.path.exists(marker):
        return path
    from functools import reduce

    from pyspark.sql import functions as F

    from lapidus_spark.sources.tables import load_table

    SF = "/root/testdata/sf0.1"
    MULT, SPLITS, SHIFT = 10, 8, 10_000_000
    os.makedirs(path, exist_ok=True)

    def shifted(name: str, i: int):
        t = load_table(spark, SF, name)
        if name == "documents":
            return t.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * SHIFT)
            ).withColumn("text", F.concat(F.col("text"), F.lit(f" copytok{i}")))
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
        # shifted ids AND shifted users (PARITY_10X's recipe): per-user
        # event counts must stay at their 1x values or count-derived
        # clause routing (e.g. lake_merge_predicates' cnt<=60 delete)
        # changes outcomes at 10x
        return t.withColumn(
            "event_id", F.col("event_id") + F.lit(i * SHIFT)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * SHIFT))

    for name in ("documents", "embeddings", "orders", "lineitem", "events"):
        big = reduce(
            lambda a, b: a.unionByName(b), [shifted(name, i) for i in range(MULT)]
        )
        big.repartition(SPLITS).write.mode("overwrite").parquet(
            os.path.join(path, f"{name}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write("ok")
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--derived", default="/root/r14/derived10x")
    args = ap.parse_args()

    from lapidus_spark.plans.registry import load_all
    from lapidus_spark.session import get_spark

    spark = get_spark("core_scaling_10x", cpus=args.cpus)
    reg = load_all()
    sf_dir = build_or_reuse_derived(spark, args.derived)

    # fixture pre-build (bench.py's setup block, restricted to the
    # builders the cohort consumes)
    from lapidus_spark.functions.dedup import build_fingerprint_index, build_ngram_index
    from lapidus_spark.functions.similarity import (
        build_ivf_index,
        build_pq_index,
        build_pq_trained_index,
    )
    from lapidus_spark.functions.text import build_df_index
    from lapidus_spark.streaming.queries import (
        build_late_replay,
        build_merge_replay,
        build_snapshot_replay,
        build_versioned_lake,
    )

    fixtures = {}
    for b in (
        build_fingerprint_index,
        build_ngram_index,
        build_df_index,
        build_ivf_index,
        build_pq_index,
        build_pq_trained_index,
        build_late_replay,
        build_merge_replay,
        build_snapshot_replay,
        build_versioned_lake,
    ):
        t0 = time.perf_counter()
        try:
            b(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"# fixture {b.__name__} failed: {e}", file=sys.stderr)
            continue
        fixtures[b.__name__] = round(time.perf_counter() - t0, 2)

    order = [q for q in sorted(QUERIES) if not q.startswith("stream_")] + [
        q for q in sorted(QUERIES) if q.startswith("stream_")
    ]
    # warm pass at sf0.001 (codegen/JIT, same as bench.py)
    for name in order:
        try:
            reg[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
    for t in spark.catalog.listTables():
        if t.isTemporary and t.name.endswith("_out"):
            spark.catalog.dropTempView(t.name)

    timings = {}
    for name in order:
        t0 = time.perf_counter()
        try:
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            timings[name] = None
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.endswith("_out"):
                spark.catalog.dropTempView(t.name)

    payload = {
        "cpus": args.cpus,
        "derived": sf_dir,
        "mult": 10,
        "queries": timings,
        "fixtures": fixtures,
        "total": round(sum(v for v in timings.values() if v), 2),
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
