#!/usr/bin/env python
"""Continuous-ingestion arm of the curation pipeline: the daemon-mode
story (the reference runs as a long-lived capture daemon,
index.js:5-53) applied to corpus building.

    python examples/curate_stream.py [sf_dir]      # default sf0.001

`curate_corpus.py` is the batch rebuild; this is what runs BETWEEN
rebuilds: crawl snapshots arrive as a stream (file replay here; a
Kafka/object-store listing source in production — same columns, same
code) and each micro-batch is

  1. fingerprinted and probed against the PERSISTED standing-corpus
     fingerprint index (build-once-probe-many — the corpus itself is
     never re-read; stream_dedup_incremental's shape),
  2. accepted arrivals ("new") pick up their embedding and are routed
     to their IVF/SemDeDup cell through the BROADCAST centroid table
     (stream_kmeans_assign's shape — identical routing to the batch
     quantizer by construction),
  3. appended to a cell-partitioned intake area — exactly the layout
     the semantic-dedup and ANN probes read, so the next batch
     rebuild starts from an already-bucketed delta.

Every stage is stateless stream-static work (index probe + broadcast
join), so the stream needs no watermark and scales with the arrival
rate, not the corpus: at 100 TB the standing indexes grow by appends
while each micro-batch touches only its own rows.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lapidus_spark.functions.dedup import build_fingerprint_index
from lapidus_spark.functions.similarity import _CENT_SCORE, _centroid_df
from lapidus_spark.session import get_spark
from lapidus_spark.sources.tables import load_table
from lapidus_spark.streaming.sources import stream_documents


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curate_stream")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    # standing state, built/loaded once (ingest probes, never rebuilds)
    fp_index = spark.read.parquet(build_fingerprint_index(spark, sf_dir))
    embeddings = load_table(spark, sf_dir, "embeddings")
    centroids = _centroid_df(spark)

    # the arrival feed (every INCR_MOD-th doc models the new crawl)
    from lapidus_spark.functions.dedup import INCR_MOD

    arrivals = stream_documents(spark, sf_dir).filter(F.col("doc_id") % INCR_MOD == 0)
    fingerprinted = arrivals.select(
        "doc_id",
        "source",
        F.sha2(
            F.array_join(F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), " "),
            256,
        ).alias("fp"),
    )
    classified = fingerprinted.join(fp_index, "fp", "left").select(
        "doc_id",
        "source",
        F.when(F.col("canonical").isNull(), "new").otherwise("dup").alias("status"),
    )

    intake = tempfile.mkdtemp(prefix="lapidus_intake_")
    funnel: dict[str, int] = {"arrived": 0, "dup_dropped": 0, "admitted": 0, "deferred": 0}

    def admit(batch_df, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            counts = {
                r["status"]: r["n"]
                for r in batch_df.groupBy("status").agg(F.count("*").alias("n")).collect()
            }
            funnel["arrived"] += sum(counts.values())
            funnel["dup_dropped"] += counts.get("dup", 0)
            fresh = batch_df.filter(F.col("status") == "new")
            # LEFT join: an admitted doc with no embedding row must not
            # vanish from the intake while still counted as admitted
            # (ADVICE r5) — it routes to the holding cell -1 and counts
            # as 'deferred' until an embedding arrives.
            with_emb = fresh.join(
                embeddings, fresh.doc_id == embeddings.vec_id, "left"
            ).persist()
            try:
                deferred = with_emb.filter(F.col("vec_id").isNull()).select(
                    "doc_id", "source", F.lit(-1).alias("cell")
                )
                n_deferred = deferred.count()
                funnel["deferred"] += n_deferred
                funnel["admitted"] += counts.get("new", 0) - n_deferred
                routed = (
                    with_emb.filter(F.col("vec_id").isNotNull())
                    .join(F.broadcast(centroids))
                    .select("doc_id", "source", F.expr(_CENT_SCORE).alias("score"), "cell")
                    .groupBy("doc_id", "source")
                    .agg(F.min(F.struct("score", "cell")).alias("m"))
                    .select("doc_id", "source", F.col("m.cell").alias("cell"))
                )
                routed.unionByName(deferred).write.mode("append").partitionBy(
                    "cell"
                ).parquet(intake)
            finally:
                # inside the batch's own finally: a failed write must
                # not leak the cached join for the daemon's lifetime
                with_emb.unpersist()
        finally:
            batch_df.unpersist()

    ckpt = tempfile.mkdtemp(prefix="lapidus_intake_ckpt_")
    q = (
        classified.writeStream.foreachBatch(admit)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    print("== ingestion funnel ==")
    for stage, n in funnel.items():
        print(f"  {stage:>12}: {n}")
    print("== intake by cell (cell -1 = embedding-less holding) ==")
    cells = (
        spark.read.parquet(intake)
        .groupBy("cell")
        .agg(F.count("*").alias("docs"))
        .orderBy("cell")
        .collect()
    )
    for r in cells:
        print(f"  cell {r['cell']:>3}: {r['docs']} docs")
    total = sum(r["docs"] for r in cells)
    print(f"  total intake: {total} docs (admitted {funnel['admitted']} + deferred {funnel['deferred']})")
    assert total == funnel["admitted"] + funnel["deferred"], "intake accounting drifted"


if __name__ == "__main__":
    main()
