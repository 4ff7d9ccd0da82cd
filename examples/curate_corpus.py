#!/usr/bin/env python
"""End-to-end corpus curation: the LLM training-data pipeline the
extension operators exist for, composed over the real fixture tables.

    python examples/curate_corpus.py [sf_dir]      # default sf0.001

Each stage is a per-document VERDICT produced by a registry operator
(the same oracle-verified code the correctness gate runs); the final
selection joins the verdicts on doc_id and filters — the shape of a
production batch pipeline, where every stage writes annotations and
the assembly step composes them. Stages:

  1. intake profile     (ext_profile_columns — trust the dump first)
  2. span hygiene       (ext_dup_span_trim — docs that are mostly
                         cross-corpus boilerplate 8-gram spans are
                         dropped; ExactSubstr-style)
  3. quality gate       (ext_quality_logit, frozen-weight classifier)
  4. exact dedup        (canonical = lowest QUALITY-SURVIVING doc per
                         text hash — dedup runs after filtering, so a
                         group whose lowest-id copy failed quality
                         still keeps one representative)
  5. near-dup dedup     (ext_dedup_components near-dup clusters →
                         keep the lowest surviving member per
                         component — pairwise doc_b-dropping would
                         lose whole clusters when doc_a was already
                         eliminated upstream)
  6. semantic dedup     (ext_semdedup cluster-blocked embedding
                         dedup; the fixture pairs vec_id ≡ doc_id,
                         the ext_dedup_crossmodal identification)
  7. decontamination    (ext_decontaminate, benchmark-overlap docs out)
  8. domain cap         (ext_domain_cap — at most N docs per source,
                         the anti-monoculture guard; a pre-computed
                         per-corpus verdict joined like the others)
  9. split + manifest   (ext_split_hash, deterministic 90/5/5)

At 100 TB every stage is the same code: the verdicts are narrow
(doc_id + a few ints), so the joins are cheap; the heavy lifting
happened inside each operator's own documented plan shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lapidus_spark.functions.dedup import ext_dedup_components
from lapidus_spark.functions.corpus import ext_decontaminate, ext_dup_span_trim
from lapidus_spark.functions.similarity import ext_semdedup
from lapidus_spark.functions.pipeline import (
    ext_domain_cap,
    ext_profile_columns,
    ext_quality_logit,
    ext_split_hash,
)
from lapidus_spark.session import get_spark
from lapidus_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curate_corpus", cpus=8)
    docs = load_table(spark, sf_dir, "documents")
    funnel: list[tuple[str, int]] = [("intake", docs.count())]

    print("== intake profile ==")
    for r in ext_profile_columns(spark, sf_dir).collect():
        print(f"  {r['col_name']:>8}: rows={r['n_rows']} nulls={r['n_nulls']} distinct={r['n_distinct']}")

    # span hygiene: a doc keeping under 30% of its tokens after
    # cross-corpus duplicated-span removal is boilerplate, not prose
    span_ok = (
        ext_dup_span_trim(spark, sf_dir)
        .filter(F.col("n_kept") * 10 >= F.col("n_tokens") * 3)
        .select("doc_id")
    )
    funnel.append(("span-hygiene", span_ok.count()))

    quality = (
        ext_quality_logit(spark, sf_dir)
        .filter(F.col("keep") == 1)
        .select("doc_id")
        .join(span_ok, "doc_id")
    )
    funnel.append(("quality", quality.count()))

    # exact dedup AFTER the quality gate: canonical = lowest
    # quality-surviving doc per normalized-text hash, so a duplicate
    # group never vanishes just because its lowest-id copy failed
    # quality (the ext_dedup_exact hash rule, applied to survivors)
    canonical = (
        docs.join(quality, "doc_id")
        .select("doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    funnel.append(("exact-dedup", canonical.count()))

    # near-dup: keep the lowest surviving member per near-dup CLUSTER
    # (ext_dedup_components transitive closure) — never drop a doc
    # because of a partner that was itself already eliminated
    comps = ext_dedup_components(spark, sf_dir)
    clustered = canonical.join(comps, "doc_id", "left")
    keep_per_comp = (
        clustered.filter(F.col("component").isNotNull())
        .groupBy("component")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = clustered.filter(F.col("component").isNull()).select("doc_id").unionByName(
        keep_per_comp
    )

    # semantic dedup: SemDeDup's per-cell dropped ids; the fixture
    # pairs embeddings to documents by vec_id ≡ doc_id (the same
    # identification ext_dedup_crossmodal uses)
    sem_dropped = (
        ext_semdedup(spark, sf_dir)
        .select(F.explode(F.split("dropped_ids", r"\|")).alias("sid"))
        .filter(F.col("sid") != "")
        .select(F.col("sid").cast("long").alias("doc_id"))
    )
    deduped = deduped.join(sem_dropped, "doc_id", "left_anti")

    contaminated = ext_decontaminate(spark, sf_dir).select("doc_id")
    survivors = deduped.join(contaminated, "doc_id", "left_anti")
    funnel.append(("post-dedup+decontam", survivors.count()))

    # per-domain cap: the anti-monoculture verdict (computed over the
    # full corpus — a production run would recompute it over the
    # survivors; joined here like every other annotation)
    capped = (
        ext_domain_cap(spark, sf_dir)
        .select(F.explode(F.split("kept_ids", r"\|")).alias("kid"))
        .filter(F.col("kid") != "")
        .select(F.col("kid").cast("long").alias("doc_id"))
    )
    survivors = survivors.join(capped, "doc_id")
    funnel.append(("domain-cap", survivors.count()))

    manifest = survivors.join(ext_split_hash(spark, sf_dir), "doc_id").groupBy(
        "split"
    ).agg(F.count("*").alias("n_docs"))

    print("== curation funnel ==")
    for stage, n in funnel:
        print(f"  {stage:>22}: {n}")
    print("== final manifest ==")
    for r in manifest.orderBy("split").collect():
        print(f"  {r['split']:>6}: {r['n_docs']} docs")
    spark.stop()


if __name__ == "__main__":
    main()
