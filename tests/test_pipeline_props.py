"""Invariant tests for the dataset-assembly operators: properties the
oracle hash can't express — conservation, coverage, boundedness —
checked on the real fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lapidus_spark.functions.pipeline import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    PACK_BUDGET,
    SAMPLE_RATES,
    TRAIN_PCT,
    VAL_PCT,
    ext_chunk_overlap,
    ext_sample_stratified,
    ext_seq_pack,
    ext_split_hash,
)
from lapidus_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_split_is_total_and_roughly_proportional(spark):
    docs = load_table(spark, SF_DIR, "documents")
    split = ext_split_hash(spark, SF_DIR)
    assert split.count() == docs.count()  # every doc assigned exactly once
    frac = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(frac.values())
    # 90/5/5 with hash-binomial noise; the fixture is small, so ±10pp
    assert abs(frac["train"] / n - TRAIN_PCT / 100) < 0.10
    assert frac.get("val", 0) / n < (VAL_PCT + 10) / 100


def test_chunks_cover_every_token_and_respect_geometry(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    chunks = ext_chunk_overlap(spark, SF_DIR)
    geo = chunks.agg(
        F.max("chunk_len").alias("max_len"), F.min("chunk_len").alias("min_len")
    ).first()
    assert geo["max_len"] <= CHUNK_SIZE
    assert geo["min_len"] >= 1
    # coverage: the last chunk of each doc must reach the doc's end —
    # its start + length equals the token count (strides tile the rest)
    last = (
        chunks.groupBy("doc_id")
        .agg(F.max("chunk_id").alias("last_id"), F.max_by("chunk_len", "chunk_id").alias("last_len"))
        .join(docs, "doc_id")
    )
    uncovered = last.filter(
        F.col("last_id") * CHUNK_STRIDE + F.col("last_len") < F.col("n_tok")
    ).count()
    assert uncovered == 0


def test_seq_pack_conserves_tokens_and_bounds_bins(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        F.size(F.split("text", " ")).alias("n_tok")
    )
    total_tokens = docs.agg(F.sum("n_tok")).first()[0]
    max_doc = docs.agg(F.max("n_tok")).first()[0]
    bins = ext_seq_pack(spark, SF_DIR)
    agg = bins.agg(
        F.sum("n_tokens").alias("tok"),
        F.sum("n_docs").alias("docs"),
        F.max("n_tokens").alias("biggest"),
    ).first()
    assert agg["tok"] == total_tokens  # every token lands in exactly one bin
    assert agg["docs"] == load_table(spark, SF_DIR, "documents").count()
    # offset packing: a bin holds at most budget + one straddling doc
    assert agg["biggest"] <= PACK_BUDGET + max_doc
    # bin ids are the dense offset sequence 0..max
    ids = sorted(r["bin_id"] for r in bins.select("bin_id").collect())
    assert ids == list(range(len(ids)))


def test_stratified_sample_rates_bound_each_stratum(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sample = ext_sample_stratified(spark, SF_DIR)
    kept = {
        r["lang"]: r["n"]
        for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    pop = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n_pop in pop.items():
        rate = SAMPLE_RATES[lang] / 100
        # binomial bound: kept fraction within ±25pp of the stratum rate
        # on the tiny fixture (the point is per-stratum, not global)
        assert kept.get(lang, 0) <= n_pop
        assert abs(kept.get(lang, 0) / n_pop - rate) < 0.25
    # determinism: same rule, same sample
    again = ext_sample_stratified(spark, SF_DIR)
    assert again.exceptAll(sample).count() == 0
