"""Invariant tests for the dataset-assembly operators: properties the
oracle hash can't express — conservation, coverage, boundedness —
checked on the real fixture.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
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


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_winnowing_shared_run_guarantee(spark, data):
    """The MOSS winnowing bound: two documents sharing a token run of
    length >= k + w - 1 MUST share at least one fingerprint (the
    property plain modular sampling cannot promise). Random docs get
    a random shared run planted at random offsets; the docs differ
    everywhere else (disjoint alphabets), so any shared fingerprint
    necessarily comes from the planted run."""
    from pyspark.sql import functions as F

    from lapidus_spark.functions.text import WINNOW_K, WINNOW_W, ext_winnow_fingerprint
    from lapidus_spark.sources import tables as T

    min_run = WINNOW_K + WINNOW_W - 1
    run_len = data.draw(st.integers(min_value=min_run, max_value=min_run + 6))
    # shared run from a 'z' alphabet; fillers from disjoint alphabets
    run = [f"z{data.draw(st.integers(0, 9))}w{i}" for i in range(run_len)]
    fill_a = [f"a{data.draw(st.integers(0, 99))}" for _ in range(data.draw(st.integers(0, 12)))]
    fill_a2 = [f"a{data.draw(st.integers(0, 99))}" for _ in range(data.draw(st.integers(0, 12)))]
    fill_b = [f"b{data.draw(st.integers(0, 99))}" for _ in range(data.draw(st.integers(0, 12)))]
    fill_b2 = [f"b{data.draw(st.integers(0, 99))}" for _ in range(data.draw(st.integers(0, 12)))]
    doc_a = " ".join(fill_a + run + fill_a2)
    doc_b = " ".join(fill_b + run + fill_b2)

    docs = spark.createDataFrame(
        [(1, doc_a, "en", "src0", len(doc_a)), (2, doc_b, "en", "src0", len(doc_b))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # route the operator at our synthetic docs via the loader seam
    orig = T.load_table
    try:
        T.load_table = lambda _s, _d, name, **kw: docs  # noqa: ARG005
        import lapidus_spark.functions.text as X

        orig_text = X.load_table
        X.load_table = T.load_table
        try:
            out = ext_winnow_fingerprint(spark, "ignored")
            rows = {r["doc_id"]: r for r in out.collect()}
        finally:
            X.load_table = orig_text
    finally:
        T.load_table = orig
    assert rows[1]["n_fingerprints"] >= 1 and rows[2]["n_fingerprints"] >= 1
    # recompute the fingerprint SETS (not just the checksum) to assert
    # a genuine shared member
    k, w, p = WINNOW_K, WINNOW_W, 1000000007

    def winnow(text):
        vals = [len(t) * 7 + ord(t[0]) for t in text.lower().split(" ")]
        kh = []
        for i in range(len(vals) - k + 1):
            h = 0
            for v in vals[i : i + k]:
                h = (h * 31 + v) % p
            kh.append(h)
        return {min(kh[j : j + w]) for j in range(len(kh) - w + 1)}

    fa, fb = winnow(doc_a), winnow(doc_b)
    assert fa & fb, "shared run must yield a shared fingerprint"
    # and the Spark-side checksums agree with the recomputation
    assert rows[1]["fp_checksum"] == sum(fa) % p
    assert rows[2]["fp_checksum"] == sum(fb) % p
