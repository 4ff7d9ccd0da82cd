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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_dup_span_matches_bruteforce(spark, data):
    """ext_dup_span vs a direct Python recomputation on random tiny
    corpora: per-doc duplicated-token counts must match exactly for
    arbitrary gram overlaps (nested, crossing, self-repeats within a
    doc that also appear elsewhere)."""
    from lapidus_spark.functions.corpus import DUP_N, MIN_DUP_DOCS, ext_dup_span
    from lapidus_spark.sources import tables as T

    n_docs = data.draw(st.integers(min_value=2, max_value=5))
    # tiny alphabet so cross-doc gram collisions actually happen
    docs_tokens = [
        [
            f"t{data.draw(st.integers(0, 2))}"
            for _ in range(data.draw(st.integers(DUP_N, DUP_N + 10)))
        ]
        for _ in range(n_docs)
    ]
    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(docs_tokens)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    # brute force
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for i, toks in enumerate(docs_tokens):
        for p in range(len(toks) - DUP_N + 1):
            gram_docs[tuple(toks[p : p + DUP_N])].add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= MIN_DUP_DOCS}
    expected = {}
    for i, toks in enumerate(docs_tokens):
        cov = set()
        for p in range(len(toks) - DUP_N + 1):
            if tuple(toks[p : p + DUP_N]) in dup:
                cov.update(range(p, p + DUP_N))
        expected[i] = (len(toks), len(cov))

    orig = T.load_table
    import lapidus_spark.functions.corpus as C

    orig_c = C.load_table
    try:
        T.load_table = C.load_table = lambda _s, _d, name, **kw: docs  # noqa: ARG005
        out = {r["doc_id"]: r for r in ext_dup_span(spark, "ignored").collect()}
    finally:
        T.load_table = orig
        C.load_table = orig_c
    assert set(out) == set(expected)
    for i, (n_tok, n_dup) in expected.items():
        assert out[i]["n_tokens"] == n_tok, (i, docs_tokens)
        assert out[i]["n_dup_tokens"] == n_dup, (i, docs_tokens)


def test_ohlc_tiebreak_and_order_independence(spark):
    """win_ohlc_bars: open/close are argmin/argmax by (ts, event_id) —
    equal timestamps resolve by event_id, and the answer is identical
    under any input row order (the property that makes the streaming
    twin safe for out-of-order feeds)."""
    import datetime as dt

    from lapidus_spark.operators.windows import win_ohlc_bars
    from lapidus_spark.sources import tables as T

    t0 = dt.datetime(2026, 1, 1, 10, 15, 0)
    rows = [
        # same ts: event_id 1 must win 'open'
        (2, t0, 7, "click", 50.0, "{}"),
        (1, t0, 7, "click", 10.0, "{}"),
        # later ts wins 'close'; high/low from the middle
        (3, t0 + dt.timedelta(minutes=5), 7, "click", 99.0, "{}"),
        (4, t0 + dt.timedelta(minutes=20), 7, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=30), 7, "click", 42.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    import lapidus_spark.operators.windows as W

    orig = W.load_table
    results = []
    try:
        for perm in (rows, rows[::-1], rows[2:] + rows[:2]):
            ev = spark.createDataFrame(perm, schema)
            W.load_table = lambda _s, _d, name, **kw: ev  # noqa: ARG005, B023
            results.append(
                {
                    (r["event_type"], r["bar_ts"]): r
                    for r in win_ohlc_bars(spark, "ignored").collect()
                }
            )
    finally:
        W.load_table = orig
    key = ("click", t0.replace(minute=0))
    for res in results:
        r = res[key]
        assert r["open_v"] == 10.0  # event_id tiebreak at equal ts
        assert r["close_v"] == 42.0
        assert r["high_v"] == 99.0 and r["low_v"] == 1.0
        assert r["volume"] == 5
    assert results[0] == results[1] == results[2]


def test_dup_span_trim_consistent_with_profile(spark):
    """The profile (ext_dup_span) and the removal (ext_dup_span_trim)
    agree document by document: kept = total − duplicated, and the
    cleaned text re-tokenizes to exactly n_kept tokens."""
    from lapidus_spark.functions.corpus import ext_dup_span, ext_dup_span_trim

    prof = {r["doc_id"]: r for r in ext_dup_span(spark, SF_DIR).collect()}
    trim = {r["doc_id"]: r for r in ext_dup_span_trim(spark, SF_DIR).collect()}
    assert set(prof) == set(trim)
    for i, p in prof.items():
        t = trim[i]
        assert t["n_kept"] == p["n_tokens"] - p["n_dup_tokens"], i
        retok = [x for x in t["clean_text"].split(" ") if x != ""]
        assert len(retok) == t["n_kept"], i


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_cusum_matches_bruteforce(spark, data):
    """win_cusum_drift vs a direct Python fold on random event
    sequences: statistic, peak, and drift flag must match exactly
    (same mean reference, same clamped recursion, same order)."""
    import datetime as dt
    from decimal import Decimal

    from lapidus_spark.operators.windows import win_cusum_drift
    import lapidus_spark.operators.windows as W

    n_users = data.draw(st.integers(2, 4))
    t0 = dt.datetime(2026, 1, 1)
    rows, expected = [], {}
    eid = 0
    for u in range(n_users):
        n = data.draw(st.integers(1, 12))
        vals = [
            round(data.draw(st.floats(0, 1000, allow_nan=False)), 2) for _ in range(n)
        ]
        for j, v in enumerate(vals):
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, "e", v, "{}"))
            eid += 1
        # mirror the engines exactly: exact DECIMAL sum -> double cast
        # -> IEEE double division (NOT Decimal division then float)
        k = float(sum(Decimal(str(v)).quantize(Decimal("0.01")) for v in vals)) / n
        s = m = 0.0
        for x in vals:
            s = max(0.0, s + (x - k))
            m = max(m, s)
        expected[u] = (n, m, s, int(m > k))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    orig = W.load_table
    try:
        W.load_table = lambda _s, _d, name, **kw: ev  # noqa: ARG005
        out = {r["entity_id"]: r for r in win_cusum_drift(spark, "ignored").collect()}
    finally:
        W.load_table = orig
    assert set(out) == set(expected)
    for u, (n, m, s, drift) in expected.items():
        r = out[u]
        assert r["n_events"] == n
        assert r["peak_cusum"] == m, (u, rows)
        assert r["final_cusum"] == s, (u, rows)
        assert r["drift"] == drift
