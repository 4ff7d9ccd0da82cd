"""Scale-technique tests: salted aggregation equivalence and
shuffle-free bucketed joins (plan-shape asserted, not just results)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lapidus_spark.plans.scale import bucket_table, colocated_join, salted_agg
from lapidus_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_agg_matches_direct(spark):
    ev = load_table(spark, SF_DIR, "events")
    direct = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
    )
    salted = salted_agg(
        ev,
        "user_id",
        {
            "n": ("*", "count"),
            "lo": ("event_id", "min"),
            "hi": ("event_id", "max"),
            "total": ("CAST(value AS DECIMAL(18,2))", "sum"),
        },
    )
    # identical result set under any salting
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_salted_agg_spreads_hot_key(spark):
    # one key owning 90% of rows: stage 1 must split it across salts
    hot = spark.range(9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select((F.col("id") % 100 + 2).alias("k"), F.col("id").alias("v"))
    df = hot.unionByName(cold)
    out = salted_agg(df, "k", {"n": ("*", "count"), "s": ("v", "sum")}, n_salts=8)
    row = {r["k"]: r for r in out.collect()}
    assert row[1]["n"] == 9000
    assert row[1]["s"] == sum(range(9000))
    # stage-1 granularity check: the hot key really was salted
    salted_stage1 = (
        df.withColumn("_salt", F.monotonically_increasing_id() % 8)
        .groupBy("k", "_salt")
        .count()
        .filter(F.col("k") == 1)
    )
    assert salted_stage1.count() > 1


@pytest.mark.usefixtures("spark")
def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    cu = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")

    bucket_table(ev, "b_events", "user_id", n_buckets=4)
    bucket_table(
        cu.withColumnRenamed("c_custkey", "user_id"), "b_customer", "user_id", n_buckets=4
    )
    # at fixture scale the dim side would auto-broadcast (fine, but it
    # hides what we're proving); at 100 TB both sides are too big to
    # broadcast — that regime is the point of bucketing
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_events", "b_customer", "user_id")

        # same rows as the plain join
        plain = ev.join(cu, ev.user_id == cu.c_custkey).drop("c_custkey")
        assert joined.count() == plain.count()

        # and the physical plan has no Exchange of any kind: the
        # bucket layout IS the join partitioning
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---- skew guards: degenerate LSH buckets must not form m² pair tasks ----


def test_minhash_skew_guard_drops_degenerate_bucket(spark, tmp_path):
    """Adversarial duplicate-heavy corpus: 2000 identical docs collapse
    into ONE band bucket in every band — without the guard that is
    ~2M candidate pairs in a single task. The guard drops the bucket
    (identical docs are ext_dedup_exact's job), keeps genuine small
    near-dup groups, and the DuckDB oracle applies the same cap so
    parity holds."""
    import duckdb
    import pandas as pd

    from lapidus_spark.plans.registry import load_all

    mega = "the quick brown fox jumps over the lazy dog again and again"
    pair_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pair_b = "one two three four five six seven eight nine ten eleven"
    uniq = [
        f"unique document number {i} with distinct tokens w{i} x{i} y{i} z{i}"
        for i in range(5)
    ]
    texts = [mega] * 2000 + [pair_a, pair_a, pair_b, pair_b] + uniq
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["adv"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sfdir = tmp_path / "adv"
    sfdir.mkdir()
    pdf.to_parquet(str(sfdir / "documents.parquet"))

    reg = load_all()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in reg["ext_dedup_minhash"].fn(spark, str(sfdir)).collect()
    }
    # genuine small dup groups survive
    assert (2000, 2001) in pairs and (2002, 2003) in pairs
    # the degenerate 2000-doc bucket emitted NO pairs
    assert not any(a < 2000 and b < 2000 for a, b in pairs)

    # oracle applies the identical cap → engines agree exactly
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')"
    )
    opairs = {
        tuple(r)
        for r in con.sql(
            f"SELECT doc_a, doc_b FROM ({reg['ext_dedup_minhash'].oracle})"
        ).fetchall()
    }
    con.close()
    assert pairs == opairs


def test_embed_skew_guard_drops_degenerate_bucket(spark, tmp_path):
    """Same guard on the sign-LSH vector buckets: 1500 zero vectors all
    hash to one signature (every hyperplane dot is 0); the bucket is
    pruned before the pair join, while a genuine identical-vector pair
    in a small bucket is still found."""
    import pandas as pd

    from lapidus_spark.functions.similarity import DIM
    from lapidus_spark.plans.registry import load_all

    zero = [0.0] * DIM
    # exactly float32-representable values → bit-identical across engines
    v = [0.5 if d % 3 == 0 else -0.25 for d in range(DIM)]
    vecs = [zero] * 1500 + [v, v]
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": vecs,
            "label": [0] * len(vecs),
        }
    )
    sfdir = tmp_path / "advv"
    sfdir.mkdir()
    pdf.to_parquet(str(sfdir / "embeddings.parquet"))

    reg = load_all()
    rows = reg["ext_dedup_embed"].fn(spark, str(sfdir)).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
    assert pairs == {(1500, 1501)}


def test_ngram_prefix_filter_bounds_stopword_fanout(spark, tmp_path):
    """Adversarial stopword-heavy corpus: every doc shares the same
    high-df token. A raw inverted index would emit all m(m-1)/2
    candidate pairs off that one token; prefix filtering orders
    tokens by ascending df, so the universal stopword sorts to the
    back of every doc and never enters the index — candidate count
    stays 0 while the final answer still matches the naive oracle
    exactly (prefix filtering is lossless for J >= t)."""
    import duckdb
    import pandas as pd

    from lapidus_spark.functions.dedup import (
        JACCARD_T,
        LENGTH_BAND,
        _ngram_df_sorted,
        _ngram_prefix_candidates,
    )
    from lapidus_spark.plans.registry import load_all

    n_docs = 200
    # each doc: 4 unique tokens + the universal stopword + one genuine
    # near-dup pair (docs n_docs, n_docs+1 share 5 of 6 tokens)
    texts = [f"u{i}a u{i}b u{i}c u{i}d the" for i in range(n_docs)]
    texts += ["dup alpha beta gamma delta the", "dup alpha beta gamma delta zz"]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["adv"] * len(texts),
            "n_chars": [50] * len(texts),  # one length band for everyone
        }
    )
    sfdir = tmp_path / "adv_ngram"
    sfdir.mkdir()
    pdf.to_parquet(str(sfdir / "documents.parquet"))

    d = spark.read.parquet(str(sfdir / "documents.parquet"))
    t = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LENGTH_BAND).cast("long").alias("len_band"),
        F.expr("array_distinct(split(lower(text), ' '))").alias("ts"),
    )
    n_cand = _ngram_prefix_candidates(_ngram_df_sorted(t), JACCARD_T).count()
    naive_pairs = (len(texts) * (len(texts) - 1)) // 2  # what 'the' alone would emit
    # fan-out bounded: only docs sharing a RARE token become candidates
    assert n_cand < 10, f"{n_cand} candidates vs naive {naive_pairs}"

    # and the full query still equals the naive oracle exactly
    reg = load_all()
    pairs = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in reg["ext_dedup_ngram"].fn(spark, str(sfdir)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')"
    )
    opairs = {
        (a, b, round(j, 9))
        for a, b, j in con.sql(reg["ext_dedup_ngram"].oracle).fetchall()
    }
    con.close()
    assert pairs == opairs
    assert (n_docs, n_docs + 1, round(5 / 7, 9)) in pairs


def test_ngram_prefix_filter_lossless_on_random_corpora(spark):
    """The prefix-filter lemma, empirically: on randomized token sets
    (seeded), EVERY pair with Jaccard >= t must appear among the
    prefix candidates — the optimization is lossless by construction,
    so the candidate set is a superset of the true result within each
    blocking bucket. Exercises skewed df distributions, tiny docs
    (prefix length 1), and duplicate token sets."""
    import random

    from lapidus_spark.functions.dedup import (
        JACCARD_T,
        _ngram_df_sorted,
        _ngram_prefix_candidates,
    )

    rng = random.Random(20260813)
    vocab = [f"t{i}" for i in range(40)]
    # zipf-ish skew: low-index tokens appear far more often
    docs = []
    for i in range(120):
        n = rng.randint(1, 12)
        toks = {vocab[min(int(rng.expovariate(0.12)), 39)] for _ in range(n)}
        docs.append((i, sorted(toks) or ["t0"]))
    # a few exact duplicates and near-duplicates
    docs.append((200, docs[0][1]))
    docs.append((201, docs[1][1][:-1] + ["zz"] if len(docs[1][1]) > 1 else ["zz"]))

    expected = set()
    for i, (da, ta) in enumerate(docs):
        sa = set(ta)
        for db, tb in docs[i + 1 :]:
            sb = set(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= JACCARD_T:
                expected.add((min(da, db), max(da, db)))

    t = spark.createDataFrame(
        [(d, "en", 0, toks) for d, toks in docs],
        "doc_id long, lang string, len_band long, ts array<string>",
    )
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in _ngram_prefix_candidates(_ngram_df_sorted(t), JACCARD_T).collect()
    }
    missed = expected - cand
    assert not missed, f"prefix filter lost qualifying pairs: {sorted(missed)[:10]}"


def test_decontaminate_boilerplate_cap(spark, tmp_path):
    """Adversarial boilerplate: a 4-gram shared by >MAX_BENCH_DF
    benchmark docs (a copyright footer) must be excluded — it is both
    the production false-positive rule and the skew guard (the
    boilerplate key would otherwise fan out bench_df × train_df rows
    in one join task). A genuinely rare benchmark phrase still flags
    the train docs that copied it, and the oracle applies the same
    cap so parity holds."""
    import duckdb
    import pandas as pd

    from lapidus_spark.functions.corpus import BENCH_MOD, MAX_BENCH_DF
    from lapidus_spark.plans.registry import load_all
    from tests.oracle_utils import compare

    boiler = "copyright all rights reserved worldwide"
    rare = "secret eval question alpha bravo"
    n_docs = BENCH_MOD * (MAX_BENCH_DF + 10) + 1  # 31 benchmark docs
    texts = []
    for i in range(n_docs):
        filler = f"doc{i} filler{i} pad{i} tail{i}"
        if i % BENCH_MOD == 0:  # benchmark member: all carry boilerplate
            t = f"{filler} {boiler}"
            if i == BENCH_MOD:  # one benchmark doc also holds the rare phrase
                t = f"{t} {rare}"
        elif i in (1, 2):  # contaminated train docs
            t = f"{filler} {boiler} {rare}"
        else:  # train docs with only boilerplate overlap
            t = f"{filler} {boiler}"
        texts.append(t)
    pdf = pd.DataFrame(
        {
            "doc_id": range(n_docs),
            "text": texts,
            "lang": ["en"] * n_docs,
            "source": ["adv"] * n_docs,
            "n_chars": [len(t) for t in texts],
        }
    )
    sfdir = tmp_path / "adv_decon"
    sfdir.mkdir()
    pdf.to_parquet(str(sfdir / "documents.parquet"))

    reg = load_all()
    rows = {
        r["doc_id"]: (r["n_bench_docs"], r["n_shared_ngrams"])
        for r in reg["ext_decontaminate"].fn(spark, str(sfdir)).collect()
    }
    # ONLY the rare-phrase copiers flag: 2 four-grams inside the rare
    # phrase + 3 spanning the boilerplate→rare seam (the same junction
    # exists in benchmark doc BENCH_MOD), all from ONE benchmark doc —
    # and none of the hundreds of boilerplate-only train docs appear
    assert rows == {1: (1, 5), 2: (1, 5)}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')"
    )
    rep = compare(
        reg["ext_decontaminate"].fn(spark, str(sfdir)), con, reg["ext_decontaminate"].oracle
    )
    assert rep["ok"], rep["detail"]


def test_corpus_shard_layout(spark):
    """The shard layout is dataloader-ready: hive dirs per (split,
    lang), doc_id monotone within every file, and a split filter
    resolves as a PartitionFilter (val/test dirs never opened)."""
    import os

    from lapidus_spark.functions.pipeline import build_corpus_shards
    from lapidus_spark.plans.audit import plan_facts

    out = build_corpus_shards(spark, SF_DIR)
    splits = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert splits == ["split=test", "split=train", "split=val"]
    langs = sorted(os.listdir(os.path.join(out, "split=train")))
    assert all(d.startswith("lang=") for d in langs) and len(langs) >= 2

    # one data file per (split, lang) dir — no small-file explosion
    lang_dir = os.path.join(out, "split=train", langs[0])
    files = [f for f in os.listdir(lang_dir) if f.endswith(".parquet")]
    assert len(files) == 1

    # doc_id monotone inside the file
    ids = [r[0] for r in spark.read.parquet(os.path.join(lang_dir, files[0])).select("doc_id").collect()]
    assert ids == sorted(ids)

    # the split predicate prunes partitions at the scan
    pruned = spark.read.parquet(out).filter(F.col("split") == "train")
    facts = plan_facts(pruned)
    assert facts.partition_filters, "split=train must be a PartitionFilter"


def test_semdedup_skew_guard_drops_degenerate_cell(spark, tmp_path):
    """SemDeDup's cluster cap: 1500 zero vectors tie onto one cell
    (every centroid score is 0 → first-minimum cell), exceed
    MAX_BUCKET_VECS, and are pruned before the pair join — while a
    genuine same-direction pair in a healthy cell is still caught."""
    import pandas as pd

    from lapidus_spark.functions.similarity import DIM
    from lapidus_spark.plans.registry import load_all

    zero = [0.0] * DIM
    v = [0.5 if d % 3 == 0 else -0.25 for d in range(DIM)]
    v2 = [x * 2.0 for x in v]  # same direction → same cell, cos = 1
    vecs = [zero] * 1500 + [v, v2]
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": vecs, "label": [0] * len(vecs)}
    )
    sfdir = tmp_path / "semdd"
    sfdir.mkdir()
    pdf.to_parquet(str(sfdir / "embeddings.parquet"))

    reg = load_all()
    rows = {r["cell"]: r for r in reg["ext_semdedup"].fn(spark, str(sfdir)).collect()}
    # the degenerate cell is absent entirely (pruned pre-join AND
    # pre-report: a cell too hot to pair-join is a cell the report
    # must not silently claim as deduplicated)
    assert sum(r["n_vecs"] for r in rows.values()) == 2, rows
    (pair_cell,) = [c for c, r in rows.items() if r["n_vecs"] == 2]
    assert rows[pair_cell]["n_dropped"] == 1
    assert rows[pair_cell]["dropped_ids"] == "1501"


def test_domain_cap_bounds_hot_domain(spark, tmp_path):
    """The per-domain cap under real skew: one domain with 400 docs is
    cut to exactly DOMAIN_CAP (longest-first, doc_id tiebreak), a
    small domain keeps everything."""
    import pandas as pd

    from lapidus_spark.functions.pipeline import DOMAIN_CAP
    from lapidus_spark.plans.registry import load_all

    rows = []
    for i in range(400):
        rows.append((i, "w " * 5, "en", "hot.example", 100 + (i % 7)))
    for i in range(400, 403):
        rows.append((i, "w " * 5, "en", "small.example", 50))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    sfdir = tmp_path / "domcap"
    sfdir.mkdir()
    pdf.to_parquet(str(sfdir / "documents.parquet"))

    reg = load_all()
    out = {r["source"]: r for r in reg["ext_domain_cap"].fn(spark, str(sfdir)).collect()}
    assert out["hot.example"]["n_docs"] == 400
    assert out["hot.example"]["n_kept"] == DOMAIN_CAP
    kept = [int(x) for x in out["hot.example"]["kept_ids"].split("|")]
    assert len(kept) == DOMAIN_CAP
    # longest first; within equal n_chars the LOWEST doc_id wins
    chars = {r[0]: r[4] for r in rows}
    assert kept == sorted(kept, key=lambda k: (-chars[k], k))
    assert out["small.example"]["n_kept"] == 3


def test_ann_incremental_append_is_no_rebuild(spark, tmp_path):
    """Incremental IVF maintenance (VERDICT r7 #6): appending an
    arrival batch must (a) leave every standing-corpus index file
    byte-untouched (O(batch) maintenance, not O(corpus)), (b) add new
    files inside the existing cell=K layout, and (c) leave the probe
    answering EXACTLY like a from-scratch full-corpus index — the
    frozen quantizer gives every vector the same cell either way."""
    import os

    from lapidus_spark.functions import similarity as S

    e = load_table(spark, SF_DIR, "embeddings", parallel=True)
    path = str(tmp_path / "ivf")
    base = e.filter(F.col("vec_id") % S.ANN_ARRIVAL_MOD != 0)
    (
        base.join(S.assign_cells(spark, base).drop("mn"), "vec_id")
        .select("vec_id", "embedding", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )

    def listing():
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = listing()
    assert before  # the base build wrote real cell files
    arrivals = e.filter(F.col("vec_id") % S.ANN_ARRIVAL_MOD == 0)
    S.append_to_ivf_index(spark, arrivals, path)
    after = listing()
    assert set(before) <= set(after)  # no standing file deleted/renamed
    for p, sig in before.items():
        assert after[p] == sig  # ...or rewritten (size + mtime pinned)
    assert len(after) > len(before)  # the batch landed as NEW files
    # probe equivalence: incrementally-maintained == from-scratch
    incr = S.ivf_candidates(spark, SF_DIR, S.TOP_K, idx_path=path).collect()
    scratch = S.ivf_candidates(spark, SF_DIR, S.TOP_K).collect()
    assert [tuple(r) for r in incr] == [tuple(r) for r in scratch]
