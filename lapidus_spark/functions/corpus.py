"""Corpus-hygiene extension operators (SURVEY.md §2.9 family):
benchmark decontamination and within-document repetition signals —
the two data-quality passes an LLM training pipeline runs between
dedup and quality filtering.

- ext_decontaminate: find training documents that share token
  n-grams with a held-out benchmark set (here: ``doc_id % BENCH_MOD
  == 0`` plays the benchmark). The join is an inverted index on the
  n-gram — per-doc DISTINCT n-grams on both sides, boilerplate
  n-grams (benchmark document frequency > MAX_BENCH_DF) dropped
  before the join, so no n-gram can fan out quadratically. At 100 TB
  the join key is the n-gram (hash it to xxhash64 to shrink the
  shuffle; string keys kept here for oracle parity), the benchmark
  side is tiny and broadcastable, and the skew cap is the same
  document-frequency rule production decontamination uses to ignore
  ubiquitous phrases.
- ext_repetition: Gopher-style repetition ratios (duplicate-bigram
  fraction, top-bigram coverage) as pure array expressions — zero
  shuffle, whole-stage codegen, O(distinct × total) per document
  which is bounded by ingest-time document length caps.

Float determinism: every double is a ratio of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

NGRAM_N = 4  # decontamination n-gram width (tokens)
BENCH_MOD = 25  # doc_id % BENCH_MOD == 0 → benchmark member
#: skew guard / boilerplate rule: an n-gram present in more than this
#: many benchmark docs is too common to indicate contamination.
MAX_BENCH_DF = 20


def _ngrams_spark(col: str, n: int) -> str:
    """DISTINCT token n-grams of a text column (empty when shorter
    than n tokens — sequence() would run backwards otherwise)."""
    return (
        f"array_distinct(CASE WHEN size(split({col}, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split({col}, ' ')) - {n} + 1), "
        f"i -> array_join(slice(split({col}, ' '), i, {n}), ' ')) "
        f"ELSE array() END)"
    )


def _ngrams_duck(col: str, n: int) -> str:
    return (
        f"list_distinct(CASE WHEN len(string_split({col}, ' ')) >= {n} THEN "
        f"list_transform(range(1, len(string_split({col}, ' ')) - {n} + 2), "
        f"i -> array_to_string(list_slice(string_split({col}, ' '), i, i + {n} - 1), ' ')) "
        f"ELSE [] END)"
    )


@query(
    "ext_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, unnest({_ngrams_duck("text", NGRAM_N)}) AS ng
      FROM documents
    ),
    bench AS (
      SELECT doc_id AS bench_id, ng FROM g WHERE doc_id % {BENCH_MOD} = 0
    ),
    bench_rare AS (
      SELECT ng FROM bench GROUP BY ng HAVING count(*) <= {MAX_BENCH_DF}
    ),
    hits AS (
      SELECT t.doc_id, b.bench_id, b.ng
      FROM g t
      JOIN (SELECT * FROM bench WHERE ng IN (SELECT ng FROM bench_rare)) b
        USING (ng)
      WHERE t.doc_id % {BENCH_MOD} <> 0
    )
    SELECT doc_id,
           CAST(count(DISTINCT bench_id) AS BIGINT) AS n_bench_docs,
           CAST(count(DISTINCT ng) AS BIGINT) AS n_shared_ngrams
    FROM hits GROUP BY doc_id
    """,
    operator="ext_decontaminate (benchmark decontamination)",
    doc="Training docs sharing {n}-grams with the held-out benchmark "
    "set: per-doc distinct n-grams, boilerplate n-grams (benchmark "
    "df > cap) excluded, inverted-index equi-join, per-doc "
    "contamination counts. The production pass that keeps eval sets "
    "out of training data.".format(n=NGRAM_N),
)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    g = d.select(
        "doc_id", F.explode(F.expr(_ngrams_spark("text", NGRAM_N))).alias("ng")
    )
    bench = g.filter(F.col("doc_id") % BENCH_MOD == 0).withColumnRenamed(
        "doc_id", "bench_id"
    )
    bench_rare = (
        bench.groupBy("ng")
        .agg(F.count("*").alias("df"), F.collect_list("bench_id").alias("bench_ids"))
        .filter(F.col("df") <= MAX_BENCH_DF)
        .select("ng", "bench_ids")
    )
    # The filtered benchmark index is small by construction (rare
    # n-grams only) → broadcast; the training side never shuffles.
    hits = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench_rare), "ng")
        .select("doc_id", "ng", F.explode("bench_ids").alias("bench_id"))
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("bench_id").alias("n_bench_docs"),
        F.countDistinct("ng").alias("n_shared_ngrams"),
    )


@query(
    "ext_repetition",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 2 THEN
               list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])
             ELSE [] END AS bg
      FROM documents
    ),
    -- the oracle states top-bigram count relationally (unnest +
    -- group + max); the Spark side computes the same number with a
    -- run-length fold over the sorted array
    cnt AS (
      SELECT doc_id, max(c) AS mx FROM (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(bg) AS g FROM b)
        GROUP BY doc_id, g
      ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(bg) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
           CASE WHEN len(bg) > 0 THEN
             CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
           ELSE CAST(0 AS DOUBLE) END AS dup_frac,
           CASE WHEN len(bg) > 0 THEN
             CAST(cnt.mx AS DOUBLE) / len(bg)
           ELSE CAST(0 AS DOUBLE) END AS top_frac
    FROM b LEFT JOIN cnt ON b.doc_id = cnt.doc_id
    """,
    operator="ext_repetition (Gopher repetition signals)",
    doc="Within-document repetition quality signals: duplicate-bigram "
    "fraction and top-bigram coverage, as pure higher-order array "
    "expressions — zero shuffle, embarrassingly parallel.",
)
def ext_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lapidus_spark.functions.exprs import let_

    d = load_table(spark, sf_dir, "documents", parallel=True)
    bg = (
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat(element_at(split(text, ' '), i), ' ', "
        "element_at(split(text, ' '), i + 1))) ELSE array() END"
    )
    # top-bigram count is a run-length fold over the SORTED array —
    # O(n log n) per doc, not the O(distinct × n) pairwise scan; bg
    # and the distinct count are let_-bound so CollapseProject can't
    # re-evaluate the bigram build once per output column
    top = (
        "aggregate(array_sort(bg), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'mx', 0), "
        "(acc, x) -> named_struct('prev', x, "
        "'run', IF(x <=> acc.prev, acc.run + 1, 1), "
        "'mx', greatest(acc.mx, IF(x <=> acc.prev, acc.run + 1, 1))), "
        "acc -> acc.mx)"
    )
    body = (
        "named_struct("
        "'n_bigrams', CAST(size(bg) AS BIGINT), "
        "'n_distinct', CAST(nd AS BIGINT), "
        "'dup_frac', CASE WHEN size(bg) > 0 THEN "
        "CAST(size(bg) - nd AS DOUBLE) / size(bg) ELSE CAST(0 AS DOUBLE) END, "
        "'top_frac', CASE WHEN size(bg) > 0 THEN "
        f"CAST({top} AS DOUBLE) / size(bg) ELSE CAST(0 AS DOUBLE) END)"
    )
    stats = let_(bg, "bg", let_("size(array_distinct(bg))", "nd", body))
    return d.select("doc_id", F.expr(stats).alias("s")).select(
        "doc_id",
        F.col("s.n_bigrams").alias("n_bigrams"),
        F.col("s.n_distinct").alias("n_distinct"),
        F.col("s.dup_frac").alias("dup_frac"),
        F.col("s.top_frac").alias("top_frac"),
    )


@query(
    "ext_mix_weights",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ), t AS (
      SELECT sum(n_docs) AS total FROM c
    ), s AS (
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / total AS share,
             sqrt(CAST(n_docs AS DOUBLE) / total) AS sq
      FROM c, t
    ), d AS (
      -- normalizer as an explicit lang-ordered left fold: double
      -- addition is order-sensitive, so the order is pinned
      SELECT list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(sq ORDER BY lang)), (a, b) -> a + b) AS denom
      FROM s
    )
    SELECT lang, n_docs, share, sq / denom AS weight
    FROM s, d
    """,
    operator="ext_corpus (domain-mixture sampling weights)",
    doc="Square-root temperature mixture weights per language: "
    "w = sqrt(share) / sum(sqrt(share)) — the standard rebalancing "
    "between natural sampling (alpha=1) and uniform (alpha=0) that "
    "multilingual/multidomain training mixes use, with alpha=0.5 "
    "chosen because IEEE-754 requires correctly-rounded sqrt and "
    "division, so every value is bit-identical across engines "
    "without fixed-point tricks. The normalizer folds the per-domain "
    "terms in pinned lang order (domains are few — the fold is a "
    "scalar, not a data-sized reduction); the only data-sized work "
    "is one count aggregation.",
)
def ext_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    # materialize the domain-count table once (it is domain-cardinality
    # sized — a handful of rows): total, shares, and the normalizer all
    # derive from it, and without the checkpoint each consumer re-scans
    # and re-aggregates the corpus
    c = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_docs")).localCheckpoint()
    total = c.agg(F.sum("n_docs").alias("total"))
    s = c.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("total")).alias("share"),
        F.sqrt(F.col("n_docs").cast("double") / F.col("total")).alias("sq"),
    )
    denom = s.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(lang, sq))), "
            "x -> x.sq), CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("denom")
    )
    return s.crossJoin(F.broadcast(denom)).select(
        "lang", "n_docs", "share", (F.col("sq") / F.col("denom")).alias("weight")
    )


DUP_N = 8  # duplicated-span n-gram width (tokens)
MIN_DUP_DOCS = 2  # a gram in >= this many distinct docs is corpus-duplicated


@query(
    "ext_dup_span",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), g AS (
      SELECT doc_id, unnest(range(1, len(t) - {DUP_N} + 2)) AS pos, t
      FROM t WHERE len(t) >= {DUP_N}
    ), g2 AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(t, pos, pos + {DUP_N} - 1), ' ') AS gram
      FROM g
    ), dup AS (
      SELECT gram FROM g2 GROUP BY gram
      HAVING count(DISTINCT doc_id) >= {MIN_DUP_DOCS}
    ), occ AS (
      SELECT g2.doc_id, g2.pos FROM g2 JOIN dup USING (gram)
    ), cov AS (
      SELECT DISTINCT doc_id, pos + unnest(range(0, {DUP_N})) AS p FROM occ
    ), covc AS (
      SELECT doc_id, count(*) AS ndup FROM cov GROUP BY doc_id
    ), n AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT n.doc_id,
           CAST(n.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.ndup, 0) AS BIGINT) AS n_dup_tokens,
           CAST(COALESCE(c.ndup, 0) AS DOUBLE) / n.n_tokens AS dup_ratio
    FROM n LEFT JOIN covc c ON n.doc_id = c.doc_id
    """,
    operator="ext_dedup (cross-doc duplicated-span annotation, ExactSubstr shape)",
    doc=f"Per-document duplicated-span profile: a token position is "
    f"'duplicated' when it falls inside any {DUP_N}-gram that also "
    "occurs in at least one OTHER document — the span-level signal "
    "behind ExactSubstr-style dedup (Lee et al. 2022), which removes "
    "repeated boilerplate runs instead of whole near-dup documents, "
    "and the complement of ext_repetition (within-doc) and "
    "ext_decontaminate (vs a benchmark set). Pipeline: positional "
    "n-grams → gram-keyed distinct-doc count (one shuffle; the gram "
    "would be xxhash64'd at 100 TB to shrink the exchange, string "
    "kept here for oracle parity) → semi-join back (fan-out bounded "
    "by the corpus's positional-gram count, never quadratic in "
    "documents) → position-interval union via an 8-way explode + "
    "distinct. Coverage counts are exact integers; the ratio is one "
    "exact int/int division.",
)
def ext_dup_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    g2 = (
        toks.filter(F.size("t") >= DUP_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {DUP_N} + 1), "
                    f"i -> struct(i AS pos, array_join(slice(t, i, {DUP_N}), ' ') AS gram))"
                )
            ).alias("pg"),
        )
        .select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    dup = (
        g2.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= MIN_DUP_DOCS)
        .select("gram")
    )
    occ = g2.join(dup, "gram").select("doc_id", "pos")
    covc = (
        occ.select("doc_id", F.explode(F.expr(f"sequence(pos, pos + {DUP_N} - 1)")).alias("p"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("ndup"))
    )
    n = d.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    nd = F.coalesce(F.col("ndup"), F.lit(0)).cast("bigint")
    return n.join(covc, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        nd.alias("n_dup_tokens"),
        (nd.cast("double") / F.col("n_tokens")).alias("dup_ratio"),
    )


@query(
    "ext_dup_span_trim",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), g AS (
      SELECT doc_id, unnest(range(1, len(t) - {DUP_N} + 2)) AS pos, t
      FROM t WHERE len(t) >= {DUP_N}
    ), g2 AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(t, pos, pos + {DUP_N} - 1), ' ') AS gram
      FROM g
    ), dup AS (
      SELECT gram FROM g2 GROUP BY gram
      HAVING count(DISTINCT doc_id) >= {MIN_DUP_DOCS}
    ), occ AS (
      SELECT g2.doc_id, g2.pos FROM g2 JOIN dup USING (gram)
    ), cov AS (
      SELECT DISTINCT doc_id, pos + unnest(range(0, {DUP_N})) AS p FROM occ
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, t FROM t
    ), kept AS (
      SELECT pos.doc_id, pos.p, pos.t[pos.p] AS tok
      FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
      WHERE cov.p IS NULL
    ), clean AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY p) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           COALESCE(c.n_kept, 0) AS n_kept,
           COALESCE(c.clean_text, '') AS clean_text
    FROM t LEFT JOIN clean c ON t.doc_id = c.doc_id
    """,
    operator="ext_dedup (duplicated-span REMOVAL — the actionable ExactSubstr pass)",
    doc="The acting half of ext_dup_span: every token position covered "
    "by a cross-document duplicated 8-gram is REMOVED and the "
    "document is reassembled from the surviving tokens in original "
    "order — ExactSubstr dedup's output artifact (Lee et al. 2022 "
    "cut duplicated spans, not documents). Same bounded pipeline as "
    "the profile (gram df → semi-join → interval union), plus one "
    "anti-join of token positions against covered positions and an "
    "order-pinned reassembly (collect_list sorted by position — "
    "per-document arrays, never a corpus-wide sort). Documents whose "
    "every token is boilerplate collapse to the empty string rather "
    "than disappearing, so downstream length filters see them.",
)
def ext_dup_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    g2 = (
        toks.filter(F.size("t") >= DUP_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {DUP_N} + 1), "
                    f"i -> struct(i AS pos, array_join(slice(t, i, {DUP_N}), ' ') AS gram))"
                )
            ).alias("pg"),
        )
        .select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    )
    dup = (
        g2.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= MIN_DUP_DOCS)
        .select("gram")
    )
    cov = (
        g2.join(dup, "gram")
        .select("doc_id", F.explode(F.expr(f"sequence(pos, pos + {DUP_N} - 1)")).alias("p"))
        .distinct()
    )
    posrows = toks.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = posrows.join(cov, ["doc_id", "p"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"), " "
        ).alias("clean_text"),
    )
    return toks.select("doc_id", F.size("t").cast("bigint").alias("n_tokens")).join(
        clean, "doc_id", "left"
    ).select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
