"""Text-analysis extension operators (SURVEY.md §2.9, ext_text_*).

LLM-training-data text pipeline over the ``documents`` table:
statistics, language-ID (n-gram/marker heuristic), quality scoring,
token counting (whitespace + BPE-ish regex), and document
fingerprinting (md5 + rolling polynomial hash).

All computations are JVM-side column expressions (no Python UDFs):
higher-order array functions keep per-token loops inside codegen, so
the hot path scales linearly with data and parallelizes per-partition
with zero shuffle (the only shuffles are final groupBys).

Float determinism: every double output is a ratio of exact integers
(deterministic IEEE division), never a float sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
_STOP_IN = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

#: the [a-zA-Z0-9 ] character class as a translate() deletion table —
#: counting chars OUTSIDE a single-char class needs no regex engine
#: at all (length(text) vs length(translate(text, class, ''))).
_ALNUM_SPACE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
)

#: marker-word profile per language, checked in deterministic order.
LANG_MARKERS = (("en", "the"), ("es", "el"), ("de", "der"), ("fr", "le"), ("zh", "的"))


@query(
    "ext_text_stats",
    oracle="""
    WITH t AS (
      SELECT lang, n_chars, len(string_split(text, ' ')) AS n_toks
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           -- BIGINT casts: DuckDB sum() yields HUGEINT, which a
           -- pandas round-trip silently widens to float64 ("123.0"
           -- vs "123") and breaks value-hash parity.
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           CAST(sum(n_toks) AS DOUBLE) / count(*) AS avg_tokens
    FROM t GROUP BY lang
    """,
    operator="ext_text_stats",
    doc="Per-language corpus statistics (doc counts, char totals, "
    "token averages).",
)
def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "n_toks", F.expr("size(split(text, ' '))")
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.sum("n_toks").alias("total_tokens"),
        (F.sum("n_toks").cast("double") / F.count("*")).alias("avg_tokens"),
    )


def _marker_counts_sql(split_fn: str) -> list[str]:
    """Per-language marker-hit count expressions (dialect-neutral body)."""
    filt = "filter" if split_fn == "split" else "list_filter"
    size = "size" if split_fn == "split" else "len"
    return [
        f"{size}({filt}({split_fn}(lower(text), ' '), t -> t = '{m}')) AS c_{lang}"
        for lang, m in LANG_MARKERS
    ]


_PRED_CASE = (
    "CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_zh THEN 'en' "
    "WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es' "
    "WHEN c_de >= c_fr AND c_de >= c_zh THEN 'de' "
    "WHEN c_fr >= c_zh THEN 'fr' ELSE 'zh' END"
)


@query(
    "ext_lang_id",
    oracle=f"""
    WITH c AS (
      SELECT lang, {", ".join(_marker_counts_sql("string_split"))}
      FROM documents
    )
    SELECT lang, {_PRED_CASE} AS pred_lang, count(*) AS n_docs
    FROM c GROUP BY lang, pred_lang
    """,
    operator="ext_lang_id",
    doc="Marker-word language-ID heuristic; output is the "
    "actual-vs-predicted confusion matrix.",
)
def ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    for expr in _marker_counts_sql("split"):
        body, alias = expr.rsplit(" AS ", 1)
        d = d.withColumn(alias, F.expr(body))
    return (
        d.withColumn("pred_lang", F.expr(_PRED_CASE))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "ext_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_other_tokens
    FROM documents
    """,
    operator="ext_token_count",
    doc="Token counting: whitespace tokens + BPE-ish regex classes "
    "(word pieces vs non-alnum symbols). Counts are computed WITHOUT "
    "materializing match arrays or extra regex scans — the round-5 "
    "scaling probe measured the naive 3-regex regexp_extract_all "
    "form at ~5x the cost on 500k docs (21.6s -> 3.4-4.7s, values "
    "bit-identical): regexp_count does the one regex scan with no "
    "match materialization at all (3-4x faster again than a "
    "collapse-to-marker regexp_replace — replacement-string "
    "building is itself a cost), and the whitespace/symbol counts "
    "are plain replace/translate char-table passes.",
)
def ext_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    return d.select(
        "doc_id",
        (F.length("text") - F.length(F.expr("replace(text, ' ', '')")) + F.lit(1))
        .cast("int")
        .alias("n_ws_tokens"),
        F.regexp_count(F.lower("text"), F.lit("[a-z0-9]+")).cast("int").alias("n_word_tokens"),
        F.length(F.expr(f"translate(text, '{_ALNUM_SPACE}', '')"))
        .cast("int")
        .alias("n_other_tokens"),
    )


@query(
    "ext_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             length(text) AS n_chars_exact,
             len(string_split(text, ' ')) AS n_toks,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t IN {_STOP_IN})) AS n_stop,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct
      FROM documents
    )
    SELECT doc_id, lang, n_toks, n_stop, n_punct,
           CAST(n_stop AS DOUBLE) / n_toks AS stop_ratio,
           CAST(n_punct AS DOUBLE) / n_chars_exact AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_toks
             - CAST(n_punct AS DOUBLE) / n_chars_exact
             + CAST(least(n_toks, 100) AS DOUBLE) / 100 AS quality_score
    FROM t
    """,
    operator="ext_quality_score",
    doc="Heuristic doc quality: stopword ratio + length credit - "
    "punctuation penalty (all deterministic rational arithmetic).",
)
def ext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    # n_toks and n_punct need no regex engine (space count + translate
    # char table — see ext_token_count's measured 5x); only the
    # stopword membership genuinely needs tokenization.
    t = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_exact"),
        (F.length("text") - F.length(F.expr("replace(text, ' ', '')")) + F.lit(1))
        .cast("int")
        .alias("n_toks"),
        F.expr(f"size(filter(split(lower(text), ' '), t -> t IN {_STOP_IN}))").alias("n_stop"),
        F.length(F.expr(f"translate(text, '{_ALNUM_SPACE}', '')"))
        .cast("int")
        .alias("n_punct"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_toks")
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars_exact")
    length_credit = F.least(F.col("n_toks"), F.lit(100)).cast("double") / F.lit(100)
    return t.select(
        "doc_id",
        "lang",
        "n_toks",
        "n_stop",
        "n_punct",
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        (stop_ratio - punct_ratio + length_credit).alias("quality_score"),
    )


@query(
    "ext_top_tokens",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), freq AS (
      SELECT lang, token, count(*) AS n
      FROM tok WHERE token <> '' GROUP BY lang, token
    ), ranked AS (
      SELECT lang, token, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC)
               AS rank
      FROM freq
    )
    SELECT lang, token, n, rank FROM ranked WHERE rank <= 3
    """,
    operator="explode + rank (gap §2.5 lateral view; ext_text corpus stats)",
    doc="Top-3 tokens per language: explode the token stream (lateral "
    "view), frequency-aggregate, rank per language with deterministic "
    "ties (count desc, token asc) — the vocabulary report a corpus "
    "pipeline runs; one shuffle per stage, rank never globalizes.",
)
def ext_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", parallel=True)
    tok = d.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", "token", "n", "rank")
    )


_NORM = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
_NORM_DUCK = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


@query(
    "ext_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             md5({_NORM_DUCK}) AS fp_md5,
             list_transform(string_split({_NORM_DUCK}, ' '),
                            t -> length(t) * 7 + ascii(substr(t, 1, 1))) AS vals
      FROM documents
    )
    SELECT doc_id, fp_md5,
           list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
                       (a, b) -> (a * 31 + b) % 1000000007) AS fp_rolling
    FROM t
    """,
    operator="ext_fingerprint",
    doc="Document fingerprinting: md5 of whitespace-normalized text + "
    "order-sensitive polynomial rolling hash (explicit left-fold, so "
    "Spark and the oracle accumulate in the same order).",
)
def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    return d.select(
        "doc_id",
        F.expr(f"md5({_NORM})").alias("fp_md5"),
        F.expr(
            f"aggregate(transform(split({_NORM}, ' '), "
            "t -> length(t) * 7 + ascii(substr(t, 1, 1))), "
            "CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 1000000007)"
        ).alias("fp_rolling"),
    )


#: persisted df indexes, cached per (process, sf_dir).
_DF_INDEX_DIRS: dict[str, str] = {}


def build_df_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the document-frequency statistics ONCE (the
    ext_doc_freq aggregation written to parquet): token → df, with
    the corpus size riding along. Vocabulary-sized — words, not
    documents — so downstream consumers broadcast it; scoring runs
    never recompute the corpus-wide df aggregation (Spark plans don't
    share subtrees, so inlining df would scan and explode the corpus
    twice per query). Same build-once-probe-many posture as the IVF
    and fingerprint indexes."""
    if sf_dir in _DF_INDEX_DIRS:
        return _DF_INDEX_DIRS[sf_dir]
    import tempfile

    out = tempfile.mkdtemp(prefix="lapidus_df_index_")
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("token")
    ).filter(F.col("token") != "")
    n_docs = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    (
        tok.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .write.mode("overwrite")
        .parquet(out)
    )
    _DF_INDEX_DIRS[sf_dir] = out
    return out



#: keyword extraction: quantized tf-idf (integer div, same fixed-point
#: discipline as ext_bm25_topk) — idf ≈ SCALE*N div df, score = tf*idf.
KEYWORD_TOPK = 3
KEYWORD_IDF_SCALE = 1_000


@query(
    "ext_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE token <> '' GROUP BY doc_id, token
    ), df AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df,
             (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
      FROM tf GROUP BY token
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             tf.tf * (({KEYWORD_IDF_SCALE} * df.n_docs) // df.df) AS score
      FROM tf JOIN df ON tf.token = df.token
    ), ranked AS (
      SELECT doc_id, token, tf, df, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token ASC) AS rank
      FROM scored
    )
    SELECT doc_id, token, tf, df, score, rank
    FROM ranked WHERE rank <= {KEYWORD_TOPK}
    """,
    operator="ext_keywords (per-doc tf-idf keyword extraction)",
    doc=f"Top-{KEYWORD_TOPK} keywords per document by quantized "
    "tf-idf: per-doc term frequency joined to the corpus df index, "
    "score = tf * (SCALE*N div df) in exact BIGINT (integer-div "
    "fixed point — engine-identical, no transcendentals), ranked per "
    "doc with deterministic ties. The df side is vocabulary-sized "
    "(words, not documents) so it broadcasts even at corpus scale; "
    "the per-doc rank partitions on doc_id and never globalizes.",
)
def ext_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    idx = spark.read.parquet(build_df_index(spark, sf_dir))
    d = load_table(spark, sf_dir, "documents", parallel=True)
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    scored = tf.join(F.broadcast(idx), "token").withColumn(
        "score", F.expr(f"tf * (({KEYWORD_IDF_SCALE} * n_docs) div df)")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KEYWORD_TOPK)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


#: vocabulary size for OOV-rate coverage checks (fixture vocab is 31
#: distinct tokens, so 16 keeps roughly half of them out-of-vocab and
#: the rate meaningfully non-trivial at every sf).
OOV_VOCAB_K = 16


@query(
    "ext_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), tok_nz AS (
      SELECT doc_id, token FROM tok WHERE token <> ''
    ), cnt AS (
      SELECT token, count(*) AS c FROM tok_nz GROUP BY token
    ), vocab AS (
      SELECT token FROM cnt ORDER BY c DESC, token ASC LIMIT {OOV_VOCAB_K}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN token IN (SELECT token FROM vocab)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           CAST(sum(CASE WHEN token IN (SELECT token FROM vocab)
                         THEN 0 ELSE 1 END) AS DOUBLE) / count(*) AS oov_rate
    FROM tok_nz GROUP BY doc_id
    """,
    operator="ext_text_stats (vocabulary coverage / OOV rate)",
    doc=f"Per-document out-of-vocabulary rate against the corpus "
    f"top-{OOV_VOCAB_K} token vocabulary (ties broken count DESC, "
    "token ASC — deterministic): the tokenizer-coverage check a "
    "training pipeline runs before committing to a vocab. The vocab "
    "is top-K via TakeOrderedAndProject (never a global sort) and "
    "K rows broadcast to the per-token membership probe; per-doc "
    "aggregation is one shuffle on doc_id. Exact integers + one "
    "final division, bit-identical across engines.",
)
def ext_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(OOV_VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    probed = tok.join(F.broadcast(vocab), "token", "left")
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast("bigint")
    return probed.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        n_oov.alias("n_oov"),
        (n_oov.cast("double") / F.count("*")).alias("oov_rate"),
    )


#: top-K collocations reported (ties broken by bigram text — total
#: order, deterministic across engines).
COLLOC_TOPK = 15


@query(
    "ext_collocations",
    oracle=f"""
    WITH base AS (
      SELECT string_split(lower(text), ' ') AS arr FROM documents
    ), idx AS (
      SELECT arr, unnest(range(1, len(arr))) AS i FROM base
    ), pairs AS (
      SELECT arr[i] AS a, arr[i + 1] AS b FROM idx
    ), d AS (
      SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY a, b
    ), u AS (
      SELECT unnest(arr) AS token FROM base
    ), uc AS (
      SELECT token, count(*) AS c FROM u GROUP BY token
    )
    SELECT d.a || ' ' || d.b AS bigram,
           d.c_ab,
           ua.c AS c_a,
           ub.c AS c_b,
           CAST(2 * d.c_ab AS DOUBLE) / (ua.c + ub.c) AS dice
    FROM d JOIN uc ua ON d.a = ua.token
           JOIN uc ub ON d.b = ub.token
    ORDER BY dice DESC, bigram ASC
    LIMIT {COLLOC_TOPK}
    """,
    operator="ext_text_stats (collocation / phrase mining)",
    doc=f"Top-{COLLOC_TOPK} bigram collocations by Dice coefficient "
    "2*c(ab)/(c(a)+c(b)) — the association score behind phrase-aware "
    "tokenizer vocabularies and stop-phrase lists, chosen over PMI "
    "because it needs no logarithm: exact integer counts and one "
    "final division, bit-identical across engines. Bigram and "
    "unigram counts are two map-side-combined aggregations; the "
    "unigram table is vocabulary-sized and broadcasts onto the "
    "bigram side twice; top-K is TakeOrderedAndProject with a total "
    "ordering (dice DESC, bigram ASC).",
)
def ext_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    base = d.select(F.split(F.lower("text"), " ").alias("arr"))
    pairs = base.select(
        F.explode(
            F.expr(
                "CASE WHEN size(arr) >= 2 THEN "
                "transform(sequence(1, size(arr) - 1), "
                "i -> struct(element_at(arr, i) AS a, element_at(arr, i + 1) AS b)) "
                "ELSE array() END"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bg = pairs.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    uc = (
        base.select(F.explode("arr").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    ua = F.broadcast(uc.select(F.col("token").alias("a"), F.col("c").alias("c_a")))
    ub = F.broadcast(uc.select(F.col("token").alias("b"), F.col("c").alias("c_b")))
    scored = (
        bg.join(ua, "a")
        .join(ub, "b")
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            "c_ab",
            "c_a",
            "c_b",
            ((F.lit(2) * F.col("c_ab")).cast("double") / (F.col("c_a") + F.col("c_b"))).alias(
                "dice"
            ),
        )
    )
    return scored.orderBy(F.desc("dice"), F.asc("bigram")).limit(COLLOC_TOPK)


@query(
    "ext_length_histogram",
    oracle="""
    WITH t AS (
      SELECT len(list_filter(string_split(lower(text), ' '),
                             x -> x <> '')) AS n_tokens
      FROM documents
    )
    SELECT CAST(length(bin(CAST(n_tokens AS BIGINT))) - 1 AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens
    FROM t
    WHERE n_tokens > 0
    GROUP BY log2_bucket
    """,
    operator="ext_text_stats (corpus length distribution)",
    doc="Token-length histogram in power-of-two buckets — the "
    "sequence-length profile that drives packing bin sizes and "
    "truncation budgets. The bucket is floor(log2(n)) computed via "
    "binary-representation length, an exact integer identity on "
    "both engines (no transcendental, no boundary rounding). "
    "Zero-shuffle projection + one tiny aggregation.",
)
def ext_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    n_tokens = F.size(F.expr("filter(split(lower(text), ' '), x -> x <> '')"))
    t = d.select(n_tokens.alias("n_tokens")).filter(F.col("n_tokens") > 0)
    bucket = (F.length(F.bin(F.col("n_tokens").cast("bigint"))) - 1).cast("bigint")
    return t.groupBy(bucket.alias("log2_bucket")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


#: winnowing parameters: k-gram size and window width. Guarantee: any
#: shared token run of length >= WINNOW_K + WINNOW_W - 1 between two
#: docs produces at least one shared fingerprint (the MOSS bound).
WINNOW_K = 4
WINNOW_W = 5
_WINNOW_P = 1000000007


@query(
    "ext_winnow_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split({_NORM_DUCK}, ' '),
                            t -> CAST(length(t) * 7 + ascii(substr(t, 1, 1)) AS BIGINT))
               AS vals
      FROM documents
    ), kh AS (
      SELECT doc_id, len(vals) AS n_toks,
             CASE WHEN len(vals) >= {WINNOW_K}
                  THEN list_transform(range(1, len(vals) - {WINNOW_K} + 2),
                       i -> list_reduce(
                              list_prepend(CAST(0 AS BIGINT),
                                           list_slice(vals, i, i + {WINNOW_K} - 1)),
                              (a, b) -> (a * 31 + b) % {_WINNOW_P}))
                  ELSE [] END AS khash
      FROM t
    ), fp AS (
      SELECT doc_id, n_toks, len(khash) AS n_kgrams,
             CASE WHEN len(khash) >= {WINNOW_W}
                  THEN list_distinct(list_transform(
                         range(1, len(khash) - {WINNOW_W} + 2),
                         j -> list_min(list_slice(khash, j, j + {WINNOW_W} - 1))))
                  ELSE [] END AS fps
      FROM kh
    )
    SELECT doc_id,
           CAST(n_kgrams AS BIGINT) AS n_kgrams,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT), fps),
                                     (a, b) -> (a + b) % {_WINNOW_P}), 0) AS BIGINT)
             AS fp_checksum
    FROM fp
    """,
    operator="ext_fingerprint (winnowing — the MOSS local fingerprint algorithm)",
    doc="Winnowed document fingerprints (Schleimer/Wilkerson/Aiken): "
    "token 4-gram rolling hashes (the ext_fingerprint polynomial as "
    "an explicit left-fold per k-gram, identical on both engines), "
    "then the minimum hash of every 5-hash window — the LOCAL "
    "selection guaranteeing any shared token run of length k+w-1 "
    "yields a shared fingerprint, which plain modular sampling "
    "cannot promise. Fingerprint sets are reported as (count, "
    "modular checksum); the checksum folds (a+b) mod p, which is "
    "associative-commutative, so it is order-insensitive and "
    "bit-identical on any engine. Zero-shuffle: every step is a "
    "higher-order array expression inside codegen; selectivity is "
    "~2/(w+1) of k-gram positions, the storage win that makes "
    "fingerprint indexes feasible at 100 TB.",
)
def ext_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    k, w, p = WINNOW_K, WINNOW_W, _WINNOW_P
    vals = (
        f"transform(split({_NORM}, ' '), "
        "t -> CAST(length(t) * 7 + ascii(substr(t, 1, 1)) AS BIGINT))"
    )
    khash = (
        f"CASE WHEN size(vals) >= {k} "
        f"THEN transform(sequence(1, size(vals) - {k} + 1), "
        f"i -> aggregate(slice(vals, i, {k}), CAST(0 AS BIGINT), "
        f"(a, b) -> (a * 31 + b) % {p})) "
        "ELSE array() END"
    )
    fps = (
        f"CASE WHEN size(khash) >= {w} "
        f"THEN array_distinct(transform(sequence(1, size(khash) - {w} + 1), "
        f"j -> array_min(slice(khash, j, {w})))) "
        "ELSE array() END"
    )
    return (
        d.select("doc_id", F.expr(vals).alias("vals"))
        .select("doc_id", F.expr(khash).alias("khash"))
        .select("doc_id", F.size("khash").cast("bigint").alias("n_kgrams"), F.expr(fps).alias("fps"))
        .select(
            "doc_id",
            "n_kgrams",
            F.size("fps").cast("bigint").alias("n_fingerprints"),
            F.expr(
                f"aggregate(fps, CAST(0 AS BIGINT), (a, b) -> (a + b) % {p})"
            ).alias("fp_checksum"),
        )
    )


@query(
    "ext_bigram_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
      FROM documents
    ), uni AS (
      SELECT w, count(*) AS c1
      FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY 1
    ), big AS (
      SELECT doc_id, unnest(list_transform(range(1, len(ts)),
             i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS bg
      FROM toks WHERE len(ts) >= 2
    ), bc AS (
      SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS c2
      FROM big GROUP BY 1, 2
    ), scored AS (
      SELECT b.doc_id,
             CAST(length(bin(u.c1 // c.c2)) - 1 AS BIGINT) AS q
      FROM big b
      JOIN bc c ON b.bg.w1 = c.w1 AND b.bg.w2 = c.w2
      JOIN uni u ON b.bg.w1 = u.w
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(q) AS BIGINT) AS surprisal_q,
           CAST((1000 * sum(q)) // count(*) AS BIGINT) AS mean_q_milli
    FROM scored GROUP BY doc_id
    """,
    operator="ext_quality (statistical LM fluency filter, CCNet shape)",
    doc="Quantized bigram surprisal per document — the integer analog "
    "of language-model perplexity filtering (CCNet): each adjacent "
    "token pair scores floor(log2(c(w1) / c(w1,w2))) via the exact "
    "binary-length identity (no transcendentals — the same trick as "
    "the length histogram), summed per doc with an integer-division "
    "mean. High mean surprisal = token transitions rare relative to "
    "their context = disfluent/boilerplate-shuffled text. Counts "
    "come from the corpus itself (a self-scored filter). The UNIGRAM "
    "table is vocabulary-sized and broadcasts; the BIGRAM table "
    "grows with the corpus (distinct adjacent pairs), so its join "
    "is left to the planner — broadcast at fixture scale, "
    "shuffle-on-(w1,w2) at 100 TB.",
)
def ext_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("ts"),
    )
    big = toks.filter(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    q = (F.length(F.bin(F.expr("c1 div c2"))) - 1).cast("bigint")
    return (
        big.join(bc, ["w1", "w2"])
        .join(F.broadcast(uni), big.w1 == uni.w)
        .select("doc_id", q.alias("q"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("q").alias("surprisal_q"),
            F.expr("(1000 * sum(q)) div count(*)").alias("mean_q_milli"),
        )
    )
