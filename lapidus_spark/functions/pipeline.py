"""Training-data pipeline operators (SURVEY.md §2.9 family): the
dataset-assembly passes that run AFTER dedup/decontamination —
split assignment, PII scrubbing, chunking, sequence packing, and
corpus vocabulary statistics.

Scale notes (100 TB):

- ext_split_hash: embarrassingly parallel projection — the split is a
  pure function of the stable doc_id (md5, not ``hash()``, so the
  assignment survives Spark upgrades and matches any other engine
  computing the same rule). Zero shuffle.
- ext_pii_scrub: zero-shuffle regexp projection, whole-stage codegen;
  patterns are RE2-compatible so the same rules run on DuckDB/Go
  scrubbers byte-for-byte.
- ext_chunk_overlap: per-row explode with bounded fan-out
  (ceil(len/stride) chunks per doc) — no shuffle; output size is the
  input size times a constant overlap factor.
- ext_seq_pack: the one genuinely order-dependent pass. The global
  token offset is computed with the same range-exchange +
  per-partition-offset formulation as sort_global_events (never a
  single-partition window): partition counts are k rows of broadcast
  metadata, so the cumulative sum distributes across the cluster.
- ext_doc_freq: explode → one hash aggregation on the token key; the
  corpus-size scalar joins in as a broadcast literal, not a
  driver-side constant folded into the plan.

Float determinism: no floats — every output is an exact integer or a
string, so oracle hashes match bit-for-bit by construction.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

#: train/val/test fractions in hash-bucket percent (out of 100).
TRAIN_PCT = 90
VAL_PCT = 5
#: chunking geometry (tokens).
CHUNK_SIZE = 32
CHUNK_STRIDE = 24
#: sequence-packing token budget per packed bin.
PACK_BUDGET = 512
#: parallelism of the range exchange in ext_seq_pack (tracks cluster
#: cores at scale; fixture-sized here).
PACK_PARTITIONS = 32


@query(
    "ext_split_hash",
    oracle=f"""
    SELECT doc_id,
           CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
             % 100 AS bucket,
           CASE
             WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                  % 100 < {TRAIN_PCT} THEN 'train'
             WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                  % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
    operator="ext_split_hash (train/val/test assignment)",
    doc="Deterministic 90/5/5 train/val/test split: md5 of the stable "
    "doc key → hash bucket in [0,100) → split label. Content-blind "
    "(near-dups must be clustered first so a cluster lands in ONE "
    "split — see ext_dedup_components), engine-portable (md5, not "
    "Spark's Murmur hash()), and zero-shuffle.",
)
def ext_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
        % 100
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "ext_pii_scrub",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_scrubbed,
           regexp_replace(CAST(user_id AS VARCHAR), '[0-9]', '#', 'g') AS user_masked,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_num_runs,
           CAST(len(regexp_extract_all(props,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails
    FROM events
    """,
    operator="ext_pii_scrub (PII redaction)",
    doc="PII scrubbing pass over the event payloads: number runs in "
    "the free-form props replaced with a <NUM> sentinel, the user "
    "identifier digit-masked, and per-row match counts (number runs, "
    "email-shaped tokens) emitted for audit. Patterns restricted to "
    "the RE2-compatible subset so Java-regex Spark and RE2 DuckDB "
    "agree byte-for-byte; zero shuffle, whole-stage codegen.",
)
def ext_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    email = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("props_scrubbed"),
        F.regexp_replace(F.col("user_id").cast("string"), "[0-9]", "#").alias("user_masked"),
        F.regexp_count("props", F.lit("[0-9]+")).cast("bigint").alias("n_num_runs"),
        F.regexp_count("props", F.lit(email)).cast("bigint").alias("n_emails"),
    )


@query(
    "ext_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), x AS (
      SELECT doc_id, toks,
             1 + (greatest(0, n - {CHUNK_SIZE}) + {CHUNK_STRIDE} - 1)
                 // {CHUNK_STRIDE} AS n_chunks
      FROM t
    ), e AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM x
    )
    SELECT doc_id, chunk_id,
           array_to_string(
             toks[chunk_id * {CHUNK_STRIDE} + 1 : chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}],
             ' ') AS chunk_text,
           CAST(len(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                         chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}]) AS BIGINT)
             AS chunk_len
    FROM e
    """,
    operator="ext_chunk_overlap (sliding-window chunking)",
    doc=f"Overlapping-window chunking for context-length-bounded "
    f"training: {CHUNK_SIZE}-token chunks every {CHUNK_STRIDE} tokens "
    f"({CHUNK_SIZE - CHUNK_STRIDE}-token overlap). Chunk count is "
    "computed in exact integer arithmetic (div, not float ceil) so "
    "both engines explode identical row sets; fan-out per row is "
    "bounded by ceil(len/stride), no shuffle anywhere.",
)
def ext_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    ).withColumn(
        "n_chunks",
        F.expr(f"1 + (greatest(0, n - {CHUNK_SIZE}) + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE}"),
    )
    e = t.select(
        "doc_id",
        "toks",
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), CAST(n_chunks - 1 AS BIGINT))")).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id").cast("int") * CHUNK_STRIDE
    chunk = F.slice("toks", start + 1, CHUNK_SIZE)
    return e.select(
        "doc_id",
        "chunk_id",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
    )


@query(
    "ext_seq_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ), c AS (
      SELECT doc_id, n_tok,
             CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM t
    )
    SELECT cum_before // {PACK_BUDGET} AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c GROUP BY bin_id
    """,
    operator="ext_seq_pack (sequence packing)",
    doc=f"Sequence packing: documents are packed in stable doc_id "
    f"order into ~{PACK_BUDGET}-token training bins by cumulative "
    "token offset (bin = offset div budget — the deterministic, "
    "shuffle-once formulation; a doc straddling a boundary joins the "
    "bin its offset starts in, the same contiguous-packing rule "
    "Megatron-style dataloaders use). The global cumulative sum uses "
    "the range-exchange + broadcast-offset pattern from "
    "sort_global_events — never a single-partition window.",
)
def ext_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    # Range-partition on doc_id: partition i holds strictly lower doc
    # ids than partition i+1, so a broadcast of per-partition token
    # totals yields each partition's global starting offset.
    # localCheckpoint for the same reason as sort_global_events
    # (operators/relational.py): pid feeds BOTH the totals branch and
    # the window branch, and the range-exchange bounds are sampled at
    # run time — two un-pinned evaluations can land rows in different
    # pids and silently shift every downstream bin. Multi-split
    # inputs are what make the samplings diverge; the sf0.1 sweep
    # caught the sibling bug in the rank operator.
    parts = (
        docs.repartitionByRange(PACK_PARTITIONS, F.asc("doc_id"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = parts.groupBy("pid").agg(F.sum("n_tok").alias("tok"))
    offsets = (
        totals.alias("a")
        .join(F.broadcast(totals.alias("b")), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.tok"), F.lit(0)).cast("bigint").alias("offset"))
    )
    w = Window.partitionBy("pid").orderBy("doc_id")
    packed = (
        parts.withColumn("local_cum", F.sum("n_tok").over(w))
        .join(F.broadcast(offsets), "pid")
        .withColumn("cum_before", F.col("offset") + F.col("local_cum") - F.col("n_tok"))
        .withColumn("bin_id", F.expr(f"cum_before div {PACK_BUDGET}"))
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "ext_doc_freq",
    oracle="""
    WITH e AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
      )
    )
    SELECT token, count(*) AS df,
           (SELECT count(*) FROM documents) AS n_docs
    FROM e GROUP BY token
    """,
    operator="ext_doc_freq (corpus vocabulary statistics)",
    doc="Document frequency per token (the df in idf, and the input "
    "to stopword/boilerplate lists): per-doc DISTINCT tokens exploded "
    "into one hash aggregation on the token key. The corpus size "
    "rides along as a broadcast scalar. Counts stay exact integers — "
    "downstream idf = ln(N/df) is a lossy float, so the operator "
    "emits the exact sufficient statistics instead.",
)
def ext_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("token"),
    )
    total = docs.agg(F.count("*").alias("n_docs"))
    return (
        e.groupBy("token")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(total))
    )


#: per-language sampling rates in hash-bucket percent: downsample the
#: dominant language, keep most of the tail (corpus rebalancing).
SAMPLE_RATES = {"en": 20, "de": 60, "es": 60, "fr": 60, "zh": 60}
SAMPLE_DEFAULT = 40  # unseen languages


def _sample_rate_case_duck() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items())
    return f"CASE lang {whens} ELSE {SAMPLE_DEFAULT} END"


@query(
    "ext_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(concat('0x', substr(md5(concat('sample_', CAST(doc_id AS VARCHAR))), 1, 4))
                AS INT) % 100 AS bucket
    FROM documents
    WHERE CAST(concat('0x', substr(md5(concat('sample_', CAST(doc_id AS VARCHAR))), 1, 4))
               AS INT) % 100 < {_sample_rate_case_duck()}
    """,
    operator="ext_sample_stratified (per-stratum hash sampling)",
    doc="Stratified corpus sampling: each language stratum keeps a "
    "different fraction (downsample the dominant language, keep the "
    "tail) decided by a salted md5 bucket of the stable doc key — "
    "deterministic across engines and re-runs, unlike rand()-based "
    "Bernoulli sampling, and a pure zero-shuffle filter that pushes "
    "into the scan.",
)
def ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sample_"), F.col("doc_id").cast("string"))), 1, 4),
            16,
            10,
        ).cast("int")
        % 100
    )
    rate = F.lit(SAMPLE_DEFAULT)
    for k, v in reversed(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("rate"))
        .filter(F.col("bucket") < F.col("rate"))
        .drop("rate")
    )


#: frozen quality-classifier weights (milli-units) — a quantized
#: linear model: reward length, penalize character bulk, reward
#: stopword evidence ('the' count as the anchor feature).
LOGIT_W_TOK = 5
LOGIT_W_CHAR = -2
LOGIT_W_STOP = 100
LOGIT_THRESHOLD = -300


@query(
    "ext_quality_logit",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             n_chars,
             len(list_filter(string_split(lower(text), ' '), x -> x = 'the')) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST({LOGIT_W_TOK} * n_tok + {LOGIT_W_CHAR} * n_chars
                + {LOGIT_W_STOP} * n_stop AS BIGINT) AS z_milli,
           CAST(CASE WHEN {LOGIT_W_TOK} * n_tok + {LOGIT_W_CHAR} * n_chars
                + {LOGIT_W_STOP} * n_stop > {LOGIT_THRESHOLD} THEN 1 ELSE 0 END AS INT)
             AS keep
    FROM t
    """,
    operator="ext_quality_logit (frozen-weight quality classifier)",
    doc="A fasttext-style linear quality filter with FROZEN integer "
    "weights (milli-units): the logit is an exact integer combination "
    "of token count, char count, and stopword evidence, so the score "
    "and the keep/drop decision are bit-identical on any engine — "
    "the quantized-classifier trick that makes a learned filter "
    "reproducible. Zero shuffle, whole-stage codegen.",
)
def ext_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    n_stop = F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x == "the"))
    z = (
        F.lit(LOGIT_W_TOK) * n_tok
        + F.lit(LOGIT_W_CHAR) * F.col("n_chars")
        + F.lit(LOGIT_W_STOP) * n_stop
    )
    return docs.select(
        "doc_id",
        z.cast("bigint").alias("z_milli"),
        F.when(z > LOGIT_THRESHOLD, 1).otherwise(0).cast("int").alias("keep"),
    )


#: BM25 lexical retrieval: frozen query terms, k1 = 1.2 (6/5),
#: b = 0.75 (3/4), fixed-point scales. The score is computed entirely
#: in BIGINT arithmetic (integer ``div`` quantization — the
#: impact-ordered-index trick: Lucene/Anserini quantize BM25 impacts
#: to integers for exactly this reproducibility), so ranking is
#: bit-identical on any engine with no transcendentals. idf uses the
#: rational Robertson core (2N-2df+1)/(2df+1) — the argument of the
#: usual log — quantized at IDF_SCALE; the tf saturation term
#: tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) is cleared of rationals by
#: multiplying through by 10*T (T = corpus tokens, avgdl = T/N):
#: 22*T*tf / (10*T*tf + 3*T + 9*dl*N), quantized at TF_SCALE.
BM25_TERMS = ("hash", "vector", "stream")
BM25_TOPK = 10
BM25_IDF_SCALE = 1_000_000
BM25_TF_SCALE = 1_000


def _bm25_score_sql() -> str:
    """The per-doc BIGINT score expression — same text works on Spark
    and DuckDB once tf_<t>/dl/n_docs/n_tokens/df_<t> columns exist
    (integer div spelled per-engine)."""
    terms = []
    for t in BM25_TERMS:
        idf = f"(({BM25_IDF_SCALE} * (2*n_docs - 2*df_{t} + 1)) DIV (2*df_{t} + 1))"
        sat = (
            f"(({BM25_TF_SCALE} * 22 * n_tokens * tf_{t}) DIV "
            f"(10 * n_tokens * tf_{t} + 3 * n_tokens + 9 * dl * n_docs))"
        )
        terms.append(f"{idf} * {sat}")
    return " + ".join(terms)


def _bm25_tf_sql() -> str:
    """Per-doc tf_<t> columns (DuckDB dialect) — shared by the BM25
    oracle and the re-rank oracle so the frozen arithmetic has one
    source of truth."""
    return ",\n             ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in BM25_TERMS
    )


def _bm25_df_sql() -> str:
    """Corpus df_<t> columns (DuckDB dialect), same sharing rule."""
    return ",\n             ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS
    )


def _bm25_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 term frame (doc_id, dl, tf_<t>...) — the Spark
    twin of the oracle's t CTE, shared by ext_bm25_topk and
    ext_retrieve_rerank."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    return docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.size(F.expr(f"filter(toks, x -> x = '{t}')"))
            .cast("bigint")
            .alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )


def _bm25_stats(per_doc: DataFrame) -> DataFrame:
    """One-row corpus stats (n_docs, n_tokens, df_<t>...) — the Spark
    twin of the oracle's s/st CTE; broadcast by both consumers."""
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("n_tokens"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )


def _bm25_oracle() -> str:
    tf_cols = _bm25_tf_sql()
    df_cols = _bm25_df_sql()
    score = _bm25_score_sql().replace(" DIV ", " // ")
    tf_out = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
    WITH d AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), t AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
             {tf_cols}
      FROM d
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS n_tokens,
             {df_cols}
      FROM t
    )
    SELECT doc_id, score, dl, {tf_out} FROM (
      SELECT t.doc_id, t.dl, {tf_out}, {score} AS score FROM t, s
    )
    WHERE score > 0
    ORDER BY score DESC, doc_id
    LIMIT {BM25_TOPK}
    """


@query(
    "ext_bm25_topk",
    oracle=_bm25_oracle(),
    operator="ext_bm25_topk (lexical retrieval, fixed-point BM25)",
    doc="Lexical top-k retrieval — the sparse complement to "
    "ext_sim_search/ext_ann_*: BM25 with frozen integer fixed-point "
    "scoring (rational Robertson idf core, rational-cleared tf "
    "saturation, BIGINT div quantization), so the score and ranking "
    "are bit-identical on any engine. Two passes: a map-side-partial "
    "global-stats aggregation broadcast as one row (N, T, per-term "
    "df), then a zero-shuffle scoring projection into "
    "TakeOrderedAndProject — no sort of the full corpus, no inverted "
    "index needed below ~10 query terms. At 100 TB the stats row is "
    "computed once per corpus snapshot and persisted, and the BIGINT "
    "headroom calls for per-shard partial stats or DECIMAL(38,0) "
    "once T*tf approaches 2^63/22000.",
)
def ext_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored_in = _bm25_per_doc(spark, sf_dir)
    stats = _bm25_stats(scored_in)
    tf_out = [f"tf_{t}" for t in BM25_TERMS]
    return (
        scored_in.crossJoin(F.broadcast(stats))
        .withColumn("score", F.expr(_bm25_score_sql()))
        .filter(F.col("score") > 0)
        .select("doc_id", "score", "dl", *tf_out)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )


#: sharded-corpus layouts, cached per (process, sf_dir).
_SHARD_DIRS: dict[str, str] = {}


def _split_col():
    """The ext_split_hash assignment rule as a Column (md5 bucket →
    train/val/test), shared so the shard layout and the split query
    can never disagree."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int")
        % 100
    )
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


def build_corpus_shards(spark: SparkSession, sf_dir: str) -> str:
    """Write the documents table as a dataloader-ready shard layout:
    hive-partitioned by (split, lang), doc_id-sorted within every
    file. ``repartition(split, lang)`` makes each task own whole
    partition-dir combos (one file per dir — no small-file explosion),
    and ``sortWithinPartitions`` gives readers monotone doc_id runs
    and parquet min/max stats tight enough for range pruning. At
    100 TB the same plan holds with a higher shuffle parallelism:
    the layout cost is one shuffle, and every downstream epoch reads
    only ``split=train`` via partition pruning."""
    if sf_dir in _SHARD_DIRS:
        return _SHARD_DIRS[sf_dir]
    out = tempfile.mkdtemp(prefix="lapidus_corpus_shards_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        _split_col().alias("split"),
        "lang",
    )
    (
        docs.repartition("split", "lang")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("split", "lang")
        .parquet(out)
    )
    _SHARD_DIRS[sf_dir] = out
    return out


@query(
    "ext_corpus_shard",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
               % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM s WHERE bucket < {TRAIN_PCT}
    GROUP BY lang
    """,
    operator="ext_corpus_shard (partitioned training-shard layout)",
    doc="The materialization step of the pipeline: documents written "
    "as a hive-partitioned (split, lang) parquet layout with "
    "doc_id-sorted files (build_corpus_shards), then the train "
    "manifest read BACK from the layout — so the green oracle row "
    "certifies the full write→read round trip, and the split=train "
    "predicate resolves as a PartitionFilter (the scan never opens "
    "val/test dirs; plan-audited). The oracle recomputes the "
    "manifest straight from the source table via the shared "
    "ext_split_hash md5 rule.",
)
def ext_corpus_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    shards = spark.read.parquet(build_corpus_shards(spark, sf_dir))
    return (
        shards.filter(F.col("split") == "train")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass data-quality profile: per column, row/null/distinct
    counts. All counts land in ONE aggregation — Spark plans the
    multi-column distinct set with a single Expand node (one scan, no
    per-column passes), the same shape a warehouse profiler uses. The
    wide 1-row aggregate is then unpivoted driver-free via stack()."""
    aggs = [F.count("*").alias("__rows")]
    for c in columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', __rows, {c}__nulls, {c}__distinct" for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_expr}) "
            "AS (col_name, n_rows, n_nulls, n_distinct)"
        )
    )


@query(
    "ext_profile_columns",
    oracle="""
    SELECT 'doc_id' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'text', count(*),
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT text) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'lang', count(*),
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'source', count(*),
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_chars', count(*),
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT) FROM documents
    """,
    operator="data-quality profiling (pipeline ops — corpus intake audit)",
    doc="Column profile of the documents corpus in one scan: row "
    "count, null count, and exact distinct count for every column "
    "via a single multi-distinct aggregation (Catalyst's Expand "
    "node), unpivoted with stack() — the intake-audit step a "
    "training-data pipeline runs before trusting a new dump. The "
    "oracle recomputes each column's profile independently; the "
    "n-way UNION vs one-Expand-pass difference is exactly what the "
    "parity check proves equivalent.",
)
def ext_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, ["doc_id", "text", "lang", "source", "n_chars"])


DOMAIN_CAP = 10  # max docs kept per source domain


@query(
    "ext_domain_cap",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
             ) AS rk
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars,
           string_agg(CASE WHEN rk <= {DOMAIN_CAP} THEN CAST(doc_id AS VARCHAR) END,
                      '|' ORDER BY rk) AS kept_ids
    FROM r GROUP BY source
    """,
    operator="ext_sample (per-domain document cap)",
    doc=f"FineWeb-style per-domain cap: keep at most {DOMAIN_CAP} "
    "documents per source domain, ranked by document length with a "
    "deterministic doc_id tiebreak — the anti-monoculture guard that "
    "stops one crawler-friendly domain from dominating a training "
    "mix. One window pass on the domain key (single exchange; the "
    "per-domain rank never globalizes) followed by the per-domain "
    "keep report with the kept ids in rank order for audit. At "
    "100 TB the domain key is skewed by construction (that is the "
    "problem the cap exists to measure) — the window still bounds "
    "per-task work because rank only needs a per-domain sort, and a "
    "domain too hot for one task is exactly a domain the cap will "
    f"cut to {DOMAIN_CAP} rows anyway, so a pre-aggregation keeping "
    "each domain's top rows per partition (partial TakeOrdered) "
    "bounds the exchange.",
)
def ext_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", parallel=True)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    r = d.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
    kept = F.col("rk") <= DOMAIN_CAP
    return r.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).cast("bigint").alias("kept_chars"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN rk <= "
                f"{DOMAIN_CAP} THEN struct(rk, doc_id) END)), x -> CAST(x.doc_id AS STRING))"
            ),
            "|",
        ).alias("kept_ids"),
    )


@query(
    "ext_domain_gini",
    oracle="""
    WITH r AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars ASC, doc_id ASC) AS i
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(2 * sum(i * n_chars) - (count(*) + 1) * sum(n_chars) AS BIGINT)
             AS gini_num,
           CAST(count(*) * sum(n_chars) AS BIGINT) AS gini_den,
           CAST(2 * sum(i * n_chars) - (count(*) + 1) * sum(n_chars) AS DOUBLE)
             / (count(*) * sum(n_chars)) AS gini
    FROM r GROUP BY source
    """,
    operator="ext_sample (per-domain size-concentration audit)",
    doc="Per-domain Gini coefficient of document sizes — the "
    "concentration audit behind mix design: a domain whose token "
    "mass sits in a few huge documents behaves differently under "
    "sampling and packing than one with the same total spread "
    "evenly, and caps/weights tuned on totals alone miss it. "
    "Computed by the rank identity G = (2·Σi·x(i) − (n+1)·Σx) / "
    "(n·Σx) over the ascending (n_chars, doc_id)-ranked sizes: one "
    "window exchange on the domain key + the per-domain aggregation "
    "sharing it; every term is an exact BIGINT and the coefficient "
    "is a single exact-integer division, so the audit is "
    "bit-identical under any partitioning. The exact numerator/"
    "denominator travel with the ratio so downstream thresholds can "
    "stay in integer space.",
)
def ext_domain_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", parallel=True)
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    r = d.select("source", "n_chars", F.row_number().over(w).alias("i"))
    n = F.count("*")
    sx = F.sum("n_chars")
    six = F.sum(F.col("i") * F.col("n_chars"))
    num = (2 * six - (n + 1) * sx).cast("bigint")
    return r.groupBy("source").agg(
        n.cast("bigint").alias("n_docs"),
        sx.cast("bigint").alias("total_chars"),
        num.alias("gini_num"),
        (n * sx).cast("bigint").alias("gini_den"),
        (num.cast("double") / (n * sx)).alias("gini"),
    )


# --- two-stage retrieval: dense ANN candidates → lexical re-rank ---

#: stage-1 candidate pool (dense recall set) and final result size.
RERANK_CANDIDATES = 50
RERANK_TOPK = 10


def _retrieve_rerank_oracle() -> str:
    from lapidus_spark.functions.similarity import (
        N_PROBE,
        QUERY_VEC_ID,
        _cell_expr,
        _cos,
        _scores_arr,
    )

    tf_cols = _bm25_tf_sql()
    df_cols = _bm25_df_sql()
    score = _bm25_score_sql().replace(" DIV ", " // ")
    return f"""
    WITH s AS (
      SELECT vec_id, embedding, {_cell_expr("duck", "embedding")} AS cell
      FROM embeddings
    ), q AS (
      SELECT embedding AS qe,
             {_scores_arr("duck", "embedding")} AS qscores
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ), cand AS (
      SELECT s.vec_id, {_cos("duck", "s.embedding", "q.qe")} AS cos_sim
      FROM s CROSS JOIN q
      WHERE q.qscores[s.cell + 1] <= list_sort(q.qscores)[{N_PROBE}]
        AND s.vec_id <> {QUERY_VEC_ID}
      ORDER BY cos_sim DESC, s.vec_id ASC
      LIMIT {RERANK_CANDIDATES}
    ), d AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), t AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
             {tf_cols}
      FROM d
    ), st AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS n_tokens,
             {df_cols}
      FROM t
    )
    SELECT t.doc_id, {score} AS score, c.cos_sim
    FROM cand c JOIN t ON t.doc_id = c.vec_id CROSS JOIN st
    ORDER BY score DESC, c.cos_sim DESC, t.doc_id ASC
    LIMIT {RERANK_TOPK}
    """


@query(
    "ext_retrieve_rerank",
    oracle=_retrieve_rerank_oracle(),
    operator="two-stage retrieval (ANN recall → BM25 precision re-rank)",
    doc="The standard retrieval composition as ONE audited plan: "
    "stage 1 probes the cell-partitioned IVF index (ext_ann_ivf's "
    "partition-pruned read — n_probe/k of the files) for the top-"
    f"{RERANK_CANDIDATES} dense candidates by exact cosine; stage 2 "
    "re-ranks ONLY those candidates lexically with the frozen fixed-"
    "point BM25 (ext_bm25_topk's scoring, corpus-wide stats). The "
    "candidate set joins back to documents as a broadcast (50 rows "
    "of ids — the build side of a broadcast hash join, never a "
    "shuffle), the stats row is one broadcast scalar, and the final "
    "ranking is (bm25, cosine, id) — fully deterministic, bit-"
    "identical across engines. At 100 TB: the IVF probe stays "
    "pruned, corpus stats are a persisted ingest-time artifact "
    "(per ext_bm25_topk's note), and the candidate fetch becomes a "
    "keyed point-read against the doc store; the one full documents "
    "scan here exists only to compute those stats on the fly.",
)
def ext_retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lapidus_spark.functions.similarity import ivf_candidates

    cand = ivf_candidates(spark, sf_dir, RERANK_CANDIDATES)
    per_doc = _bm25_per_doc(spark, sf_dir)
    stats = _bm25_stats(per_doc)
    return (
        per_doc.join(F.broadcast(cand), per_doc.doc_id == cand.vec_id)
        .crossJoin(F.broadcast(stats))
        .withColumn("score", F.expr(_bm25_score_sql()))
        .select("doc_id", "score", "cos_sim")
        .orderBy(F.desc("score"), F.desc("cos_sim"), F.asc("doc_id"))
        .limit(RERANK_TOPK)
    )
