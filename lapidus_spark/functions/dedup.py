"""Deduplication extension operators (SURVEY.md §2.9, ext_dedup_*).

Four dedup strategies over ``documents``, each scale-shaped:

- exact:   hash-groupBy on normalized text → one shuffle on a short
           hash key; canonical row via min(doc_id).
- minhash: shingle → 8 minhashes → 4 LSH bands → candidate pairs via
           an equi-join on (band_id, band_hash). At 100 TB the band
           join is the only shuffle and its key space is huge (md5),
           so it partitions evenly; no O(n²) stage anywhere.
- simhash: per-doc 16-bit signature, computed entirely inside
           whole-stage codegen via higher-order functions (no UDF, no
           shuffle at all).
- ngram:   token-set Jaccard *within blocking buckets*
           (lang × length band) — the classic candidate-blocking
           trick that keeps the pair join bounded per bucket.

Everything is expressed in both Spark SQL and DuckDB SQL with pinned
fold orders and md5-derived hashing (identical hex in both engines),
so results hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = 2
SIMHASH_BITS = 16
JACCARD_T = 0.5
LENGTH_BAND = 100


@query(
    "ext_dedup_exact",
    oracle="""
    WITH h AS (
      SELECT doc_id, sha256(lower(trim(text))) AS text_hash
      FROM documents
    )
    SELECT text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM h GROUP BY text_hash
    """,
    operator="ext_dedup_exact",
    doc="Exact dedup on normalized-text hash; canonical row = lowest "
    "doc_id (deterministic rank-pick).",
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------- minhash

_SH_SPARK = (
    "CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(1, size(toks) - 2), i -> "
    "concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))) "
    "ELSE slice(toks, 1, 0) END"
)
_SH_DUCK = (
    "list_transform(range(1, greatest(len(toks) - 2, 0) + 1), i -> "
    "concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))"
)


def _mh_exprs(dialect: str) -> list[str]:
    t, m = ("transform", "array_min") if dialect == "spark" else ("list_transform", "list_min")
    return [f"{m}({t}(sh, s -> md5(concat('{i}#', s)))) AS mh{i}" for i in range(N_MINHASH)]


def _band_hash(b: int) -> str:
    return f"md5(concat(mh{2 * b}, '|', mh{2 * b + 1}))"


@query(
    "ext_dedup_minhash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id, {_SH_DUCK} AS sh FROM t
    ), m AS (
      SELECT doc_id, {", ".join(_mh_exprs("duck"))}
      FROM s WHERE len(sh) > 0
    ), b AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_id, {_band_hash(b)} AS band_hash FROM m" for b in range(N_BANDS))}
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM b x JOIN b y
      ON x.band_id = y.band_id AND x.band_hash = y.band_hash
         AND x.doc_id < y.doc_id
    """,
    operator="ext_dedup_near (minhash+LSH)",
    doc="MinHash+LSH near-dup candidates: 3-word shingles → 8 "
    "md5-minhashes → 4 bands of 2 → band-bucket equi-join.",
)
def ext_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = (
        d.select("doc_id", F.expr("split(lower(text), ' ')").alias("toks"))
        .select("doc_id", F.expr(_SH_SPARK).alias("sh"))
        .filter(F.expr("size(sh) > 0"))
    )
    for e in _mh_exprs("spark"):
        body, alias = e.rsplit(" AS ", 1)
        m = m.withColumn(alias, F.expr(body))
    bands = m.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(_band_hash(b)).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------- simhash


def _simhash_exprs(dialect: str) -> tuple[str, list[str], str]:
    """Returns (hvs expr, per-bit sum exprs, final signature expr)."""
    if dialect == "spark":
        hvs = (
            "transform(split(lower(text), ' '), "
            "t -> CAST(conv(substr(md5(t), 1, 4), 16, 10) AS INT))"
        )
        bits = [
            f"aggregate(hvs, 0, (a, h) -> a + "
            f"(CASE WHEN shiftright(h, {j}) & 1 = 1 THEN 1 ELSE -1 END)) AS s{j}"
            for j in range(SIMHASH_BITS)
        ]
    else:
        hvs = (
            "list_transform(string_split(lower(text), ' '), "
            "t -> CAST(concat('0x', substr(md5(t), 1, 4)) AS INT))"
        )
        bits = [
            f"list_sum(list_transform(hvs, h -> "
            f"CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) AS s{j}"
            for j in range(SIMHASH_BITS)
        ]
    sig = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return hvs, bits, f"CAST({sig} AS BIGINT)"


@query(
    "ext_dedup_simhash",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_simhash_exprs("duck")[0]} AS hvs FROM documents
    ), b AS (
      SELECT doc_id, {", ".join(_simhash_exprs("duck")[1])} FROM h
    )
    SELECT doc_id, {_simhash_exprs("duck")[2]} AS simhash FROM b
    """,
    operator="ext_dedup_near (simhash)",
    doc=f"{SIMHASH_BITS}-bit SimHash per document: ±1 vote per token "
    "per bit from a md5-derived token hash; near-dups share "
    "signatures (grouping on `simhash` buckets them).",
)
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hvs, bits, sig = _simhash_exprs("spark")
    h = d.select("doc_id", F.expr(hvs).alias("hvs"))
    for e in bits:
        body, alias = e.rsplit(" AS ", 1)
        h = h.withColumn(alias, F.expr(body))
    return h.select("doc_id", F.expr(sig).alias("simhash"))


# ---------------------------------------------------------------- ngram jaccard


@query(
    "ext_dedup_ngram",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, n_chars // {LENGTH_BAND} AS len_band,
             list_distinct(string_split(lower(text), ' ')) AS ts
      FROM documents
    ), p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.ts, x -> list_contains(b.ts, x))) AS n_inter,
             len(a.ts) + len(b.ts) AS n_sum
      FROM t a JOIN t b
        ON a.lang = b.lang AND a.len_band = b.len_band
           AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (n_sum - n_inter) AS jaccard
    FROM p
    WHERE CAST(n_inter AS DOUBLE) / (n_sum - n_inter) >= {JACCARD_T}
    """,
    operator="ext_dedup_near (ngram jaccard)",
    doc="Token-set Jaccard near-dup pairs with candidate blocking on "
    "(lang, length band) — the pair join is bounded per block, never "
    "whole-corpus O(n²).",
)
def ext_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LENGTH_BAND).cast("long").alias("len_band"),
        F.expr("array_distinct(split(lower(text), ' '))").alias("ts"),
    )
    a, b = t.alias("a"), t.alias("b")
    p = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_band") == F.col("b.len_band"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.expr("size(filter(a.ts, x -> array_contains(b.ts, x)))").alias("n_inter"),
        (F.expr("size(a.ts)") + F.expr("size(b.ts)")).alias("n_sum"),
    )
    jac = F.col("n_inter").cast("double") / (F.col("n_sum") - F.col("n_inter"))
    return p.select("doc_a", "doc_b", jac.alias("jaccard")).filter(jac >= JACCARD_T)
