"""Similarity-search extension operators (SURVEY.md §2.9, ext_sim_*).

Over the 64-dim float ``embeddings`` table:

- ext_sim_search: brute-force cosine top-k of the corpus against a
  query vector. The query side is a broadcast single-row join, the
  corpus scan is embarrassingly parallel, and the top-k is
  TakeOrderedAndProject (k rows per partition, no full sort). This is
  the exact baseline ANN implementations are measured against.
- ext_dedup_embed: embedding-cosine near-dup pairs via random-
  hyperplane sign-LSH buckets → the pair join is per-bucket, never
  O(n²) over the corpus. The hyperplanes are md5-derived integers so
  both engines build the identical index.
- ext_ann_lsh: ANN variant of sim_search that probes only the query's
  LSH bucket — the 100 TB scale path (bucket join instead of full
  scan).

Determinism: all dot products are explicit left-folds over dimension
indices with every term cast to double (Spark `aggregate`, DuckDB
`list_reduce`), so accumulation order — and hence every float bit —
matches across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

DIM = 64
TOP_K = 10
N_PLANES = 8
ANN_PLANES = 4  # coarser buckets for ANN probing (≈corpus/16 per probe)
COS_T = 0.4  # fixture embeddings are near-orthogonal (max pair cos ≈ 0.6)
QUERY_VEC_ID = 0
#: skew guard for the sign-LSH pair join — same rationale as
#: dedup.MAX_BUCKET_DOCS: a degenerate bucket (e.g. zero vectors all
#: hashing to one signature) would emit m² pairs into one task.
MAX_BUCKET_VECS = 1000


def _fold(dialect: str, term: str, init: str = "CAST(0 AS DOUBLE)") -> str:
    """Left-fold of ``term`` (a function of index d, 1-based) over 1..DIM."""
    if dialect == "spark":
        return f"aggregate(sequence(1, {DIM}), {init}, (acc, d) -> acc + ({term}))"
    return (
        f"list_reduce(list_prepend({init}, "
        f"list_transform(range(1, {DIM} + 1), d -> ({term}))), (a, b) -> a + b)"
    )


def _elem(dialect: str, col: str) -> str:
    return f"CAST(element_at({col}, d) AS DOUBLE)" if dialect == "spark" else f"CAST({col}[d] AS DOUBLE)"


def _dot(dialect: str, a: str, b: str) -> str:
    return _fold(dialect, f"{_elem(dialect, a)} * {_elem(dialect, b)}")


def _cos(dialect: str, a: str, b: str) -> str:
    return (
        f"{_dot(dialect, a, b)} / "
        f"(sqrt({_dot(dialect, a, a)}) * sqrt({_dot(dialect, b, b)}))"
    )



def _exact_topk_sql() -> str:
    """The exact-cosine top-k SQL — ext_sim_search's oracle AND the
    ground-truth CTE body inside ext_ann_eval's, from ONE definition
    so the recall baseline can never drift from the declared-exact
    query it measures against."""
    return f"""
      SELECT e.vec_id, {_cos("duck", "e.embedding", "q.qe")} AS cos_sim
      FROM embeddings e CROSS JOIN
           (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
      WHERE e.vec_id <> {QUERY_VEC_ID}
      ORDER BY cos_sim DESC, e.vec_id ASC
      LIMIT {TOP_K}
    """


@query(
    "ext_sim_search",
    oracle=_exact_topk_sql(),
    operator="ext_sim_search",
    doc="Brute-force cosine top-k vs a fixed query vector; broadcast "
    "single-row join + TakeOrderedAndProject.",
)
def ext_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.expr(_cos("spark", "embedding", "qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _plane_weight(j: int, d: int) -> int:
    """md5-derived integer hyperplane weight w(j, d) in [-32768, 32767].

    Computed once in Python (hashlib.md5 == both engines' md5) and
    inlined as literals, so neither engine hashes per row — the sig
    is a pure arithmetic expression inside whole-stage codegen.
    """
    import hashlib

    return int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:4], 16) - 32768


def _elem_at(dialect: str, col: str, d: int) -> str:
    return (
        f"CAST(element_at({col}, {d}) AS DOUBLE)"
        if dialect == "spark"
        else f"CAST({col}[{d}] AS DOUBLE)"
    )


def _sig_expr(dialect: str, col: str, n_planes: int = N_PLANES) -> str:
    """LSH signature: bit j set iff dot(plane_j, embedding) > 0.

    Each dot is an explicit left-associated 64-term sum (same
    evaluation order in both engines → bit-identical doubles).
    """
    bits = []
    for j in range(n_planes):
        dot = " + ".join(
            f"{_plane_weight(j, d)} * {_elem_at(dialect, col, d)}" for d in range(1, DIM + 1)
        )
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS INT)"


@query(
    "ext_dedup_embed",
    oracle=f"""
    WITH s0 AS (
      SELECT vec_id, embedding, {_sig_expr("duck", "embedding")} AS sig,
             sqrt({_dot("duck", "embedding", "embedding")}) AS norm
      FROM embeddings
    ), s AS (
      -- skew guard: degenerate sign-buckets (> MAX_BUCKET_VECS) dropped
      SELECT vec_id, embedding, sig, norm
      FROM (SELECT *, count(*) OVER (PARTITION BY sig) AS bucket_n FROM s0)
      WHERE bucket_n <= {MAX_BUCKET_VECS}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_dot("duck", "a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim
    FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE {_dot("duck", "a.embedding", "b.embedding")} / (a.norm * b.norm) >= {COS_T}
    """,
    operator="ext_dedup_near (embedding cosine)",
    doc="Embedding near-dup pairs: sign-LSH bucket join (8 md5-derived "
    "hyperplanes) then exact cosine ≥ threshold inside buckets. Norms "
    "are computed once per vector on the build side of the shuffle "
    "(the exchange materializes them), so each candidate pair costs "
    "one dot product, not three. Buckets over MAX_BUCKET_VECS are "
    "pruned pre-join (skew guard — see dedup.MAX_BUCKET_DOCS).",
)
def ext_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    s = e.select(
        "vec_id",
        "embedding",
        F.expr(_sig_expr("spark", "embedding")).alias("sig"),
        F.expr(f"sqrt({_dot('spark', 'embedding', 'embedding')})").alias("norm"),
    )
    s = (
        s.withColumn("bucket_n", F.count("*").over(Window.partitionBy("sig")))
        .filter(F.col("bucket_n") <= MAX_BUCKET_VECS)
        .drop("bucket_n")
    )
    a, b = s.alias("a"), s.alias("b")
    cos = F.expr(
        f"{_dot('spark', 'a.embedding', 'b.embedding')} / (a.norm * b.norm)"
    )
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COS_T)
    )


N_CELLS = 16  # IVF coarse-quantizer cells
N_PROBE = 2  # cells probed per query


def _ivf_weight(i: int, d: int) -> int:
    """md5-derived integer centroid component c(i, d) in [-32768, 32767].

    Like the LSH hyperplanes above: computed once in Python and
    inlined as literals, so the quantizer is a compile-time constant —
    the IVF index is \"built once\" by construction, never refit per
    query (the round-1 KMeans version refit on every invocation, a
    scale anti-pattern, and was un-oracle-able)."""
    import hashlib

    return int(hashlib.md5(f"ivf_{i}_{d}".encode()).hexdigest()[:4], 16) - 32768


def _cell_scores(dialect: str, col: str) -> list[str]:
    """Per-cell L2 proxy scores against the NORM-NORMALIZED centroids
    c_i/|c_i|: argmin_i |e - c_i/|c_i||^2 == argmin_i -(c_i.e)/|c_i|
    (|e|^2 and the unit 1 are constant per row and drop out).

    Normalization is load-bearing, not cosmetic: the raw md5 centroids
    have |c_i|^2 ~ 2.3e10 with a spread that dwarfs the +-1e4 dot term
    against unit-norm embeddings, so the un-normalized argmin
    (|c_i|^2 - 2 c_i.e) is decided almost entirely by |c_i|^2 — every
    vector lands in the minimum-norm cell and the IVF partition prune
    reads 100% of the corpus (measured: 500/500 vectors in one cell).
    Dividing by the Python-computed |c_i| literal (same shortest-
    round-trip decimal parsed to the same IEEE double by both
    engines) makes the assignment direction-driven and the cells
    balanced. Each dot is an explicit left-to-right 64-term sum, so
    both engines produce bit-identical doubles."""
    scores = []
    for i in range(N_CELLS):
        import math

        norm = math.sqrt(sum(_ivf_weight(i, d) ** 2 for d in range(1, DIM + 1)))
        dot = " + ".join(
            f"{_ivf_weight(i, d)} * {_elem_at(dialect, col, d)}" for d in range(1, DIM + 1)
        )
        scores.append(f"(-({dot}) / {norm!r})")
    return scores


def _cell_expr(dialect: str, col: str) -> str:
    """Nearest-centroid cell id (0-based; first-minimum tie-break is
    deterministic because the scores themselves are bit-identical).

    The 16×64-term scores array is let-bound so it is evaluated ONCE
    per row — inlining it into both array_position and array_min
    doubles the dominant cost (measured 4× slower end-to-end)."""
    arr = ", ".join(_cell_scores(dialect, col))
    if dialect == "spark":
        from lapidus_spark.functions.exprs import let_

        return f"CAST({let_(f'array({arr})', 'sc', 'array_position(sc, array_min(sc)) - 1')} AS INT)"
    return f"CAST(list_position([{arr}], list_aggregate([{arr}], 'min')) - 1 AS INT)"


def _scores_arr(dialect: str, col: str) -> str:
    arr = ", ".join(_cell_scores(dialect, col))
    return f"array({arr})" if dialect == "spark" else f"[{arr}]"


def _centroid_df(spark: SparkSession):
    """The 16 unit-normalization-ready centroids as a 16-row DataFrame
    (cell, w: array<double>, cnorm: double).

    Centroids as DATA, not as inlined literals: the literal
    16×64-term score expression generates ~200 KB of Java per
    operator, which blows Janino's 64 KB method limit — every task
    then pays a FAILED whole-stage compilation and falls back to the
    interpreted path (measured: seconds of per-query overhead on a
    2000-row fixture, all compile). A broadcast 16-row join with a
    fold over the centroid array keeps plans small and constant-size,
    and is the only shape that survives a real codebook (a 65536-
    centroid IVF can't be a literal). The weights and norms are the
    SAME Python values the literal/_cell_scores form inlines, and the
    fold multiplies/accumulates in the same left-to-right order, so
    cell assignments and scores stay bit-identical to the DuckDB
    oracle's literal expression."""
    import math

    rows = []
    for i in range(N_CELLS):
        w = [float(_ivf_weight(i, d)) for d in range(1, DIM + 1)]
        cnorm = math.sqrt(sum(_ivf_weight(i, d) ** 2 for d in range(1, DIM + 1)))
        rows.append((i, w, cnorm))
    return spark.createDataFrame(rows, "cell INT, w ARRAY<DOUBLE>, cnorm DOUBLE")


#: fold for the centroid-table dot: identical order to _dot's literal
#: fold (0.0-prefixed, d = 1..DIM), with the int weight arriving as an
#: exactly-representable double — same IEEE products, same sum.
_CENT_SCORE = (
    f"-(aggregate(sequence(1, {DIM}), CAST(0 AS DOUBLE), "
    f"(acc, d) -> acc + element_at(w, d) * CAST(element_at(embedding, d) AS DOUBLE))) "
    f"/ cnorm"
)


def assign_cells(spark: SparkSession, e: DataFrame) -> DataFrame:
    """Nearest-centroid assignment via the broadcast centroid table:
    (vec_id, cell, mn) where mn is the winning score -(c.e)/|c|.
    One broadcast join (16× row multiplication carrying only
    vec_id/score/cell — never the embedding) + one vec_id-keyed agg;
    ties break to the lowest cell via the struct ordering, matching
    the oracle's first-minimum list_position."""
    cent = _centroid_df(spark)
    scored = e.join(F.broadcast(cent)).select(
        "vec_id", F.expr(_CENT_SCORE).alias("score"), "cell"
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("score", "cell")).alias("m"))
        .select("vec_id", F.col("m.cell").alias("cell"), F.col("m.score").alias("mn"))
    )


#: IVF index dirs built per (process, sf_dir) — the index is ingest-
#: time work (build once, probe many), so repeated queries and the
#: bench measure the PROBE, not the build.
_IVF_INDEX_DIRS: dict[str, str] = {}


def build_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the IVF index: the corpus
    with its nearest-cell assignment, written as parquet partitioned
    BY cell. At 100 TB this is the ingest-time layout — cell id as the
    physical partition key — and a probe touches only n_probe/k of the
    files. bench.py pre-builds it like the streaming replay dirs."""
    if sf_dir in _IVF_INDEX_DIRS:
        return _IVF_INDEX_DIRS[sf_dir]
    import tempfile

    path = tempfile.mkdtemp(prefix="lapidus_ivf_")
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    (
        e.join(assign_cells(spark, e).drop("mn"), "vec_id")
        .select("vec_id", "embedding", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    _IVF_INDEX_DIRS[sf_dir] = path
    return path


def _ivf_probe_cells(qe) -> list[int]:
    """The query's n_probe nearest IVF cells, computed driver-side
    with the SAME left-to-right IEEE-double fold the SQL quantizer
    uses (int weight × double element, then −dot/|c| against the
    norm-normalized centroids — see _cell_scores), so every bit
    matches the engines' arithmetic. <= keeps score ties, same as
    the oracle's predicate. Shared by the raw-IVF and IVF-PQ
    probes."""
    import math

    qscores = []
    for i in range(N_CELLS):
        norm = math.sqrt(sum(_ivf_weight(i, d) ** 2 for d in range(1, DIM + 1)))
        dot = 0.0
        for d in range(1, DIM + 1):
            dot = dot + _ivf_weight(i, d) * float(qe[d - 1])
        qscores.append(-dot / norm)
    thr = sorted(qscores)[N_PROBE - 1]
    return [c for c, s in enumerate(qscores) if s <= thr]


def ivf_candidates(
    spark: SparkSession, sf_dir: str, k: int, idx_path: str | None = None
) -> DataFrame:
    """Top-``k`` exact-cosine candidates from the probed IVF cells —
    the dense-recall stage shared by ext_ann_ivf (k = TOP_K) and
    ext_retrieve_rerank (k = RERANK_CANDIDATES): one extracted
    implementation so the frozen probe arithmetic can never diverge
    between the two queries.

    Query-side index metadata is fetched driver-side (one pushed-
    filter scan of one row). The cell scores are computed in Python
    with the SAME left-to-right IEEE-double fold the SQL quantizer
    uses (int weight × double element, then −dot/|c| against the
    norm-normalized centroids — see _cell_scores), so every bit
    matches the engines' arithmetic — and the 16×64-term score
    expression never enters this query's plan (it would dominate the
    probe via codegen compilation; it belongs to the index build)."""
    if idx_path is None:
        idx_path = build_ivf_index(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    qrow = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    cells = _ivf_probe_cells(qrow.embedding)
    qe = F.array(*[F.lit(float(v)) for v in qrow.embedding])
    # literal cell IN (...) on the partition column → static partition
    # pruning: the scan reads only the probed cells' files
    return (
        spark.read.parquet(idx_path)
        .filter(F.col("cell").isin(cells))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("qe", qe)
        .select("vec_id", F.expr(_cos("spark", "embedding", "qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )



@query(
    "ext_ann_ivf",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding, {_cell_expr("duck", "embedding")} AS cell
      FROM embeddings
    ), q AS (
      SELECT embedding AS qe,
             {_scores_arr("duck", "embedding")} AS qscores
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT s.vec_id, {_cos("duck", "s.embedding", "q.qe")} AS cos_sim
    FROM s CROSS JOIN q
    WHERE q.qscores[s.cell + 1] <= list_sort(q.qscores)[{N_PROBE}]
      AND s.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, s.vec_id ASC
    LIMIT {TOP_K}
    """,
    operator="ext_sim_search (ANN/IVF scale path)",
    doc="IVF ANN with a deterministic coarse quantizer: 16 md5-derived "
    "integer centroids (compile-time literals — never refit), corpus "
    "persisted as parquet PARTITIONED BY nearest cell (build_ivf_index, "
    "ingest-time work cached per process), query probes its n_probe=2 "
    "nearest cells via a broadcast join on the partition column — "
    "dynamic partition pruning reads only those cells' files — and "
    "exact-cosine re-ranks the survivors. The IVF analog of "
    "ext_ann_lsh's bucket join.",
)
def ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_candidates(spark, sf_dir, TOP_K)


#: arrivals cohort for the incremental index: vec_id % 5 == 0 (20% of
#: the corpus) — the same arrivals-vs-standing-corpus split
#: ext_dedup_incremental uses on documents.
ANN_ARRIVAL_MOD = 5

#: incrementally-maintained IVF index dirs per (process, sf_dir)
_IVF_INCR_DIRS: dict[str, str] = {}


def build_ivf_incremental_index(spark: SparkSession, sf_dir: str) -> str:
    """IVF index maintained INCREMENTALLY: the standing corpus
    (vec_id % 5 != 0) is built once as cell-partitioned parquet,
    then an arrival batch is assigned to its cells through the SAME
    frozen broadcast-centroid quantizer (never refit — that is what
    makes append sound: an arrival's cell equals the cell a full
    rebuild would give it) and APPENDED as new files inside the
    existing cell=K directories. No standing-corpus file is rewritten
    — at 100 TB an arrival batch costs O(batch), not O(corpus), and
    probes keep their partition pruning because the layout key is
    unchanged. The append-only posture of ext_dedup_incremental's
    fingerprint index, applied to the ANN index."""
    if sf_dir in _IVF_INCR_DIRS:
        return _IVF_INCR_DIRS[sf_dir]
    import tempfile

    path = tempfile.mkdtemp(prefix="lapidus_ivf_incr_")
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    base = e.filter(F.col("vec_id") % ANN_ARRIVAL_MOD != 0)
    (
        base.join(assign_cells(spark, base).drop("mn"), "vec_id")
        .select("vec_id", "embedding", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    arrivals = e.filter(F.col("vec_id") % ANN_ARRIVAL_MOD == 0)
    append_to_ivf_index(spark, arrivals, path)
    _IVF_INCR_DIRS[sf_dir] = path
    return path


def append_to_ivf_index(spark: SparkSession, arrivals: DataFrame, path: str) -> None:
    """The per-batch maintenance step: cell-assign ``arrivals``
    through the frozen quantizer and append them as NEW files inside
    the existing cell=K dirs (parquet append never rewrites existing
    files — tests/test_scale.py pins that contract by mtime/size)."""
    (
        arrivals.join(assign_cells(spark, arrivals).drop("mn"), "vec_id")
        .select("vec_id", "embedding", "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(path)
    )


@query(
    "ext_ann_incremental",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding, {_cell_expr("duck", "embedding")} AS cell
      FROM embeddings
    ), q AS (
      SELECT embedding AS qe,
             {_scores_arr("duck", "embedding")} AS qscores
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT s.vec_id, {_cos("duck", "s.embedding", "q.qe")} AS cos_sim,
           s.vec_id % {ANN_ARRIVAL_MOD} = 0 AS is_arrival
    FROM s CROSS JOIN q
    WHERE q.qscores[s.cell + 1] <= list_sort(q.qscores)[{N_PROBE}]
      AND s.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, s.vec_id ASC
    LIMIT {TOP_K}
    """,
    operator="ext_sim_search (incremental ANN index maintenance)",
    doc="Incremental ANN index maintenance (VERDICT r7 #6): the IVF "
    "index is built from the standing corpus only, then an arrival "
    "batch (vec_id % 5 == 0) is cell-assigned through the frozen "
    "broadcast-centroid quantizer and APPENDED as new files inside "
    "the existing cell=K partition dirs — no rebuild, no rewrite of "
    "standing files (asserted by tests/test_scale.py). The probe "
    "then runs against the incrementally-maintained index and must "
    "equal a from-scratch full-corpus index probe exactly — which is "
    "what the oracle computes — because the frozen quantizer gives "
    "every vector the same cell either way. is_arrival marks top-k "
    "hits contributed by the appended batch, proving the probe reads "
    "both file generations through one pruned scan.",
)
def ext_ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = build_ivf_incremental_index(spark, sf_dir)
    return ivf_candidates(spark, sf_dir, TOP_K, idx_path=idx).withColumn(
        "is_arrival", (F.col("vec_id") % ANN_ARRIVAL_MOD == 0).alias("is_arrival")
    )


#: multi-probe masks: the query's own bucket plus every bucket at
#: Hamming distance 1 — the standard recall/latency knob (probes
#: (ANN_PLANES+1)/2^ANN_PLANES of the corpus instead of 1/2^ANN_PLANES).
_PROBE_MASKS = [0] + [1 << j for j in range(ANN_PLANES)]


@query(
    "ext_ann_lsh",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding,
             {_sig_expr("duck", "embedding", ANN_PLANES)} AS sig
      FROM embeddings
    ), q AS (
      SELECT embedding AS qe, sig AS qsig FROM s WHERE vec_id = {QUERY_VEC_ID}
    ), p AS (
      SELECT qe, unnest([{", ".join(f"xor(qsig, {m})" for m in _PROBE_MASKS)}]) AS psig
      FROM q
    )
    SELECT s.vec_id, {_cos("duck", "s.embedding", "p.qe")} AS cos_sim
    FROM s JOIN p ON s.sig = p.psig
    WHERE s.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, s.vec_id ASC
    LIMIT {TOP_K}
    """,
    operator="ext_sim_search (ANN/LSH scale path)",
    doc="Approximate top-k via MULTI-PROBE LSH: probe the query's "
    "bucket plus its Hamming-1 neighbor buckets (the planes the "
    "query was closest to flipping) instead of scanning the corpus. "
    "The probe list is still an equi-join key — the 100 TB plan "
    "stays partition-pruned, and recall/latency tunes by probe "
    "count, the standard multi-probe trade.",
)
def ext_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    s = e.select(
        "vec_id", "embedding", F.expr(_sig_expr("spark", "embedding", ANN_PLANES)).alias("sig")
    )
    probes = (
        s.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(
            F.col("embedding").alias("qe"),
            F.explode(
                F.array(*[F.expr(f"sig ^ {m}") for m in _PROBE_MASKS])
            ).alias("psig"),
        )
    )
    return (
        s.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), F.col("sig") == F.col("psig"))
        .select("vec_id", F.expr(_cos("spark", "embedding", "qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


#: fixed-point scale for exact centroid aggregation: float32 values
#: scaled by 2^20 are exact in double (power-of-two scaling preserves
#: the 24-bit mantissa), floor is unambiguous in both engines, and the
#: BIGINT sums are associative — the whole mean is order-independent
#: and bit-identical under any partitioning.
CENTROID_SCALE = 1 << 20


@query(
    "ext_embed_centroid",
    oracle=f"""
    WITH x AS (
      SELECT label, embedding, unnest(range(1, {DIM} + 1)) AS dim
      FROM embeddings
    ), q AS (
      SELECT label, dim,
             CAST(floor(CAST(embedding[dim] AS DOUBLE) * {CENTROID_SCALE})
                  AS BIGINT) AS qv
      FROM x
    ), s AS (
      SELECT label, dim, sum(qv) AS sq, count(*) AS n
      FROM q GROUP BY label, dim
    ), m AS (
      -- floor division via the pmod identity: DuckDB's // floors but
      -- Spark's div truncates, so both sides compute the remainder-
      -- corrected form, which is an exact division (identical
      -- everywhere, negatives included)
      SELECT label, dim, n,
             (sq - (((sq % n) + n) % n)) // n AS mq
      FROM s
    )
    SELECT label,
           max(n) AS n_vecs,
           string_agg(CAST(mq AS VARCHAR), '|' ORDER BY dim) AS centroid_q
    FROM m GROUP BY label
    """,
    operator="ext_sim (per-class embedding centroid)",
    doc=f"Per-label mean embedding via exact fixed-point aggregation: "
    f"each float32 component is scaled by 2^20 (exact in double — "
    "power-of-two scaling preserves the 24-bit mantissa) and floored "
    "to BIGINT, summed associatively per (label, dim) — one shuffle "
    "whose key space is labels × dims, never a vector in flight — "
    "then floor-divided by the class size and reassembled in dim "
    "order (pipe-joined fixed-point, scale 2^20). The class-"
    "prototype computation behind dataset balancing, centroid init "
    "for IVF/k-means, and embedding-drift monitoring; order-"
    "independent, so bit-identical on any cluster layout.",
)
def ext_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    q = e.select(
        "label",
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * CENTROID_SCALE).cast("bigint").alias("qv"),
    )
    s = q.groupBy("label", "dim").agg(
        F.sum("qv").alias("sq"), F.count("*").alias("n")
    )
    m = s.withColumn("mq", F.expr("(sq - (((sq % n) + n) % n)) div n"))
    return (
        m.groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.array_sort(F.collect_list(F.struct("dim", "mq"))).alias("st"),
        )
        .select(
            "label",
            "n_vecs",
            F.array_join(F.expr("transform(st, x -> CAST(x.mq AS STRING))"), "|").alias(
                "centroid_q"
            ),
        )
    )


@query(
    "ext_dedup_crossmodal",
    # oracle composes the registered embedding-pair oracle as a CTE —
    # single source of truth for the candidate semantics
    oracle=None,  # bound right after definition (needs the registry entry)
    operator="ext_dedup_near (cross-modal confirmation)",
    doc="Embedding near-dup candidates CONFIRMED lexically: each "
    "sign-LSH cosine pair is joined to both documents' token sets "
    "and re-scored with exact Jaccard — the production two-signal "
    "dedup shape (ANN recall, lexical precision) that cuts "
    "embedding-space false positives before anything is dropped. "
    "The pair set is tiny relative to the corpus, so the text join "
    "is two broadcast-friendly equi-joins on doc id; both scores "
    "travel with the pair for audit.",
)
def ext_dedup_crossmodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lapidus_spark.functions.dedup import JACCARD_T

    pairs = ext_dedup_embed(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    ts = d.select(
        "doc_id", F.expr("array_distinct(split(lower(text), ' '))").alias("ts")
    )
    ta = ts.select(F.col("doc_id").alias("vec_a"), F.col("ts").alias("ts_a"))
    tb = ts.select(F.col("doc_id").alias("vec_b"), F.col("ts").alias("ts_b"))
    joined = pairs.join(ta, "vec_a").join(tb, "vec_b")
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = inter.cast("double") / (F.size("ts_a") + F.size("ts_b") - inter)
    return joined.select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        "cos_sim",
        jac.alias("jaccard"),
        (jac >= JACCARD_T).cast("bigint").alias("lexical_confirmed"),
    )


def _bind_crossmodal_oracle() -> None:
    from lapidus_spark.functions.dedup import JACCARD_T
    from lapidus_spark.plans.registry import REGISTRY

    embed_oracle = REGISTRY["ext_dedup_embed"].oracle
    REGISTRY["ext_dedup_crossmodal"].oracle = f"""
    WITH pairs AS ({embed_oracle}),
    toks AS (
      SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ts
      FROM documents
    )
    SELECT p.vec_a AS doc_a, p.vec_b AS doc_b, p.cos_sim,
           CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
             / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS jaccard,
           CAST(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
             / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
             >= {JACCARD_T} AS BIGINT) AS lexical_confirmed
    FROM pairs p
    JOIN toks a ON a.doc_id = p.vec_a
    JOIN toks b ON b.doc_id = p.vec_b
    """


_bind_crossmodal_oracle()


#: fixed-point scale for the quantized inertia metric — coarser than
#: CENTROID_SCALE because the squared-distance magnitudes are ~DIM×
#: larger than single components.
INERTIA_SCALE = 1 << 10


def _sqdist_expr(dialect: str, col: str) -> str:
    """Exact squared L2 distance to the NEAREST unit-normalized
    centroid: the cell scores are -(c_i.e)/|c_i| = -(chat_i.e), so
    |e - chat_i|^2 = |e|^2 + 2*min_score + 1. Every term is a
    bit-identical double on both engines (literal-centroid dots + an
    explicit left-fold self-dot), so the sum is too."""
    arr = _scores_arr(dialect, col)
    self_dot = _dot(dialect, col, col)
    if dialect == "spark":
        from lapidus_spark.functions.exprs import let_

        return let_(arr, "sc", f"({self_dot}) + 2.0 * array_min(sc) + 1.0")
    return f"({self_dot}) + 2.0 * list_aggregate({arr}, 'min') + 1.0"


@query(
    "ext_kmeans_step",
    oracle=f"""
    WITH a AS (
      SELECT vec_id, embedding,
             {_cell_expr("duck", "embedding")} AS cell,
             CAST(floor(({_sqdist_expr("duck", "embedding")}) * {INERTIA_SCALE})
                  AS BIGINT) AS dq
      FROM embeddings
    ), x AS (
      SELECT cell, dq, embedding, unnest(range(1, {DIM} + 1)) AS dim
      FROM a
    ), q AS (
      SELECT cell, dim,
             CAST(floor(CAST(embedding[dim] AS DOUBLE) * {CENTROID_SCALE})
                  AS BIGINT) AS qv,
             dq
      FROM x
    ), s AS (
      SELECT cell, dim, sum(qv) AS sq, count(*) AS n,
             CAST(sum(dq) AS BIGINT) AS sdq
      FROM q GROUP BY cell, dim
    ), m AS (
      SELECT cell, dim, n, sdq,
             (sq - (((sq % n) + n) % n)) // n AS mq
      FROM s
    )
    SELECT cell,
           max(n) AS n_vecs,
           -- sdq is identical across dims of a cell; max picks it once
           max(sdq) AS inertia_q,
           string_agg(CAST(mq AS VARCHAR), '|' ORDER BY dim) AS centroid_q
    FROM m GROUP BY cell
    """,
    operator="ext_sim (k-means Lloyd step over the IVF quantizer)",
    doc="One exact Lloyd iteration of k-means over the embedding "
    "corpus: assign every vector to its nearest static centroid (the "
    "16 md5-derived integer IVF centroids — k-means init is exactly "
    "what the IVF coarse quantizer is), then recompute each cell's "
    "centroid as the exact fixed-point mean (2^20 scaling, the "
    "ext_embed_centroid identity) and the cell's quantized inertia "
    "sum(floor(d^2 * 2^10)). Assignment and distance are zero-shuffle "
    "codegen arithmetic; the update is ONE shuffle keyed (cell, dim) "
    "— never a vector in flight — so the step is order-independent "
    "and bit-identical on any cluster layout. Iterating = re-running "
    "with the emitted centroids as the next round's literals; the "
    "refit loop that k-means needs is driver-side plan construction, "
    "each iteration one exchange over k×DIM keys.",
)
def ext_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    # assignment via the broadcast centroid table (see _centroid_df:
    # the literal-expression form blew the 64 KB codegen limit and ran
    # interpreted — measured 9.5 s → ~1 s at sf0.1), then the winning
    # (cell, mn) rejoins the embedding on vec_id for the update pass
    best = assign_cells(spark, e)
    rows = e.select(
        "vec_id",
        "embedding",
        F.expr(_dot("spark", "embedding", "embedding")).alias("sd"),
    ).join(best, "vec_id")
    a = rows.select(
        "cell",
        F.floor((F.col("sd") + 2.0 * F.col("mn") + 1.0) * INERTIA_SCALE)
        .cast("bigint")
        .alias("dq"),
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "cell",
        "dq",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * CENTROID_SCALE).cast("bigint").alias("qv"),
    )
    s = a.groupBy("cell", "dim").agg(
        F.sum("qv").alias("sq"), F.count("*").alias("n"), F.sum("dq").alias("sdq")
    )
    m = s.withColumn("mq", F.expr("(sq - (((sq % n) + n) % n)) div n"))
    return (
        m.groupBy("cell")
        .agg(
            F.max("n").alias("n_vecs"),
            F.max("sdq").alias("inertia_q"),
            F.array_sort(F.collect_list(F.struct("dim", "mq"))).alias("st"),
        )
        .select(
            "cell",
            "n_vecs",
            "inertia_q",
            F.array_join(F.expr("transform(st, x -> CAST(x.mq AS STRING))"), "|").alias(
                "centroid_q"
            ),
        )
    )


#: SemDeDup cosine threshold — the fixture's near-orthogonal vectors
#: make COS_T (0.4) the interesting band, same as ext_dedup_embed.
SEMDEDUP_T = COS_T


@query(
    "ext_semdedup",
    oracle=f"""
    WITH s0 AS (
      SELECT vec_id, embedding,
             {_cell_expr("duck", "embedding")} AS cell,
             sqrt({_dot("duck", "embedding", "embedding")}) AS norm
      FROM embeddings
    ), s AS (
      SELECT vec_id, embedding, cell, norm
      FROM (SELECT *, count(*) OVER (PARTITION BY cell) AS cn FROM s0)
      WHERE cn <= {MAX_BUCKET_VECS}
    ), dropped AS (
      SELECT DISTINCT b.cell, b.vec_id
      FROM s a JOIN s b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_dot("duck", "a.embedding", "b.embedding")} / (a.norm * b.norm)
            >= {SEMDEDUP_T}
    ), per_cell AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs FROM s GROUP BY cell
    ), drop_agg AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_dropped,
             string_agg(CAST(vec_id AS VARCHAR), '|' ORDER BY vec_id) AS dropped_ids
      FROM dropped GROUP BY cell
    )
    SELECT p.cell, p.n_vecs,
           COALESCE(d.n_dropped, 0) AS n_dropped,
           p.n_vecs - COALESCE(d.n_dropped, 0) AS n_kept,
           COALESCE(d.dropped_ids, '') AS dropped_ids
    FROM per_cell p LEFT JOIN drop_agg d ON p.cell = d.cell
    """,
    operator="ext_dedup_near (SemDeDup: cluster-blocked semantic dedup)",
    doc="SemDeDup (Abbas et al. 2023): cluster the embedding space "
    "(nearest static centroid — the same deterministic quantizer as "
    "ext_kmeans_step/ext_ann_ivf), then compare pairs ONLY within a "
    "cluster and drop every vector that has a lower-id neighbor at "
    "cosine >= t. Complement to ext_dedup_embed's sign-LSH blocking: "
    "LSH buckets bound recall by hash collision, k-means cells bound "
    "it by the quantizer — the published trade for semantic (not "
    "near-exact) dedup at corpus scale. The pair join is per-cell "
    "(cells are size-bounded by construction, K scales with N; the "
    "MAX_BUCKET_VECS guard backstops a degenerate quantizer), the "
    "keep rule is the deterministic lowest-id representative, and "
    "the per-cell report carries the dropped ids for audit.",
)
def ext_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # read the cell-partitioned IVF index (ingest-time artifact, the
    # same build-once-probe-many rule as ext_ann_ivf — SemDeDup's
    # cluster assignment IS the IVF coarse quantizer's) instead of
    # recomputing assignment on both sides of the self-join
    idx = spark.read.parquet(build_ivf_index(spark, sf_dir))
    s = idx.select(
        "vec_id",
        "embedding",
        "cell",
        F.expr(f"sqrt({_dot('spark', 'embedding', 'embedding')})").alias("norm"),
    )
    s = (
        s.withColumn("cn", F.count("*").over(Window.partitionBy("cell")))
        .filter(F.col("cn") <= MAX_BUCKET_VECS)
        .drop("cn")
    )
    a, b = s.alias("a"), s.alias("b")
    cos = F.expr(f"{_dot('spark', 'a.embedding', 'b.embedding')} / (a.norm * b.norm)")
    dropped = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(cos >= SEMDEDUP_T)
        .select(F.col("b.cell").alias("cell"), F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    per_cell = s.groupBy("cell").agg(F.count("*").cast("bigint").alias("n_vecs"))
    drop_agg = dropped.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n_dropped"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(vec_id)), x -> CAST(x AS STRING))"),
            "|",
        ).alias("dropped_ids"),
    )
    return per_cell.join(drop_agg, "cell", "left").select(
        "cell",
        "n_vecs",
        F.coalesce("n_dropped", F.lit(0).cast("bigint")).alias("n_dropped"),
        (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0).cast("bigint"))).alias("n_kept"),
        F.coalesce("dropped_ids", F.lit("")).alias("dropped_ids"),
    )


def _fold2(dialect: str, wq: str, emb: str) -> str:
    """Fold for the ITERATION-2 dot against a computed fixed-point
    centroid array (BIGINT components): same 0.0-prefixed left order
    as every other dot; the integer component converts to double
    exactly (|mq| << 2^53), so both engines produce identical bits."""
    if dialect == "spark":
        return (
            f"aggregate(sequence(1, {DIM}), CAST(0 AS DOUBLE), "
            f"(acc, d) -> acc + element_at({wq}, d) * CAST(element_at({emb}, d) AS DOUBLE))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {DIM} + 1), "
        f"d -> {wq}[d] * CAST({emb}[d] AS DOUBLE))), (a, b) -> a + b)"
    )


@query(
    "ext_kmeans_iter2",
    oracle=f"""
    WITH a1 AS (
      SELECT vec_id, embedding, {_cell_expr("duck", "embedding")} AS cell
      FROM embeddings
    ), x1 AS (
      SELECT cell, embedding, unnest(range(1, {DIM} + 1)) AS dim FROM a1
    ), q1 AS (
      SELECT cell, dim,
             CAST(floor(CAST(embedding[dim] AS DOUBLE) * {CENTROID_SCALE})
                  AS BIGINT) AS qv
      FROM x1
    ), s1 AS (
      SELECT cell, dim, sum(qv) AS sq, count(*) AS n FROM q1 GROUP BY cell, dim
    ), m1 AS (
      SELECT cell, dim, (sq - (((sq % n) + n) % n)) // n AS mq FROM s1
    ), c1 AS (
      SELECT cell, list(mq ORDER BY dim) AS wq,
             CAST(sum(mq * mq) AS BIGINT) AS norm2
      FROM m1 GROUP BY cell
    ), sc2 AS (
      SELECT e.vec_id, c1.cell,
             -({_fold2("duck", "wq", "e.embedding")}) / sqrt(CAST(norm2 AS DOUBLE))
               AS score
      FROM embeddings e CROSS JOIN c1
    ), b2 AS (
      SELECT vec_id, min(struct_pack(s := score, c := cell)) AS m
      FROM sc2 GROUP BY vec_id
    ), mv AS (
      SELECT a1.vec_id, (b.m).c AS cell2, (b.m).s AS mn2,
             CASE WHEN a1.cell <> (b.m).c THEN 1 ELSE 0 END AS moved
      FROM a1 JOIN b2 b ON a1.vec_id = b.vec_id
    ), dq AS (
      SELECT mv.vec_id, mv.cell2, mv.moved, e.embedding,
             CAST(floor(({_dot("duck", "e.embedding", "e.embedding")}
                         + 2.0 * mv.mn2 + 1.0) * {INERTIA_SCALE}) AS BIGINT) AS dq2
      FROM mv JOIN embeddings e ON mv.vec_id = e.vec_id
    ), x2 AS (
      SELECT cell2 AS cell, dq2, moved, embedding,
             unnest(range(1, {DIM} + 1)) AS dim
      FROM dq
    ), q2 AS (
      SELECT cell, dim, dq2, moved,
             CAST(floor(CAST(embedding[dim] AS DOUBLE) * {CENTROID_SCALE})
                  AS BIGINT) AS qv
      FROM x2
    ), s2 AS (
      SELECT cell, dim, sum(qv) AS sq, count(*) AS n,
             CAST(sum(dq2) AS BIGINT) AS sdq,
             CAST(sum(moved) AS BIGINT) AS smv
      FROM q2 GROUP BY cell, dim
    ), m2 AS (
      SELECT cell, dim, n, sdq, smv,
             (sq - (((sq % n) + n) % n)) // n AS mq
      FROM s2
    )
    SELECT cell,
           max(n) AS n_vecs,
           max(smv) AS n_moved,
           max(sdq) AS inertia2_q,
           string_agg(CAST(mq AS VARCHAR), '|' ORDER BY dim) AS centroid2_q
    FROM m2 GROUP BY cell
    """,
    operator="ext_sim (k-means: full two-iteration Lloyd loop)",
    doc="The complete Lloyd refinement loop, two iterations end to "
    "end: assign to the static seed centroids, recompute exact "
    "fixed-point centroids, then REASSIGN every vector to its "
    "nearest COMPUTED centroid and emit the second-generation "
    "centroids, per-cell movement counts, and quantized inertia "
    "(distance to the unit-normalized winning centroid, the same "
    "metric as ext_kmeans_step — comparable across iterations). "
    "Iteration-2 centroids are pure DATA flowing through the plan: "
    "a k-row aggregate joined back via broadcast — no driver "
    "collect, no literal refit, no recompilation; k more iterations "
    "are k more copies of the same two-exchange stage. Everything "
    "stays in exact integer fixed point or pinned-order folds, so "
    "the whole two-step trajectory is bit-identical on any cluster "
    "layout — the property that makes a distributed k-means run "
    "reproducible at all.",
)
def ext_kmeans_iter2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    best1 = assign_cells(spark, e).drop("mn")
    # iteration-1 centroids, fixed point (the ext_kmeans_step update)
    q1 = (
        e.join(best1, "vec_id")
        .select("cell", F.posexplode("embedding").alias("dim0", "val"))
        .select(
            "cell",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("val").cast("double") * CENTROID_SCALE).cast("bigint").alias("qv"),
        )
    )
    m1 = (
        q1.groupBy("cell", "dim")
        .agg(F.sum("qv").alias("sq"), F.count("*").alias("n"))
        .withColumn("mq", F.expr("(sq - (((sq % n) + n) % n)) div n"))
    )
    c1 = m1.groupBy("cell").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, mq))), x -> x.mq)").alias("wq"),
        F.sum(F.col("mq") * F.col("mq")).cast("bigint").alias("norm2"),
    )
    # iteration 2: reassign to the computed centroids (data, broadcast)
    sc2 = e.join(F.broadcast(c1)).select(
        "vec_id",
        "cell",
        (
            -F.expr(_fold2("spark", "wq", "embedding"))
            / F.sqrt(F.col("norm2").cast("double"))
        ).alias("score"),
    )
    b2 = (
        sc2.groupBy("vec_id")
        .agg(F.min(F.struct("score", "cell")).alias("m"))
        .select("vec_id", F.col("m.cell").alias("cell2"), F.col("m.score").alias("mn2"))
    )
    mv = best1.join(b2, "vec_id").select(
        "vec_id",
        "cell2",
        "mn2",
        (F.col("cell") != F.col("cell2")).cast("int").alias("moved"),
    )
    dq = mv.join(e, "vec_id").select(
        "cell2",
        "moved",
        "embedding",
        F.floor(
            (
                F.expr(_dot("spark", "embedding", "embedding"))
                + 2.0 * F.col("mn2")
                + 1.0
            )
            * INERTIA_SCALE
        )
        .cast("bigint")
        .alias("dq2"),
    )
    q2 = dq.select(
        F.col("cell2").alias("cell"),
        "dq2",
        "moved",
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "cell",
        "dq2",
        "moved",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * CENTROID_SCALE).cast("bigint").alias("qv"),
    )
    s2 = (
        q2.groupBy("cell", "dim")
        .agg(
            F.sum("qv").alias("sq"),
            F.count("*").alias("n"),
            F.sum("dq2").cast("bigint").alias("sdq"),
            F.sum("moved").cast("bigint").alias("smv"),
        )
        .withColumn("mq", F.expr("(sq - (((sq % n) + n) % n)) div n"))
    )
    return (
        s2.groupBy("cell")
        .agg(
            F.max("n").alias("n_vecs"),
            F.max("smv").alias("n_moved"),
            F.max("sdq").alias("inertia2_q"),
            F.array_sort(F.collect_list(F.struct("dim", "mq"))).alias("st"),
        )
        .select(
            "cell",
            "n_vecs",
            "n_moved",
            "inertia2_q",
            F.array_join(F.expr("transform(st, x -> CAST(x.mq AS STRING))"), "|").alias(
                "centroid2_q"
            ),
        )
    )


# ---- IVF-PQ: product quantization over the IVF layout ----
#
# The memory-compression scale path: the ADC pass ranks candidates
# from 4-bit codes (PQ_M bytes/vector in spirit; stored as a tinyint
# array here) instead of the 512-byte raw embedding — at 100 TB the
# shortlist scan reads ~1% of the bytes the raw-vector probe reads,
# and only the PQ_CAND shortlist survivors fetch their full vectors
# for the exact re-rank (a broadcast semi-join, never a second scan
# of the probed cells' raw vectors).

PQ_M = 8  # subspaces: 64 dims → 8 sub-vectors of 8
PQ_SUB = DIM // PQ_M
PQ_K = 16  # codewords per subspace (4-bit codes)
PQ_CAND = 50  # ADC shortlist re-ranked with exact cosine


def _pq_weight(m: int, j: int, d: int) -> int:
    """md5-derived integer codeword component for subspace ``m``
    (1-based), codeword ``j`` (0-based), sub-dimension ``d``
    (1..PQ_SUB) — the same frozen-quantizer construction as
    ``_ivf_weight``: computed once in Python, identical in both
    engines, never refit."""
    import hashlib

    return int(hashlib.md5(f"pq_{m}_{j}_{d}".encode()).hexdigest()[:4], 16) - 32768


def _pq_norm(m: int, j: int) -> float:
    import math

    return math.sqrt(sum(_pq_weight(m, j, d) ** 2 for d in range(1, PQ_SUB + 1)))


def _pq_sub_scores(dialect: str, col: str, m: int) -> list[str]:
    """Per-codeword assignment scores for sub-vector ``m``:
    -(c_mj · x_m)/|c_mj| — direction-driven argmin against the
    norm-normalized codewords, the same normalization argument as
    ``_cell_scores`` (raw md5 norms would otherwise decide every
    assignment). Left-associated sums → bit-identical doubles."""
    off = (m - 1) * PQ_SUB
    scores = []
    for j in range(PQ_K):
        dot = " + ".join(
            f"{_pq_weight(m, j, d)} * {_elem_at(dialect, col, off + d)}"
            for d in range(1, PQ_SUB + 1)
        )
        scores.append(f"(-({dot}) / {_pq_norm(m, j)!r})")
    return scores


def _pq_code_expr(dialect: str, col: str, m: int) -> str:
    """0-based codeword id for sub-vector ``m`` — first-minimum
    tie-break, matching the Spark build's min(struct(score, j)).
    Oracle-only: the Spark side assigns codes via the broadcast
    codebook join in ``build_pq_index`` (a literal expression here
    would be untested parity-sensitive code free to drift from the
    join arithmetic it claims to match)."""
    assert dialect == "duck"
    arr = ", ".join(_pq_sub_scores(dialect, col, m))
    return f"CAST(list_position([{arr}], list_aggregate([{arr}], 'min')) - 1 AS INT)"


def _pq_codebook_df(spark: SparkSession):
    """The PQ_M×PQ_K codebook as a 128-row DataFrame (m, j,
    w: array<double>, cnorm) — codewords as broadcast DATA for the
    index build, same Janino-limit rationale as ``_centroid_df``;
    the values are exactly the ones the oracle's literal expressions
    inline."""
    rows = []
    for m in range(1, PQ_M + 1):
        for j in range(PQ_K):
            w = [float(_pq_weight(m, j, d)) for d in range(1, PQ_SUB + 1)]
            rows.append((m, j, w, _pq_norm(m, j)))
    return spark.createDataFrame(rows, "m INT, j INT, w ARRAY<DOUBLE>, cnorm DOUBLE")


#: Spark-side assignment score for the codebook join: identical fold
#: order to _pq_sub_scores' literal form (0.0-seeded left fold over
#: sub-dimensions 1..PQ_SUB at offset (m-1)*PQ_SUB).
_PQ_SCORE = (
    f"-(aggregate(sequence(1, {PQ_SUB}), CAST(0 AS DOUBLE), "
    f"(acc, d) -> acc + element_at(w, d) * "
    f"CAST(element_at(embedding, (m - 1) * {PQ_SUB} + d) AS DOUBLE))) / cnorm"
)

#: IVF-PQ index dirs per (process, sf_dir) — ingest-time work, like
#: the plain IVF index.
_PQ_INDEX_DIRS: dict[str, str] = {}


def build_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the IVF-PQ index: one row
    per vector carrying ONLY (vec_id, code: array<int> of PQ_M 4-bit
    ids), parquet-partitioned by IVF cell. The raw embedding is
    deliberately NOT in the index — the ADC pass reads PQ_M small
    ints per vector, and re-ranking fetches full vectors for the
    shortlist alone."""
    if sf_dir in _PQ_INDEX_DIRS:
        return _PQ_INDEX_DIRS[sf_dir]
    import tempfile

    path = tempfile.mkdtemp(prefix="lapidus_ivfpq_")
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    scored = e.join(F.broadcast(_pq_codebook_df(spark))).select(
        "vec_id", "m", "j", F.expr(_PQ_SCORE).alias("score")
    )
    codes = (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct("score", "j")).alias("s"))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(m, s.j AS cw))), x -> x.cw)"
            ).alias("code")
        )
    )
    (
        codes.join(assign_cells(spark, e).drop("mn"), "vec_id")
        .select("vec_id", "code", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    _PQ_INDEX_DIRS[sf_dir] = path
    return path


def _pq_lut_py(qe) -> list[float]:
    """The query's ADC lookup table, flattened (m-major: entry
    (m-1)*PQ_K + j = (c_mj · q_m)/|c_mj|), computed driver-side with
    the SAME left-to-right IEEE fold the oracle's SQL uses — 128
    doubles inlined as literals into the Spark ADC expression."""
    lut = []
    for m in range(1, PQ_M + 1):
        off = (m - 1) * PQ_SUB
        for j in range(PQ_K):
            dot = 0.0
            for d in range(1, PQ_SUB + 1):
                dot = dot + _pq_weight(m, j, d) * float(qe[off + d - 1])
            lut.append(dot / _pq_norm(m, j))
    return lut


def _pq_lut_sql(dialect: str, qcol: str) -> list[str]:
    """The same LUT as SQL expressions over the query row's embedding
    (the oracle cannot inline per-dataset literals — its string is
    fixed at registration): entry order and fold order match
    ``_pq_lut_py`` exactly."""
    lut = []
    for m in range(1, PQ_M + 1):
        off = (m - 1) * PQ_SUB
        for j in range(PQ_K):
            dot = " + ".join(
                f"{_pq_weight(m, j, d)} * {_elem_at(dialect, qcol, off + d)}"
                for d in range(1, PQ_SUB + 1)
            )
            lut.append(f"(({dot}) / {_pq_norm(m, j)!r})")
    return lut


def _pq_adc_sql(dialect: str) -> str:
    """ADC score from the code columns c1..c{PQ_M} and the LUT list
    ``lut`` (duck) — left-associated sum over subspaces, matching the
    Spark fold's order."""
    assert dialect == "duck"
    return " + ".join(f"lut[{(m - 1) * PQ_K} + c{m} + 1]" for m in range(1, PQ_M + 1))


def pq_candidates(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Top-``k`` exact-cosine results via the IVF-PQ two-stage probe:
    ADC over the probed cells' CODES (column-pruned scan of the
    compressed index — never the raw vectors), PQ_CAND shortlist by
    approximate score, exact re-rank of the shortlist's full vectors
    fetched through a broadcast semi-join on the corpus table."""
    idx = build_pq_index(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    qrow = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    cells = _ivf_probe_cells(qrow.embedding)
    lut = _pq_lut_py(qrow.embedding)
    lut_lit = ", ".join(repr(v) for v in lut)
    adc = F.expr(
        f"aggregate(sequence(1, {PQ_M}), CAST(0 AS DOUBLE), "
        f"(acc, m) -> acc + element_at(array({lut_lit}), "
        f"(m - 1) * {PQ_K} + element_at(code, m) + 1))"
    )
    shortlist = (
        spark.read.parquet(idx)
        .filter(F.col("cell").isin(cells))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", adc.alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(PQ_CAND)
    )
    qe = F.array(*[F.lit(float(v)) for v in qrow.embedding])
    return (
        e.join(F.broadcast(shortlist.select("vec_id")), "vec_id", "semi")
        .withColumn("qe", qe)
        .select("vec_id", F.expr(_cos("spark", "embedding", "qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _pq_oracle_sql() -> str:
    """The full IVF-PQ probe in DuckDB — codes, probe cells, LUT and
    ADC all recomputed from the raw table with the Spark path's exact
    arithmetic."""
    code_cols = ", ".join(
        f"{_pq_code_expr('duck', 'embedding', m)} AS c{m}" for m in range(1, PQ_M + 1)
    )
    return f"""
    WITH s AS (
      SELECT vec_id, embedding, {_cell_expr("duck", "embedding")} AS cell,
             {code_cols}
      FROM embeddings
    ), q AS (
      SELECT embedding AS qe,
             {_scores_arr("duck", "embedding")} AS qscores,
             [{", ".join(_pq_lut_sql("duck", "embedding"))}] AS lut
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ), cand AS (
      SELECT s.vec_id, s.embedding, {_pq_adc_sql("duck")} AS adc
      FROM s CROSS JOIN q
      WHERE q.qscores[s.cell + 1] <= list_sort(q.qscores)[{N_PROBE}]
        AND s.vec_id <> {QUERY_VEC_ID}
      ORDER BY adc DESC, s.vec_id ASC
      LIMIT {PQ_CAND}
    )
    SELECT cand.vec_id, {_cos("duck", "cand.embedding", "q.qe")} AS cos_sim
    FROM cand CROSS JOIN q
    ORDER BY cos_sim DESC, cand.vec_id ASC
    LIMIT {TOP_K}
    """


@query(
    "ext_ann_pq",
    oracle=_pq_oracle_sql(),
    operator="ext_sim_search (ANN/IVF-PQ compressed scale path)",
    doc="IVF-PQ ANN: the corpus is indexed as PQ_M=8 4-bit codes per "
    "vector (each 8-dim sub-vector assigned to its nearest of 16 "
    "frozen md5-derived codewords — the same deterministic-quantizer "
    "construction as the IVF cells), parquet-partitioned by IVF "
    "cell. A query probes its n_probe cells and ranks by ASYMMETRIC "
    "DISTANCE: a driver-computed 128-entry lookup table (query "
    "sub-vector · each codeword) folded over the code array — the "
    "scan reads ONLY the code column (~1% of the raw-vector bytes; "
    "at 100 TB this is the difference between an in-memory shortlist "
    "pass and re-reading half a terabyte per probed cell). The "
    "PQ_CAND=50 shortlist then fetches full vectors via a broadcast "
    "semi-join for the exact cosine top-10. Every stage deterministic "
    "(left-fold doubles, first-minimum assignment, total tie order), "
    "so the oracle replays codes, LUT, ADC and re-rank bit-for-bit.",
)
def ext_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_candidates(spark, sf_dir, TOP_K)


@query(
    "ext_ann_eval",
    oracle=f"""
    WITH exact_k AS ({_exact_topk_sql()}),
    s AS (
      SELECT vec_id, embedding, {_cell_expr("duck", "embedding")} AS cell,
             {_sig_expr("duck", "embedding", ANN_PLANES)} AS sig
      FROM embeddings
    ), q AS (
      SELECT embedding AS qe,
             {_scores_arr("duck", "embedding")} AS qscores,
             sig AS qsig
      FROM s WHERE vec_id = {QUERY_VEC_ID}
    ), ivf_k AS (
      SELECT s.vec_id, {_cos("duck", "s.embedding", "q.qe")} AS cos_sim
      FROM s CROSS JOIN q
      WHERE q.qscores[s.cell + 1] <= list_sort(q.qscores)[{N_PROBE}]
        AND s.vec_id <> {QUERY_VEC_ID}
      ORDER BY cos_sim DESC, s.vec_id ASC
      LIMIT {TOP_K}
    ), p AS (
      SELECT qe, unnest([{", ".join(f"xor(qsig, {m})" for m in _PROBE_MASKS)}]) AS psig
      FROM q
    ), lsh_k AS (
      SELECT s.vec_id, {_cos("duck", "s.embedding", "p.qe")} AS cos_sim
      FROM s JOIN p ON s.sig = p.psig
      WHERE s.vec_id <> {QUERY_VEC_ID}
      ORDER BY cos_sim DESC, s.vec_id ASC
      LIMIT {TOP_K}
    ), pq_k AS ({_pq_oracle_sql()})
    SELECT 'ivf' AS method, CAST({TOP_K} AS BIGINT) AS k,
           count(*) AS n_hits,
           (1000 * count(*)) // {TOP_K} AS recall_permille
    FROM ivf_k JOIN exact_k USING (vec_id)
    UNION ALL
    SELECT 'lsh' AS method, CAST({TOP_K} AS BIGINT) AS k,
           count(*) AS n_hits,
           (1000 * count(*)) // {TOP_K} AS recall_permille
    FROM lsh_k JOIN exact_k USING (vec_id)
    UNION ALL
    SELECT 'pq' AS method, CAST({TOP_K} AS BIGINT) AS k,
           count(*) AS n_hits,
           (1000 * count(*)) // {TOP_K} AS recall_permille
    FROM pq_k JOIN exact_k USING (vec_id)
    """,
    operator="ext_sim_search (ANN recall@k evaluation)",
    doc="ANN recall measurement (VERDICT r9 #5) — the observability "
    "twin of ext_dedup_eval: the IVF probe (n_probe=2 of 16 cells), "
    "the multi-probe LSH (query bucket + Hamming-1 neighbors) and "
    "the IVF-PQ ADC probe (compressed codes + exact re-rank) "
    "top-10 candidate sets are each semi-joined against the EXACT "
    "cosine top-10 (ext_sim_search, the declared-exact baseline this "
    "module measures every ANN variant against), reporting integer-"
    "permille recall@10 per method — the number a user tuning "
    "n_probe/probe-count needs. Every stage is deterministic "
    "(left-fold doubles, frozen quantizer, total tie order), so the "
    "oracle recomputes the identical recall from the exact ranking. "
    "At 100 TB the exact baseline is the expensive leg by design — "
    "an EVAL query runs on a sample or a golden query set, not in "
    "the serving path; the ANN legs keep their pruned-probe plans.",
)
def ext_ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = ext_sim_search(spark, sf_dir).select("vec_id")

    def leg(method: str, cand: DataFrame) -> DataFrame:
        return (
            cand.select("vec_id")
            .join(exact, "vec_id", "semi")
            .agg(F.count("*").alias("n_hits"))
            .select(
                F.lit(method).alias("method"),
                F.lit(TOP_K).cast("long").alias("k"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.expr(f"CAST((1000 * n_hits) DIV {TOP_K} AS BIGINT)").alias(
                    "recall_permille"
                ),
            )
        )

    return (
        leg("ivf", ivf_candidates(spark, sf_dir, TOP_K))
        .unionByName(leg("lsh", ext_ann_lsh(spark, sf_dir)))
        .unionByName(leg("pq", pq_candidates(spark, sf_dir, TOP_K)))
    )


# ---------------------------------------------------------------------------
# Trained PQ codebook (VERDICT r10 #5): one Lloyd refinement of the
# frozen md5 seeds using the ext_kmeans machinery — codebook as DATA
# flowing through the plan (broadcast 128-row joins, exact integer
# fixed-point means), never a driver-side refit.
# ---------------------------------------------------------------------------

#: Spark-side assignment score against a TRAINED codeword row
#: (wq: array<bigint> fixed-point weights, norm2: bigint): same
#: 0.0-seeded left fold as _PQ_SCORE, integer weights converting to
#: double exactly — bit-identical to the oracle's list_reduce fold.
_PQ_TRAINED_SCORE = (
    f"-(aggregate(sequence(1, {PQ_SUB}), CAST(0 AS DOUBLE), "
    f"(acc, d) -> acc + CAST(element_at(wq, d) AS DOUBLE) * "
    f"CAST(element_at(embedding, (m - 1) * {PQ_SUB} + d) AS DOUBLE))) "
    f"/ sqrt(CAST(norm2 AS DOUBLE))"
)


def _pq_frozen_assignments(spark: SparkSession, e: DataFrame) -> DataFrame:
    """(vec_id, m, j): each sub-vector's nearest FROZEN codeword —
    the Lloyd assignment step, via the broadcast codebook join
    (exactly ``build_pq_index``'s arithmetic)."""
    scored = e.join(F.broadcast(_pq_codebook_df(spark))).select(
        "vec_id", "m", "j", F.expr(_PQ_SCORE).alias("score")
    )
    return (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct("score", "j")).alias("s"))
        .select("vec_id", "m", F.col("s.j").alias("j"))
    )


def _pq_trained_codebook(spark: SparkSession, e: DataFrame) -> DataFrame:
    """One Lloyd update step for every subspace at once: per assigned
    (m, j), the exact fixed-point per-sub-dimension mean of the
    member sub-vectors (the ext_kmeans_step update — floor-div on
    quantized sums, so the codebook is integer-exact and
    bit-identical on any cluster layout). Returns (m, j, wq:
    array<bigint>[PQ_SUB], norm2: bigint); codewords that attracted
    no members simply have no row (standard k-means empty-cluster
    drop — codes can only reference surviving codewords, both
    engines derive the same set). Training is two aggregations over
    (corpus × PQ_M × PQ_SUB) plus a 128-row broadcast — linear in
    the corpus, no driver collect."""
    asn = _pq_frozen_assignments(spark, e).join(e, "vec_id")
    qv = asn.select(
        "m",
        "j",
        F.explode(
            F.expr(
                f"transform(sequence(1, {PQ_SUB}), d -> struct(d AS d, "
                f"CAST(floor(CAST(element_at(embedding, (m - 1) * {PQ_SUB} + d) "
                f"AS DOUBLE) * {CENTROID_SCALE}) AS BIGINT) AS qv))"
            )
        ).alias("x"),
    ).select("m", "j", F.col("x.d").alias("d"), F.col("x.qv").alias("qv"))
    mq = (
        qv.groupBy("m", "j", "d")
        .agg(F.sum("qv").alias("sq"), F.count("*").alias("n"))
        .withColumn("mq", F.expr("(sq - (((sq % n) + n) % n)) div n"))
    )
    return mq.groupBy("m", "j").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, mq))), x -> x.mq)"
        ).alias("wq"),
        F.sum(F.col("mq") * F.col("mq")).cast("bigint").alias("norm2"),
    )


#: trained IVF-PQ index dirs per (process, sf_dir)
_PQ_TRAINED_INDEX_DIRS: dict[str, str] = {}


def build_pq_trained_index(spark: SparkSession, sf_dir: str) -> str:
    """Rebuild the IVF-PQ index from the TRAINED codebook: identical
    layout to ``build_pq_index`` (one row per vector, (vec_id, code)
    parquet-partitioned by IVF cell), codes assigned against the
    trained codewords via the same broadcast-join argmin. The IVF
    cell structure stays frozen — PQ training refines the in-cell
    quantizer, not the coarse partitioner, so the probe planning is
    unchanged."""
    if sf_dir in _PQ_TRAINED_INDEX_DIRS:
        return _PQ_TRAINED_INDEX_DIRS[sf_dir]
    import os
    import tempfile

    path = tempfile.mkdtemp(prefix="lapidus_ivfpq_trained_")
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    # Train ONCE at index-build time and PERSIST the codebook beside
    # the codes (round 14, VERDICT r13 #8): the probe's query LUT
    # needs exactly these ≤128 rows — before this, pq_trained_
    # candidates re-ran the whole Lloyd pipeline (frozen-assignment
    # broadcast join + two corpus-sized aggregations) inside the
    # timed probe just to collect them. The sidecar is part of the
    # same build-once-probe-many index dir; the leading '_' keeps it
    # out of the main read's partition discovery. It is written to a
    # scratch dir first and MOVED in after the codes write (whose
    # mode("overwrite") would wipe anything already under ``path``);
    # reading it back for the code assignment below keeps the build
    # itself to ONE training pass.
    cb_tmp = tempfile.mkdtemp(prefix="lapidus_ivfpq_cb_")
    _pq_trained_codebook(spark, e).write.mode("overwrite").parquet(cb_tmp)
    cb = spark.read.parquet(cb_tmp)
    scored = e.join(F.broadcast(cb)).select(
        "vec_id", "m", "j", F.expr(_PQ_TRAINED_SCORE).alias("score")
    )
    codes = (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct("score", "j")).alias("s"))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(m, s.j AS cw))), x -> x.cw)"
            ).alias("code")
        )
    )
    (
        codes.join(assign_cells(spark, e).drop("mn"), "vec_id")
        .select("vec_id", "code", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    import shutil

    shutil.move(cb_tmp, os.path.join(path, "_codebook"))
    _PQ_TRAINED_INDEX_DIRS[sf_dir] = path
    return path


def pq_trained_candidates(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Top-``k`` via the trained-codebook IVF-PQ probe — the same
    two-stage ADC + exact-re-rank shape as ``pq_candidates``, with
    the query LUT computed from the trained codewords (a 128-row
    metadata-sized collect of the codebook, the same class as the
    single query-row fetch; gaps for member-less codewords fill 0.0
    and are never indexed — codes only reference surviving
    codewords). The codebook rows come from the index's ``_codebook``
    sidecar (round 14): the probe used to re-run the Lloyd training
    pipeline to produce these identical ≤128 rows on every execution
    — training belongs to the index build, the serving path reads
    it."""
    import math
    import os

    idx = build_pq_trained_index(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings", parallel=True)
    qrow = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    cells = _ivf_probe_cells(qrow.embedding)
    cb = {
        (r["m"], r["j"]): (r["wq"], r["norm2"])
        for r in spark.read.parquet(os.path.join(idx, "_codebook")).collect()
    }
    lut = []
    for m in range(1, PQ_M + 1):
        off = (m - 1) * PQ_SUB
        for j in range(PQ_K):
            if (m, j) in cb:
                wq, n2 = cb[(m, j)]
                dot = 0.0  # same left fold as the oracle's list_reduce
                for d in range(1, PQ_SUB + 1):
                    dot = dot + float(wq[d - 1]) * float(qrow.embedding[off + d - 1])
                lut.append(dot / math.sqrt(float(n2)))
            else:
                lut.append(0.0)
    lut_lit = ", ".join(repr(v) for v in lut)
    adc = F.expr(
        f"aggregate(sequence(1, {PQ_M}), CAST(0 AS DOUBLE), "
        f"(acc, m) -> acc + element_at(array({lut_lit}), "
        f"(m - 1) * {PQ_K} + element_at(code, m) + 1))"
    )
    shortlist = (
        spark.read.parquet(idx)
        .filter(F.col("cell").isin(cells))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", adc.alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(PQ_CAND)
    )
    qe = F.array(*[F.lit(float(v)) for v in qrow.embedding])
    return (
        e.join(F.broadcast(shortlist.select("vec_id")), "vec_id", "semi")
        .withColumn("qe", qe)
        .select("vec_id", F.expr(_cos("spark", "embedding", "qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _pq_trained_oracle_ctes() -> str:
    """DuckDB replay of the trained pipeline: frozen assignment →
    fixed-point Lloyd update → trained codes → query LUT → ADC
    shortlist → exact re-rank, every fold in the Spark path's exact
    order. Emits CTE bodies; callers append the final SELECT."""
    code_cols = ", ".join(
        f"{_pq_code_expr('duck', 'embedding', m)} AS f{m}" for m in range(1, PQ_M + 1)
    )
    sub_fold = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {PQ_SUB} + 1), "
        f"d -> wq[d] * CAST(embedding[(m - 1) * {PQ_SUB} + d] AS DOUBLE))), "
        f"(a, b) -> a + b)"
    )
    lut_fold = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {PQ_SUB} + 1), "
        f"d -> wq[d] * CAST(qe[(m - 1) * {PQ_SUB} + d] AS DOUBLE))), "
        f"(a, b) -> a + b)"
    )
    adc_chain = " + ".join(
        f"lut[{(m - 1) * PQ_K} + code[{m}] + 1]" for m in range(1, PQ_M + 1)
    )
    return f"""
    fa AS (
      SELECT vec_id, embedding, {_cell_expr("duck", "embedding")} AS cell,
             {code_cols}
      FROM embeddings
    ), asn AS (
      SELECT vec_id, embedding,
             unnest([{", ".join(f"f{m}" for m in range(1, PQ_M + 1))}]) AS j,
             unnest([{", ".join(str(m) for m in range(1, PQ_M + 1))}]) AS m
      FROM fa
    ), qv AS (
      SELECT m, j, unnest(range(1, {PQ_SUB} + 1)) AS d,
             unnest(list_transform(range(1, {PQ_SUB} + 1), d ->
               CAST(floor(CAST(embedding[(m - 1) * {PQ_SUB} + d] AS DOUBLE)
                          * {CENTROID_SCALE}) AS BIGINT))) AS qvv
      FROM asn
    ), sums AS (
      SELECT m, j, d, sum(qvv) AS sq, count(*) AS n FROM qv GROUP BY m, j, d
    ), means AS (
      SELECT m, j, d, (sq - (((sq % n) + n) % n)) // n AS mq FROM sums
    ), cb AS (
      SELECT m, j, list(mq ORDER BY d) AS wq,
             CAST(sum(mq * mq) AS BIGINT) AS norm2
      FROM means GROUP BY m, j
    ), tsc AS (
      SELECT fa.vec_id, cb.m, cb.j,
             -({sub_fold}) / sqrt(CAST(norm2 AS DOUBLE)) AS score
      FROM fa CROSS JOIN cb
    ), tbest AS (
      SELECT vec_id, m, min(struct_pack(s := score, j := j)) AS b
      FROM tsc GROUP BY vec_id, m
    ), tcodes AS (
      SELECT vec_id, list((b).j ORDER BY m) AS code FROM tbest GROUP BY vec_id
    ), tq AS (
      SELECT embedding AS qe, {_scores_arr("duck", "embedding")} AS qscores
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ), grid AS (
      SELECT gm.m, gj.j
      FROM (SELECT unnest(range(1, {PQ_M} + 1)) AS m) gm,
           (SELECT unnest(range(0, {PQ_K})) AS j) gj
    ), lutv AS (
      SELECT cb.m, cb.j, ({lut_fold}) / sqrt(CAST(norm2 AS DOUBLE)) AS v
      FROM cb CROSS JOIN tq
    ), lutarr AS (
      SELECT list(COALESCE(lutv.v, CAST(0 AS DOUBLE)) ORDER BY grid.m, grid.j) AS lut
      FROM grid LEFT JOIN lutv ON grid.m = lutv.m AND grid.j = lutv.j
    ), tcand AS (
      SELECT fa.vec_id, fa.embedding, {adc_chain} AS adc
      FROM fa
      JOIN tcodes ON fa.vec_id = tcodes.vec_id
      CROSS JOIN lutarr CROSS JOIN tq
      WHERE tq.qscores[fa.cell + 1] <= list_sort(tq.qscores)[{N_PROBE}]
        AND fa.vec_id <> {QUERY_VEC_ID}
      ORDER BY adc DESC, fa.vec_id ASC
      LIMIT {PQ_CAND}
    ), trained_k AS (
      SELECT tcand.vec_id, {_cos("duck", "tcand.embedding", "tq.qe")} AS cos_sim
      FROM tcand CROSS JOIN tq
      ORDER BY cos_sim DESC, tcand.vec_id ASC
      LIMIT {TOP_K}
    )"""


@query(
    "ext_ann_pq_trained",
    oracle=f"""
    WITH exact_k AS ({_exact_topk_sql()}),
    frozen_k AS ({_pq_oracle_sql()}),
    {_pq_trained_oracle_ctes().lstrip()}
    SELECT 'pq' AS method, CAST({TOP_K} AS BIGINT) AS k,
           count(*) AS n_hits,
           (1000 * count(*)) // {TOP_K} AS recall_permille
    FROM frozen_k JOIN exact_k USING (vec_id)
    UNION ALL
    SELECT 'pq_trained' AS method, CAST({TOP_K} AS BIGINT) AS k,
           count(*) AS n_hits,
           (1000 * count(*)) // {TOP_K} AS recall_permille
    FROM trained_k JOIN exact_k USING (vec_id)
    """,
    operator="ext_sim_search (trained PQ codebook — Lloyd-refined, recall vs frozen)",
    doc="Trained PQ codebook (VERDICT r10 #5): the per-subspace "
    "codewords are REFINED with one Lloyd step of the ext_kmeans "
    "machinery — assign every sub-vector to its nearest frozen "
    "md5-seed codeword, recompute each codeword as the exact "
    "fixed-point mean of its members (floor-div on quantized sums, "
    "the ext_kmeans_step update — integer-exact, so the trained "
    "codebook is bit-identical on any cluster layout), with the "
    "codebook flowing as DATA through broadcast joins (no driver "
    "refit; member-less codewords drop, standard k-means). The "
    "IVF-PQ index is REBUILT from the trained codebook (same "
    "compressed layout, same probe planning — training refines the "
    "in-cell quantizer, not the coarse partitioner) and recall@10 is "
    "reported SIDE BY SIDE with the frozen codebook's against the "
    "exact top-k — the query ASSERTS trained >= frozen every run "
    "(measured 3/3/4 vs 3/3/3 hits at sf 0.001/0.01/0.1): data-fit "
    "codewords quantize the corpus strictly better than the "
    "hash-derived seeds. The oracle replays the ENTIRE trained "
    "pipeline (assignment, fixed-point update, re-coding, LUT, ADC, "
    "re-rank) in DuckDB bit-for-bit. Further Lloyd iterations are "
    "more copies of the same two-exchange stage (ext_kmeans_iter2 "
    "proves the loop).",
)
def ext_ann_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = ext_sim_search(spark, sf_dir).select("vec_id")

    def leg(method: str, cand: DataFrame) -> DataFrame:
        return (
            cand.select("vec_id")
            .join(exact, "vec_id", "semi")
            .agg(F.count("*").alias("n_hits"))
            .select(
                F.lit(method).alias("method"),
                F.lit(TOP_K).cast("long").alias("k"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.expr(f"CAST((1000 * n_hits) DIV {TOP_K} AS BIGINT)").alias(
                    "recall_permille"
                ),
            )
        )

    out = leg("pq", pq_candidates(spark, sf_dir, TOP_K)).unionByName(
        leg("pq_trained", pq_trained_candidates(spark, sf_dir, TOP_K))
    )
    rows = {r["method"]: r["recall_permille"] for r in out.collect()}
    assert rows["pq_trained"] >= rows["pq"], (
        f"trained codebook must not lose recall: {rows}"
    )
    return out
