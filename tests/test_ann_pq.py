"""IVF-PQ properties the oracle gate cannot see: the compression
claim (the ADC index is a small fraction of the raw corpus bytes —
the whole point of PQ at 100 TB), shortlist determinism under
repartitioning, and the recall ordering guarantee (PQ's top-k is the
exact re-rank of an ADC shortlist drawn from the SAME probed cells
the raw-IVF probe ranks exactly, so PQ can never out-recall IVF and
both are bounded by the probe's cell coverage).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lapidus_spark.functions import similarity as S
from tests.conftest import SF_DIR


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def test_pq_index_is_a_fraction_of_the_corpus(spark):
    """8 4-bit codes per vector vs 64 float64s: the ADC pass's
    parquet footprint must stay under 15% of the raw table (in
    practice ~5% at fixture scale; RLE on 0-15 ints compresses
    further at real scale)."""
    idx = S.build_pq_index(spark, SF_DIR)
    corpus = os.path.join(SF_DIR, "embeddings.parquet")
    ratio = _dir_bytes(idx) / os.path.getsize(corpus)
    assert 0 < ratio < 0.15, f"PQ index is {ratio:.1%} of the corpus"


def test_pq_codes_are_partition_invariant(spark):
    """The codebook assignment is a per-row broadcast-join fold —
    repartitioning the corpus must produce the identical code for
    every vector (the r4 bug class: layout-dependent results)."""
    idx = S.build_pq_index(spark, SF_DIR)
    stored = {
        r["vec_id"]: tuple(r["code"])
        for r in spark.read.parquet(idx).collect()
    }
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).repartition(
        13, F.col("vec_id")
    )
    scored = e.join(F.broadcast(S._pq_codebook_df(spark))).select(
        "vec_id", "m", "j", F.expr(S._PQ_SCORE).alias("score")
    )
    recomputed = {
        r["vec_id"]: tuple(r["code"])
        for r in scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct("score", "j")).alias("s"))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(m, s.j AS cw))), x -> x.cw)"
            ).alias("code")
        )
        .collect()
    }
    assert recomputed == stored


def test_pq_recall_never_exceeds_ivf_recall(spark):
    """PQ's final top-k is the exact re-rank of a shortlist drawn
    from the probed cells; raw IVF exact-ranks the probed cells
    directly — so hits(pq) <= hits(ivf) by construction, and a PQ
    'win' would mean the shortlist cut or the probe drifted."""
    rows = {r["method"]: r for r in S.ext_ann_eval(spark, SF_DIR).collect()}
    assert set(rows) == {"ivf", "lsh", "pq"}
    assert rows["pq"]["n_hits"] <= rows["ivf"]["n_hits"]
    assert rows["pq"]["recall_permille"] > 0, (
        "the ADC shortlist lost every true neighbor — quantizer or LUT drift"
    )


def test_pq_topk_equals_exact_rerank_of_adc_shortlist(spark):
    """End-to-end identity: recomputing the shortlist and re-rank
    from the stored codes (independent code path: python-side ADC
    over collected codes) reproduces ext_ann_pq's result exactly."""
    idx = S.build_pq_index(spark, SF_DIR)
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    qe = e.filter(F.col("vec_id") == S.QUERY_VEC_ID).first()["embedding"]
    cells = set(S._ivf_probe_cells(qe))
    lut = S._pq_lut_py(qe)
    coded = [
        (r["vec_id"], r["code"])
        for r in spark.read.parquet(idx).collect()
        if r["cell"] in cells and r["vec_id"] != S.QUERY_VEC_ID
    ]
    adc = []
    for vid, code in coded:
        s = 0.0
        for m in range(1, S.PQ_M + 1):
            s = s + lut[(m - 1) * S.PQ_K + code[m - 1]]
        adc.append((vid, s))
    shortlist = {
        vid for vid, _ in sorted(adc, key=lambda t: (-t[1], t[0]))[: S.PQ_CAND]
    }
    got = [r["vec_id"] for r in S.ext_ann_pq(spark, SF_DIR).collect()]
    assert set(got) <= shortlist
    assert len(got) == S.TOP_K
