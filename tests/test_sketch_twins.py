"""At-100-TB twins of the exact operators: sketch aggregates
(approx_count_distinct / percentile_approx) and ANN probes must land
within a stated tolerance of their exact counterparts on the fixture
— the quantitative evidence behind every 'at scale, swap in the
sketch' note in the registry docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lapidus_spark.functions.similarity import ext_ann_ivf, ext_ann_lsh, ext_sim_search
from lapidus_spark.sources.tables import load_table
from tests.conftest import SF_DIR, SF_DIR_MID


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF_DIR_MID, "events")
    pairs = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    )
    for r in pairs.collect():
        # HLL++ at rsd=0.05: allow 3 standard errors
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.15 * r["exact"]), r


def test_percentile_approx_brackets_exact(spark):
    ev = load_table(spark, SF_DIR_MID, "events")
    r = ev.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("approx"),
        F.expr("percentile(value, 0.01)").alias("lo"),
        F.expr("percentile(value, 0.99)").alias("hi"),
    ).first()
    spread = r["hi"] - r["lo"]
    assert abs(r["approx"] - r["exact"]) <= 0.02 * spread, r


def _top_ids(df):
    return {r["vec_id"] for r in df.collect()}


def test_ivf_probe_recalls_exact_topk(spark):
    exact = _top_ids(ext_sim_search(spark, SF_DIR))
    ivf = _top_ids(ext_ann_ivf(spark, SF_DIR))
    k = len(exact)
    assert len(ivf & exact) >= k // 2, (sorted(exact), sorted(ivf))
    # LSH bucket recall is NOT asserted against this fixture: the
    # embeddings are i.i.d. noise (max pair cosine < 0.5 at sf0.001),
    # so 'nearest neighbors' are noise and sign-LSH has nothing to
    # recall. The LSH property is tested on planted neighbors below.


def test_lsh_buckets_catch_planted_neighbor(spark):
    """Sign-LSH's actual contract: a genuinely-near pair (cos ≈ 0.99)
    lands within the multi-probe radius (Hamming ≤ 1 on 4 planes)."""
    import random

    from lapidus_spark.functions.similarity import ANN_PLANES, DIM, _sig_expr

    rng = random.Random(7)  # pinned: the assertion is deterministic
    base = [rng.gauss(0, 1) for _ in range(DIM)]
    near = [x + rng.gauss(0, 0.08) for x in base]  # cos ≈ 0.997
    far = [rng.gauss(0, 1) for _ in range(DIM)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id INT, embedding ARRAY<DOUBLE>"
    ).select("vec_id", F.expr(_sig_expr("spark", "embedding", ANN_PLANES)).alias("sig"))
    sigs = {r["vec_id"]: r["sig"] for r in df.collect()}
    ham = bin(sigs[1] ^ sigs[2]).count("1")
    assert ham <= 1, f"planted near pair separated by Hamming {ham}: {sigs}"
