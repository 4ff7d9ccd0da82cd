"""Corpus/embedding-side scaling curve: documents-only and
embeddings-only operators at 1x/10x/100x derived load. Copies get a
unique suffix token (documents) / id shift (embeddings) so duplicate
density stays realistic instead of every doc becoming a 100-way
exact dup."""
import sys, tempfile, time
from functools import reduce

sys.path.insert(0, "/root/repo")
from lapidus_spark.session import get_spark
from lapidus_spark.plans.registry import load_all
from lapidus_spark.sources.tables import load_table
from pyspark.sql import functions as F

spark = get_spark("scaling_docs", cpus=32)
reg = load_all()
SF = "/root/testdata/sf0.1"

def derived(mult, splits):
    d = load_table(spark, SF, "documents")
    e = load_table(spark, SF, "embeddings")
    copies = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
         .withColumn("text", F.concat(F.col("text"), F.lit(f" copytok{i}")))
        for i in range(mult)
    ]
    ecopies = [
        e.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        for i in range(mult)
    ]
    out = tempfile.mkdtemp(prefix=f"docs{mult}x_")
    reduce(lambda a, b: a.unionByName(b), copies).repartition(splits)\
        .write.mode("overwrite").parquet(out + "/documents.parquet")
    reduce(lambda a, b: a.unionByName(b), ecopies).repartition(splits)\
        .write.mode("overwrite").parquet(out + "/embeddings.parquet")
    return out

dirs = {1: SF, 10: derived(10, 8), 100: derived(100, 32)}
QUERIES = [
    "ext_text_stats",        # zero-shuffle projection + final agg
    "ext_lang_id",           # marker projection + 2-key agg
    "ext_quality_score",     # zero/one-shuffle
    "ext_token_count",       # one-shuffle
    "ext_dedup_exact",       # hash-key groupBy
    "ext_dedup_simhash",     # pure codegen projection
    "ext_winnow_fingerprint",# per-doc array folds
    "ext_dedup_minhash",     # banded LSH pair join
    "ext_kmeans_step",       # broadcast assign + (cell,dim) agg
    "ext_embed_centroid",    # two-level exact agg
    "ext_bm25_topk",         # corpus-stats agg + zero-shuffle score
    "ext_retrieve_rerank",   # pruned IVF probe + stats + bcast re-rank
]
for n in QUERIES:
    reg[n].fn(spark, SF).write.format("noop").mode("overwrite").save()

print("query, t_1x, t_10x, t_100x, r10, r100")
for n in QUERIES:
    ts = {}
    for mult, d in dirs.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            reg[n].fn(spark, d).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ts[mult] = best
    print(f"{n}, {ts[1]:.2f}, {ts[10]:.2f}, {ts[100]:.2f}, "
          f"{ts[10]/ts[1]:.1f}, {ts[100]/ts[1]:.1f}", flush=True)
