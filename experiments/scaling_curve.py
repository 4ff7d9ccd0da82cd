"""Scaling curve for representative operator shapes: run the same
events-only queries at 100k (sf0.1 fixture, 1 split), 1M (10x
derived, 8 splits), and 10M rows (100x derived, 32 splits) and
report wall-clock ratios. Sub-linear scaling = the partition
strategy holds; super-linear = a hidden funnel."""
import sys, tempfile, time
from functools import reduce

sys.path.insert(0, "/root/repo")
from lapidus_spark.session import get_spark
from lapidus_spark.plans.registry import load_all
from lapidus_spark.sources.tables import load_table
from pyspark.sql import functions as F

spark = get_spark("scaling_curve", cpus=32)
reg = load_all()
SF = "/root/testdata/sf0.1"

def derived(mult, splits):
    ev = load_table(spark, SF, "events")
    copies = [ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000)) for i in range(mult)]
    big = reduce(lambda a, b: a.unionByName(b), copies)
    out = tempfile.mkdtemp(prefix=f"events{mult}x_")
    big.repartition(splits).write.mode("overwrite").parquet(out + "/events.parquet")
    return out

dirs = {1: SF, 10: derived(10, 8), 100: derived(100, 32)}
QUERIES = [
    "agg_type_counts",      # one partial-agg exchange
    "top_k_entities",       # TakeOrdered
    "win_cdc_snapshot",     # max_by hash agg (map-side partials)
    "win_tumbling_counts",  # window-key agg
    "win_ohlc_bars",        # (type,hour) struct-argmin agg
    "win_ema",              # per-entity sorted-collect fold
    "sort_global_events",   # sampled range exchange + per-pid rank
    "agg_tx_assembly",      # tx-key sorted-collect assembly
]
# warm every shape at 1x
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
