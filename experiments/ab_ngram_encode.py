#!/usr/bin/env python
"""Interleaved A/B of the round-13 dictionary-encoded ngram index
(st: pre-sorted array<bigint> of token ids) vs the legacy layout
(st: array<struct<df:bigint, token:string>>), in ONE process — the
only honest protocol on this box (BENCH.md variance band).

    python experiments/ab_ngram_encode.py [--reps 7] [--cpus 32]

Both variants read their own pre-built parquet index (the build is a
fixtures-block item in bench.py, not operator work). Besides timing,
the script asserts the two variants' (doc_a, doc_b, jaccard) result
sets are IDENTICAL (exact float equality — both divide the same
integer counts, so bytes must match).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lapidus_spark.functions.dedup import (
        JACCARD_T,
        LENGTH_BAND,
        build_ngram_index,
    )
    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.tables import load_table

    spark = get_spark("ab_ngram_encode", cpus=args.cpus)

    # ---- legacy index (whatever the module currently builds) -------
    legacy_dir = build_ngram_index(spark, args.sf_dir)

    # ---- new index: dictionary-encoded, pre-sorted array<bigint> ---
    d = load_table(spark, args.sf_dir, "documents", parallel=True)
    t = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LENGTH_BAND).cast("long").alias("len_band"),
        F.expr("array_distinct(split(lower(text), ' '))").alias("ts"),
    )
    tok = t.select(
        "doc_id", "lang", "len_band", F.size("ts").alias("n_toks"),
        F.explode("ts").alias("token"),
    )
    dfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    # injective token -> int64 id; materialized once so every consumer
    # of the written index sees ONE frozen assignment
    tdict = dfreq.select(
        "token", "df", F.monotonically_increasing_id().alias("tid")
    ).localCheckpoint(eager=False)
    agg_new = (
        tok.join(tdict, "token")
        .groupBy("doc_id", "lang", "len_band", "n_toks")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(df, tid))), x -> x.tid)"
            ).alias("st")
        )
    )
    new_dir = tempfile.mkdtemp(prefix="ab_ngram_new_idx_")
    agg_new.write.mode("overwrite").parquet(new_dir)

    # ---- the two query bodies --------------------------------------
    def candidates(pref, threshold):
        a, b = pref.alias("a"), pref.alias("b")
        na, nb = F.col("a.n_toks"), F.col("b.n_toks")
        overlap_needed = F.lit(threshold / (1.0 + threshold)) * (na + nb)
        overlap_bound = 1 + F.least(na - F.col("a.pos"), nb - F.col("b.pos"))
        return (
            a.join(
                b,
                (F.col("a.token") == F.col("b.token"))
                & (F.col("a.lang") == F.col("b.lang"))
                & (F.col("a.len_band") == F.col("b.len_band"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (nb >= F.lit(threshold) * na)
                & (na >= F.lit(threshold) * nb)
                & (overlap_bound >= overlap_needed),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )

    prefix_len = (
        F.col("n_toks") - F.ceil(F.lit(JACCARD_T) * F.col("n_toks")) + 1
    ).cast("int")

    def run_legacy():
        agg = spark.read.parquet(legacy_dir)
        pref = agg.select(
            "doc_id", "lang", "len_band", "n_toks",
            F.posexplode(F.slice("st", F.lit(1), prefix_len)).alias("pos0", "pt"),
        ).select(
            "doc_id", "lang", "len_band", "n_toks",
            (F.col("pos0") + 1).alias("pos"), F.col("pt.token").alias("token"),
        )
        cand = candidates(pref, JACCARD_T)
        tsdf = agg.select("doc_id", F.expr("transform(st, x -> x.token)").alias("ts"))
        ta = tsdf.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
        tb = tsdf.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
        pairs = cand.join(ta, "doc_a").join(tb, "doc_b")
        inter = F.size(F.array_intersect("ts_a", "ts_b"))
        jac = inter.cast("double") / (F.size("ts_a") + F.size("ts_b") - inter)
        return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
            jac >= JACCARD_T
        )

    def run_new():
        agg = spark.read.parquet(new_dir)
        pref = agg.select(
            "doc_id", "lang", "len_band", "n_toks",
            F.posexplode(F.slice("st", F.lit(1), prefix_len)).alias("pos0", "token"),
        ).select(
            "doc_id", "lang", "len_band", "n_toks",
            (F.col("pos0") + 1).alias("pos"), "token",
        )
        cand = candidates(pref, JACCARD_T)
        tsdf = agg.select("doc_id", F.col("st").alias("ts"))
        ta = tsdf.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
        tb = tsdf.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
        pairs = cand.join(ta, "doc_a").join(tb, "doc_b")
        inter = F.size(F.array_intersect("ts_a", "ts_b"))
        jac = inter.cast("double") / (F.size("ts_a") + F.size("ts_b") - inter)
        return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
            jac >= JACCARD_T
        )

    # ---- exactness: identical result sets ---------------------------
    old_rows = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in run_legacy().collect()}
    new_rows = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in run_new().collect()}
    assert old_rows == new_rows, (
        f"MISMATCH: {len(old_rows)} legacy vs {len(new_rows)} new; "
        f"diff={list(old_rows ^ new_rows)[:5]}"
    )
    print(f"results identical: {len(new_rows)} pairs", flush=True)

    # index byte sizes on disk (the broadcast/shuffle-byte proxy)
    def du(path):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path) for f in fs
        )

    print(f"index bytes: legacy={du(legacy_dir)} new={du(new_dir)}", flush=True)

    # ---- interleaved timing -----------------------------------------
    def noop(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for fn in (run_legacy, run_new):  # warm both shapes
        noop(fn())
    times: dict[str, list[float]] = {"legacy": [], "new": []}
    for rep in range(args.reps):
        for tag, fn in (("new", run_new), ("legacy", run_legacy)):
            dt = noop(fn())
            times[tag].append(dt)
            print(f"rep{rep} {tag}: {dt:.3f}s", flush=True)
    for tag, ts in times.items():
        print(
            f"{tag}: floor={min(ts):.3f} median={statistics.median(ts):.3f} "
            f"mean={statistics.mean(ts):.3f} (n={len(ts)})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
