#!/usr/bin/env python
"""Interleaved A/B of the round-14 distributed two-phase vocabulary
rank vs the round-13 single-partition global window, in ONE process.

    python experiments/ab_ngram_rank.py [--reps 5] [--cpus 32]

Times the INDEX BUILD (the path the rank lives on — the query itself
reads the persisted index) and asserts per rep that every doc's
token-id array is identical across variants (the rank must be
bit-equal, not merely order-isomorphic: the committed index bytes and
the props test pin row_number semantics).
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lapidus_spark.functions import dedup
    from lapidus_spark.functions.dedup import LENGTH_BAND, _ngram_df_sorted
    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.tables import load_table

    spark = get_spark("ab_ngram_rank", cpus=args.cpus)
    d = load_table(spark, args.sf_dir, "documents", parallel=True)
    t = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LENGTH_BAND).cast("long").alias("len_band"),
        F.expr("array_distinct(split(lower(text), ' '))").alias("ts"),
    )

    def run_once() -> tuple[float, int]:
        out = tempfile.mkdtemp(prefix="ab_ngram_idx_")
        t0 = time.perf_counter()
        _ngram_df_sorted(t).write.mode("overwrite").parquet(out)
        dt = time.perf_counter() - t0
        h = (
            spark.read.parquet(out)
            .select(
                F.xxhash64("doc_id", F.col("st").cast("string")).alias("h")
            )
            .agg(F.expr("bit_xor(h)"))
            .first()[0]
        )
        return dt, h

    for legacy in (False, True):
        dedup._FORCE_LEGACY_RANK = legacy
        run_once()

    times: dict[str, list[float]] = {"new": [], "legacy": []}
    hashes: dict[str, int] = {}
    for rep in range(args.reps):
        for tag, legacy in (("new", False), ("legacy", True)):
            dedup._FORCE_LEGACY_RANK = legacy
            dt, h = run_once()
            times[tag].append(dt)
            hashes[tag] = h
            print(f"rep{rep} {tag}: {dt:.3f}s", flush=True)
        assert hashes["new"] == hashes["legacy"], ("indexes diverged", hashes)
    dedup._FORCE_LEGACY_RANK = False
    for tag, ts in times.items():
        print(
            f"{tag}: floor={min(ts):.3f} median={statistics.median(ts):.3f} "
            f"mean={statistics.mean(ts):.3f} (n={len(ts)})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
