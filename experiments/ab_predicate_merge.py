#!/usr/bin/env python
"""Interleaved A/B of the round-14 predicate-merge restructure
(observe()-based action counts + persisted pruned stored-bucket read)
vs the round-13 shape (separate groupBy-count job + double stored-
bucket scan), in ONE process — the only honest protocol on this box
(serial reps swing 2-3x, BENCH.md variance band).

    python experiments/ab_predicate_merge.py [--reps 6] [--cpus 32]

Each rep builds a fresh base lake from the sf0.1 events envelope and
times ONE merge_into_lake with the lake_merge_predicates clause set.
Result parity is asserted per rep: the returned counts and the final
snapshot hash must be identical across variants.
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
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lapidus_spark.lake import merge
    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table
    from lapidus_spark.streaming.materialize import (
        merge_batch_into_lake,
        merge_into_lake,
        read_lake_snapshot,
    )

    spark = get_spark("ab_predicate_merge", cpus=args.cpus)
    events = load_table(spark, args.sf_dir, "events")
    env = normalize_events(events)
    source = events.groupBy(F.col("user_id").cast("string").alias("pk")).agg(
        F.count("*").alias("cnt"), F.max("props").alias("tag")
    )

    def run_once() -> tuple[float, dict, int]:
        lake = tempfile.mkdtemp(prefix="ab_predmerge_lake_")
        merge_batch_into_lake(env, lake, retain_versions=2)
        t0 = time.perf_counter()
        res = merge_into_lake(
            source,
            lake,
            stamp_seq=9_000_000_000,
            stamp_ts="2030-01-01 00:00:00",
            when_matched=(
                {"condition": "source.cnt >= 67",
                 "update": {"item": "concat('hot:', source.tag)"}},
                {"condition": "source.cnt <= 60", "delete": True},
            ),
            when_not_matched=(
                {"condition": "source.cnt >= 67", "insert": {"item": "'revived'"}},
            ),
            retain_versions=2,
        )
        dt = time.perf_counter() - t0
        snap_hash = (
            read_lake_snapshot(spark, lake)
            .select(F.xxhash64("entity_id", "last_seq", "last_type", "item").alias("h"))
            .agg(F.expr("bit_xor(h)"))
            .first()[0]
        )
        return dt, res, snap_hash

    # warm both shapes once
    for legacy in (False, True):
        merge._FORCE_LEGACY_PREDICATE = legacy
        run_once()

    times: dict[str, list[float]] = {"new": [], "legacy": []}
    results: dict[str, tuple] = {}
    for rep in range(args.reps):
        for tag, legacy in (("new", False), ("legacy", True)):
            merge._FORCE_LEGACY_PREDICATE = legacy
            dt, res, h = run_once()
            times[tag].append(dt)
            results[tag] = (res, h)
            print(f"rep{rep} {tag}: {dt:.3f}s counts={res}", flush=True)
        assert results["new"] == results["legacy"], (
            "variant results diverged",
            results,
        )
    merge._FORCE_LEGACY_PREDICATE = False
    for tag, ts in times.items():
        print(
            f"{tag}: floor={min(ts):.3f} median={statistics.median(ts):.3f} "
            f"mean={statistics.mean(ts):.3f} (n={len(ts)})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
