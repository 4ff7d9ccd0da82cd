#!/usr/bin/env python
"""Interleaved A/B of the round-14 constrained-merge restructure
(one fused validation+touched job over a fresh snapshot aggregation,
single-exchange staging, no cache) vs the legacy cached
aggregate-then-combine shape, in ONE process.

    python experiments/ab_constraint_merge.py [--reps 6] [--cpus 32]

Each rep replays lake_constraint_merge's shape: base merge, two CHECK
constraints, two constrained merges (the timed region is the two
constrained merges). Snapshot hash parity asserted per rep.
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
        add_constraint,
        merge_batch_into_lake,
        read_lake_snapshot,
    )

    spark = get_spark("ab_constraint_merge", cpus=args.cpus)
    env = normalize_events(load_table(spark, args.sf_dir, "events"))

    def run_once() -> tuple[float, int]:
        lake = tempfile.mkdtemp(prefix="ab_cons_lake_")
        merge_batch_into_lake(
            env.filter(F.col("event_seq") % 3 == 0), lake, retain_versions=6
        )
        add_constraint(
            spark, lake, "pk_present", "entity_id IS NOT NULL", retain_versions=6
        )
        add_constraint(spark, lake, "seq_nonneg", "last_seq >= 0", retain_versions=6)
        t0 = time.perf_counter()
        for i in (1, 2):
            merge_batch_into_lake(
                env.filter(F.col("event_seq") % 3 == i),
                lake,
                n_buckets=None,
                retain_versions=6,
            )
        dt = time.perf_counter() - t0
        snap_hash = (
            read_lake_snapshot(spark, lake)
            .select(F.xxhash64("entity_id", "last_seq", "last_type", "item").alias("h"))
            .agg(F.expr("bit_xor(h)"))
            .first()[0]
        )
        return dt, snap_hash

    for legacy in (False, True):
        merge._FORCE_LEGACY_MERGE = legacy
        run_once()

    times: dict[str, list[float]] = {"new": [], "legacy": []}
    hashes: dict[str, int] = {}
    for rep in range(args.reps):
        for tag, legacy in (("new", False), ("legacy", True)):
            merge._FORCE_LEGACY_MERGE = legacy
            dt, h = run_once()
            times[tag].append(dt)
            hashes[tag] = h
            print(f"rep{rep} {tag}: {dt:.3f}s", flush=True)
        assert hashes["new"] == hashes["legacy"], ("snapshots diverged", hashes)
    merge._FORCE_LEGACY_MERGE = False
    for tag, ts in times.items():
        print(
            f"{tag}: floor={min(ts):.3f} median={statistics.median(ts):.3f} "
            f"mean={statistics.mean(ts):.3f} (n={len(ts)})"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
