#!/usr/bin/env python
"""Interleaved A/B of the round-13 single-exchange merge vs the legacy
aggregate-then-combine shape, in ONE process (the only honest protocol
on this box — serial reps swing 2-3x, BENCH.md variance band).

    python experiments/ab_merge_shape.py [--reps 6] [--cpus 32]

Reports per-variant floors and medians over interleaved reps; each rep
is a fresh 3-commit lake built from the sf0.1 events envelope.
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

    spark = get_spark("ab_merge_shape", cpus=args.cpus)
    env = normalize_events(load_table(spark, args.sf_dir, "events"))

    def run_once() -> float:
        lake = tempfile.mkdtemp(prefix="ab_merge_lake_")
        t0 = time.perf_counter()
        for i in range(3):
            merge.merge_batch_into_lake(
                env.filter(F.col("event_seq") % 3 == i), lake, retain_versions=2
            )
        return time.perf_counter() - t0

    # warm both shapes once
    for legacy in (False, True):
        merge._FORCE_LEGACY_MERGE = legacy
        run_once()

    times: dict[str, list[float]] = {"new": [], "legacy": []}
    for rep in range(args.reps):
        for tag, legacy in (("new", False), ("legacy", True)):
            merge._FORCE_LEGACY_MERGE = legacy
            dt = run_once()
            times[tag].append(dt)
            print(f"rep{rep} {tag}: {dt:.3f}s", flush=True)
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
