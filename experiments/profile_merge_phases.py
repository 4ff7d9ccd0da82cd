#!/usr/bin/env python
"""Phase-level timing of the lake merge path (round-13 §1 measurement).

Monkeypatches timed wrappers around the merge internals and runs a
representative 3-commit merge sequence at sf0.1, reporting where each
merge's wall-clock goes:

    python experiments/profile_merge_phases.py [--cpus 32]
"""

from __future__ import annotations

import argparse
import collections
import functools
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: dict[str, list[float]] = collections.defaultdict(list)


def timed(mod, name: str):
    fn = getattr(mod, name)

    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            PHASES[name].append(time.perf_counter() - t0)

    setattr(mod, name, wrap)
    return fn


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--merges", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lapidus_spark.lake import log, merge
    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table

    # instrument the merge internals
    timed(merge, "_merged_for_batch")
    timed(merge, "snapshot_stream")
    timed(merge, "_evolved_schema")
    timed(merge, "_enforce_constraints")
    timed(log, "_read_live")
    timed(log, "_stage_commit")
    timed(log, "_flip_version")
    timed(log, "_publish_version")
    # _publish_version calls _stage_commit + _flip_version; read it as a total

    spark = get_spark("profile_merge", cpus=args.cpus)
    env = normalize_events(load_table(spark, args.sf_dir, "events"))

    # warm codegen once at tiny scale
    warm_env = normalize_events(load_table(spark, "/root/testdata/sf0.001", "events"))
    warm_lake = tempfile.mkdtemp(prefix="prof_warm_lake_")
    merge.merge_batch_into_lake(warm_env, warm_lake, retain_versions=2)

    for rep in range(2):
        PHASES.clear()
        lake = tempfile.mkdtemp(prefix="prof_merge_lake_")
        t0 = time.perf_counter()
        for i in range(args.merges):
            t1 = time.perf_counter()
            merge.merge_batch_into_lake(
                env.filter(F.col("event_seq") % args.merges == i),
                lake,
                retain_versions=4,
                txn=("prof", i),
            )
            print(f"rep{rep} merge{i}: {time.perf_counter() - t1:.3f}s", flush=True)
        total = time.perf_counter() - t0
        print(f"rep{rep} total {args.merges} merges: {total:.3f}s")
        for name, ts in sorted(PHASES.items(), key=lambda kv: -sum(kv[1])):
            print(
                f"  {name:24s} n={len(ts):2d} sum={sum(ts):7.3f}s "
                f"each={' '.join(f'{t:.3f}' for t in ts)}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
