#!/usr/bin/env python
"""Per-batch engine-metric profile of the four heavy NON-merge
streaming queries (VERDICT r13 #7): stream_distinct_watermarked,
stream_funnel_state, stream_stream_join, stream_outer_attrib — the
replicate-style protocol (the engine's own durationMs per trigger),
so the per-phase breakdown is falsifiable.

    python experiments/profile_stream_heavy.py [--cpus 32] [--reps 2]

Monkeypatches streaming.queries._run_to_memory to capture each run's
recentProgress; prints per-batch addBatch / getBatch / walCommit /
commitOffsets / stateOps and the sum per phase.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPTURED: dict[str, list] = {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--queries",
        default="stream_distinct_watermarked,stream_funnel_state,"
        "stream_stream_join,stream_outer_attrib",
    )
    args = ap.parse_args()

    from lapidus_spark.plans.registry import load_all
    from lapidus_spark.session import get_spark
    from lapidus_spark.streaming import queries as sq

    orig = sq._run_to_memory

    def wrapped(df, name, output_mode="append", confs=None, partitions=None,
                process_all=False):
        spark = df.sparkSession
        import tempfile

        from lapidus_spark.plans.audit import clear_stream_run, record_stream_run

        clear_stream_run(name)
        ckpt = tempfile.mkdtemp(prefix=f"prof_{name}_ckpt_")
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        prev_confs = {k: spark.conf.get(k, None) for k in (confs or {})}
        for k, v in (confs or {}).items():
            spark.conf.set(k, v)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(partitions or sq.STREAM_SHUFFLE_PARTITIONS),
        )
        try:
            w = (
                df.writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .outputMode(output_mode)
            )
            if process_all:
                q = w.start()
                try:
                    q.processAllAvailable()
                    record_stream_run(name, q)
                finally:
                    q.stop()
                q.awaitTermination()
            else:
                q = w.trigger(availableNow=True).start()
                q.awaitTermination()
                record_stream_run(name, q)
            CAPTURED[name] = list(q.recentProgress)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            for k, v in prev_confs.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        return spark.table(name)

    sq._run_to_memory = wrapped
    spark = get_spark("profile_stream_heavy", cpus=args.cpus)
    reg = load_all()
    names = args.queries.split(",")

    for rep in range(args.reps):
        for name in names:
            CAPTURED.clear()
            t0 = time.perf_counter()
            reg[name].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            print(f"\n== rep{rep} {name}: {wall:.3f}s wall")
            for run, progs in CAPTURED.items():
                phase_sum: dict[str, float] = collections.defaultdict(float)
                print(f"  run {run}: {len(progs)} batches")
                for p in progs:
                    dm = p.get("durationMs") or {}
                    rows = p.get("numInputRows")
                    parts = [f"rows={rows}"]
                    for k in sorted(dm):
                        phase_sum[k] += dm[k]
                        parts.append(f"{k}={dm[k]}")
                    st = p.get("stateOperators") or []
                    for s in st:
                        parts.append(
                            f"state(rows={s.get('numRowsTotal')},"
                            f"upd={s.get('numRowsUpdated')},"
                            f"commitMs={s.get('commitTimeMs')})"
                        )
                    print(f"    b{p.get('batchId')}: {' '.join(parts)}")
                tot = sum(
                    dm
                    for k, dm in phase_sum.items()
                    if k == "triggerExecution"
                )
                print(
                    f"  run {run} phase sums (ms): "
                    + " ".join(f"{k}={v:.0f}" for k, v in sorted(phase_sum.items()))
                    + f" | triggerExecution total {tot:.0f}ms of {wall*1000:.0f}ms wall"
                )
            for t in spark.catalog.listTables():
                if t.isTemporary and t.name.endswith("_out"):
                    spark.catalog.dropTempView(t.name)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
