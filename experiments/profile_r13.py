#!/usr/bin/env python
"""Round-13 optimization profiling harness.

Times a named subset of registered queries at sf0.1 through the
bench's own protocol (noop sink, warm JVM) and, with --explain, dumps
each query's .explain("formatted") to plans/r13/<name>_<tag>.txt so
plan claims in OPTIMIZATION_r13.md are checkable offline.

    python experiments/profile_r13.py --tag before q1 q2 ...
    python experiments/profile_r13.py --tag before --reps 3 q1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--tag", default=None, help="dump plans/r13/<q>_<tag>.txt")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from lapidus_spark.plans.registry import load_all
    from lapidus_spark.session import get_spark

    spark = get_spark("profile_r13", cpus=args.cpus)
    reg = load_all()
    warm_dir = "/root/testdata/sf0.001"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in args.queries:
        if name not in reg:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = reg[name].fn
        if not args.no_warm:
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"# warm {name} failed: {e}", file=sys.stderr)
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.endswith("_out"):
                spark.catalog.dropTempView(t.name)
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            for t in spark.catalog.listTables():
                if t.isTemporary and t.name.endswith("_out"):
                    spark.catalog.dropTempView(t.name)
        print(f"{name}: " + " ".join(f"{t:.3f}" for t in times), flush=True)
        if args.tag:
            try:
                plan = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)
            except Exception as e:  # noqa: BLE001
                print(f"# explain {name} failed: {e}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
