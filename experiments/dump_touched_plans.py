#!/usr/bin/env python
"""Dump before/after formatted plans for the round-13 touched queries.

The returned DataFrames of the merge-family queries are snapshot
reads whose plans the restructure does NOT change (the claim lives in
the merge staging job — merge_commit_{before,after}.txt); these pairs
prove exactly that: the consumer-facing plan is byte-stable.

    python experiments/dump_touched_plans.py after q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from lapidus_spark.plans.registry import load_all
    from lapidus_spark.session import get_spark

    spark = get_spark("dump_touched_plans", cpus=8)
    reg = load_all()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    sf = "/root/testdata/sf0.01"
    for name in names:
        df = reg[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "exchanges:", plan.count("Exchange"))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
