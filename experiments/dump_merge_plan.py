#!/usr/bin/env python
"""Dump the physical plan of the merge staging job (the `merged`
DataFrame `_stage_commit` writes) — the plan evidence for the round-13
merge-path restructure. Usage:

    python experiments/dump_merge_plan.py plans/r13/merge_commit_before.txt
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from lapidus_spark.lake import log, merge
    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table

    spark = get_spark("dump_merge_plan", cpus=8)
    env = normalize_events(load_table(spark, sf_dir, "events"))
    lake = tempfile.mkdtemp(prefix="dump_merge_lake_")
    # first merge establishes the table; the second is the steady-state
    # merge whose staging plan we record (current buckets + batch)
    merge.merge_batch_into_lake(env.filter(F.col("event_seq") % 2 == 0), lake)

    captured = {}
    orig = log._stage_commit

    def spy(lake_dir, rows, touched, commit_rel, max_records_per_file=None):
        captured["plan"] = rows._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        return orig(lake_dir, rows, touched, commit_rel, max_records_per_file)

    log._stage_commit = spy
    try:
        merge.merge_batch_into_lake(env.filter(F.col("event_seq") % 2 == 1), lake)
    finally:
        log._stage_commit = orig
    with open(out_path, "w") as fh:
        fh.write(captured["plan"])
    n_exch = captured["plan"].count("Exchange")
    n_scan = captured["plan"].count("InMemoryTableScan")
    print(f"wrote {out_path}: {n_exch} Exchange node refs, "
          f"{n_scan} InMemoryTableScan refs")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
