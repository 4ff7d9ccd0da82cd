"""Subprocess driver for the SIGKILL crash tests.

Runs ONE lake table operation in its own process so the parent test
can arm the ``LAPIDUS_FAILPOINT=lake_merge.before_manifest_flip`` env
var and observe a genuine kill-mid-commit (the process SIGKILLs
itself at the commit point — nothing in the op can catch or finalize
around it; the writer lock is left behind STALE, which is exactly
what the next writer's dead-pid lock-breaking must handle).

    python tests/lake_crash_driver.py <lake_dir> <sf_dir> merge <mod> <rem>
    python tests/lake_crash_driver.py <lake_dir> <sf_dir> compact
    python tests/lake_crash_driver.py <lake_dir> <sf_dir> rebucket <n>

merge merges ``events`` rows with ``event_seq % mod == rem``;
compact/rebucket run the maintenance ops. Prints OP_OK on success.
"""

from __future__ import annotations

import sys


def main() -> None:
    lake, sf_dir, op = sys.argv[1], sys.argv[2], sys.argv[3]
    from pyspark.sql import functions as F

    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table
    from lapidus_spark.streaming.materialize import (
        compact_lake,
        merge_batch_into_lake,
        rebucket_lake,
    )

    spark = get_spark("lake_crash_driver", cpus=4)
    if op == "merge":
        mod, rem = int(sys.argv[4]), int(sys.argv[5])
        env = normalize_events(load_table(spark, sf_dir, "events"))
        merge_batch_into_lake(env.filter(F.col("event_seq") % mod == rem), lake)
    elif op == "compact":
        compact_lake(spark, lake)
    elif op == "rebucket":
        rebucket_lake(spark, lake, int(sys.argv[4]))
    else:
        raise SystemExit(f"unknown op {op!r}")
    spark.stop()
    print("OP_OK")


if __name__ == "__main__":
    main()
