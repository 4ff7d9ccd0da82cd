"""Subprocess driver for the SIGKILL crash tests.

Runs ONE lake merge in its own process so the parent test can arm the
``LAPIDUS_FAILPOINT=lake_merge.before_manifest_flip`` env var and
observe a genuine kill-mid-commit (the process SIGKILLs itself at the
commit point — nothing in the merge can catch or finalize around it).

    python tests/lake_crash_driver.py <lake_dir> <sf_dir> <mod> <rem>

merges ``events`` rows with ``event_seq % mod == rem`` into
``lake_dir`` and prints MERGE_OK on success.
"""

from __future__ import annotations

import sys


def main() -> None:
    lake, sf_dir, mod, rem = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    from pyspark.sql import functions as F

    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table
    from lapidus_spark.streaming.materialize import merge_batch_into_lake

    spark = get_spark("lake_crash_driver", cpus=4)
    env = normalize_events(load_table(spark, sf_dir, "events"))
    merge_batch_into_lake(env.filter(F.col("event_seq") % mod == rem), lake)
    spark.stop()
    print("MERGE_OK")


if __name__ == "__main__":
    main()
