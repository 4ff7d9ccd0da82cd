"""Subprocess writer for the true-parallelism OCC race test: writer
``w`` optimistically merges ``n`` batches (event_seq % 7 == w*n + i,
i in 0..n-1) into a shared lake while a sibling process does the
same for its own residues. No scheduling control — the writers
contend for real on staging, GC, and the flip lock.

    python tests/occ_race_driver.py <lake_dir> <writer_id> <n_batches>

Prints WRITER_OK after its last commit.
"""

from __future__ import annotations

import sys


def main() -> None:
    lake, w, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from pyspark.sql import functions as F

    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table
    from lapidus_spark.streaming.materialize import merge_batch_optimistic

    spark = get_spark(f"occ_writer_{w}", cpus=4)
    env = normalize_events(load_table(spark, "/root/testdata/sf0.001", "events"))
    for i in range(n):
        residue = w * n + i
        merge_batch_optimistic(
            env.filter(F.col("event_seq") % 7 == residue),
            lake,
            n_buckets=None,
            retain_versions=3,
            flip_wait_s=60.0,
        )
    spark.stop()
    print("WRITER_OK")


if __name__ == "__main__":
    main()
