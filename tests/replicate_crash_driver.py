"""Subprocess driver for the lake→lake REPLICATION crash test
(VERDICT r11 #2): the full replication pipeline — ``lake_cdf``
streaming source → clause mapping → ``predicate_merge_sink`` into a
replica lake — run in its own process so the parent test can arm
``LAPIDUS_FAILPOINT=lake_merge.before_manifest_flip:N`` and SIGKILL
this consumer mid-commit of its N-th replica merge: a genuine kill
across BOTH exactly-once layers at once (streaming checkpoint offsets
upstream, atomic manifest flip downstream), with the predicate
MERGE's txn markers as the third leg.

    python tests/replicate_crash_driver.py <src_lake> <replica> <ckpt>

Prints REPL_OK after a clean catch-up drain.
"""

from __future__ import annotations

import sys


def main() -> None:
    src_lake, replica, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
    from lapidus_spark.session import get_spark
    from lapidus_spark.streaming.queries import replicate_lake_stream

    spark = get_spark("replicate_crash_driver", cpus=4)
    q = replicate_lake_stream(spark, src_lake, replica, ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    spark.stop()
    print("REPL_OK")


if __name__ == "__main__":
    main()
