"""Full-daemon subprocess for the two-daemon OCC end-to-end test:
the COMPLETE config-driven stack (config.parse_config → pipeline.run
→ file backend replay → envelope normalization → lake sink with
``concurrency: "optimistic"``), one OS process per daemon — the
reference's one-worker-per-backend process model (lapidus.js:88-109)
with two daemons sharing ONE lake table through the OCC commit
protocol.

    python tests/occ_daemon_driver.py <config.json> <rendezvous_dir> <n_daemons>

The rendezvous barrier makes the race real: each daemon finishes its
(slow) Spark session + stream setup, drops a ready-file, and waits
for every sibling before its first micro-batch — so the merges
actually interleave instead of serializing behind JVM startup skew.

Prints ``DAEMON_OK conflicts=<n> rebases=<m>`` where the counters are
this process's observed OCC outcomes (lost-and-recomputed races /
flips rebased onto moved manifests).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    cfg_path, rendezvous, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from lapidus_spark.config import parse_config
    from lapidus_spark.session import get_spark
    from lapidus_spark.streaming import pipeline
    import lapidus_spark.streaming.materialize as M

    t0 = time.time()

    def mark(what: str) -> None:
        print(f"[occ_daemon {os.getpid()}] +{time.time() - t0:6.1f}s {what}",
              file=sys.stderr, flush=True)

    with open(cfg_path) as fh:
        cfg = parse_config(fh.read())
    spark = get_spark(f"occ_daemon_{os.getpid()}", cpus=4)
    mark("session up")

    # barrier: sessions are up in every daemon before any batch runs
    os.makedirs(rendezvous, exist_ok=True)
    with open(os.path.join(rendezvous, f"ready.{os.getpid()}"), "w") as fh:
        fh.write("up")
    deadline = time.time() + 120
    while len([f for f in os.listdir(rendezvous) if f.startswith("ready.")]) < n:
        if time.time() > deadline:
            raise TimeoutError("rendezvous: sibling daemon never came up")
        time.sleep(0.1)
    mark("rendezvous passed")

    pipeline.run(spark, cfg)  # availableNow triggers: drain and stop
    mark("drained")
    spark.stop()
    print(f"DAEMON_OK conflicts={M.OCC_CONFLICTS} rebases={M.OCC_REBASES}")


if __name__ == "__main__":
    main()
