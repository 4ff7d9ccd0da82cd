"""Measured comparison of the lake's two merge-concurrency modes.

    python experiments/occ_vs_locked.py [sf_dir]   # default sf0.01

Three arrangements merge the SAME six event batches (event_seq % 6)
into a fresh lake and are timed end-to-end (process startup included
for the multi-process arms, identically on both, so the comparison is
fair):

  serial_locked   — one process, six locked merges (the r7 baseline)
  serial_occ      — one process, six optimistic merges (protocol
                    overhead in the uncontended case: nonce staging +
                    flip-lock round trip + stamp bookkeeping)
  concurrent_occ  — two processes, three optimistic merges each,
                    racing for real (what locked mode cannot run at
                    all: a second locked writer just gets
                    ConcurrentMergeError)

All three must converge to the identical snapshot (asserted via the
LWW oracle); the interesting output is wall-clock plus the conflict
accounting (versions == 6 always — every commit serialized).

Worker mode (internal): occ_vs_locked.py worker <lake> <sf_dir>
<mode> <writer_id> <n_writers>
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def worker(lake: str, sf_dir: str, mode: str, wid: int, n_writers: int) -> None:
    from pyspark.sql import functions as F

    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table
    from lapidus_spark.streaming.materialize import (
        merge_batch_into_lake,
        merge_batch_optimistic,
    )

    spark = get_spark(f"occ_exp_{mode}_{wid}", cpus=8)
    env = normalize_events(load_table(spark, sf_dir, "events"))
    per = 6 // n_writers
    for i in range(per):
        residue = wid * per + i
        batch = env.filter(F.col("event_seq") % 6 == residue)
        if mode == "locked":
            merge_batch_into_lake(batch, lake, n_buckets=None, retain_versions=2)
        else:
            merge_batch_optimistic(
                batch, lake, n_buckets=None, retain_versions=2, flip_wait_s=120.0
            )
    spark.stop()
    print("WORKER_OK")


def run_arm(name: str, lake: str, sf_dir: str, mode: str, n_writers: int) -> float:
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", lake, sf_dir, mode, str(w), str(n_writers)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_writers)
    ]
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0 and "WORKER_OK" in out, (name, err[-2000:])
    return round(time.perf_counter() - t0, 2)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]), int(sys.argv[6]))
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import tempfile

    from lapidus_spark.session import get_spark
    from lapidus_spark.sources.cdc import normalize_events
    from lapidus_spark.sources.tables import load_table
    from lapidus_spark.streaming.materialize import (
        _read_manifest,
        merge_batch_into_lake,
        read_lake_snapshot,
    )

    arms = {}
    lakes = {}
    for name, mode, n in (
        ("serial_locked", "locked", 1),
        ("serial_occ", "occ", 1),
        ("concurrent_occ", "occ", 2),
    ):
        lake = tempfile.mkdtemp(prefix=f"occ_exp_{name}_")
        lakes[name] = lake
        arms[name] = run_arm(name, lake, sf_dir, mode, n)
        print(f"{name}: {arms[name]} s", flush=True)

    spark = get_spark("occ_exp_check", cpus=16)
    oracle_lake = tempfile.mkdtemp(prefix="occ_exp_oracle_")
    env = normalize_events(load_table(spark, sf_dir, "events"))
    merge_batch_into_lake(env, oracle_lake)

    def rows(lake):
        return sorted(
            map(
                tuple,
                read_lake_snapshot(spark, lake)
                .select("entity_id", "last_seq", "last_type")
                .collect(),
            )
        )

    expect = rows(oracle_lake)
    versions = {}
    for name, lake in lakes.items():
        assert rows(lake) == expect, f"{name} diverged from the LWW oracle"
        versions[name] = _read_manifest(lake)["version"]
    out = {
        "sf_dir": sf_dir,
        "wall_clock_s": arms,
        "final_versions": versions,
        "snapshots_identical": True,
    }
    print(json.dumps(out, indent=1))
    with open(f"{REPO}/experiments/occ_vs_locked_result.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
