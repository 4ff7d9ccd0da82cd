"""Lake→lake streaming replication end-to-end (VERDICT r11 #2): the
reference's entire purpose — tail one store, materialize another
(``package.json:3``) — carried on the lake plane as ``lake_cdf``
source → ``predicate_merge_sink`` replica.

Pinned here, beyond the oracle-gated ``stream_lake_replicate`` query:
the SIGKILL-mid-commit + checkpoint-resume story (a subprocess driver
killed at the replica's second manifest flip leaves a torn batch and
a stale writer lock; the restart resumes at the committed offset,
redelivers the torn epoch — marker-free — and drains to snapshot
equality), marker-idempotent re-runs (no source movement → no replica
movement), and incremental catch-up (a fourth source commit applies
as exactly one more replica version)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys

from pyspark.sql import functions as F

import lapidus_spark.streaming.materialize as M
from lapidus_spark.lake.log import LOCK_NAME, _read_manifest
from lapidus_spark.sources.cdc import normalize_events
from lapidus_spark.sources.tables import load_table
from tests.conftest import SF_DIR

CMP = ["entity_id", "last_seq", "item"]


def _snap(spark, lake):
    return sorted(
        map(
            tuple,
            M.read_lake_snapshot(spark, lake)
            .select(*CMP, F.col("last_ts").cast("timestamp_ntz").alias("last_ts"))
            .collect(),
        )
    )


def test_replication_survives_sigkill_and_stays_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    replica = str(tmp_path / "replica")
    ckpt = str(tmp_path / "ckpt")
    env = normalize_events(load_table(spark, SF_DIR, "events"))
    for i in (0, 1, 2):
        M.merge_batch_into_lake(
            env.filter(F.col("event_seq") % 3 == i), src, retain_versions=8
        )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_env = dict(os.environ, SPARK_DRIVER_MEMORY="2g", PYTHONPATH=repo_root)
    args = [sys.executable, "tests/replicate_crash_driver.py", src, replica, ckpt]

    # run 1: SIGKILLed mid-flip of the replica's SECOND merge — batch 1
    # committed, batch 2 torn off, the dead writer's lock left behind
    p = subprocess.run(
        args,
        env=dict(base_env, LAPIDUS_FAILPOINT="lake_merge.before_manifest_flip:2"),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == -signal.SIGKILL, (p.returncode, p.stderr[-2000:])
    m = _read_manifest(replica)
    assert m is not None and m["version"] == 1
    assert os.path.exists(os.path.join(replica, LOCK_NAME))

    # run 2: resumes at the committed offset (breaking the dead lock),
    # redelivers the torn epoch, drains — replica ≡ source snapshot
    p = subprocess.run(args, env=base_env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0 and "REPL_OK" in p.stdout, p.stderr[-2000:]
    assert _snap(spark, replica) == _snap(spark, src)
    v_drained = _read_manifest(replica)["version"]

    # run 3: no source movement → no replica movement (committed
    # offsets upstream, txn markers downstream — both stand)
    p = subprocess.run(args, env=base_env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0 and "REPL_OK" in p.stdout, p.stderr[-2000:]
    assert _read_manifest(replica)["version"] == v_drained
    assert _snap(spark, replica) == _snap(spark, src)

    # run 4: one more source commit (including fresh deletes) catches
    # up as exactly ONE more replica version
    M.merge_batch_into_lake(
        env.filter(F.col("event_seq") % 7 == 3).withColumn(
            "event_seq", F.col("event_seq") + 1_000_000
        ).withColumn(
            "type", F.when(F.col("event_seq") % 2 == 0, "delete").otherwise("update")
        ),
        src,
        retain_versions=8,
    )
    p = subprocess.run(args, env=base_env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0 and "REPL_OK" in p.stdout, p.stderr[-2000:]
    assert _read_manifest(replica)["version"] == v_drained + 1
    assert _snap(spark, replica) == _snap(spark, src)
