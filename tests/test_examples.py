"""Smoke tests for the runnable examples — artifacts must not rot."""

from __future__ import annotations

import subprocess
import sys


def test_curate_corpus_example_runs():
    """The end-to-end curation pipeline runs on sf0.001 and prints a
    monotonically shrinking funnel plus a total split manifest."""
    out = subprocess.run(
        [sys.executable, "examples/curate_corpus.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
        check=True,
    ).stdout
    assert "== curation funnel ==" in out and "== final manifest ==" in out
    import re

    funnel = [int(m) for m in re.findall(r"^\s+[\w+-]+: (\d+)$", out, re.M)]
    # intake >= span-hygiene >= quality >= exact-dedup >=
    # post-dedup+decontam >= domain-cap > 0
    stages = funnel[:6]
    assert stages == sorted(stages, reverse=True) and stages[-1] > 0
    manifest = [int(m) for m in re.findall(r"^\s+(?:train|val|test): (\d+) docs$", out, re.M)]
    assert sum(manifest) == stages[-1]


def test_curate_stream_example_runs():
    """The continuous-ingestion arm runs on sf0.001: arrivals are
    classified against the standing fingerprint index, admitted docs
    are centroid-routed, and the cell-partitioned intake accounts for
    every admitted doc."""
    import re

    out = subprocess.run(
        [sys.executable, "examples/curate_stream.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
        check=True,
    ).stdout
    assert "== ingestion funnel ==" in out and "== intake by cell" in out
    funnel = {
        m[0]: int(m[1]) for m in re.findall(r"^\s+(\w+): (\d+)$", out, re.M)
    }
    assert (
        funnel["arrived"]
        == funnel["dup_dropped"] + funnel["admitted"] + funnel["deferred"]
    )
    assert funnel["admitted"] > 0 and funnel["dup_dropped"] > 0
    total = int(re.search(r"total intake: (\d+) docs", out).group(1))
    assert total == funnel["admitted"] + funnel["deferred"]


def test_sql_lake_roundtrip_example_runs():
    """The zero-import produce → consume → replicate round trip runs
    on sf0.001 end to end (df.write format lake, SQL reads, rowChanges
    feed, lake_cdf → lake streaming replication)."""
    out = subprocess.run(
        [sys.executable, "examples/sql_lake_roundtrip.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
        check=True,
    ).stdout
    assert "== snapshot ==" in out
    assert "update_preimage" in out and "update_postimage" in out
    assert "replica matches source: True" in out
