"""Plan-shape regression tests: the audited queries must keep their
100 TB plan contract (pushdown reaches the scan, exchange budget
holds, dims broadcast, top-k stays TakeOrderedAndProject)."""

from __future__ import annotations

import pytest

from lapidus_spark.plans.audit import (
    EXPECTATIONS,
    STREAM_EXPECTATIONS,
    STREAM_RUN_FACTS,
    check,
    check_stream,
    plan_facts,
)
from lapidus_spark.plans.registry import load_all
from tests.conftest import SF_DIR

REG = load_all()


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_contract(spark, name):
    facts = plan_facts(REG[name].fn(spark, SF_DIR))
    errors = check(name, facts, EXPECTATIONS[name])
    assert not errors, f"{name}: {errors}"


@pytest.mark.parametrize("name", sorted(STREAM_EXPECTATIONS))
def test_stream_contract(spark, name):
    """Streaming plans only exist once executed: run the query live,
    then assert the facts its runner recorded (state operators,
    bounded state partitioning, watermarks, micro-batch counts)."""
    REG[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    facts = STREAM_RUN_FACTS[name]
    errors = check_stream(name, facts, STREAM_EXPECTATIONS[name])
    assert not errors, f"{name}: {errors}"


def test_every_query_has_a_contract():
    """Every registered query is covered by exactly one contract
    layer — batch plan-shape or executed-stream facts."""
    covered = set(EXPECTATIONS) | set(STREAM_EXPECTATIONS)
    missing = sorted(set(REG) - covered)
    assert not missing, f"queries without a plan contract: {missing}"
    unknown = sorted(covered - set(REG))
    assert not unknown, f"contracts for unregistered queries: {unknown}"


def test_clear_stream_run_normalizes_sink_names():
    """clear_stream_run must strip the '_out' sink suffix exactly as
    record_stream_run does — _run_to_memory passes the sink name, and
    an unnormalized pop would silently leave the previous run's facts
    in place (the ADVICE-r5 staleness bug's original fix was exactly
    this no-op)."""
    from lapidus_spark.plans.audit import clear_stream_run

    STREAM_RUN_FACTS["stream_policy_probe"] = object()
    clear_stream_run("stream_policy_probe_out")
    assert "stream_policy_probe" not in STREAM_RUN_FACTS
    STREAM_RUN_FACTS["stream_policy_probe"] = object()
    clear_stream_run("stream_policy_probe")
    assert "stream_policy_probe" not in STREAM_RUN_FACTS


def test_pagerank_builder_runs_no_spark_jobs(spark):
    """VERDICT r6 #2: ext_pagerank's join-strategy guard must come
    from the build-time statistic (stats.json beside the persisted
    graph), not a driver-side count — on the warm path, CONSTRUCTING
    the query DataFrame must trigger zero Spark jobs (at 100 TB edge
    scale an eager guard job costs a full aggregation before the
    real query starts)."""
    from lapidus_spark.operators.graph import build_trade_graph, ext_pagerank

    build_trade_graph(spark, SF_DIR)  # warm: one-time ingest work
    sc = spark.sparkContext
    sc.setJobGroup("pr_builder_audit", "pagerank builder must be lazy")
    try:
        df = ext_pagerank(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("pr_builder_audit")
    assert list(jobs) == [], f"builder ran Spark jobs: {jobs}"
    assert df.columns == ["node", "rank_q"]
