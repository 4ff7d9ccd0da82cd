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
