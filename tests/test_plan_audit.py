"""Plan-shape regression tests: the audited queries must keep their
100 TB plan contract (pushdown reaches the scan, exchange budget
holds, dims broadcast, top-k stays TakeOrderedAndProject)."""

from __future__ import annotations

import pytest

from lapidus_spark.plans.audit import EXPECTATIONS, check, plan_facts
from lapidus_spark.plans.registry import load_all
from tests.conftest import SF_DIR

REG = load_all()


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_contract(spark, name):
    facts = plan_facts(REG[name].fn(spark, SF_DIR))
    errors = check(name, facts, EXPECTATIONS[name])
    assert not errors, f"{name}: {errors}"
