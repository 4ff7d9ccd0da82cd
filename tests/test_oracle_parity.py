"""The local mirror of the driver's t2 correctness gate: every
registered query with an oracle must exact-match DuckDB at sf0.001.
"""

from __future__ import annotations

import pytest

from lapidus_spark.plans.registry import load_all
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection

REG = load_all()
WITH_ORACLE = sorted(name for name, spec in REG.items() if spec.oracle is not None)
ROWS_ONLY = sorted(name for name, spec in REG.items() if spec.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = REG[name]
    report = compare(spec.fn(spark, SF_DIR), duck, spec.oracle)
    assert report["ok"], f"{name}: {report['detail']} rows={report['rows']} cols={report['cols']}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    df = REG[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
