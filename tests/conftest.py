from __future__ import annotations

import pytest

from lapidus_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: spawns a subprocess SparkSession (SIGKILL crash tests)"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lapidus_spark_tests", cpus=8)
    yield s
    s.stop()
