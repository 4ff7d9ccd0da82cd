"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (last-write-wins CDC
snapshot) on sf0.001; ``queries()``/``oracle_sql()`` expose the full
declared operator surface from the lapidus_spark registry
(SURVEY.md §2.10) — each key pairs a PySpark callable with its DuckDB
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lapidus_spark.plans.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: current state of every entity from its event history
    (win_cdc_snapshot — the canonical consumer of a CDC stream)."""
    reg = load_all()
    return reg["win_cdc_snapshot"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
