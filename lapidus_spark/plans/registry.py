"""Query registry: the declared testable operator surface (SURVEY.md §2.10).

Each operator module registers its queries here via the ``@query``
decorator, pairing a PySpark callable ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB ANSI-SQL oracle string (or ``None`` for
non-SQL-expressible ops, which get a rows-only check).

Exact-match discipline (the driver hashes values order-insensitively
after sorting columns by name):
- identical column aliases on both sides;
- computed numerics are either exact integers (BIGINT) or doubles
  derived from *exact decimal* intermediates, so Spark and DuckDB
  produce bit-identical float64 regardless of parallel sum order;
- sequence-sensitive folds (dot products, rolling hashes) use
  explicit left-folds (`F.aggregate` / `list_reduce`) on both sides
  so the accumulation order is pinned.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    operator: str  # SURVEY.md §2 operator id this query models
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, operator: str, doc: str = ""):
    """Register a (PySpark, oracle-SQL) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, operator=operator, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules so their registrations run."""
    import lapidus_spark.operators.filters  # noqa: F401
    import lapidus_spark.operators.joins  # noqa: F401
    import lapidus_spark.operators.projections  # noqa: F401
    import lapidus_spark.operators.relational  # noqa: F401
    import lapidus_spark.operators.stateful  # noqa: F401
    import lapidus_spark.operators.windows  # noqa: F401
    import lapidus_spark.functions.dedup  # noqa: F401
    import lapidus_spark.functions.multimodal  # noqa: F401
    import lapidus_spark.functions.similarity  # noqa: F401
    import lapidus_spark.functions.text  # noqa: F401
    import lapidus_spark.streaming.queries  # noqa: F401

    return REGISTRY
