from lapidus_spark.plans.registry import REGISTRY, QuerySpec, query  # noqa: F401
