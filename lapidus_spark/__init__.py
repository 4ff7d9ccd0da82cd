"""lapidus_spark — a PySpark-native rebuild of the capabilities of
JarvusInnovations/lapidus (a CDC event streamer), extended with
LLM-data-pipeline operators, designed for 100 TB scale.

Architecture (Spark-first, not a port):

- ``sources``   — batch parquet loaders + the canonical CDC envelope
                  schema and per-source normalizers (reference:
                  src/postgresql.js:471-480, src/mysql.js:144-269,
                  src/mongo.js:133-272).
- ``operators`` — the declared batch operator surface (filters,
                  projections, stateful assembly, relational proofs).
- ``functions`` — LLM-pipeline extensions: dedup, similarity search,
                  text analysis, multimodal columns.
- ``plans``     — the query registry: every operator registers a
                  (PySpark callable, DuckDB oracle SQL) pair.
- ``streaming`` — Structured Streaming parity: envelope pipeline,
                  transaction assembler, sink factories, config/CLI.

Every query is DataFrame-first; Catalyst handles pushdown/pruning;
no RDDs, no driver-side collect loops in any operator.
"""

__version__ = "0.1.0"

from lapidus_spark.plans.registry import REGISTRY, QuerySpec  # noqa: F401
