"""Canonical CDC change-event envelope and normalizers.

The reference builds one envelope shape per row change across all
three backends — ``{type, schema, table, pk, item, txId}``
(reference: src/postgresql.js:471-480 for PG insert/update,
src/postgresql.js:416-425 for PG delete, src/mysql.js:144-269,
src/mongo.js:133-272). We declare it once as a Spark ``StructType``
shared by batch and streaming, and normalize each source into it with
pure column expressions (JVM-side, whole-stage-codegen friendly).

The driver's ``events`` fixture plays the role of the CDC stream
(FIXTURES.md §B): ``event_id``→arrival seq, ``event_type``→envelope
type, ``user_id``→entity/tx key, ``props``→JSON row image, ``ts``→
commit timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Envelope schema (SURVEY.md §1.4 / FIXTURES.md §A3).
ENVELOPE_SCHEMA = StructType(
    [
        StructField("event_seq", LongType(), False),
        StructField("source", StringType(), False),
        StructField("type", StringType(), False),
        StructField("schema_name", StringType(), True),
        StructField("table_name", StringType(), True),
        StructField("pk", StringType(), True),
        StructField("item", StringType(), True),
        StructField("tx_id", LongType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

#: Mapping of fixture event_type → CDC action, modeling the reference's
#: three DML families (insert/update/delete, src/postgresql.js:400-469).
CDC_TYPE_EXPR = (
    "CASE event_type WHEN 'signup' THEN 'insert' "
    "WHEN 'error' THEN 'delete' ELSE 'update' END"
)


def cdc_type_col() -> Column:
    return F.expr(CDC_TYPE_EXPR)


def normalize_events(
    df: DataFrame,
    source: str = "pg_main",
    schema_name: str = "public",
    table_name: str = "users",
) -> DataFrame:
    """events fixture → canonical envelope (prj_envelope).

    Mirrors the per-source envelope builders (src/postgresql.js:471-480):
    full-image insert/update, key-only delete (item dropped — the
    reference's delete carries replica-identity keys only,
    src/postgresql.js:416-425), pk extraction per §1.3, tx stamp.
    """
    typ = cdc_type_col()
    return df.select(
        F.col("event_id").alias("event_seq"),
        F.lit(source).alias("source"),
        typ.alias("type"),
        F.lit(schema_name).alias("schema_name"),
        F.lit(table_name).alias("table_name"),
        F.col("user_id").cast("string").alias("pk"),
        # delete carries no row image (src/mysql.js:148-152)
        F.when(typ == "delete", F.lit(None).cast("string"))
        .otherwise(F.col("props"))
        .alias("item"),
        F.col("user_id").alias("tx_id"),
        F.col("ts").alias("ts"),
    )
