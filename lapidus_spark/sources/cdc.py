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


def normalize_mysql(df: DataFrame, pk_columns: dict[str, str], source: str = "mysql_main") -> DataFrame:
    """MySQL binlog rows → canonical envelope.

    Input columns: ``seq, op ('insert'|'update'|'delete'), db, table,
    before, after`` (before/after: MapType(string,string) row images).
    Reference semantics (src/mysql.js:144-269):
    - pk column name comes from binlog tablemap PRIMARY-KEY metadata,
      per table (``constraints.PRIMARY[0]``, mysql.js:119-140) —
      modeled as the ``pk_columns`` table→column map;
    - update carries the after-image only (row.after, mysql.js:235);
    - delete carries pk only, no row image (mysql.js:148-152);
    - MySQL has no transaction ids in this path → tx_id null.
    """
    pk_col = F.lit(None).cast("string")
    for table, col in pk_columns.items():
        image = F.when(F.col("op") == "delete", F.col("before")).otherwise(F.col("after"))
        pk_col = F.when(F.col("table") == table, image.getItem(col)).otherwise(pk_col)
    return df.select(
        F.col("seq").alias("event_seq"),
        F.lit(source).alias("source"),
        F.col("op").alias("type"),
        F.col("db").alias("schema_name"),
        F.col("table").alias("table_name"),
        pk_col.alias("pk"),
        F.when(F.col("op") == "delete", F.lit(None).cast("string"))
        .otherwise(F.to_json(F.col("after")))
        .alias("item"),
        F.lit(None).cast("long").alias("tx_id"),
        F.col("ts"),
    )


def normalize_mongo(df: DataFrame, source: str = "mongo_main") -> DataFrame:
    """Mongo oplog docs → canonical envelope.

    Input columns: ``seq, op ('i'|'u'|'d'), db, collection, o, o2``
    (o/o2: MapType(string,string) — the oplog document and the
    update-target doc). Reference semantics (src/mongo.js:133-272):
    - ns = "db.collection" (mongo.js:141) → split across
      schema_name/table_name in the canonical envelope;
    - pk = o._id || o2._id (mongo.js:139,195,239);
    - update carries the update *operation* doc, not the resulting
      row: item = o2 || o (mongo.js:197, caveat README.md:10-12);
    - delete carries no item at all (mongo.js:237-240, asserted in
      test/mongo.test.js:288,317).
    """
    op_type = (
        F.when(F.col("op") == "i", F.lit("insert"))
        .when(F.col("op") == "u", F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    return df.select(
        F.col("seq").alias("event_seq"),
        F.lit(source).alias("source"),
        op_type.alias("type"),
        F.col("db").alias("schema_name"),
        F.col("collection").alias("table_name"),
        F.coalesce(F.col("o").getItem("_id"), F.col("o2").getItem("_id")).alias("pk"),
        F.when(F.col("op") == "d", F.lit(None).cast("string"))
        .when(F.col("op") == "u", F.to_json(F.coalesce(F.col("o2"), F.col("o"))))
        .otherwise(F.to_json(F.col("o")))
        .alias("item"),
        F.lit(None).cast("long").alias("tx_id"),
        F.col("ts"),
    )


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
