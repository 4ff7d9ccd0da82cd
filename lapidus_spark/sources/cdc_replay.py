"""Oracle-gated replay queries for the MySQL-binlog and Mongo-oplog
normalizers (src_my, src_mg) — the same decode∘encode-identity trick
as the jsoncdc replay: binlog/oplog-shaped frames are synthesized
from the ``events`` table with pure column expressions, pushed
through the real normalizers, and the DuckDB oracle states the
expected envelope directly from ``events``.

Reference semantics under test:
- MySQL (src/mysql.js:144-269): pk column name from binlog tablemap
  PRIMARY-KEY metadata; update carries the after-image only; delete
  carries the before-image keys and NO row image; no tx ids.
- Mongo (src/mongo.js:133-272): ns split into db/collection; pk =
  ``o._id || o2._id``; update item is the oplog's ``o2 ∥ o`` (the
  target-row doc, not the resulting row — the caveat the reference
  documents in README.md:10-12); delete carries no item.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.cdc import (
    CDC_TYPE_EXPR,
    normalize_mongo,
    normalize_mysql,
)
from lapidus_spark.sources.tables import load_table

#: CASE mapping shared by the oracles.
_ORACLE_TYPE = (
    "CASE event_type WHEN 'signup' THEN 'insert' "
    "WHEN 'error' THEN 'delete' ELSE 'update' END"
)


def _mysql_frames(ev: DataFrame) -> DataFrame:
    """events → binlog-row frames (seq, op, db, table, before, after)."""
    op = F.expr(CDC_TYPE_EXPR)
    image = F.create_map(
        F.lit("id"),
        F.col("user_id").cast("string"),
        F.lit("k"),
        F.get_json_object("props", "$.k"),
    )
    return ev.select(
        F.col("event_id").alias("seq"),
        op.alias("op"),
        F.lit("appdb").alias("db"),
        F.lit("users").alias("table"),
        F.when(op == "delete", image).alias("before"),
        F.when(op != "delete", image).alias("after"),
        F.col("ts"),
    )


def _mongo_frames(ev: DataFrame) -> DataFrame:
    """events → oplog frames (seq, op, db, collection, o, o2)."""
    typ = F.expr(CDC_TYPE_EXPR)
    op = (
        F.when(typ == "insert", F.lit("i"))
        .when(typ == "delete", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    uid = F.col("user_id").cast("string")
    full_doc = F.create_map(
        F.lit("_id"), uid, F.lit("k"), F.get_json_object("props", "$.k")
    )
    # faithful oplog shapes: insert carries the full doc in o; update
    # carries the modifier in o and the target-row doc in o2 (no _id
    # inside o — pk must fall through to o2._id); delete carries the
    # key doc in o
    modifier = F.create_map(F.lit("k"), F.get_json_object("props", "$.k"))
    key_doc = F.create_map(F.lit("_id"), uid)
    return ev.select(
        F.col("event_id").alias("seq"),
        op.alias("op"),
        F.lit("app").alias("db"),
        F.lit("users").alias("collection"),
        F.when(op == "i", full_doc)
        .when(op == "u", modifier)
        .otherwise(key_doc)
        .alias("o"),
        F.when(op == "u", key_doc).alias("o2"),
        F.col("ts"),
    )


@query(
    "src_mysql_binlog",
    oracle=f"""
    SELECT event_id AS event_seq,
           'mysql_main' AS source,
           {_ORACLE_TYPE} AS type,
           'appdb' AS schema_name,
           'users' AS table_name,
           CAST(user_id AS VARCHAR) AS pk,
           CASE WHEN {_ORACLE_TYPE} = 'delete' THEN NULL
                ELSE '{{"id":"' || CAST(user_id AS VARCHAR) || '","k":"'
                     || json_extract_string(props, '$.k') || '"}}' END AS item,
           CAST(NULL AS BIGINT) AS tx_id,
           ts
    FROM events
    """,
    operator="src_my (binlog normalizer, decode∘encode identity)",
    doc="Binlog-row frames synthesized from events pushed through the "
    "real normalize_mysql: metadata-driven pk column, after-image-only "
    "updates, key-only deletes, null tx ids (src/mysql.js:144-269). "
    "The oracle states the expected envelope from events directly.",
)
def src_mysql_binlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return normalize_mysql(_mysql_frames(ev), pk_columns={"users": "id"})


@query(
    "src_mongo_oplog",
    oracle=f"""
    SELECT event_id AS event_seq,
           'mongo_main' AS source,
           {_ORACLE_TYPE} AS type,
           'app' AS schema_name,
           'users' AS table_name,
           CAST(user_id AS VARCHAR) AS pk,
           CASE {_ORACLE_TYPE}
                WHEN 'delete' THEN NULL
                WHEN 'update' THEN '{{"_id":"' || CAST(user_id AS VARCHAR) || '"}}'
                ELSE '{{"_id":"' || CAST(user_id AS VARCHAR) || '","k":"'
                     || json_extract_string(props, '$.k') || '"}}' END AS item,
           CAST(NULL AS BIGINT) AS tx_id,
           ts
    FROM events
    """,
    operator="src_mg (oplog normalizer, decode∘encode identity)",
    doc="Oplog frames synthesized from events pushed through the real "
    "normalize_mongo: ns split, pk = o._id ∥ o2._id (updates carry no "
    "_id in o, so the pk falls through to o2), update item = o2 ∥ o "
    "(the documented operation-doc caveat), delete item null "
    "(src/mongo.js:133-272).",
)
def src_mongo_oplog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return normalize_mongo(_mongo_frames(ev))
