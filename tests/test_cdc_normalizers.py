"""Per-source envelope normalizer tests, mirroring the reference's
live-DB assertions (SURVEY §5 suite 2): delete-has-no-item
(test/mongo.test.js:288,317), update after-image (mysql.js:235),
and the four pk rules (SURVEY §1.3)."""

from __future__ import annotations

from lapidus_spark.sources.cdc import (
    ENVELOPE_SCHEMA,
    normalize_events,
    normalize_mongo,
    normalize_mysql,
)

MYSQL_SCHEMA = (
    "seq long, op string, db string, table string, "
    "before map<string,string>, after map<string,string>, ts timestamp"
)
MONGO_SCHEMA = (
    "seq long, op string, db string, collection string, "
    "o map<string,string>, o2 map<string,string>, ts timestamp"
)


def test_mysql_envelope_rules(spark):
    rows = [
        (1, "insert", "lapidus", "users", None, {"uid": "7", "name": "a"}, None),
        (2, "update", "lapidus", "users", {"uid": "7", "name": "a"}, {"uid": "7", "name": "b"}, None),
        (3, "delete", "lapidus", "users", {"uid": "7", "name": "b"}, None, None),
        (4, "insert", "lapidus", "orders", None, {"oid": "99"}, None),
    ]
    df = spark.createDataFrame(rows, MYSQL_SCHEMA)
    env = {r["event_seq"]: r for r in normalize_mysql(df, {"users": "uid", "orders": "oid"}).collect()}

    # pk from per-table PRIMARY-KEY metadata (mysql.js:119-140)
    assert env[1]["pk"] == "7" and env[4]["pk"] == "99"
    # update carries the after-image only (mysql.js:235)
    assert '"name":"b"' in env[2]["item"]
    # delete: pk survives (from the before-image), item is dropped
    # (mysql.js:148-152)
    assert env[3]["pk"] == "7" and env[3]["item"] is None
    assert env[1]["schema_name"] == "lapidus" and env[1]["table_name"] == "users"


def test_mongo_envelope_rules(spark):
    rows = [
        (1, "i", "app", "docs", {"_id": "a1", "v": "x"}, None, None),
        (2, "u", "app", "docs", {"$set.v": "y"}, {"_id": "a1"}, None),
        (3, "d", "app", "docs", {"_id": "a1"}, None, None),
    ]
    df = spark.createDataFrame(rows, MONGO_SCHEMA)
    env = {r["event_seq"]: r for r in normalize_mongo(df).collect()}

    # ns split into schema/table (mongo.js:141)
    assert env[1]["schema_name"] == "app" and env[1]["table_name"] == "docs"
    # pk = o._id || o2._id (mongo.js:139,195,239)
    assert env[1]["pk"] == "a1" and env[2]["pk"] == "a1" and env[3]["pk"] == "a1"
    # update carries the update-operation doc (o2 || o, mongo.js:197)
    assert "_id" in env[2]["item"]
    # delete has no item (test/mongo.test.js:288,317)
    assert env[3]["item"] is None
    assert [env[i]["type"] for i in (1, 2, 3)] == ["insert", "update", "delete"]


def test_all_normalizers_share_schema(spark):
    """One canonical envelope across all three sources (SURVEY §1.4)."""
    my = normalize_mysql(
        spark.createDataFrame([], MYSQL_SCHEMA), {"users": "uid"}
    )
    mg = normalize_mongo(spark.createDataFrame([], MONGO_SCHEMA))
    names = [f.name for f in ENVELOPE_SCHEMA.fields]
    assert [f.name for f in my.schema.fields] == names
    assert [f.name for f in mg.schema.fields] == names
    from tests.conftest import SF_DIR
    from lapidus_spark.sources.tables import load_table

    pg = normalize_events(load_table(spark, SF_DIR, "events"))
    assert [f.name for f in pg.schema.fields] == names
