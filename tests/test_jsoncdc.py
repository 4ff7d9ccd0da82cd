"""Faithful jsoncdc wire-format decode (src_decode) and its pipeline
backend wiring (``type: "jsoncdc"`` in config).

The reference's lineHandler semantics under test
(src/postgresql.js:373-485):
- delete pk = first non-null value of the ``@`` replica-identity
  object (src/postgresql.js:416-425),
- insert/update pk = ``line[action].id || line[action].ID``
  (src/postgresql.js:472),
- lines whose table contains ``pg_temp_`` are dropped
  (src/postgresql.js:386-390),
- schema lines feed a per-table schema cache attached to later DML
  (src/postgresql.js:427-430),
- begin/commit markers drive the running tx stamp
  (src/postgresql.js:431-436).
"""

from __future__ import annotations

import json

from lapidus_spark.config import parse_config
from lapidus_spark.sources.cdc import ENVELOPE_SCHEMA
from lapidus_spark.sources.jsoncdc import (
    build_jsoncdc_replay,
    decode_jsoncdc,
    decode_jsoncdc_dir,
    normalize_jsoncdc,
)
from lapidus_spark.streaming.pipeline import run
from tests.conftest import SF_DIR


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def test_decode_at_pk_first_nonnull(spark):
    """Delete pk is the first non-null value of the ``@`` object —
    including when the first replica-identity column is null."""
    rows = decode_jsoncdc(
        _lines_df(
            spark,
            [
                '{"table":"users","delete":{},"@":{"a":null,"b":"7","c":"9"}}',
                '{"table":"users","delete":{},"@":{"id":42}}',
            ],
        )
    ).select("type", "pk").collect()
    assert [(r.type, r.pk) for r in rows] == [("delete", "7"), ("delete", "42")]


def test_decode_pk_id_or_upper_id(spark):
    """insert/update pk = item.id || item.ID (src/postgresql.js:472)."""
    rows = decode_jsoncdc(
        _lines_df(
            spark,
            [
                '{"table":"t","insert":{"id":1,"k":"x"}}',
                '{"table":"t","insert":{"ID":2,"k":"y"}}',
                '{"table":"t","update":{"ID":3},"@":{"ID":3}}',
            ],
        )
    ).select("pk").collect()
    assert [r.pk for r in rows] == ["1", "2", "3"]


def test_decode_drops_pg_temp_noise(spark):
    """The materialized-view-refresh HACK: any table containing
    pg_temp_ is dropped; marker lines (no table) survive."""
    out = decode_jsoncdc(
        _lines_df(
            spark,
            [
                '{"table":"pg_temp_123","insert":{"id":1}}',
                '{"table":"keep_me","insert":{"id":2}}',
                '{"begin":9}',
            ],
        )
    )
    assert [r.type for r in out.collect()] == ["insert", "beginTransaction"]


def test_decode_dir_schema_cache_and_tx_stamp(spark, tmp_path):
    """Interleaved schema lines update the per-table cache for LATER
    DML only; begin markers stamp the running tx_id."""
    seg = tmp_path / "segment_000.ldjson"
    seg.write_text(
        "\n".join(
            [
                '{"table":"t","schema":{"v":1}}',
                '{"begin":100}',
                '{"table":"t","insert":{"id":1}}',
                '{"table":"t","schema":{"v":2}}',
                '{"table":"t","insert":{"id":2}}',
                '{"commit":100,"t":"2026-01-01T00:00:00Z"}',
                '{"begin":101}',
                '{"table":"t","insert":{"id":3}}',
                '{"commit":101,"t":"2026-01-01T00:00:01Z"}',
            ]
        )
        + "\n"
    )
    out = {
        r.event_id: (r.tx_id, r.table_schema)
        for r in decode_jsoncdc_dir(spark, str(tmp_path)).collect()
    }
    assert out == {
        1: (100, '{"v":1}'),
        2: (100, '{"v":2}'),
        3: (101, '{"v":2}'),
    }


def test_normalize_jsoncdc_envelope_shape(spark):
    """Envelope: qualified table split, schema item, marker tx_id/ts."""
    env = normalize_jsoncdc(
        decode_jsoncdc(
            _lines_df(
                spark,
                [
                    '{"table":"billing.invoices","insert":{"id":5,"v":"a"}}',
                    '{"table":"users","schema":{"id":"integer"}}',
                    '{"begin":7}',
                    '{"commit":7,"t":"2026-02-01T00:00:00Z"}',
                ],
            )
        )
    )
    assert [f.name for f in env.schema.fields] == [f.name for f in ENVELOPE_SCHEMA.fields]
    rows = env.collect()
    ins, sch, beg, com = rows
    assert (ins.schema_name, ins.table_name, ins.pk) == ("billing", "invoices", "5")
    assert (sch.type, sch.item) == ("schema", '{"id":"integer"}')
    assert (beg.type, beg.tx_id, beg.ts) == ("beginTransaction", 7, None)
    assert com.type == "commitTransaction" and com.tx_id == 7 and com.ts is not None


def test_jsoncdc_pipeline_backend(spark, tmp_path):
    """End-to-end daemon run over a jsoncdc capture dir: config →
    jsoncdc backend → decode → envelope → gated memory sinks. The DML
    row count equals the events fixture (the capture is generated from
    it), and an ungated sink additionally sees schema/begin/commit."""
    capture = build_jsoncdc_replay(spark, SF_DIR)
    cfg = parse_config(
        json.dumps(
            {
                "backends": [
                    {
                        "name": "pg_wal",
                        "type": "jsoncdc",
                        "path": capture,
                        "sinks": [
                            {
                                "type": "memory",
                                "options": {"table": "jsoncdc_dml"},
                                "enabledTypes": ["insert", "update", "delete"],
                            },
                            {"type": "memory", "options": {"table": "jsoncdc_all"}},
                        ],
                    }
                ]
            }
        )
    )
    run(spark, cfg, checkpoint_root=str(tmp_path / "ckpts"))
    dml = spark.table("jsoncdc_dml")
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert dml.count() == n_events
    assert set(r.type for r in dml.select("type").distinct().collect()) == {
        "insert",
        "update",
        "delete",
    }
    all_kinds = set(
        r.type for r in spark.table("jsoncdc_all").select("type").distinct().collect()
    )
    assert {"schema", "beginTransaction", "commitTransaction"} <= all_kinds
    # commit markers carry tx_id + commit ts through the envelope
    com = spark.table("jsoncdc_all").filter("type = 'commitTransaction'")
    assert com.filter("tx_id IS NULL OR ts IS NULL").count() == 0


def test_jsoncdc_config_requires_path():
    import pytest

    from lapidus_spark.config import ConfigError

    with pytest.raises(ConfigError, match="jsoncdc backend requires a 'path'"):
        parse_config(json.dumps({"backends": [{"type": "jsoncdc"}]}))


def test_large_segment_reads_as_one_split_in_order(spark, tmp_path):
    """The scale regime the gzip write exists for: a segment far above
    Spark's EFFECTIVE split size (min(maxPartitionBytes,
    max(openCostInBytes, bytes/cores)) — ~4 MB on a 32-core local
    run, not the 128 MB maxPartitionBytes bound) must still be read
    as exactly ONE scan split, in exact line order. An uncompressed
    text file this size would be sliced into ~8 splits and
    _with_file_order's per-partition ids would interleave."""
    from pyspark.sql import functions as F

    from lapidus_spark.sources.jsoncdc import _with_file_order, _write_ordered_segments

    n = 400_000  # ~40 MB of ~100-byte lines in ONE segment
    lines = spark.range(n).select(
        F.lit(0).cast("int").alias("file_id"),
        F.lit(0).cast("long").alias("user_key"),
        F.lit(0).alias("phase"),
        F.col("id").alias("sub"),
        F.format_string("{\"seq\":%d,\"pad\":\"%s\"}", "id", F.repeat(F.lit("x"), 80)).alias(
            "line"
        ),
    )
    out = str(tmp_path / "bigseg")
    import os

    os.makedirs(out, exist_ok=True)
    _write_ordered_segments(lines, out)

    back = _with_file_order(spark.read.text(out)).withColumn(
        "pid", F.spark_partition_id()
    )
    splits = (
        back.groupBy("src_file").agg(F.countDistinct("pid").alias("n_splits")).collect()
    )
    assert len(splits) == 1 and splits[0]["n_splits"] == 1
    # line_seq order == written sub order, end to end
    ooo = (
        back.select(
            F.get_json_object("value", "$.seq").cast("long").alias("seq"), "line_seq"
        )
        .withColumn(
            "prev_seq",
            F.lag("seq").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("line_seq")
            ),
        )
        .filter(F.col("prev_seq").isNotNull() & (F.col("seq") != F.col("prev_seq") + 1))
        .count()
    )
    assert ooo == 0
