"""Faithful jsoncdc wire-format decode (src_decode, the real thing).

The reference consumes ``pg_recvlogical --plugin jsoncdc`` stdout: an
LDJSON stream whose line shapes are (src/postgresql.js:373-485,
607-611):

- ``{"begin": <txid>}`` — transaction open; sets the running
  ``currentTxId`` stamped onto every following DML line,
- ``{"commit": <txid>, "t": <ts>}`` — transaction close,
- ``{"table": t, "schema": {...}}`` — DDL; cached per table
  (``schemaCache[tableName] = line.schema``) and attached to every
  later DML envelope for that table,
- ``{"table": t, "insert"|"update": {cols...}}`` — row image; pk =
  ``line[action].id || line[action].ID`` (src/postgresql.js:472),
- ``{"table": t, "delete": {...}, "@": {...}}`` — replica-identity
  keys; item = ``line['@']``, pk = first non-null value of the ``@``
  object (src/postgresql.js:416-425),
- lines whose table contains ``pg_temp_`` are dropped (the
  materialized-view-refresh HACK, src/postgresql.js:386-390).

The rebuild decodes those shapes with pure column expressions
(``get_json_object`` returns the raw compact JSON substring — no
re-serialization drift) and replaces the reference's two pieces of
mutable decoder state with per-file analytic windows:

- running tx stamp:  ``last(begin_id) IGNORE NULLS`` over line order,
- schema cache:      ``last(schema_json) IGNORE NULLS`` per table.

Scale shape: the window partition key is the source FILE (one WAL
segment / micro-batch capture per file, transaction-aligned — the
same contract the reference gets from one ordered pg_recvlogical
pipe per slot). Decoding is embarrassingly parallel across files;
within a file, line order is the parquet of record. A transaction
never spans capture files (pg_recvlogical flushes on commit), so the
per-file window is both correct and distributed.

The replay fixture is GENERATED from the ``events`` table (cached per
process, untimed harness setup), so the DuckDB oracle can state the
expected envelope directly from ``events`` — the parity check proves
decode ∘ encode == identity over the real line shapes, including
interleaved schema epochs and pg_temp noise lines.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

#: capture files in a replay dir (scale knob: decode parallelism).
N_FILES = 8
#: tables the synthetic stream writes to.
N_TABLES = 3
#: schema epoch 2 starts at the file's 3rd transaction (user_id//8 >= 2).
SCHEMA_V2_AT = 2

_V1 = '{"id":"integer","k":"text","v":1}'
_V2 = '{"id":"integer","k":"text","v":2}'

#: fixture event_type → jsoncdc action (same mapping as CDC_TYPE_EXPR).
_ACTION = {"signup": "insert", "error": "delete"}

_REPLAY_DIRS: dict[str, str] = {}


def _write_ordered_segments(lines_df: DataFrame, out_dir: str) -> None:
    """Distributed write of (file_id, user_key, phase, sub, line) rows
    as one ordered LDJSON file per file_id.

    The partitionBy text write only *requires* ordering by the
    partition column; sortWithinPartitions establishes the full
    (file_id, user_key, phase, sub) order up front, which satisfies
    that requirement as a prefix, so the writer keeps the row order
    — each segment file comes out exactly in logical line order. The
    per-file_id part files are then renamed to segment_NNN.ldjson.gz
    (metadata-only ops, O(N_FILES) regardless of data volume).

    Downstream order recovery (``_with_file_order``) relies on each
    segment being read as ONE scan split. A size guard against
    ``spark.sql.files.maxPartitionBytes`` is NOT sufficient: Spark's
    effective split size is min(maxPartitionBytes, max(openCostInBytes,
    totalBytes/defaultParallelism)), which on a 32-core local run
    splits any file above ~4 MB. Segments are therefore written
    GZIP-COMPRESSED — a non-splittable codec, so the scan planner is
    FORBIDDEN from splitting a segment at any size or parallelism
    (several whole files packed into one partition still preserve
    per-file order; only splitting one file breaks it). Decode
    parallelism remains N_FILES, the same contract as one ordered
    pg_recvlogical pipe per slot."""
    stage = out_dir + "_stage"
    (
        lines_df.repartition(N_FILES, "file_id")
        .sortWithinPartitions("file_id", "user_key", "phase", "sub")
        .select("file_id", "line")
        .write.partitionBy("file_id")
        .option("compression", "gzip")
        .mode("overwrite")
        .text(stage)
    )
    for d in os.listdir(stage):
        if not d.startswith("file_id="):
            continue
        f = int(d.split("=", 1)[1])
        parts = [p for p in os.listdir(os.path.join(stage, d)) if p.endswith(".txt.gz")]
        assert len(parts) == 1, f"expected 1 part file per segment, got {parts}"
        src = os.path.join(stage, d, parts[0])
        os.replace(src, os.path.join(out_dir, f"segment_{f:03d}.ldjson.gz"))


def build_jsoncdc_replay(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process per sf_dir) a jsoncdc LDJSON replay dir
    derived from the events table: N_FILES files, each a sequence of
    schema / begin / DML / commit lines for the transactions (users)
    it owns, plus pg_temp noise lines the decoder must drop.

    Fully distributed: every line is built by codegen expressions and
    written with a partitionBy(file_id) text write — nothing event-
    sized ever reaches the driver (the old toPandas() builder OOMs
    the driver before any operator runs at 100× sf). Line bytes are
    format_string-pinned to the exact json.dumps(separators=(',',':'))
    shapes the decoder and its DuckDB oracle expect."""
    if sf_dir in _REPLAY_DIRS:
        return _REPLAY_DIRS[sf_dir]

    replay_dir = tempfile.mkdtemp(prefix="lapidus_jsoncdc_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "props"
    )
    file_id = (F.col("user_id") % N_FILES).cast("int").alias("file_id")
    tbl = F.format_string("tbl_%d", (F.col("user_id") % N_TABLES).cast("int"))
    cols = ["file_id", "user_key", "phase", "sub", "line"]

    # ordering tuple per line kind (sorted lexicographically):
    #   headers        (user_key=-1, phase=0 schema / 1 noise)
    #   v2 schema      (user_key=first qualifying user, phase=-1)
    #   begin          (user_key=uid, phase=0)
    #   DML            (user_key=uid, phase=1, sub=event_id)
    #   commit         (user_key=uid, phase=2)
    files = spark.range(N_FILES).select(F.col("id").cast("int").alias("file_id"))
    tables = spark.range(N_TABLES).select(F.col("id").cast("int").alias("t"))
    header_schema = files.crossJoin(tables).select(
        "file_id",
        F.lit(-1).cast("long").alias("user_key"),
        F.lit(0).alias("phase"),
        F.col("t").cast("long").alias("sub"),
        F.format_string('{"table":"tbl_%d","schema":%s}', "t", F.lit(_V1)).alias("line"),
    )
    noise = files.select(
        "file_id",
        F.lit(-1).cast("long").alias("user_key"),
        F.lit(1).alias("phase"),
        F.lit(0).cast("long").alias("sub"),
        F.format_string(
            '{"table":"pg_temp_%d","insert":{"id":-1}}', F.col("file_id") + 9000
        ).alias("line"),
    )

    users = ev.select(file_id, "user_id").distinct()
    v2_first = (
        users.filter(F.expr(f"user_id DIV {N_FILES}") >= SCHEMA_V2_AT)
        .groupBy("file_id")
        .agg(F.min("user_id").alias("user_key"))
    )
    v2_schema = v2_first.crossJoin(tables).select(
        "file_id",
        "user_key",
        F.lit(-1).alias("phase"),
        F.col("t").cast("long").alias("sub"),
        F.format_string('{"table":"tbl_%d","schema":%s}', "t", F.lit(_V2)).alias("line"),
    )
    begin = users.select(
        "file_id",
        F.col("user_id").alias("user_key"),
        F.lit(0).alias("phase"),
        F.lit(0).cast("long").alias("sub"),
        F.format_string('{"begin":%d}', "user_id").alias("line"),
    )
    commit = users.select(
        "file_id",
        F.col("user_id").alias("user_key"),
        F.lit(2).alias("phase"),
        F.lit(0).cast("long").alias("sub"),
        F.format_string('{"commit":%d,"t":"2026-01-01T00:00:00Z"}', "user_id").alias("line"),
    )

    k = F.get_json_object("props", "$.k").cast("long")
    action = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    dml_line = (
        F.when(
            action == "delete",
            F.format_string('{"table":"%s","delete":{},"@":{"id":%d}}', tbl, "event_id"),
        )
        .when(
            action == "update",
            F.format_string(
                '{"table":"%s","update":{"id":%d,"k":%d},"@":{"id":%d}}',
                tbl,
                "event_id",
                k,
                "event_id",
            ),
        )
        .otherwise(
            F.format_string('{"table":"%s","insert":{"id":%d,"k":%d}}', tbl, "event_id", k)
        )
    )
    dml = ev.select(
        file_id,
        F.col("user_id").alias("user_key"),
        F.lit(1).alias("phase"),
        F.col("event_id").alias("sub"),
        dml_line.alias("line"),
    )

    all_lines = (
        header_schema.select(cols)
        .unionByName(noise.select(cols))
        .unionByName(v2_schema.select(cols))
        .unionByName(begin.select(cols))
        .unionByName(dml.select(cols))
        .unionByName(commit.select(cols))
    )
    _write_ordered_segments(all_lines, replay_dir)
    _REPLAY_DIRS[sf_dir] = replay_dir
    return replay_dir


#: first non-null value of the ``@`` replica-identity object — the
#: reference's delete-pk rule (Object.keys(...).filter(non-null).shift()).
#: try_element_at: an ``@`` object whose values are all null yields an
#: empty filtered array — under ANSI mode (Spark 4 default) a plain
#: element_at would throw INVALID_ARRAY_INDEX instead of yielding a
#: null pk.
_AT_PK = (
    "try_element_at(filter(map_entries(from_json("
    "get_json_object(value, \"$['@']\"), 'map<string,string>')), "
    "e -> e.value IS NOT NULL), 1).value"
)

_TYPE_CASE = (
    "CASE WHEN get_json_object(value, '$.insert') IS NOT NULL THEN 'insert' "
    "WHEN get_json_object(value, '$.update') IS NOT NULL THEN 'update' "
    "WHEN get_json_object(value, '$.delete') IS NOT NULL THEN 'delete' "
    "WHEN get_json_object(value, '$.schema') IS NOT NULL THEN 'schema' "
    "WHEN get_json_object(value, '$.begin') IS NOT NULL THEN 'beginTransaction' "
    "WHEN get_json_object(value, '$.commit') IS NOT NULL THEN 'commitTransaction' "
    "ELSE 'unknown' END"
)


def decode_jsoncdc(lines: DataFrame) -> DataFrame:
    """Stateless per-line decode: raw text lines → typed jsoncdc
    records. Works on batch and streaming DataFrames alike (no
    window/state); tx stamping and schema attachment are the stateful
    layer added by ``decode_jsoncdc_stream_of_files``."""
    item = (
        "CASE WHEN get_json_object(value, '$.delete') IS NOT NULL "
        "THEN get_json_object(value, \"$['@']\") "
        "WHEN get_json_object(value, '$.insert') IS NOT NULL "
        "THEN get_json_object(value, '$.insert') "
        "ELSE get_json_object(value, '$.update') END"
    )
    pk = (
        "CASE WHEN get_json_object(value, '$.delete') IS NOT NULL "
        f"THEN {_AT_PK} "
        "ELSE coalesce(get_json_object(value, '$.insert.id'), "
        "get_json_object(value, '$.insert.ID'), "
        "get_json_object(value, '$.update.id'), "
        "get_json_object(value, '$.update.ID')) END"
    )
    return lines.select(
        "*",
        F.expr(_TYPE_CASE).alias("type"),
        F.get_json_object("value", "$.table").alias("table_name"),
        F.expr(item).alias("item"),
        F.expr(pk).alias("pk"),
        F.get_json_object("value", "$.begin").cast("long").alias("begin_id"),
        F.get_json_object("value", "$.commit").cast("long").alias("commit_id"),
        F.get_json_object("value", "$.schema").alias("schema_json"),
    ).filter(
        # the pg_temp HACK (src/postgresql.js:386-390): contains-match
        F.col("table_name").isNull() | ~F.col("table_name").contains("pg_temp_")
    )


def normalize_jsoncdc(decoded: DataFrame, source: str = "pg_main") -> DataFrame:
    """Decoded jsoncdc records → canonical envelope (ENVELOPE_SCHEMA).

    Stateless, so it works on batch and streaming inputs alike. All
    six line kinds flow through as envelope rows — the reference emits
    ``schema`` / ``beginTransaction`` / ``commitTransaction`` as
    events in their own right (src/postgresql.js:427-484), and the
    per-kind emit gates (EmitFlags) decide per sink what survives:

    - DML rows carry item/pk; ``tx_id`` is left null here because the
      running-stamp state belongs to the assembler layer
      (stream_tx_assembly) — in batch decode ``decode_jsoncdc_dir``
      stamps it with the per-file window instead,
    - schema lines carry the schema JSON as their item,
    - begin/commit carry the transaction id in ``tx_id``; commit also
      carries the commit timestamp (``t`` key, src/postgresql.js:432).

    ``event_seq``: batch decode gets per-partition-monotonic arrival
    ids (the reference has no global sequence either — its order IS
    the single pg_recvlogical pipe; one ordered capture file is the
    distributed equivalent). Streaming relations can't host
    ``monotonically_increasing_id`` (it is plan-instance state), so
    the stream gets a stable line fingerprint instead — an identifier,
    not an order; ordering guarantees for stateful consumers come
    from the capture segmentation (one transaction-aligned file per
    micro-batch), same as the reference's one-pipe-per-slot contract.
    """
    if decoded.isStreaming:
        seq = F.xxhash64("value").alias("event_seq")
    else:
        seq = F.monotonically_increasing_id().alias("event_seq")
    qualified = F.col("table_name").contains(".")
    return decoded.select(
        seq,
        F.lit(source).alias("source"),
        F.col("type"),
        F.when(qualified, F.split("table_name", r"\.").getItem(0))
        .otherwise(F.lit("public"))
        .alias("schema_name"),
        F.when(qualified, F.split("table_name", r"\.").getItem(1))
        .otherwise(F.col("table_name"))
        .alias("table_name"),
        F.col("pk"),
        F.when(F.col("type") == "schema", F.col("schema_json"))
        .otherwise(F.col("item"))
        .alias("item"),
        F.coalesce("begin_id", "commit_id").alias("tx_id"),
        F.get_json_object("value", "$.t").cast("timestamp").alias("ts"),
    )


def stream_jsoncdc_envelope(
    spark: SparkSession, capture_dir: str, source: str = "pg_main",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a jsoncdc capture dir → envelope stream (the
    pipeline backend entry point, ``type: "jsoncdc"`` in config)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_jsoncdc(decode_jsoncdc(reader.load(capture_dir)), source=source)


def _with_file_order(lines: DataFrame) -> DataFrame:
    """Attach (src_file, line_seq) to a batch text-lines DataFrame.
    Capture files are gzip-compressed (non-splittable — enforced at
    write time in ``_write_ordered_segments``), so each is exactly one
    scan split and the per-partition-monotonic id IS the line order
    per file."""
    return lines.select(
        "value",
        F.input_file_name().alias("src_file"),
        F.monotonically_increasing_id().alias("line_seq"),
    )


def _stamped(rec: DataFrame) -> DataFrame:
    """Decoded records (+src_file/line_seq) → records with the running
    tx stamp (the reference's ``currentTxId`` as a per-file window)."""
    w_file = (
        Window.partitionBy("src_file")
        .orderBy("line_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rec.withColumn("tx_id", F.last("begin_id", ignorenulls=True).over(w_file))


def decode_jsoncdc_dir(spark: SparkSession, replay_dir: str) -> DataFrame:
    """Batch decode of a jsoncdc capture dir → DML envelopes with the
    running tx stamp and latest-schema attachment (the reference's
    ``currentTxId`` / ``schemaCache`` state as per-file windows)."""
    lines = _with_file_order(spark.read.text(replay_dir))
    rec = decode_jsoncdc(lines)
    w_tbl = (
        Window.partitionBy("src_file", "table_name")
        .orderBy("line_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _stamped(rec)
        .withColumn("table_schema", F.last("schema_json", ignorenulls=True).over(w_tbl))
        .filter(F.col("type").isin("insert", "update", "delete"))
        .select(
            F.get_json_object("item", "$.id").cast("long").alias("event_id"),
            "type",
            "table_name",
            "pk",
            "item",
            "tx_id",
            "table_schema",
        )
    )


@query(
    "src_jsoncdc_decode",
    oracle=f"""
    SELECT event_id,
           CASE event_type WHEN 'signup' THEN 'insert'
                WHEN 'error' THEN 'delete' ELSE 'update' END AS type,
           'tbl_' || CAST(user_id % {N_TABLES} AS VARCHAR) AS table_name,
           CAST(event_id AS VARCHAR) AS pk,
           CASE WHEN event_type = 'error'
                THEN '{{"id":' || CAST(event_id AS VARCHAR) || '}}'
                ELSE '{{"id":' || CAST(event_id AS VARCHAR) || ',"k":'
                     || json_extract_string(props, '$.k') || '}}' END AS item,
           user_id AS tx_id,
           CASE WHEN user_id // {N_FILES} >= {SCHEMA_V2_AT}
                THEN '{_V2}' ELSE '{_V1}' END AS table_schema
    FROM events
    """,
    operator="src_decode (faithful jsoncdc wire format)",
    doc="Decode of real jsoncdc LDJSON line shapes — insert/update/"
    "delete with @-keyed replica identity, interleaved schema lines "
    "feeding the per-table schema cache, begin/commit markers driving "
    "the running tx_id stamp, pg_temp noise dropped. The replay dir "
    "is generated from events, so the oracle states the expected "
    "envelope from events directly: parity == decode∘encode is the "
    "identity (src/postgresql.js:373-485).",
)
def src_jsoncdc_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_jsoncdc_dir(spark, build_jsoncdc_replay(spark, sf_dir))


@query(
    "stream_jsoncdc_decode",
    oracle=f"""
    SELECT event_id,
           CASE event_type WHEN 'signup' THEN 'insert'
                WHEN 'error' THEN 'delete' ELSE 'update' END AS type,
           'tbl_' || CAST(user_id % {N_TABLES} AS VARCHAR) AS table_name,
           CAST(event_id AS VARCHAR) AS pk,
           CASE WHEN event_type = 'error'
                THEN '{{"id":' || CAST(event_id AS VARCHAR) || '}}'
                ELSE '{{"id":' || CAST(event_id AS VARCHAR) || ',"k":'
                     || json_extract_string(props, '$.k') || '}}' END AS item
    FROM events
    """,
    operator="src_decode + src_pg (streaming jsoncdc execution)",
    doc="The jsoncdc line decode run as a real stream (readStream.text "
    "over the capture dir, one micro-batch per segment file): "
    "stateless per-line parse → DML envelope. The stateful layers "
    "(tx assembly, schema cache) are their own streaming operators "
    "(stream_tx_assembly, stream_schema_cache) fed by this decode — "
    "the reference's lineHandler decomposed into Spark stages "
    "(src/postgresql.js:607-611).",
)
def stream_jsoncdc_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lapidus_spark.streaming.queries import _run_to_memory

    replay_dir = build_jsoncdc_replay(spark, sf_dir)
    # multi-micro-batch replay (4 segments per trigger): proves the
    # decode crosses trigger boundaries without paying 8× per-batch
    # commit overhead for a stateless parse — state-carry properties
    # belong to the stateful layers' own queries (stream_tx_assembly).
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "4")
        .load(replay_dir)
    )
    env = (
        decode_jsoncdc(lines)
        .filter(F.col("type").isin("insert", "update", "delete"))
        .select(
            F.get_json_object("item", "$.id").cast("long").alias("event_id"),
            "type",
            "table_name",
            "pk",
            "item",
        )
    )
    return _run_to_memory(env, "stream_jsoncdc_decode_out")


@query(
    "stream_jsoncdc_tx",
    oracle="""
    SELECT user_id AS tx_id,
           CAST(count(*) AS BIGINT) AS n_items,
           min(event_id) AS first_seq,
           max(event_id) AS last_seq,
           string_agg(CASE event_type WHEN 'signup' THEN 'insert'
                WHEN 'error' THEN 'delete' ELSE 'update' END,
                ',' ORDER BY event_id) AS item_types,
           TIMESTAMP '2026-01-01 00:00:00' AS commit_ts
    FROM events GROUP BY user_id
    """,
    operator="src_decode → agg_tx (full product chain, streaming)",
    doc="The reference's whole live path composed end to end as one "
    "stream: jsoncdc capture dir → readStream → per-line decode → "
    "running tx stamp → transaction assembly → assembled transactions "
    "(src/postgresql.js:550-619 event loop + 18-33 DatabaseTransaction). "
    "Assembly runs per micro-batch in foreachBatch: a micro-batch is "
    "whole capture files and transactions never span files "
    "(pg_recvlogical flushes on commit), so batch-local stamping + "
    "groupBy is exact — the streaming shape that avoids unbounded "
    "state for a source whose segments are transaction-aligned.",
)
def stream_jsoncdc_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lapidus_spark.streaming.assembler import COMMIT_TYPE

    replay_dir = build_jsoncdc_replay(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="lapidus_jsoncdc_tx_")
    ckpt = tempfile.mkdtemp(prefix="lapidus_jsoncdc_tx_ckpt_")
    # 6 of the 8 segment files per trigger = exactly two micro-batches:
    # assembly is batch-local (transactions never span capture files),
    # so extra micro-batches buy no state coverage — they only multiply
    # fixed trigger/commit overhead (measured 2.8s -> 2.4s at sf0.1
    # going 4 -> 6 files/trigger; a single batch would reach 1.5s but
    # stop exercising the trigger boundary this query exists to cross).
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "6")
        .load(replay_dir)
    )

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        # A commit line's running tx stamp IS its own tx (its begin
        # precedes it in the same file), so DML and commit rows land
        # in the same group — ONE aggregation, no commit join.
        is_dml = F.col("type").isin("insert", "update", "delete")
        rows = (
            _stamped(decode_jsoncdc(_with_file_order(batch_df)))
            .filter(is_dml | (F.col("type") == COMMIT_TYPE))
            .select(
                "tx_id",
                "type",
                F.get_json_object("item", "$.id").cast("long").alias("event_id"),
                F.when(
                    F.col("type") == COMMIT_TYPE,
                    F.get_json_object("value", "$.t").cast("timestamp"),
                ).alias("commit_ts"),
            )
        )
        is_dml_row = F.col("type") != COMMIT_TYPE
        (
            rows.groupBy("tx_id")
            .agg(
                F.sum(is_dml_row.cast("long")).alias("n_items"),
                F.min("event_id").alias("first_seq"),
                F.max("event_id").alias("last_seq"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(is_dml_row, F.struct("event_id", "type"))
                            )
                        ),
                        lambda x: x["type"],
                    ),
                    ",",
                ).alias("item_types"),
                F.max("commit_ts").alias("commit_ts"),
            )
            .filter(F.col("n_items") > 0)
            .select(
                "tx_id", "n_items", "first_seq", "last_seq", "item_types", "commit_ts"
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # 4 shuffle partitions: the per-batch aggregation handles ~a few
    # segment files of lines, and each batch appends one parquet file
    # per partition — at the default 8 the task/file overhead costs
    # more than the parallelism buys (measured 5.7s→3.5s at sf0.1).
    # Cluster runs size this to executor cores like any batch agg.
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            lines.writeStream.foreachBatch(assemble)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from lapidus_spark.plans.audit import record_stream_run

        record_stream_run("stream_jsoncdc_tx", q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out_dir)




#: corrupted-replay dirs, cached per (process, sf_dir).
_CORRUPT_DIRS: dict[str, str] = {}
#: every CORRUPT_MOD-th transaction gets a truncated line and an
#: unknown-action line injected after it.
CORRUPT_MOD = 7


def build_jsoncdc_corrupt_replay(spark: SparkSession, sf_dir: str) -> str:
    """The jsoncdc replay plus deterministically injected bad lines —
    one truncated-JSON line and one unknown-action line per
    transaction whose tx id is divisible by CORRUPT_MOD — modeling a
    capture pipe with occasional torn writes and decoder-version
    drift."""
    if sf_dir in _CORRUPT_DIRS:
        return _CORRUPT_DIRS[sf_dir]

    base = build_jsoncdc_replay(spark, sf_dir)
    corrupt_dir = tempfile.mkdtemp(prefix="lapidus_jsoncdc_bad_")
    cols = ["file_id", "user_key", "phase", "sub", "line"]
    # base lines keep their per-file order (user_key 0, sub = line_seq;
    # segment files are single-split so the monotonic id is line order);
    # injected bad lines append after them (user_key 1), torn write
    # before unknown-action per bad tx (sub = 2*uid / 2*uid + 1).
    base_lines = _with_file_order(spark.read.text(base)).select(
        F.regexp_extract(F.col("src_file"), r"segment_(\d+)", 1).cast("int").alias("file_id"),
        F.lit(0).cast("long").alias("user_key"),
        F.lit(0).alias("phase"),
        F.col("line_seq").alias("sub"),
        F.col("value").alias("line"),
    )
    bad_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .filter(F.col("user_id") % CORRUPT_MOD == 0)
        .select(
            (F.col("user_id") % N_FILES).cast("int").alias("file_id"),
            "user_id",
        )
    )
    torn = bad_users.select(
        "file_id",
        F.lit(1).cast("long").alias("user_key"),
        F.lit(0).alias("phase"),
        (F.col("user_id") * 2).alias("sub"),
        F.format_string('{"oops":%d', "user_id").alias("line"),
    )
    unknown = bad_users.select(
        "file_id",
        F.lit(1).cast("long").alias("user_key"),
        F.lit(0).alias("phase"),
        (F.col("user_id") * 2 + 1).alias("sub"),
        F.format_string(
            '{"table":"tbl_%d","truncate":{"id":%d}}',
            (F.col("user_id") % N_TABLES).cast("int"),
            "user_id",
        ).alias("line"),
    )
    _write_ordered_segments(
        base_lines.select(cols).unionByName(torn.select(cols)).unionByName(unknown.select(cols)),
        corrupt_dir,
    )
    _CORRUPT_DIRS[sf_dir] = corrupt_dir
    return corrupt_dir


@query(
    "src_jsoncdc_errors",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    stats AS (
      SELECT
        (SELECT count(*) FROM u) AS n_users,
        (SELECT count(*) FROM u WHERE user_id % {CORRUPT_MOD} = 0) AS n_bad,
        (SELECT count(DISTINCT user_id % {N_FILES}) FROM u
          WHERE user_id // {N_FILES} >= {SCHEMA_V2_AT}) AS n_v2_files,
        (SELECT count(*) FROM events WHERE event_type = 'signup') AS n_ins,
        (SELECT count(*) FROM events WHERE event_type = 'error') AS n_del,
        (SELECT count(*) FROM events
          WHERE event_type NOT IN ('signup', 'error')) AS n_upd
      FROM u LIMIT 1
    )
    SELECT line_class, n FROM stats, LATERAL (VALUES
      ('malformed', n_bad),
      ('unknown', n_bad),
      ('noise', {N_FILES}),
      ('schema', {N_TABLES} * ({N_FILES} + n_v2_files)),
      ('beginTransaction', n_users),
      ('commitTransaction', n_users),
      ('insert', n_ins),
      ('update', n_upd),
      ('delete', n_del)
    ) AS t(line_class, n)
    """,
    operator="src_stderr (data-error classification)",
    doc="Line-level error triage over a corrupted capture: torn "
    "(truncated-JSON) writes classify as malformed, decoder-version "
    "drift (valid JSON, unrecognized action) as unknown, pg_temp "
    "noise as noise, and every well-formed line by its action — the "
    "batch-queryable face of the reference's stderr classifier "
    "(src/postgresql.js:520-548): bad input is COUNTED AND KEPT "
    "visible, never silently dropped. The oracle recomputes every "
    "class count from the generating table. Zero-shuffle scan + one "
    "tiny aggregation.",
)
def src_jsoncdc_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = spark.read.text(build_jsoncdc_corrupt_replay(spark, sf_dir))
    parsed = lines.withColumn(
        "parsed", F.from_json("value", "map<string,string>")
    ).withColumn("tbl", F.expr("get_json_object(value, '$.table')"))
    line_class = (
        F.when(F.col("parsed").isNull(), "malformed")
        .when(F.col("tbl").startswith("pg_temp"), "noise")
        .when(F.expr(_TYPE_CASE) != "unknown", F.expr(_TYPE_CASE))
        .otherwise("unknown")
    )
    return (
        parsed.select(line_class.alias("line_class"))
        .groupBy("line_class")
        .agg(F.count("*").alias("n"))
    )


@query(
    "src_schema_history",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v2f AS (
      SELECT count(DISTINCT user_id % {N_FILES}) AS n FROM u
      WHERE user_id // {N_FILES} >= {SCHEMA_V2_AT}
    )
    SELECT 'tbl_' || CAST(t.t AS VARCHAR) AS table_name,
           e.schema_json,
           CAST(e.n_files AS BIGINT) AS n_files
    FROM (VALUES (0), (1), (2)) t(t),
    LATERAL (VALUES ('{_V1}', {N_FILES}),
                    ('{_V2}', (SELECT n FROM v2f))) e(schema_json, n_files)
    WHERE e.n_files > 0
    """,
    operator="win_schema (full version history — schema registry view)",
    doc="Per-table schema VERSION HISTORY from the capture stream: "
    "every distinct (table, schema) epoch the jsoncdc DDL lines "
    "carried, with the number of capture segments that observed it — "
    "the schema-registry view a CDC consumer needs for migrations, "
    "where win_schema_cache keeps only the latest epoch "
    "(schemaCache, postgresql.js:56,430-436 discards history). The "
    "oracle recomputes the epoch fan-out from the generating table. "
    "Decode is per-file parallel; the history aggregation keys on "
    "(table, schema) — a tiny groupBy.",
)
def src_schema_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _with_file_order(spark.read.text(build_jsoncdc_replay(spark, sf_dir)))
    rec = decode_jsoncdc(lines)
    return (
        rec.filter(F.col("type") == "schema")
        .groupBy("table_name", F.col("schema_json"))
        .agg(F.countDistinct("src_file").cast("bigint").alias("n_files"))
    )
