"""Additional source formats: CSV with malformed-row triage and
parquet schema evolution.

The reference reads exactly one wire format (jsoncdc LDJSON from
pg_recvlogical; src/postgresql.js:373-485) and treats every line that
fails to parse as a classified, counted error rather than a crash
(src/postgresql.js:520-548). A complete engine needs the same
contract on the lake-side formats a pipeline actually ingests:

- ``src_csv_scan``: CSV read in PERMISSIVE mode with a corrupt-record
  column — well-formed rows classify by their payload, torn/garbled
  lines land in a counted 'corrupt' class, nothing is silently
  dropped (the CSV face of src_stderr).
- ``src_parquet_evolution``: a parquet directory whose files were
  written under DIFFERENT schema versions (columns added over time)
  read as one table via mergeSchema — the lake-side twin of the
  jsoncdc schema-epoch cache (win_schema): old files surface the new
  columns as nulls, nothing is rewritten.

Fixtures are generated from the events table with distributed writes
(cached per process per sf_dir, untimed harness setup) so the DuckDB
oracles can state expectations directly from events.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

#: every CSV_BAD_MOD-th event is written as a torn/garbled line.
CSV_BAD_MOD = 13

_CSV_DIRS: dict[str, str] = {}
_EVO_DIRS: dict[str, str] = {}


def build_csv_capture(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process per sf_dir) a CSV capture of the events
    table with deterministically injected malformed lines: every
    CSV_BAD_MOD-th event becomes a garbled non-numeric line (a torn
    write / encoding fault). Fully distributed text write; row order
    is irrelevant to every consumer (classification is a bag)."""
    if sf_dir in _CSV_DIRS:
        return _CSV_DIRS[sf_dir]
    out = tempfile.mkdtemp(prefix="lapidus_csv_capture_")
    ev = load_table(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % CSV_BAD_MOD == 0,
        F.format_string("!!torn%d,###", "event_id"),
    ).otherwise(
        F.format_string(
            "%s,%s,%s,%s",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            "event_type",
            F.col("value").cast("string"),
        )
    )
    ev.select(line.alias("value")).write.mode("overwrite").text(out)
    _CSV_DIRS[sf_dir] = out
    return out


@query(
    "src_csv_scan",
    oracle=f"""
    SELECT event_type AS line_class,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_ids,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events WHERE event_id % {CSV_BAD_MOD} <> 0
    GROUP BY event_type
    UNION ALL
    SELECT 'corrupt', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT), NULL
    FROM events WHERE event_id % {CSV_BAD_MOD} = 0
    HAVING count(*) > 0
    """,
    operator="src_decode for CSV (PERMISSIVE triage — the src_stderr contract on a lake format)",
    doc="CSV ingest with the reference's error-handling contract "
    "(src/postgresql.js:520-548 — bad input is counted and kept "
    "visible, never silently dropped): PERMISSIVE parse with a "
    "corrupt-record column, well-formed rows classified by payload "
    "and their values summed through the string round-trip (CAST to "
    "string on write, CSV double parse on read — Java double "
    "formatting is round-trippable, so the exact-decimal sums match "
    "the generating table bit for bit), torn lines counted under "
    "'corrupt' with a NULL sum. One scan, one tiny aggregation.",
)
def src_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = build_csv_capture(spark, sf_dir)
    schema = (
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, _bad STRING"
    )
    rows = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
    )
    # n_ids keeps event_id in the parser's required set: with CSV
    # column pruning, a field that is never read is never parsed, so
    # a torn value in it would not trip the corrupt-record column.
    cls = F.when(F.col("_bad").isNotNull(), "corrupt").otherwise(F.col("event_type"))
    return (
        rows.select(cls.alias("line_class"), "event_id", "value")
        .groupBy("line_class")
        .agg(
            F.count("*").alias("n"),
            F.count("event_id").alias("n_ids"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


def build_evolved_parquet(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process per sf_dir) a parquet dir whose files
    carry two schema epochs: even event_ids under the v1 schema
    (event_id, user_id), odd under v2 (+ value, + props-derived
    extra). Two distributed writes into one directory — exactly what
    a pipeline's landing zone looks like after a producer upgrade."""
    if sf_dir in _EVO_DIRS:
        return _EVO_DIRS[sf_dir]
    out = tempfile.mkdtemp(prefix="lapidus_evo_parquet_")
    ev = load_table(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id")
    v2 = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "value", F.col("event_type").alias("extra")
    )
    v1.write.mode("overwrite").parquet(out)
    v2.write.mode("append").parquet(out)
    _EVO_DIRS[sf_dir] = out
    return out


@query(
    "src_parquet_evolution",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_value,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_extra,
           CAST(sum(CASE WHEN event_id % 2 = 1
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS sum_value
    FROM events
    """,
    operator="win_schema on the lake side (mergeSchema across producer epochs)",
    doc="Schema evolution at the storage layer: a parquet directory "
    "holding v1 files (event_id, user_id) and v2 files (+value, "
    "+extra) reads as ONE table via mergeSchema — v1 rows surface "
    "the v2 columns as nulls, no rewrite, no migration job. This is "
    "the lake-side counterpart of the jsoncdc schema-epoch cache "
    "(schemaCache, postgresql.js:56,430-436): the capture layer "
    "tracks wire-schema versions, the lake layer absorbs them. "
    "Scale note: mergeSchema's footer-union runs on the driver over "
    "file METADATA only; pin a read schema once known to skip it.",
)
def src_parquet_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = build_evolved_parquet(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return df.agg(
        F.count("*").alias("n_rows"),
        F.count("value").alias("n_with_value"),
        F.count("extra").alias("n_with_extra"),
        F.sum(F.coalesce(F.col("value"), F.lit(0)).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


#: every JSONL_BAD_MOD-th document is written as a torn JSON line.
JSONL_BAD_MOD = 17

_JSONL_DIRS: dict[str, str] = {}


def build_jsonl_capture(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process per sf_dir) an LDJSON capture of the
    documents table — one JSON object per line with a NESTED metadata
    object (the layout crawler dumps and annotation pipelines ship) —
    with every JSONL_BAD_MOD-th document replaced by a torn line.
    ``to_json`` handles all escaping, so the payload round-trips
    exactly; fully distributed text write."""
    if sf_dir in _JSONL_DIRS:
        return _JSONL_DIRS[sf_dir]
    out = tempfile.mkdtemp(prefix="lapidus_jsonl_capture_")
    d = load_table(spark, sf_dir, "documents")
    obj = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.col("text"),
            F.struct(
                F.col("lang"),
                F.col("source").alias("src"),
                F.col("n_chars").alias("nc"),
            ).alias("meta"),
        )
    )
    line = F.when(
        F.col("doc_id") % JSONL_BAD_MOD == 0,
        F.format_string('{"doc_id": %d, "text": "torn', "doc_id"),
    ).otherwise(obj)
    d.select(line.alias("value")).write.mode("overwrite").text(out)
    _JSONL_DIRS[sf_dir] = out
    return out


@query(
    "src_jsonl_scan",
    oracle=f"""
    SELECT lang AS line_class,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT source) AS BIGINT) AS n_srcs,
           CAST(sum(n_chars) AS BIGINT) AS meta_chars,
           CAST(sum(len(text)) AS BIGINT) AS text_chars
    FROM documents WHERE doc_id % {JSONL_BAD_MOD} <> 0
    GROUP BY lang
    UNION ALL
    SELECT 'corrupt', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT), NULL, NULL
    FROM documents WHERE doc_id % {JSONL_BAD_MOD} = 0
    HAVING count(*) > 0
    """,
    operator="src_decode for LDJSON documents (nested-schema JSON lines ingest)",
    doc="LDJSON document ingest with the reference's error contract "
    "(the reference's ONLY wire format is LDJSON — "
    "src/postgresql.js:373-485 parse, 520-548 error counting): "
    "explicit-schema PERMISSIVE read with a corrupt-record column, "
    "nested metadata decoded structurally (meta.lang / meta.src / "
    "meta.nc — no per-row get_json_object string probing), torn "
    "lines counted under 'corrupt', nothing silently dropped. The "
    "payload is value-verified through the full JSON round-trip: "
    "both the nested char count and the re-measured text length must "
    "equal the generating table's. Explicit schema is the scale "
    "contract — schema inference is a second full scan at 100 TB.",
)
def src_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = build_jsonl_capture(spark, sf_dir)
    schema = (
        "doc_id LONG, text STRING, "
        "meta STRUCT<lang: STRING, src: STRING, nc: LONG>, _bad STRING"
    )
    rows = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
    )
    cls = F.when(F.col("_bad").isNotNull(), "corrupt").otherwise(F.col("meta.lang"))
    return (
        rows.select(
            cls.alias("line_class"),
            F.col("meta.src").alias("src"),
            F.col("meta.nc").alias("nc"),
            "text",
        )
        .groupBy("line_class")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("src").alias("n_srcs"),
            F.sum("nc").alias("meta_chars"),
            F.sum(F.length("text")).alias("text_chars"),
        )
    )


_ORC_DIRS: dict[str, str] = {}


def build_orc_capture(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process per sf_dir) the events table as ORC —
    the columnar lake format the engine must read alongside parquet
    (Spark's native ORC reader: vectorized, predicate-pushdown,
    column-pruned). Distributed write; timestamps carried as
    microsecond longs so the round-trip is bit-exact regardless of
    either format's timestamp affordances."""
    if sf_dir in _ORC_DIRS:
        return _ORC_DIRS[sf_dir]
    out = tempfile.mkdtemp(prefix="lapidus_orc_capture_")
    ev = load_table(spark, sf_dir, "events")
    (
        ev.select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .write.mode("overwrite")
        .orc(out)
    )
    _ORC_DIRS[sf_dir] = out
    return out


@query(
    "src_orc_scan",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(event_id) AS first_id,
           max(event_id) AS last_id,
           min(epoch_us(ts)) AS first_ts_us,
           max(epoch_us(ts)) AS last_ts_us,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    operator="src scan on ORC (second columnar lake format, pushdown verified)",
    doc="ORC ingest through Spark's native vectorized reader: the "
    "events table round-tripped through an ORC write and verified "
    "value-exactly against the generating table (ids, microsecond "
    "timestamps, DECIMAL-exact sums). The same declarative plan "
    "properties as the parquet scans — predicate pushdown, column "
    "pruning, split-parallel scan — on the other columnar format a "
    "lake actually contains; one scan, one tiny aggregation.",
)
def src_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = build_orc_capture(spark, sf_dir)
    rows = spark.read.orc(path)
    return rows.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
