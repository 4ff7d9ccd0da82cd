"""Multimodal-column extension operators (SURVEY.md §2.9).

Treats non-text payloads as opaque ``binary`` columns with a typed
metadata struct, the way a 100 TB training-data lake stores
image/audio/video: parquet binary + metadata, decode on demand.

The decode/feature-extract stage is real Spark plumbing — schema,
Arrow-batched ``mapInPandas``, partition-preserving — with the codec
itself STUBBED deterministically (image/audio libraries are not in
this container): ``decode_stub`` derives features from the bytes
(length, checksum, head bytes). Swapping in a real decoder is a
one-function change; the distributed shape stays identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lapidus_spark.plans.registry import query
from lapidus_spark.sources.tables import load_table

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_sum", LongType(), True),
        StructField("head_hex", StringType(), True),
    ]
)


def to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """documents → multimodal records (payload = utf-8 bytes of text)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. A real image/audio decoder
    (PIL/librosa/av) would be dropped in here; everything around it —
    Arrow batching, schema, partitioning — is production-shaped.
    """
    if payload is None:
        raise NotImplementedError("real codecs not available in this container")
    return {
        "byte_sum": int(sum(payload)),
        "head_hex": payload[:8].hex(),
    }


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over multimodal payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_sum": feats.map(lambda f: f["byte_sum"]),
                    "head_hex": feats.map(lambda f: f["head_hex"]),
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("target_w", LongType(), False),
        StructField("target_h", LongType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image resize (PIL not in this
    container): truncate/tile the byte stream to w*h bytes so batch
    shapes and sizes behave like a real thumbnail pass."""
    if payload is None:
        raise NotImplementedError("real codecs not available in this container")
    need = w * h
    reps = need // max(len(payload), 1) + 1
    return (payload * reps)[:need]


def resize_images(media: DataFrame, w: int = 32, h: int = 32) -> DataFrame:
    """Arrow-batched resize pass (drop-in point for a real decoder)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "media_type"]].copy()
            out["payload"] = pdf["payload"].map(lambda p: resize_stub(p, w, h))
            out["n_bytes"] = out["payload"].map(len)
            out["target_w"] = w
            out["target_h"] = h
            yield out

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """Frame sampling: one output row per sampled frame (video →
    frames explode). The stub slices the byte stream at fixed strides;
    a real build swaps in a container demuxer — the row-explosion
    shape, schema, and partitioning are what the pipeline depends on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    raise NotImplementedError("real codecs not available")
                for i in range(min(max_frames, max(len(payload) // every_n_bytes, 1))):
                    frame = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append((doc_id, i, frame, len(frame)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_payload", "n_bytes"]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


@query(
    "ext_multimodal_frames",
    # The raw BLOB column itself has no cross-engine stringification,
    # but its HEX rendering does — both engines agree on lower(hex(..))
    # byte for byte. Projecting the frame payload as hex keeps the
    # FULL frame content under hash verification (stronger than the
    # md5 reduction in ext_multimodal_framesig) while the pipeline
    # function sample_frames keeps returning real binary.
    oracle="""
    WITH t AS (
      SELECT doc_id, text, length(text) AS n FROM documents
    ), x AS (
      SELECT doc_id, text, least(4, greatest(n // 256, 1)) AS n_frames FROM t
    ), e AS (
      SELECT doc_id, text,
             unnest(generate_series(0, n_frames - 1)) AS frame_no
      FROM x
    )
    SELECT doc_id, frame_no,
           lower(hex(encode(substr(text, CAST(frame_no * 256 + 1 AS INT), 256))))
             AS frame_hex,
           CAST(length(substr(text, CAST(frame_no * 256 + 1 AS INT), 256)) AS BIGINT)
             AS n_bytes
    FROM e
    """,
    operator="ext_multimodal",
    doc="Frame-sampling over binary payloads: mapInPandas row "
    "explosion (≤4 frames per doc at a fixed byte stride, stub "
    "demuxer) — the video→frames shape of a training-data pipeline. "
    "Frame bytes are projected as hex so the whole payload is under "
    "cross-engine hash verification.",
)
def ext_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    frames = sample_frames(to_media(d))
    return frames.select(
        "doc_id",
        "frame_no",
        F.lower(F.hex("frame_payload")).alias("frame_hex"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
    )


@query(
    "ext_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    operator="ext_multimodal",
    doc="Multimodal metadata projection: payload byte length + content "
    "hash over the binary column (JVM-side, no decode).",
)
def ext_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.md5(F.col("text")).alias("content_md5"),
    )


@query(
    "ext_multimodal_decode",
    # The stub codec's features are pure byte arithmetic, and the
    # fixture payloads are ASCII text bytes — so the oracle can state
    # byte_sum/head_hex in SQL and the Arrow mapInPandas decode gets a
    # full hash-parity check (a real image codec would be rows-only).
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(coalesce(list_aggregate(
               list_transform(range(1, length(text) + 1),
                              i -> unicode(text[i])), 'sum'), 0)
               AS BIGINT) AS byte_sum,
           lower(hex(encode(substr(text, 1, 8)))) AS head_hex
    FROM documents
    """,
    operator="ext_multimodal",
    doc="Arrow-batched mapInPandas decode/feature-extract over binary "
    "payloads (deterministic stub codec; real decoder drop-in).",
)
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    return decode_features(to_media(d))


@query(
    "ext_multimodal_framesig",
    # Same Arrow mapInPandas frame explosion as ext_multimodal_frames,
    # but the binary frame is reduced JVM-side to (md5, length) — a
    # canonical cross-engine form — so the Pandas-UDF explode path
    # itself gets a full hash-parity check (the raw-bytes variant stays
    # rows-only: BLOB stringification differs between engines). The
    # fixture payloads are ASCII, so the oracle can state the stub
    # demuxer's byte slices as substrings.
    oracle="""
    WITH t AS (
      SELECT doc_id, text, length(text) AS n FROM documents
    ), x AS (
      SELECT doc_id, text, least(4, greatest(n // 256, 1)) AS n_frames FROM t
    ), e AS (
      SELECT doc_id, text,
             unnest(generate_series(0, n_frames - 1)) AS frame_no
      FROM x
    )
    SELECT doc_id, frame_no,
           md5(substr(text, CAST(frame_no * 256 + 1 AS INT), 256)) AS frame_md5,
           CAST(length(substr(text, CAST(frame_no * 256 + 1 AS INT), 256)) AS BIGINT)
             AS n_bytes
    FROM e
    """,
    operator="ext_multimodal",
    doc="Frame fingerprints: the mapInPandas frame explosion reduced "
    "to (doc_id, frame_no, md5, length) — the form a dedup/lineage "
    "pass stores per frame, and the query that upgrades the frame "
    "path from rows-only to full hash verification.",
)
def ext_multimodal_framesig(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", parallel=True)
    frames = sample_frames(to_media(d))
    return frames.select(
        "doc_id",
        "frame_no",
        F.md5("frame_payload").alias("frame_md5"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
    )
