"""Multimodal column plumbing (SURVEY.md §2.11 extension).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested; the actual media decode is
STUBBED (the image/audio libraries are not in this container): decode
functions raise ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake feature extractor runs so pipelines are end-to-end
testable.

The binary payloads here are derived from ``documents.text`` (utf-8 bytes),
which keeps the byte-level operators (length, hash, magic-byte sniff)
oracle-checkable in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikipediaetl_spark.catalog import query
from wikipediaetl_spark.sources import load_table


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, payload binary, meta struct)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("declared_size"),
            F.col("lang").alias("locale"),
        ).alias("meta"),
    )


@query(
    "q64_binary_meta",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha,
           ascii(substr(text, 1, 1)) AS first_byte
    FROM documents
    """,
)
def q64_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level metadata over binary payloads: size, content hash, leading
    byte (the magic-number sniff position) — all native binary expressions."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.ascii(F.col("payload").cast("string").substr(1, 1)).alias("first_byte"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """STUB: decode an image/audio/video payload to a feature array.

    Real decode requires PIL/ffmpeg-class libraries not present in this
    container. With ``fake=True`` a deterministic byte-statistics feature
    vector is produced so the distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(8)
    return np.array(
        [
            arr.size,
            float(arr.mean()),
            float(arr.std()),
            float(arr.min()),
            float(arr.max()),
            float(np.median(arr)),
            float(arr[0]),
            float(arr[-1]),
        ]
    )


def extract_features(media: DataFrame, fake: bool = True, batch_hint: int = 0) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched iterator: each pandas batch carries the binary column;
    per-row decode happens worker-side with zero driver involvement. At
    scale, repartition upstream so batches are balanced (media payloads are
    heavily size-skewed in real corpora).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, t, fake=fake).tolist()
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.mapInPandas(op, schema="doc_id long, media_type string, features array<double>")


@query("q65_media_features")
def q65_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed media feature extraction through the real mapInPandas path:
    byte-statistics vector per payload (deterministic fake decode), then a
    per-media-type aggregate. Rows-only check (float feature means are not
    SQL-twinned); tests pin exact feature values for known payloads."""
    m = media_table(spark, sf_dir)
    feats = extract_features(m, fake=True)
    return (
        feats.select(
            "doc_id",
            "media_type",
            F.round(F.element_at("features", 2), 4).alias("byte_mean"),
            F.element_at("features", 1).cast("long").alias("n_bytes"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
