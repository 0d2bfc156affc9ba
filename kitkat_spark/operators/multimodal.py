"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.B, M4).

Design: media are opaque ``binary`` columns travelling next to typed metadata
(a struct column), processed by Arrow-batched ``mapInPandas`` stages. The
Spark-side plumbing — schema, batch iteration, partition-preserving map, UDF
signatures — is real and tested; the actual codec calls are STUBBED (this
container ships no image/audio libraries) behind ``_decode_stub``, which is a
clearly-marked deterministic fake. Swap ``_decode_stub`` for PIL/librosa in a
real deployment; nothing else changes.

Scale: decode/feature-extract is a narrow map (no shuffle). Batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs never materializes at once — the per-batch generator below is the
backpressure point. Media bytes should live in parquet binary columns (or
pointers to object storage for >~1 MB blobs: store a URI + byte range and
fetch inside the batch loop).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kitkat_spark.sources import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, magic string, "
    "width int, height int, duration_s double, checksum long"
)


def _decode_stub(content: bytes, media_type: str) -> dict:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg/librosa.

    Raises NotImplementedError for media types a real deployment would need a
    codec for but we cannot fake coherently.
    """
    if media_type not in {"image", "audio", "video", "text"}:
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    n = len(content)
    checksum = 0
    for b in content[:64]:  # deterministic cheap "feature"
        checksum = (checksum * 131 + b) % (1 << 31)
    return {
        "magic": content[:4].hex(),
        "width": (n % 640) + 1 if media_type in {"image", "video"} else None,
        "height": (n % 480) + 1 if media_type in {"image", "video"} else None,
        "duration_s": round(n / 1000.0, 3) if media_type in {"audio", "video"} else None,
        "checksum": checksum,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(c if c is not None else b"", t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            out.insert(2, "n_bytes", [len(c or b"") for c in pdf["content"]])
            yield out[
                [
                    "media_id",
                    "media_type",
                    "n_bytes",
                    "magic",
                    "width",
                    "height",
                    "duration_s",
                    "checksum",
                ]
            ]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media fixture: documents' utf-8 bytes as fake payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video"), F.lit("text")),
            (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over synthesized media; n_bytes is oracle-checkable
    (octet_length of the source text), the rest exercises the stub plumbing."""
    feats = extract_features(synthesize_media(spark, sf_dir))
    return feats.select("media_id", "media_type", "n_bytes", "magic")


ORACLE: dict[str, str] = {
    "q_multimodal_decode": """
        SELECT doc_id AS media_id,
               CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               WHEN 2 THEN 'video' ELSE 'text' END AS media_type,
               CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
               lower(hex(encode(substring(text, 1, 4)))) AS magic
        FROM documents
    """,
}
