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


RESIZE_SCHEMA = "media_id long, width int, height int, content binary"
FRAME_SCHEMA = "media_id long, frame_idx int, frame bytes".replace("bytes", "binary")


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage (images only): mapInPandas with a STUBBED resampler.

    The stub 'resizes' by deterministic byte subsampling so output size
    tracks the target dims; swap the inner function for PIL's
    ``Image.resize`` — batching, schema, and partitioning are unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64  # stub: bytes proportional to area
        for pdf in batches:
            imgs = pdf[pdf["media_type"] == "image"]
            if not len(imgs):
                continue
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"].values,
                    "width": width,
                    "height": height,
                    "content": [
                        bytes((c or b"")[: max(1, target)]) for c in imgs["content"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage (videos only): one output row per sampled frame —
    the mapInPandas 1->N fan-out shape. Stub frames are fixed-size byte
    windows; a real deployment decodes with ffmpeg at the same seam."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            ids, idxs, frames = [], [], []
            for mid, c in zip(vids["media_id"], vids["content"]):
                c = c or b""
                for k in range(min(max_frames, max(1, len(c) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(bytes(c[k * every_n_bytes : (k + 1) * every_n_bytes]))
            if ids:
                yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


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


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: dims + output payload size are oracle-checkable."""
    out = resize_images(synthesize_media(spark, sf_dir))
    return out.select(
        "media_id", "width", "height", F.octet_length("content").alias("n_out")
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling 1->N fan-out: per-frame sizes are oracle-checkable."""
    out = sample_frames(synthesize_media(spark, sf_dir))
    return out.select("media_id", "frame_idx", F.octet_length("frame").alias("n_frame"))


ORACLE: dict[str, str] = {
    "q_media_resize": """
        SELECT doc_id AS media_id,
               224 AS width, 224 AS height,
               CAST(least(octet_length(text::BLOB), 784) AS INT) AS n_out
        FROM documents WHERE doc_id % 4 = 0
    """,
    "q_frame_sample": """
        SELECT doc_id AS media_id,
               CAST(k AS INT) AS frame_idx,
               CAST(least(octet_length(text::BLOB) - k * 256, 256) AS INT) AS n_frame
        FROM documents,
             UNNEST(generate_series(0, CAST(least(8, greatest(1,
                 octet_length(text::BLOB) // 256)) AS BIGINT) - 1)) AS t(k)
        WHERE doc_id % 4 = 2
    """,
    "q_multimodal_decode": """
        SELECT doc_id AS media_id,
               CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               WHEN 2 THEN 'video' ELSE 'text' END AS media_type,
               CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
               lower(hex(encode(substring(text, 1, 4)))) AS magic
        FROM documents
    """,
}
