"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.B, M4).

Design: media are opaque ``binary`` columns travelling next to typed metadata
(a struct column), processed by Arrow-batched ``mapInPandas`` stages.

IMAGES ARE REAL as of round 9: synthesized media carry genuine PNG bytes
(functions/imagecodec.py — pure-stdlib encoder with per-row filter cycling),
and the decode/resize stages run a real spec-compliant PNG/BMP parser
(all five scanline filters, CRC-verified chunks, bottom-up BMP rows). The
image dimensions and pixel values are deterministic functions of doc_id
(see ``_img_dims``/``_img_pixels``), so the DuckDB oracles replay decoded
width/height/pixel sums arithmetically — a wrong unfilter or a padding leak
changes ``px_sum`` and fails the hash gate.

AUDIO IS REAL as of round 9 (session 4): audio docs carry genuine WAV
(RIFF PCM 16-bit) payloads built executor-side, and decode runs the real
chunk-walking parser (functions/audiocodec.py). Frame count and the exact
int16 sample sum are deterministic functions of doc_id (see
``_wav_frames``; sample i = (doc_id*31 + i*17) % 4001 - 2000), so the
DuckDB oracle replays duration and sample_sum in closed form — a
byte-order, header-offset, or chunk-padding bug changes the sum and fails
the hash gate.

VIDEO IS REAL as of round 9 (session 4): video docs carry genuine Y4M
(YUV4MPEG2, C420) streams built executor-side, and both decode and the
frame-sampling 1->N fan-out run the real parser
(functions/videocodec.py). Frame count, dimensions, and per-frame luma
sums are deterministic functions of doc_id (see ``_y4m_dims``/
``_y4m_nframes``; luma(f, x, y) = (3x + 5y + 7f + doc_id) % 256), so the
DuckDB oracle replays duration, pixel counts, and the exact luma sums in
closed form — a plane-offset or header-length bug fails the hash gate.

Payloads without a codec still route through the clearly-marked
deterministic stub; unsupported formats raise NotImplementedError. Swap
in ffmpeg at the same seams in a deployment — batching, schema, and
partitioning are unchanged.

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
    "width int, height int, n_px long, px_sum long, duration_s double, "
    "checksum long"
)


def _img_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic fixture image dimensions (oracle-replayable)."""
    return 4 + doc_id % 13, 4 + doc_id % 11


def _img_pixels(doc_id: int, channels: int):
    """Deterministic fixture pixels: grey value v(x, y) = (7x+13y+doc_id)
    mod 256; RGB channels (v, v+85, v+170) mod 256. Returned as a numpy
    (h, w[, 3]) uint8 array — the oracle replays the same arithmetic."""
    import numpy as np

    w, h = _img_dims(doc_id)
    v = (7 * np.arange(w)[None, :] + 13 * np.arange(h)[:, None] + doc_id) % 256
    if channels == 1:
        return v.astype(np.uint8)
    return np.stack([v, (v + 85) % 256, (v + 170) % 256], axis=-1).astype(
        np.uint8
    )


def _wav_frames(doc_id: int) -> int:
    """Deterministic fixture frame count (oracle-replayable)."""
    return 200 + doc_id % 101


WAV_RATE = 8000
Y4M_FPS = 25
# sample_frames defaults, mirrored into the q_frame_sample oracle: sampled
# frame indexes are 0, FRAME_STRIDE, ... and capped at FRAME_MAX frames, so
# frame_idx < FRAME_STRIDE * FRAME_MAX always. The fixture's _y4m_nframes
# (<= 8) keeps the cap inactive at fixture scale, but the oracle states it
# explicitly so raising the fixture frame count cannot silently break parity.
FRAME_STRIDE = 2
FRAME_MAX = 8


def _y4m_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic EVEN fixture dimensions (C420 requires them)."""
    return 2 * (4 + doc_id % 5), 2 * (3 + doc_id % 4)


def _y4m_nframes(doc_id: int) -> int:
    return 3 + doc_id % 6


def _decode_stub(content: bytes, media_type: str) -> dict:
    """Feature extraction: REAL decode for PNG/BMP payloads (magic
    dispatch into functions/imagecodec.py) and for WAV audio (RIFF chunk
    walk into functions/audiocodec.py); deterministic STUB for the media
    types without a codec in this container (video/text).

    Raises NotImplementedError for media types a real deployment would need a
    codec for but we cannot fake coherently.
    """
    from kitkat_spark.functions import audiocodec, imagecodec, videocodec

    if content[:8] == imagecodec.PNG_SIG or content[:2] == imagecodec.BMP_SIG:
        w, h, c, px = imagecodec.decode_image(content)
        return {
            "magic": content[:4].hex(),
            "width": w,
            "height": h,
            "n_px": w * h,
            "px_sum": sum(px),
            "duration_s": None,
            "checksum": None,
        }
    if content[:4] == audiocodec.RIFF_SIG and content[8:12] == audiocodec.WAVE_SIG:
        rate, channels, n_frames, data = audiocodec.wav_decode(content)
        return {
            "magic": content[:4].hex(),
            "width": None,
            "height": None,
            "n_px": None,
            "px_sum": None,
            "duration_s": round(n_frames / rate, 6),
            "checksum": audiocodec.sample_sum(data),
        }
    if content[: len(videocodec.Y4M_SIG)] == videocodec.Y4M_SIG:
        w, h, fps, frames = videocodec.y4m_decode(content)
        return {
            "magic": content[:4].hex(),
            "width": w,
            "height": h,
            "n_px": w * h,
            "px_sum": sum(videocodec.luma_sum(f, w, h) for f in frames),
            "duration_s": round(len(frames) / fps, 6) if fps else None,
            "checksum": None,
        }
    if media_type not in {"image", "audio", "video", "text"}:
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    n = len(content)
    checksum = 0
    for b in content[:64]:  # deterministic cheap "feature"
        checksum = (checksum * 131 + b) % (1 << 31)
    return {
        "magic": content[:4].hex(),
        "width": (n % 640) + 1 if media_type == "video" else None,
        "height": (n % 480) + 1 if media_type == "video" else None,
        "n_px": None,
        "px_sum": None,
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
                    "n_px",
                    "px_sum",
                    "duration_s",
                    "checksum",
                ]
            ]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, px_sum long, content binary"
FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame binary, "
    "width int, height int, luma_sum long"
)


def _nn_resize(content: bytes, width: int, height: int) -> tuple[int, bytes]:
    """REAL nearest-neighbour resample of a PNG/BMP payload to
    (width x height), emitted as raw row-major pixel bytes (same channel
    count as the source): out(i, j) = src(floor(i*h/height),
    floor(j*w/width)) — the standard NN mapping, replayed arithmetically
    by the oracle. Returns (px_sum, raw_bytes)."""
    import numpy as np

    from kitkat_spark.functions import imagecodec

    w, h, c, px = imagecodec.decode_image(content)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    out = arr[ys][:, xs]
    return int(out.sum()), out.tobytes()


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage (images only): mapInPandas nearest-neighbour resample.

    PNG/BMP payloads are REALLY decoded (functions/imagecodec.py) and
    resampled; payloads without a codec fall back to the byte-subsampling
    stub so the stage stays total. Swap ``_nn_resize`` for PIL's
    ``Image.resize`` — batching, schema, and partitioning are unchanged."""
    from kitkat_spark.functions.imagecodec import BMP_SIG, PNG_SIG

    # Catalyst pushes this filter through the synthesize union into both
    # branches, so the non-image branch's rows never reach the (pricey)
    # PNG-encode UDF projection; the in-batch guard below stays as the
    # semantic contract for callers that pass unfiltered media.
    media = media.filter(F.col("media_type") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64  # stub: bytes proportional to area
        for pdf in batches:
            imgs = pdf[pdf["media_type"] == "image"]
            if not len(imgs):
                continue
            sums, outs = [], []
            for c in imgs["content"]:
                c = c or b""
                if c[:8] == PNG_SIG or c[:2] == BMP_SIG:
                    s, o = _nn_resize(c, width, height)
                else:  # stub path for codec-less payloads
                    o = bytes(c[: max(1, target)])
                    s = None
                sums.append(s)
                outs.append(o)
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"].values,
                    "width": width,
                    "height": height,
                    "px_sum": pd.array(sums, dtype="Int64"),
                    "content": outs,
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 256,
    max_frames: int = FRAME_MAX,
    frame_stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sampling stage (videos only): one output row per sampled frame
    — the mapInPandas 1->N fan-out shape. Y4M payloads are REALLY decoded
    (functions/videocodec.py) and every ``frame_stride``-th frame emitted
    with its exact luma-plane sum; payloads without a codec fall back to
    the byte-window stub (NULL dims/luma) so the stage stays total. Swap
    in ffmpeg at the same seam — batching, schema, fan-out unchanged."""
    from kitkat_spark.functions.videocodec import Y4M_SIG, luma_sum, y4m_decode

    media = media.filter(F.col("media_type") == "video")  # see resize_images

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            ids, idxs, frames, ws, hs, lsums = [], [], [], [], [], []
            for mid, c in zip(vids["media_id"], vids["content"]):
                c = c or b""
                if c[: len(Y4M_SIG)] == Y4M_SIG:
                    w, h, _fps, fs = y4m_decode(c)
                    for fi in list(range(0, len(fs), frame_stride))[:max_frames]:
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(bytes(fs[fi]))
                        ws.append(w)
                        hs.append(h)
                        lsums.append(luma_sum(fs[fi], w, h))
                    continue
                for k in range(min(max_frames, max(1, len(c) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(bytes(c[k * every_n_bytes : (k + 1) * every_n_bytes]))
                    ws.append(None)
                    hs.append(None)
                    lsums.append(None)
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "frame_idx": idxs,
                        "frame": frames,
                        "width": pd.array(ws, dtype="Int32"),
                        "height": pd.array(hs, dtype="Int32"),
                        "luma_sum": pd.array(lsums, dtype="Int64"),
                    }
                )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


@F.pandas_udf(T.BinaryType())
def _png_for_doc(doc_id: pd.Series) -> pd.Series:
    """Deterministic PNG payload per doc: greyscale when doc_id % 8 == 0,
    truecolour otherwise (image docs have doc_id % 4 == 0, so the split is
    even). Runs Arrow-batched on executors — no driver-side encode loop."""
    from kitkat_spark.functions.imagecodec import png_encode

    out = []
    for d in doc_id:
        d = int(d)
        w, h = _img_dims(d)
        c = 1 if d % 8 == 0 else 3
        out.append(png_encode(_img_pixels(d, c).tobytes(), w, h, c))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def _wav_for_doc(doc_id: pd.Series) -> pd.Series:
    """Deterministic WAV payload per audio doc: mono 16-bit PCM at
    WAV_RATE, _wav_frames(doc_id) frames, sample i = (doc_id*31 + i*17)
    % 4001 - 2000 — closed-form for the oracle, in int16 range by
    construction. Runs Arrow-batched on executors."""
    import numpy as np

    from kitkat_spark.functions.audiocodec import wav_encode

    out = []
    for d in doc_id:
        d = int(d)
        i = np.arange(_wav_frames(d), dtype=np.int64)
        s = ((d * 31 + i * 17) % 4001 - 2000).astype("<i2")
        out.append(wav_encode(s.tobytes(), WAV_RATE, 1))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def _y4m_for_doc(doc_id: pd.Series) -> pd.Series:
    """Deterministic Y4M payload per video doc: C420 at Y4M_FPS,
    _y4m_nframes(doc_id) frames of _y4m_dims(doc_id); luma(f, x, y) =
    (3x + 5y + 7f + doc_id) % 256, chroma planes constant (doc_id + f)
    and (doc_id + 2f) mod 256 — closed-form for the oracle. Runs
    Arrow-batched on executors."""
    import numpy as np

    from kitkat_spark.functions.videocodec import y4m_encode

    out = []
    for d in doc_id:
        d = int(d)
        w, h = _y4m_dims(d)
        frames = []
        for f in range(_y4m_nframes(d)):
            luma = (
                (3 * np.arange(w)[None, :] + 5 * np.arange(h)[:, None] + 7 * f + d)
                % 256
            ).astype(np.uint8)
            u = np.full((h // 2, w // 2), (d + f) % 256, np.uint8)
            v = np.full((h // 2, w // 2), (d + 2 * f) % 256, np.uint8)
            frames.append(luma.tobytes() + u.tobytes() + v.tobytes())
        out.append(y4m_encode(frames, w, h, Y4M_FPS))
    return pd.Series(out)


@F.pandas_udf(T.BinaryType())
def _image_for_doc(doc_id: pd.Series) -> pd.Series:
    """Mixed-format payload per doc for q_image_decode: PNG greyscale
    (doc_id % 3 == 0), PNG truecolour (== 1), 24-bit BMP (== 2)."""
    from kitkat_spark.functions.imagecodec import bmp_encode, png_encode

    out = []
    for d in doc_id:
        d = int(d)
        w, h = _img_dims(d)
        fmt = d % 3
        if fmt == 0:
            out.append(png_encode(_img_pixels(d, 1).tobytes(), w, h, 1))
        elif fmt == 1:
            out.append(png_encode(_img_pixels(d, 3).tobytes(), w, h, 3))
        else:
            out.append(bmp_encode(_img_pixels(d, 3).tobytes(), w, h))
    return pd.Series(out)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media fixture: image docs carry REAL PNG payloads and
    audio docs REAL WAV payloads (both built executor-side from doc_id),
    the rest the documents' utf-8 bytes as fake video/text payloads.

    The content kinds are built on SEPARATE filtered branches and
    unioned: a pandas UDF inside when()/otherwise() is hoisted into an
    ArrowEvalPython node and evaluated for EVERY row, so the single-branch
    form paid the PNG encode 4x over (measured ~0.6 s at sf0.1 across the
    three media queries)."""
    docs = load_table(spark, sf_dir, "documents")

    def shape(df: DataFrame, content: F.Column, mtype: str) -> DataFrame:
        # media_type is a LITERAL per branch so a consumer's
        # filter(media_type == 'image') constant-folds the other branches
        # to empty relations — the codec-encode UDFs of excluded types
        # never run (with a computed media_type the audio branch paid the
        # WAV encode for rows q_media_resize immediately discarded)
        return df.select(
            F.col("doc_id").alias("media_id"),
            F.lit(mtype).alias("media_type"),
            content.alias("content"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.octet_length(content).cast("long").alias("n_bytes"),
            ).alias("meta"),
        )

    mod4 = F.pmod(F.col("doc_id"), F.lit(4))
    return (
        shape(docs.filter(mod4 == 0), _png_for_doc(F.col("doc_id")), "image")
        .unionByName(shape(docs.filter(mod4 == 1), _wav_for_doc(F.col("doc_id")), "audio"))
        .unionByName(shape(docs.filter(mod4 == 2), _y4m_for_doc(F.col("doc_id")), "video"))
        .unionByName(
            shape(docs.filter(mod4 == 3), F.col("text").cast("binary"), "text")
        )
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over synthesized media. Image rows exercise the
    REAL PNG decoder (magic, width, height, n_px, px_sum from parsing
    actual PNG bytes — CRC-checked, inflated, unfiltered) and audio rows
    the REAL WAV parser (duration from the fmt/data chunk walk,
    sample_sum the exact int16 sum of the decoded PCM stream); the oracle
    replays every value arithmetically from doc_id, so a decoder bug in
    either codec cannot hash-green. Video/text rows keep the documented
    stub features (sample_sum exposed for audio only — the stub checksum
    is not a decode witness)."""
    feats = extract_features(synthesize_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        "magic",
        "width",
        "height",
        "n_px",
        "px_sum",
        "duration_s",
        F.when(F.col("media_type") == "audio", F.col("checksum")).alias(
            "sample_sum"
        ),
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + nearest-neighbour resample to 16x16: output size and
    the resampled pixel sum are both oracle-replayed (the NN source-index
    arithmetic must match cell-for-cell)."""
    out = resize_images(synthesize_media(spark, sf_dir), width=16, height=16)
    return out.select(
        "media_id",
        "width",
        "height",
        F.octet_length("content").alias("n_out"),
        "px_sum",
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame-sampling 1->N fan-out: every 2nd frame of each Y4M
    stream, with the C420 frame size, dimensions, and the exact per-frame
    luma-plane sum — all replayed in closed form by the oracle (a
    plane-offset or stride bug cannot hash-green)."""
    out = sample_frames(synthesize_media(spark, sf_dir))
    return out.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame").alias("n_frame"),
        "width",
        "height",
        "luma_sum",
    )


def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three real codec paths (PNG greyscale / PNG truecolour / 24-bit
    BMP) over every document: encode executor-side, decode through the
    magic-dispatch feature extractor, verify decoded dims + pixel sums
    against the oracle's closed-form arithmetic. BMP rows prove the
    bottom-up row flip and 4-byte padding strip (a padding leak would
    corrupt px_sum)."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        _image_for_doc(F.col("doc_id")).alias("content"),
    )
    feats = extract_features(media)
    fmt = F.element_at(
        F.array(F.lit("png-gray"), F.lit("png-rgb"), F.lit("bmp")),
        (F.pmod(F.col("media_id"), F.lit(3)) + 1).cast("int"),
    )
    return feats.select(
        "media_id", fmt.alias("fmt"), "width", "height", "n_px", "px_sum"
    )


_BF_CACHE: dict[tuple[str, str], str] = {}
BF_FILES = 256  # fixture size — the operator's subject is the source path


def _binary_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Directory of BF_FILES real PNG files with deterministic content
    derived from the file id (same pixel arithmetic as the media fixtures).
    Built DRIVER-side once per (session, sf) — fixture construction
    standing in for the object store a production ingest reads, not part
    of the measured operator; the file count is the fixture's bound, not a
    silent cap on the query. Benign check-then-set race as with
    _JSON_CACHE: last writer wins, content is byte-identical."""
    import os

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BF_CACHE:
        from kitkat_spark.functions.imagecodec import png_encode

        path = os.path.join(
            "/tmp/kitkat_binaryfiles",
            spark.sparkContext.applicationId,
            os.path.basename(os.path.normpath(sf_dir)),
        )
        os.makedirs(path, exist_ok=True)
        for d in range(BF_FILES):
            c = 1 if d % 2 == 0 else 3
            w, h = _img_dims(d)
            with open(os.path.join(path, f"img_{d:06d}.png"), "wb") as f:
                f.write(png_encode(_img_pixels(d, c).tobytes(), w, h, c))
        _BF_CACHE[key] = path
    return _BF_CACHE[key]


def q_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file ingest through Spark's ``binaryFile`` source — the missing
    first step of the multimodal family: the other media queries synthesize
    payload COLUMNS, this one reads real .png FILES from a directory the
    way a production pipeline reads an object-store bucket, then decodes
    them through the same magic-dispatch codec path.

    Scale shape: binaryFile assigns whole files to tasks (files are not
    splittable), packing small files per task up to maxPartitionBytes —
    exactly the layout for billions of small media objects; the decode is
    the same Arrow-batched mapInPandas as extract_features, and nothing
    here shuffles except the final id-ordered presentation sort. ``len_ok``
    cross-checks the source's advertised ``length`` metadata against the
    bytes actually handed to the codec.

    Correctness: the oracle replays file ids, dims, and pixel sums in
    closed form (files are deterministic functions of their id), so a
    corrupted read, a bad CRC, or a filter-reconstruction slip all
    hash-mismatch. The PNG decode itself is CRC-checked per chunk
    (functions/imagecodec.py)."""
    path = _binary_fixture(spark, sf_dir)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(path)
    )
    media = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.png$", 1)
        .cast("long")
        .alias("media_id"),
        F.lit("image").alias("media_type"),
        "content",
        F.col("length").alias("src_len"),
    )
    feats = extract_features(
        media.select("media_id", "media_type", "content")
    )
    fmt = F.when(
        F.pmod(F.col("media_id"), F.lit(2)) == 0, F.lit("png-gray")
    ).otherwise(F.lit("png-rgb"))
    return (
        feats.join(media.select("media_id", "src_len"), "media_id")
        .select(
            "media_id",
            fmt.alias("fmt"),
            "width",
            "height",
            "n_px",
            "px_sum",
            (F.col("n_bytes") == F.col("src_len")).alias("len_ok"),
        )
        .orderBy("media_id")
    )


# Oracle grid arithmetic: v(x, y, id) = (7x + 13y + id) mod 256; RGB
# channel sum = v + (v+85 mod 256) + (v+170 mod 256). Dims w = 4 + id%13
# (max 16), h = 4 + id%11 (max 14); the fixed ranges below are cross-joined
# then filtered per doc (DuckDB's generate_series cannot lateral-join).
_PXSUM_GRID = """
    gx AS (SELECT x FROM range(0, 16) t(x)),
    gy AS (SELECT y FROM range(0, 14) t(y)),
    px AS (
      SELECT d.doc_id,
             SUM(CASE WHEN {gray} THEN (7*gx.x + 13*gy.y + d.doc_id) % 256
                 ELSE ((7*gx.x + 13*gy.y + d.doc_id) % 256)
                    + (((7*gx.x + 13*gy.y + d.doc_id) % 256) + 85) % 256
                    + (((7*gx.x + 13*gy.y + d.doc_id) % 256) + 170) % 256
                 END) AS s
      FROM documents d, gx, gy
      WHERE {only} gx.x < 4 + d.doc_id % 13 AND gy.y < 4 + d.doc_id % 11
      GROUP BY 1)
"""

ORACLE: dict[str, str] = {
    "q_binary_ingest": f"""
        WITH ids AS (SELECT id FROM range(0, {BF_FILES}) t(id)),
        gx AS (SELECT x FROM range(0, 16) t(x)),
        gy AS (SELECT y FROM range(0, 14) t(y)),
        px AS (
          SELECT ids.id,
                 SUM(CASE WHEN id % 2 = 0
                     THEN (7*gx.x + 13*gy.y + id) % 256
                     ELSE ((7*gx.x + 13*gy.y + id) % 256)
                        + (((7*gx.x + 13*gy.y + id) % 256) + 85) % 256
                        + (((7*gx.x + 13*gy.y + id) % 256) + 170) % 256
                     END) AS s
          FROM ids, gx, gy
          WHERE gx.x < 4 + id % 13 AND gy.y < 4 + id % 11
          GROUP BY 1)
        SELECT id AS media_id,
               CASE WHEN id % 2 = 0 THEN 'png-gray' ELSE 'png-rgb' END AS fmt,
               CAST(4 + id % 13 AS INT) AS width,
               CAST(4 + id % 11 AS INT) AS height,
               CAST((4 + id % 13) * (4 + id % 11) AS BIGINT) AS n_px,
               CAST(s AS BIGINT) AS px_sum,
               TRUE AS len_ok
        FROM px ORDER BY media_id
    """,
    "q_media_resize": """
        WITH gx AS (SELECT x FROM range(0, 16) t(x)),
             gy AS (SELECT y FROM range(0, 16) t(y)),
             nn AS (
               SELECT d.doc_id,
                      (7 * ((gx.x * (4 + d.doc_id % 13)) // 16)
                       + 13 * ((gy.y * (4 + d.doc_id % 11)) // 16)
                       + d.doc_id) % 256 AS v,
                      d.doc_id % 8 = 0 AS gray
               FROM documents d, gx, gy
               WHERE d.doc_id % 4 = 0)
        SELECT doc_id AS media_id, 16 AS width, 16 AS height,
               CAST(CASE WHEN gray THEN 256 ELSE 768 END AS INT) AS n_out,
               CAST(SUM(CASE WHEN gray THEN v
                        ELSE v + (v + 85) % 256 + (v + 170) % 256 END)
                    AS BIGINT) AS px_sum
        FROM nn GROUP BY doc_id, gray
    """,
    # Replays the Y4M sampling stride and the per-frame luma arithmetic:
    # frames 0, 2, ... of 3 + d%6, each w*h*3/2 bytes, luma(f, x, y) =
    # (3x + 5y + 7f + d) % 256 summed exactly. The frame_idx cap mirrors
    # sample_frames' max_frames so the coupling is explicit.
    "q_frame_sample": f"""
        WITH v AS (
            SELECT doc_id, 2 * (4 + doc_id % 5) AS w, 2 * (3 + doc_id % 4) AS h,
                   3 + doc_id % 6 AS nf
            FROM documents WHERE doc_id % 4 = 2
        ), fr AS (
            SELECT doc_id, w, h, CAST(f AS INT) AS frame_idx
            FROM v, UNNEST(generate_series(0, nf - 1, {FRAME_STRIDE})) AS t(f)
            WHERE f < {FRAME_STRIDE * FRAME_MAX}
        ), ls AS (
            SELECT fr.doc_id, fr.frame_idx,
                   sum((3 * x + 5 * y + 7 * fr.frame_idx + fr.doc_id) % 256) AS s
            FROM fr,
                 UNNEST(generate_series(0, fr.w - 1)) AS tx(x),
                 UNNEST(generate_series(0, fr.h - 1)) AS ty(y)
            GROUP BY 1, 2
        )
        SELECT fr.doc_id AS media_id, fr.frame_idx,
               CAST((fr.w * fr.h * 3) // 2 AS INT) AS n_frame,
               CAST(fr.w AS INT) AS width, CAST(fr.h AS INT) AS height,
               CAST(ls.s AS BIGINT) AS luma_sum
        FROM fr JOIN ls
          ON fr.doc_id = ls.doc_id AND fr.frame_idx = ls.frame_idx
    """,
    # Audio rows replay the REAL WAV decode in closed form: duration =
    # frames/rate and sample_sum = sum of the generated int16 stream —
    # the sum a header-offset / byte-order / chunk-padding bug cannot hit.
    "q_multimodal_decode": """
        WITH """ + _PXSUM_GRID.format(
        gray="d.doc_id % 8 = 0", only="d.doc_id % 4 = 0 AND"
    ) + """
        , wav AS (
            SELECT d.doc_id,
                   sum((d.doc_id * 31 + i * 17) % 4001 - 2000) AS s
            FROM documents d,
                 UNNEST(generate_series(0, 200 + d.doc_id % 101 - 1)) AS t(i)
            WHERE d.doc_id % 4 = 1
            GROUP BY d.doc_id
        ), vid AS (
            SELECT d.doc_id,
                   sum((3 * x + 5 * y + 7 * f + d.doc_id) % 256) AS s
            FROM documents d,
                 UNNEST(generate_series(0, 3 + d.doc_id % 6 - 1)) AS tf(f),
                 UNNEST(generate_series(0, 2 * (4 + d.doc_id % 5) - 1)) AS tx(x),
                 UNNEST(generate_series(0, 2 * (3 + d.doc_id % 4) - 1)) AS ty(y)
            WHERE d.doc_id % 4 = 2
            GROUP BY d.doc_id
        )
        SELECT d.doc_id AS media_id,
               CASE d.doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                                 WHEN 2 THEN 'video' ELSE 'text' END AS media_type,
               CASE d.doc_id % 4 WHEN 0 THEN '89504e47'
                                 WHEN 1 THEN '52494646'
                                 WHEN 2 THEN '59555634'
                    ELSE lower(hex(encode(substring(d.text, 1, 4)))) END AS magic,
               CAST(CASE WHEN d.doc_id % 4 = 0 THEN 4 + d.doc_id % 13
                         WHEN d.doc_id % 4 = 2 THEN 2 * (4 + d.doc_id % 5)
                    END AS INT) AS width,
               CAST(CASE WHEN d.doc_id % 4 = 0 THEN 4 + d.doc_id % 11
                         WHEN d.doc_id % 4 = 2 THEN 2 * (3 + d.doc_id % 4)
                    END AS INT) AS height,
               CAST(CASE WHEN d.doc_id % 4 = 0
                         THEN (4 + d.doc_id % 13) * (4 + d.doc_id % 11)
                         WHEN d.doc_id % 4 = 2
                         THEN 4 * (4 + d.doc_id % 5) * (3 + d.doc_id % 4)
                    END AS BIGINT) AS n_px,
               CAST(CASE WHEN d.doc_id % 4 = 0 THEN px.s
                         WHEN d.doc_id % 4 = 2 THEN vid.s
                    END AS BIGINT) AS px_sum,
               CASE WHEN d.doc_id % 4 = 1
                        THEN round((200 + d.doc_id % 101) / 8000.0, 6)
                    WHEN d.doc_id % 4 = 2
                        THEN round((3 + d.doc_id % 6) / 25.0, 6)
               END AS duration_s,
               CAST(wav.s AS BIGINT) AS sample_sum
        FROM documents d
        LEFT JOIN px ON px.doc_id = d.doc_id
        LEFT JOIN wav ON wav.doc_id = d.doc_id
        LEFT JOIN vid ON vid.doc_id = d.doc_id
    """,
    "q_image_decode": """
        WITH """ + _PXSUM_GRID.format(gray="d.doc_id % 3 = 0", only="") + """
        SELECT d.doc_id AS media_id,
               CASE d.doc_id % 3 WHEN 0 THEN 'png-gray' WHEN 1 THEN 'png-rgb'
                                 ELSE 'bmp' END AS fmt,
               CAST(4 + d.doc_id % 13 AS INT) AS width,
               CAST(4 + d.doc_id % 11 AS INT) AS height,
               CAST((4 + d.doc_id % 13) * (4 + d.doc_id % 11) AS BIGINT) AS n_px,
               CAST(px.s AS BIGINT) AS px_sum
        FROM documents d JOIN px ON px.doc_id = d.doc_id
    """,
}
