"""Pure-stdlib Y4M (YUV4MPEG2) codec — the video leg of the real-codec
matrix (images: functions/imagecodec.py; audio: functions/audiocodec.py).

YUV4MPEG2 (the mjpegtools ``yuv4mpeg(5)`` format — a fully public,
uncompressed video interchange container used by ffmpeg/x264 test
pipelines): an ASCII header line ``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``
terminated by ``\\n``, then per frame an ASCII ``FRAME`` line (optional
parameters) and raw planar YCbCr data. We implement the C420 layout
(luma w*h bytes, then two half-resolution chroma planes of w/2 * h/2):
frame size = w*h*3/2.

Unsupported colorspaces (C422/C444/mono) and malformed headers raise —
the same declared-error contract as the other codecs.

Scale note: runs inside Arrow-batched ``mapInPandas`` stages; the
per-clip Python cost is the honest price of a codec the JVM lacks, while
schema, batching, and the shuffle-free 1->N frame fan-out stay
distributed.
"""

from __future__ import annotations

Y4M_SIG = b"YUV4MPEG2"


def y4m_encode(frames: list[bytes], width: int, height: int, fps: int = 25) -> bytes:
    """C420 Y4M from raw planar frames (each exactly w*h*3/2 bytes)."""
    if width % 2 or height % 2:
        raise ValueError("C420 requires even dimensions")
    fsize = width * height * 3 // 2
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame size {len(f)} != {fsize}")
    head = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420\n".encode()
    return head + b"".join(b"FRAME\n" + f for f in frames)


def y4m_decode(content: bytes) -> tuple[int, int, int, list[memoryview]]:
    """Parse a C420 Y4M: returns (width, height, fps_num, frames) with
    each frame the raw w*h*3/2 planar bytes."""
    nl = content.find(b"\n")
    if nl < 0 or not content.startswith(Y4M_SIG):
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = fps = None
    colorspace = "C420"
    for tok in content[len(Y4M_SIG) : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            fps = int(t[1:].split(":")[0])
        elif t.startswith("C"):
            colorspace = t
    if width is None or height is None:
        raise ValueError("missing W/H in stream header")
    if width <= 0 or height <= 0 or width % 2 or height % 2:
        # C420 subsamples chroma 2x2, so dims must be positive and even —
        # mirror y4m_encode's contract; without this check fsize floors and
        # a corrupt header mis-frames the stream silently.
        raise ValueError(f"invalid C420 dimensions W{width} H{height}")
    if not colorspace.startswith("C420"):
        raise NotImplementedError(f"no codec for colorspace {colorspace}")
    fsize = width * height * 3 // 2
    frames: list[memoryview] = []
    view = memoryview(content)
    pos = nl + 1
    n = len(content)
    while pos < n:
        fnl = content.find(b"\n", pos)
        if fnl < 0 or content[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME header")
        start = fnl + 1
        if start + fsize > n:
            raise ValueError("truncated frame data")
        frames.append(view[start : start + fsize])
        pos = start + fsize
    return width, height, (fps or 0), frames


def luma_sum(frame: memoryview, width: int, height: int) -> int:
    """Exact integer sum of the frame's luma plane — the decode witness
    the oracle replays in closed form (a plane-offset or header-length
    bug cannot reproduce it)."""
    import numpy as np

    return int(
        np.frombuffer(frame[: width * height], dtype=np.uint8)
        .astype(np.int64)
        .sum()
    )
