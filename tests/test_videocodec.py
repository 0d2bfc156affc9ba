"""Y4M codec unit/property tests (functions/videocodec.py) — encode->decode
round trips, header parsing, the declared-error contract, and the fixture's
closed-form luma arithmetic.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kitkat_spark.functions.videocodec import (
    Y4M_SIG,
    luma_sum,
    y4m_decode,
    y4m_encode,
)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 8).map(lambda k: 2 * k),
    st.integers(1, 6).map(lambda k: 2 * k),
    st.integers(0, 5),
    st.randoms(use_true_random=False),
)
def test_roundtrip(w, h, nf, rnd):
    fsize = w * h * 3 // 2
    frames = [
        bytes(rnd.randrange(256) for _ in range(fsize)) for _ in range(nf)
    ]
    blob = y4m_encode(frames, w, h, 30)
    W, H, fps, out = y4m_decode(blob)
    assert (W, H, fps, len(out)) == (w, h, 30, nf)
    for a, b in zip(frames, out):
        assert a == bytes(b)
        assert luma_sum(b, w, h) == sum(a[: w * h])


def test_header_tokens_any_order():
    f = bytes(range(48)) * (8 * 4 * 3 // 2 // 48 or 1)
    f = (bytes(range(256)) * 2)[: 8 * 4 * 3 // 2]
    blob = b"YUV4MPEG2 C420 A1:1 F24:1 H4 W8 Ip\n" + b"FRAME\n" + f
    w, h, fps, frames = y4m_decode(blob)
    assert (w, h, fps, len(frames)) == (8, 4, 24, 1)


def test_declared_errors():
    with pytest.raises(ValueError):
        y4m_decode(b"NOTY4M anything\n")
    with pytest.raises(ValueError):
        y4m_decode(Y4M_SIG + b" W8 H4 F25:1 C420")  # no newline
    with pytest.raises(NotImplementedError):
        y4m_decode(Y4M_SIG + b" W8 H4 F25:1 C444\n")
    with pytest.raises(ValueError):
        y4m_decode(Y4M_SIG + b" W8 H4 F25:1 C420\nFRAME\n\x00\x00")  # truncated
    with pytest.raises(ValueError):
        y4m_encode([b"\x00"], 3, 4)  # odd width
    with pytest.raises(ValueError):
        y4m_encode([b"\x00"], 8, 4)  # wrong frame size


def test_fixture_y4m_matches_closed_form(spark):
    """The synthesized video payloads decode to exactly the closed-form
    dims, frame count, and luma sums the oracle states."""
    from kitkat_spark.operators.multimodal import (
        Y4M_FPS,
        _y4m_dims,
        _y4m_nframes,
        synthesize_media,
    )

    rows = (
        synthesize_media(spark, "/root/testdata/sf0.001")
        .filter("media_type = 'video'")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        d = r.media_id
        w, h, fps, frames = y4m_decode(bytes(r.content))
        assert (w, h) == _y4m_dims(d)
        assert fps == Y4M_FPS
        assert len(frames) == _y4m_nframes(d)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        for f, fr in enumerate(frames):
            expect = int(((3 * x + 5 * y + 7 * f + d) % 256).sum())
            assert luma_sum(fr, w, h) == expect
