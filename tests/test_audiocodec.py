"""WAV codec unit/property tests (functions/audiocodec.py) — the audio
counterpart of tests/test_imagecodec.py: encode->decode round trips, spec
chunk-walking (unknown chunks, odd padding, arbitrary order), and the
declared-error contract for unsupported variants.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kitkat_spark.functions.audiocodec import (
    RIFF_SIG,
    WAVE_SIG,
    sample_sum,
    wav_decode,
    wav_encode,
)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-(1 << 15), (1 << 15) - 1), min_size=0, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(1, 4),
)
def test_roundtrip(samples, rate, channels):
    frames = len(samples) - len(samples) % channels
    raw = np.array(samples[:frames], dtype="<i2").tobytes()
    blob = wav_encode(raw, rate, channels)
    r, c, n, data = wav_decode(blob)
    assert (r, c, n) == (rate, channels, frames // channels)
    assert bytes(data) == raw
    assert sample_sum(data) == int(
        np.frombuffer(raw, dtype="<i2").astype(np.int64).sum()
    )


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def test_chunk_walk_spec_compliance():
    """Unknown chunks before/after fmt+data, ODD-sized bodies (must pad to
    even offsets), and data-before-fmt ordering all parse — real files
    carry LIST/INFO metadata and nothing guarantees chunk order."""
    raw = np.array([1, -2, 3, -4], dtype="<i2").tobytes()
    fmt = _chunk(b"fmt ", struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
    data = _chunk(b"data", raw)
    odd = _chunk(b"LIST", b"INFOx")  # 5 bytes -> padded
    for layout in (
        odd + fmt + data,
        fmt + odd + data,
        data + fmt,  # data before fmt
        fmt + data + odd,
    ):
        blob = RIFF_SIG + struct.pack("<I", 4 + len(layout)) + WAVE_SIG + layout
        r, c, n, d = wav_decode(blob)
        assert (r, c, n) == (8000, 1, 4)
        assert sample_sum(d) == -2


def test_declared_errors():
    raw = np.zeros(4, dtype="<i2").tobytes()
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        wav_decode(wav_encode(raw, 8000, 1)[:20])  # truncated
    # float PCM (format tag 3) and 8-bit depth: declared NotImplementedError
    fmt3 = _chunk(b"fmt ", struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32))
    blob = RIFF_SIG + struct.pack("<I", 4 + len(fmt3)) + WAVE_SIG + fmt3
    with pytest.raises(NotImplementedError):
        wav_decode(blob)
    fmt8 = _chunk(b"fmt ", struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8))
    blob8 = RIFF_SIG + struct.pack("<I", 4 + len(fmt8)) + WAVE_SIG + fmt8
    with pytest.raises(NotImplementedError):
        wav_decode(blob8)
    with pytest.raises(ValueError):
        wav_encode(b"\x00\x01\x02", 8000, 1)  # not whole frames


def test_fixture_wav_matches_closed_form(spark):
    """The synthesized audio payloads decode to exactly the closed-form
    frame count and sample sum the oracle states."""
    from kitkat_spark.operators.multimodal import (
        WAV_RATE,
        _wav_frames,
        synthesize_media,
    )

    rows = (
        synthesize_media(spark, "/root/testdata/sf0.001")
        .filter("media_type = 'audio'")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        rate, channels, n, data = wav_decode(bytes(r.content))
        d = r.media_id
        assert (rate, channels, n) == (WAV_RATE, 1, _wav_frames(d))
        i = np.arange(n, dtype=np.int64)
        expect = int(((d * 31 + i * 17) % 4001 - 2000).sum())
        assert sample_sum(data) == expect
