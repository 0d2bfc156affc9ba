"""Unit tests for the pure-stdlib PNG/BMP codecs (functions/imagecodec.py).

Round-trips alone can't catch a shared misunderstanding (a wrong Paeth on
both sides cancels out), so alongside encode->decode round-trips these
pin hand-constructed byte streams with hand-computed expected pixels."""

from __future__ import annotations

import struct
import zlib

import pytest

from kitkat_spark.functions.imagecodec import (
    BMP_SIG,
    PNG_SIG,
    _paeth,
    bmp_decode,
    bmp_encode,
    decode_image,
    png_decode,
    png_encode,
)


def _pixels(w: int, h: int, c: int, seed: int = 7) -> bytes:
    return bytes((seed * 31 + i * 97) % 256 for i in range(w * h * c))


@pytest.mark.parametrize("w,h", [(1, 1), (1, 9), (9, 1), (16, 14), (5, 7)])
@pytest.mark.parametrize("c", [1, 3])
def test_png_roundtrip(w, h, c):
    px = _pixels(w, h, c)
    data = png_encode(px, w, h, c)
    assert data[:8] == PNG_SIG
    rw, rh, rc, rpx = png_decode(data)
    assert (rw, rh, rc, rpx) == (w, h, c, px)
    # h >= 5 exercises every filter type (encoder cycles 0..4 by row)


def test_paeth_predictor_spec_cases():
    # From the PNG spec: pick nearest of a (left), b (above), c (upper-left),
    # breaking ties a, then b, then c.
    assert _paeth(0, 0, 0) == 0
    assert _paeth(100, 50, 25) == 100  # p=125: pa=25 pb=75 pc=100 -> a
    assert _paeth(50, 100, 25) == 100  # p=125: pa=75 pb=25 pc=100 -> b
    assert _paeth(10, 20, 15) == 15    # p=15: pa=5 pb=5 pc=0 -> c
    assert _paeth(5, 5, 5) == 5        # tie -> a


def _raw_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def test_png_decode_hand_built_up_filter():
    # 2x2 greyscale, rows [10, 20] and [15, 27]; row 0 unfiltered (type 0),
    # row 1 Up-filtered (type 2): stored as [15-10, 27-20] = [5, 7].
    scanlines = bytes([0, 10, 20]) + bytes([2, 5, 7])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (
        PNG_SIG
        + _raw_chunk(b"IHDR", ihdr)
        + _raw_chunk(b"IDAT", zlib.compress(scanlines))
        + _raw_chunk(b"IEND", b"")
    )
    assert png_decode(data) == (2, 2, 1, bytes([10, 20, 15, 27]))


def test_png_decode_hand_built_sub_and_paeth():
    # 2x3 RGB. Row 0 Sub (type 1): first pixel raw, second stored minus
    # left-neighbour channel. Row 1 Paeth (type 4).
    row0 = bytes([1, 2, 3, 11, 22, 33])
    row1 = bytes([5, 5, 5, 250, 250, 250])
    enc0 = bytes([1, 1, 2, 3]) + bytes(
        [(11 - 1) & 255, (22 - 2) & 255, (33 - 3) & 255]
    )
    # Paeth for row 1: i<3 -> a=0,c=0,b=row0[i] -> predictor=b;
    # i>=3 -> a=row1[i-3], b=row0[i], c=row0[i-3]
    enc1 = bytearray([4])
    for i in range(6):
        a = row1[i - 3] if i >= 3 else 0
        b = row0[i]
        c = row0[i - 3] if i >= 3 else 0
        enc1.append((row1[i] - _paeth(a, b, c)) & 255)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        PNG_SIG
        + _raw_chunk(b"IHDR", ihdr)
        + _raw_chunk(b"IDAT", zlib.compress(enc0 + bytes(enc1)))
        + _raw_chunk(b"IEND", b"")
    )
    assert png_decode(data) == (2, 2, 3, row0 + row1)


def test_png_crc_corruption_detected():
    data = bytearray(png_encode(_pixels(4, 4, 1), 4, 4, 1))
    data[20] ^= 0xFF  # flip a byte inside IHDR payload
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_png_rejects_unsupported():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # palette
    data = PNG_SIG + _raw_chunk(b"IHDR", ihdr) + _raw_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        png_decode(data)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (5, 3)])
def test_bmp_roundtrip(w, h):
    px = _pixels(w, h, 3)
    data = bmp_encode(px, w, h)
    assert data[:2] == BMP_SIG
    assert bmp_decode(data) == (w, h, 3, px)


def test_bmp_decode_hand_built():
    # 2x2 24-bit BMP, bottom-up, BGR, width 2 -> stride 8 (2 pad bytes).
    # Logical pixels (top-down RGB): (1,2,3) (4,5,6) / (7,8,9) (10,11,12)
    bottom_row = bytes([9, 8, 7, 12, 11, 10, 0, 0])  # y=1 stored first
    top_row = bytes([3, 2, 1, 6, 5, 4, 0, 0])
    body = bottom_row + top_row
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    w, h, c, px = bmp_decode(header + info + body)
    assert (w, h, c) == (2, 2, 3)
    assert px == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])


def test_decode_image_dispatch():
    png = png_encode(_pixels(2, 2, 1), 2, 2, 1)
    bmp = bmp_encode(_pixels(2, 2, 3), 2, 2)
    assert decode_image(png)[:3] == (2, 2, 1)
    assert decode_image(bmp)[:3] == (2, 2, 3)
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a....")
