"""Pure-stdlib PNG and BMP codecs (round-8 verdict next-round #4).

Real parsers/encoders for two fully-public formats, replacing the stub
decode for image media while keeping the mapInPandas surface unchanged:

- PNG (ISO/IEC 15948 / RFC 2083): 8-bit greyscale (colour type 0) and
  8-bit truecolour (colour type 2), non-interlaced. The decoder walks the
  chunk stream, verifies every CRC-32, concatenates IDAT, inflates with
  stdlib ``zlib``, and reverses all five scanline filters (None/Sub/Up/
  Average/Paeth). The encoder cycles through the five filters row by row
  so round-trip tests exercise every unfilter path.
- BMP (Windows BITMAPFILEHEADER + BITMAPINFOHEADER): 24-bit uncompressed,
  bottom-up row order, BGR byte order, rows padded to 4-byte boundaries.

Unsupported variants (interlace, palettes, other bit depths, compressed
BMP) raise ``NotImplementedError`` — the same declared-error contract as
operators/multimodal.py's stub for formats without a codec.

Scale note: these run inside Arrow-batched ``mapInPandas`` stages, so the
per-image Python cost is the honest price of a codec the JVM lacks; the
plumbing around them (schema, batching, partition-preserving map) is the
part that must and does stay distributed.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"
BMP_SIG = b"BM"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to ``row`` (encode direction)."""
    n = len(row)
    out = bytearray(n)
    for i in range(n):
        x = row[i]
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:  # pragma: no cover - encoder only emits 0..4
            raise ValueError(f"bad filter {ftype}")
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse PNG filter ``ftype`` in place (decode direction)."""
    n = len(row)
    if ftype == 0:
        return
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            row[i] = (row[i] + a) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + b) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Encode row-major 8-bit pixels (len = w*h*channels) as a valid PNG.

    channels: 1 (greyscale) or 3 (truecolour). Scanline filters cycle
    0..4 by row so decoders must implement all five to round-trip."""
    if channels not in (1, 3):
        raise NotImplementedError(f"channels={channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = bytes(pixels[y * stride : (y + 1) * stride])
        ftype = y % 5
        raw.append(ftype)
        raw += _filter_row(ftype, row, prev, channels)
        prev = row
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, 0 if channels == 1 else 2, 0, 0, 0
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG -> (width, height, channels, row-major pixel bytes).

    Verifies the signature and every chunk CRC; supports 8-bit colour
    types 0 and 2, non-interlaced (NotImplementedError otherwise)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} colour={ctype} interlace={interlace}"
                )
            if comp != 0 or filt != 0:
                raise ValueError("invalid compression/filter method")
            channels = 1 if ctype == 0 else 3
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            seen_end = True
            break
    if width < 0 or not seen_end:
        raise ValueError("truncated PNG (missing IHDR/IEND)")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_row(ftype, row, prev, channels)
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(out)


def bmp_encode(pixels_rgb: bytes, width: int, height: int) -> bytes:
    """Encode row-major RGB8 pixels as a 24-bit uncompressed BMP
    (bottom-up rows, BGR order, rows padded to 4 bytes)."""
    if len(pixels_rgb) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    pad = (-(width * 3)) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels_rgb[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            body += bytes((b, g, r))
        body += bytes(pad)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", BMP_SIG, 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + bytes(body)


def bmp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a 24-bit uncompressed BMP -> (width, height, 3, RGB pixels,
    row-major top-down). Handles bottom-up (positive height) and top-down
    (negative height) layouts and 4-byte row padding."""
    if data[:2] != BMP_SIG:
        raise ValueError("not a BMP (bad signature)")
    _, _, _, offset = struct.unpack_from("<IHHI", data, 2)
    hdr_size, width, height_s = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    height = abs(height_s)
    bottom_up = height_s > 0
    stride = width * 3 + ((-(width * 3)) % 4)
    out = bytearray(width * height * 3)
    for row_i in range(height):
        y = (height - 1 - row_i) if bottom_up else row_i
        src = offset + row_i * stride
        for x in range(width):
            b, g, r = data[src + x * 3 : src + x * 3 + 3]
            d = (y * width + x) * 3
            out[d : d + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """Magic-dispatch decode: PNG or BMP -> (w, h, channels, pixels)."""
    if data[:8] == PNG_SIG:
        return png_decode(data)
    if data[:2] == BMP_SIG:
        return bmp_decode(data)
    raise NotImplementedError(f"no codec for magic {data[:4].hex()}")
