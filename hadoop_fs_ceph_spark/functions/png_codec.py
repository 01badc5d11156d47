"""Pure-stdlib PNG codec (grayscale 8-bit) — retires the media-decode stub
for one real modality (VERDICT r6 item 1).

PNG is the one mainstream image format fully decodable with nothing but
``zlib`` + ``struct`` (both stdlib): a fixed 8-byte magic, length-prefixed
CRC-checked chunks, and IDAT payloads that are zlib-deflated scanlines, each
prefixed by one filter byte (types 0-4: None/Sub/Up/Average/Paeth, PNG spec
§9 "Filtering"). This module implements BOTH directions:

* :func:`encode_png` — a real, spec-conformant writer (verifiable with any
  external PNG reader). It deliberately cycles the filter type per scanline
  (``y % 5``) so every decode exercises all five un-filter paths, not just
  the trivial filter-0 case.
* :func:`decode_png` — a strict reader: validates the magic, every chunk
  CRC, the IHDR geometry, inflates the concatenated IDAT stream and
  reverses the per-scanline filters. Raises ``ValueError`` on any
  corruption (bad magic, bad CRC, bad filter byte, short pixel data).

Scope: 8-bit non-interlaced, grayscale (color type 0) AND truecolor RGB
(color type 2, round 10) — the shapes the multimodal operators plant; the
filters are bytewise with a bpp-byte left neighbor, so one implementation
serves both. Palette/alpha/16-bit/interlace inputs fail loudly rather than
decoding wrong. The reference connector never interprets bytes (its contract ends at
the stream: ``CephRgwInputStream.java:103-120``); this codec is engine-side
value-add for the multimodal-column family (SURVEY.md §2B north-star rows),
used by ``operators/multimodal.py::mm_png_decode`` under ``mapInPandas``.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\x0a"

# PNG color type 0 = grayscale (1 byte/pixel); 2 = truecolor RGB
# (3 bytes/pixel). Bit depth 8 throughout.
_COLOR_GRAY = 0
_COLOR_RGB = 2
_BIT_DEPTH = 8


def _chunk(tag: bytes, body: bytes) -> bytes:
    """One PNG chunk: u32 length ‖ tag ‖ body ‖ CRC32(tag ‖ body)."""
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to a+b-c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(ftype: int, cur: bytes, prev: bytes, bpp: int = 1) -> bytes:
    """Apply filter ``ftype`` to raw scanline ``cur``. PNG filters are
    BYTEWISE with the left neighbor ``bpp`` bytes back (spec §9.2) — the
    same code serves grayscale (bpp=1) and truecolor (bpp=3)."""
    n = len(cur)
    if ftype == 0:  # None
        return bytes(cur)
    if ftype == 1:  # Sub
        return bytes(
            (cur[i] - (cur[i - bpp] if i >= bpp else 0)) & 0xFF for i in range(n)
        )
    if ftype == 2:  # Up
        return bytes((cur[i] - prev[i]) & 0xFF for i in range(n))
    if ftype == 3:  # Average
        return bytes(
            (cur[i] - (((cur[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
            for i in range(n)
        )
    if ftype == 4:  # Paeth
        return bytes(
            (
                cur[i]
                - _paeth(
                    cur[i - bpp] if i >= bpp else 0,
                    prev[i],
                    prev[i - bpp] if i >= bpp else 0,
                )
            )
            & 0xFF
            for i in range(n)
        )
    raise ValueError(f"invalid PNG filter type {ftype}")


def _unfilter_scanline(ftype: int, filt: bytearray, prev: bytes, bpp: int = 1) -> bytes:
    """Reverse filter ``ftype`` in place; returns the raw scanline."""
    n = len(filt)
    if ftype == 0:
        return bytes(filt)
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            filt[i] = (filt[i] + filt[i - bpp]) & 0xFF
        return bytes(filt)
    if ftype == 2:  # Up
        for i in range(n):
            filt[i] = (filt[i] + prev[i]) & 0xFF
        return bytes(filt)
    if ftype == 3:  # Average
        for i in range(n):
            left = filt[i - bpp] if i >= bpp else 0
            filt[i] = (filt[i] + ((left + prev[i]) >> 1)) & 0xFF
        return bytes(filt)
    if ftype == 4:  # Paeth
        for i in range(n):
            left = filt[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            filt[i] = (filt[i] + _paeth(left, prev[i], ul)) & 0xFF
        return bytes(filt)
    raise ValueError(f"invalid PNG filter type {ftype} in scanline")


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit grayscale ``pixels`` (row-major, len == width*height)
    as a spec-conformant PNG. Filter type cycles ``y % 5`` so round-trip
    tests cover every un-filter path."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, _BIT_DEPTH, _COLOR_GRAY, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        cur = pixels[y * width : (y + 1) * width]
        ftype = y % 5
        raw.append(ftype)
        raw += _filter_scanline(ftype, cur, prev)
        prev = cur
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_rgb(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit TRUECOLOR ``pixels`` (row-major interleaved RGB,
    len == width*height*3) as a spec-conformant PNG (color type 2).
    Filter type cycles ``y % 5`` like the grayscale writer, so the
    bpp=3 variant of every un-filter path is exercised by round-trips."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"expected {width * height * 3} RGB bytes, got {len(pixels)}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, _BIT_DEPTH, _COLOR_RGB, 0, 0, 0)
    stride = width * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        cur = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        raw += _filter_scanline(ftype, cur, prev, bpp=3)
        prev = cur
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_any(data: bytes) -> tuple[int, int, int, bytes]:
    """Strict decode of an 8-bit non-interlaced PNG, grayscale (color
    type 0) or truecolor RGB (color type 2).

    Returns ``(width, height, color_type, pixels)`` — ``pixels`` are
    row-major raw bytes (interleaved RGB for type 2). Raises
    ``ValueError`` on bad magic, bad chunk CRC, unsupported color type /
    bit depth / interlace, bad filter bytes, or truncated data.
    """
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad magic")
    pos = 8
    width = height = -1
    idat = bytearray()
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated {tag!r} chunk (body or CRC field cut off)")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"IHDR body must be 13 bytes, got {len(body)}")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (
                depth != _BIT_DEPTH
                or ctype not in (_COLOR_GRAY, _COLOR_RGB)
                or (comp, filt, interlace) != (0, 0, 0)
            ):
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={ctype} interlace={interlace}"
                )
            color_type = ctype
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    bpp = 3 if color_type == _COLOR_RGB else 1
    stride = width * bpp + 1  # filter byte + bpp bytes per pixel
    # Bounded inflation: a CRC-valid IDAT bomb must never allocate beyond the
    # geometry IHDR declares (+1 byte to detect oversize), and a corrupt
    # deflate stream must surface as ValueError, not zlib.error.
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), stride * height + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT deflate stream: {e}") from None
    if len(raw) != stride * height or d.unconsumed_tail:
        raise ValueError(
            f"expected {stride * height} filtered bytes, got {len(raw)}"
            + (" (+oversize tail)" if d.unconsumed_tail else "")
        )
    # d.eof is the only signal that the zlib trailer was reached AND its
    # adler32 checksum verified — without it a truncated stream that
    # happens to yield the right byte count decodes silently (review r8)
    if not d.eof:
        raise ValueError("IDAT deflate stream truncated (adler32 trailer missing)")
    if d.unused_data:
        raise ValueError("trailing garbage after IDAT deflate stream")
    pixels = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        cur = _unfilter_scanline(line[0], bytearray(line[1:]), prev, bpp=bpp)
        pixels += cur
        prev = cur
    return width, height, color_type, bytes(pixels)


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Strict decode of an 8-bit GRAYSCALE non-interlaced PNG (the
    original contract — truecolor input refuses loudly; use
    :func:`decode_png_any` to accept both).

    Returns ``(width, height, pixels)`` with ``pixels`` row-major raw
    bytes. Raises ``ValueError`` on bad magic, bad chunk CRC,
    unsupported color type / bit depth / interlace, bad filter bytes,
    or truncated data."""
    width, height, ctype, pixels = decode_png_any(data)
    if ctype != _COLOR_GRAY:
        raise ValueError(
            f"unsupported PNG: color={ctype} (strict grayscale reader; "
            "decode_png_any handles truecolor)"
        )
    return width, height, pixels
