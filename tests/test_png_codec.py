"""Unit tests for the pure-stdlib PNG codec (functions/png_codec.py) —
the real-decode path behind `_decode_media("image/png", ...)` and the
`mm_png_decode` declared query (VERDICT r6 item 1)."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_fs_ceph_spark.functions.png_codec import (
    PNG_MAGIC,
    decode_png,
    decode_png_any,
    encode_png,
    encode_png_rgb,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=48),
    h=st.integers(min_value=1, max_value=48),
    data=st.data(),
)
def test_roundtrip_lossless(w, h, data):
    """encode→decode is the identity for any grayscale image — and because
    the encoder cycles filter types per scanline, any h >= 5 image
    exercises all five PNG filters."""
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    assert decode_png(encode_png(w, h, pixels)) == (w, h, pixels)


def test_output_is_spec_conformant_png():
    """Structural check against the PNG spec: magic, IHDR geometry/flags,
    chunk CRCs, and an IDAT that zlib alone can inflate to
    (width+1)*height filtered bytes."""
    w, h = 11, 7
    pixels = bytes((3 * i + 1) % 256 for i in range(w * h))
    data = encode_png(w, h, pixels)
    assert data[:8] == PNG_MAGIC
    # IHDR is the first chunk
    (ln,) = struct.unpack(">I", data[8:12])
    assert data[12:16] == b"IHDR" and ln == 13
    width, height, depth, ctype, comp, filt, inter = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    assert (width, height, depth, ctype, comp, filt, inter) == (w, h, 8, 0, 0, 0, 0)
    (crc,) = struct.unpack(">I", data[29:33])
    assert crc == (zlib.crc32(b"IHDR" + data[16:29]) & 0xFFFFFFFF)
    # walk to IDAT, inflate, check filtered length
    pos, idat = 8, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    assert len(zlib.decompress(idat)) == (w + 1) * h
    # filter bytes cycle 0..4 per scanline by construction
    raw = zlib.decompress(idat)
    assert [raw[y * (w + 1)] for y in range(h)] == [y % 5 for y in range(h)]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "bad magic"),
        (lambda b: b[:20] + bytes([b[20] ^ 0xFF]) + b[21:], "CRC mismatch"),
        (lambda b: b[: len(b) // 2], r"(truncated|missing IEND)"),
    ],
)
def test_corruption_fails_loudly(mutate, msg):
    data = encode_png(9, 6, bytes(range(54)))
    with pytest.raises(ValueError, match=msg):
        decode_png(mutate(data))


def test_unsupported_color_type_rejected():
    """The STRICT grayscale reader must refuse a truecolor PNG, never
    mis-decode it (round 10: truecolor is a supported format now —
    decode_png_any handles it — so the refusal comes from the strict
    wrapper, and a grayscale-sized body relabeled RGB fails geometry
    inside the general decoder). Palette (type 3) stays unsupported in
    both readers."""
    rgb = encode_png_rgb(4, 4, bytes(48))
    with pytest.raises(ValueError, match="strict grayscale reader"):
        decode_png(rgb)
    # relabeling a grayscale body as RGB is a geometry lie, not a decode
    data = bytearray(encode_png(4, 4, bytes(16)))
    ihdr = bytearray(data[16:29])
    ihdr[9] = 2  # color type 2 = truecolor
    data[16:29] = ihdr
    data[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="filtered bytes"):
        decode_png(bytes(data))
    # palette PNGs refuse loudly in the general reader too
    data = bytearray(encode_png(4, 4, bytes(16)))
    ihdr = bytearray(data[16:29])
    ihdr[9] = 3  # color type 3 = palette
    data[16:29] = ihdr
    data[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png_any(bytes(data))


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    data=st.data(),
)
def test_rgb_roundtrip_lossless(w, h, data):
    """encode_png_rgb→decode_png_any is the identity for any truecolor
    image; h ≥ 5 exercises all five bpp=3 un-filter paths (the left
    neighbor sits 3 bytes back — arithmetic grayscale never runs)."""
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    assert decode_png_any(encode_png_rgb(w, h, pixels)) == (w, h, 2, pixels)


@settings(max_examples=60, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=10**6),
    val=st.integers(min_value=0, max_value=255),
    trunc=st.booleans(),
)
def test_rgb_fuzz_mutation_never_escapes_valueerror(pos, val, trunc):
    """Corruption-contract parity for the truecolor path: any single-byte
    mutation or truncation of an RGB PNG either decodes (mutation missed
    a checked region — impossible here: every byte is magic, CRC-covered
    chunk, or counted) or raises ValueError — never zlib.error,
    struct.error, or IndexError."""
    blob = bytearray(encode_png_rgb(7, 6, bytes((i * 11) % 256 for i in range(126))))
    if trunc:
        blob = blob[: pos % len(blob)]
    else:
        i = pos % len(blob)
        if blob[i] == val:
            val = (val + 1) % 256
        blob[i] = val
    try:
        decode_png_any(bytes(blob))
    except ValueError:
        pass


def test_bad_encode_inputs():
    with pytest.raises(ValueError):
        encode_png(0, 4, b"")
    with pytest.raises(ValueError):
        encode_png(3, 3, b"12345678")  # 8 != 9 pixels


def _rechunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_crafted_inputs_raise_valueerror_only():
    """ADVICE r7: decode_png documents 'ValueError on any corruption' but
    leaked struct.error / zlib.error on crafted input. Every path below
    must raise ValueError specifically — never another exception type."""
    from hadoop_fs_ceph_spark.functions.png_codec import PNG_MAGIC

    good = encode_png(6, 4, bytes(24))

    # 1. chunk whose 4-byte CRC field is cut off (previously struct.error)
    (ln,) = struct.unpack(">I", good[8:12])
    cut_crc = good[: 8 + 8 + ln + 2]  # magic + IHDR header+body + 2 CRC bytes
    with pytest.raises(ValueError, match="truncated"):
        decode_png(cut_crc)

    # 2. IHDR body whose length != 13 but CRC is valid (previously struct.error)
    bad_ihdr = PNG_MAGIC + _rechunk(b"IHDR", b"\x00" * 9) + good[8 + 12 + ln :]
    with pytest.raises(ValueError, match="IHDR body must be 13"):
        decode_png(bad_ihdr)

    # 3. CRC-valid IDAT whose payload is not deflate (previously zlib.error)
    ihdr_chunk = good[8 : 8 + 12 + ln]
    junk = PNG_MAGIC + ihdr_chunk + _rechunk(b"IDAT", b"not deflate") + _rechunk(b"IEND", b"")
    with pytest.raises(ValueError, match="corrupt IDAT deflate"):
        decode_png(junk)


def test_idat_bomb_inflation_is_bounded():
    """A CRC-valid IDAT that inflates far beyond stride*height must be
    rejected after at most stride*height+1 decompressed bytes — the
    decoder must never allocate what the bomb claims (ADVICE r7)."""
    from hadoop_fs_ceph_spark.functions.png_codec import PNG_MAGIC

    good = encode_png(6, 4, bytes(24))
    (ln,) = struct.unpack(">I", good[8:12])
    ihdr_chunk = good[8 : 8 + 12 + ln]
    # 64 MiB of zeros compresses to ~64 KiB; geometry says 28 bytes
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)
    data = PNG_MAGIC + ihdr_chunk + _rechunk(b"IDAT", bomb) + _rechunk(b"IEND", b"")
    import tracemalloc

    tracemalloc.start()
    with pytest.raises(ValueError, match="filtered bytes"):
        decode_png(data)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # peak stays near the compressed input (~64 KiB), nowhere near 64 MiB
    assert peak < 8 * 1024 * 1024, f"decode allocated {peak} bytes on a bomb"


def test_truncated_adler_trailer_rejected():
    """Review r8: a deflate stream whose final adler32 trailer is cut off
    can still yield exactly stride*height bytes — the decoder must check
    d.eof (trailer reached AND checksum verified), never accept it."""
    good = encode_png(6, 4, bytes(range(24)))
    (ln,) = struct.unpack(">I", good[8:12])
    ihdr_chunk = good[8 : 8 + 12 + ln]
    # rebuild IDAT without its last 4 bytes (the adler32), with a valid CRC
    pos = 8 + 12 + ln
    (idat_len,) = struct.unpack(">I", good[pos : pos + 4])
    idat_body = good[pos + 8 : pos + 8 + idat_len]
    cut = idat_body[:-4]
    data = (
        good[:8]
        + ihdr_chunk
        + _rechunk(b"IDAT", cut)
        + _rechunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="(truncated|adler32|filtered bytes)"):
        decode_png(data)
