"""AVI codec (functions/avi_codec.py): encode→decode losslessness across
dimension/stride shapes, strict ValueError on every corruption class, and
the DIB quirks (bottom-up rows, 4-byte stride padding) proven by
construction — the same bar the PNG/WAV/MP4 codecs pinned (VERDICT r8
item 4: retire the video half of the media stub honestly)."""

import struct

import pytest

from hadoop_fs_ceph_spark.functions.avi_codec import (
    _row_stride,
    decode_avi,
    encode_avi,
)


def _frames(w, h, n, seed=7):
    return [
        bytes((seed * 31 + fr * 17 + (k // w) * 7 + (k % w) * 3) % 256 for k in range(w * h))
        for fr in range(n)
    ]


@pytest.mark.parametrize(
    "w,h,n",
    [
        (8, 4, 1),  # width multiple of 4: zero stride pad
        (9, 5, 3),  # pad 3
        (10, 6, 2),  # pad 2
        (11, 3, 4),  # pad 1
        (1, 1, 2),  # degenerate 1x1
        (13, 7, 5),
    ],
)
def test_roundtrip_lossless(w, h, n):
    frames = _frames(w, h, n)
    m = decode_avi(encode_avi(w, h, 33367, frames))
    assert (m["width"], m["height"], m["n_frames"], m["us_per_frame"]) == (
        w,
        h,
        n,
        33367,
    )
    assert m["frames"] == frames


def test_stride_and_row_order_are_load_bearing():
    """Flip ONE padding byte → decode unchanged (pad is dead space);
    flip one PIXEL byte → exactly that pixel changes, at the flipped
    (bottom-up) row mapped back to top-down — if either the stride or
    the row re-ordering were wrong, this mapping would break."""
    w, h = 9, 4  # stride 12, 3 pad bytes per row
    frames = _frames(w, h, 1)
    blob = bytearray(encode_avi(w, h, 40000, frames))
    movi = bytes(blob).index(b"movi")
    frame0 = movi + 4 + 8  # movi kind + '00db' header
    stride = _row_stride(w)

    pad_pos = frame0 + w  # first pad byte of the first (bottom) DIB row
    tampered = bytearray(blob)
    tampered[pad_pos] ^= 0xFF
    assert decode_avi(bytes(tampered))["frames"] == frames

    px_pos = frame0 + 2 * stride + 3  # DIB row 2 = top-down row h-1-2
    tampered = bytearray(blob)
    tampered[px_pos] ^= 0xFF
    out = decode_avi(bytes(tampered))["frames"][0]
    diff = [i for i in range(w * h) if out[i] != frames[0][i]]
    assert diff == [(h - 1 - 2) * w + 3]


def test_unknown_chunks_skipped():
    """JUNK padding (ubiquitous in real AVIs) and idx1 indexes must be
    skipped by declared length, including the odd-length pad byte."""
    w, h, n = 9, 5, 2
    frames = _frames(w, h, n)
    blob = encode_avi(w, h, 50000, frames)
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # odd + pad
    idx1 = b"idx1" + struct.pack("<I", 16) + b"\x00" * 16
    body = blob[8:] + junk + idx1
    patched = b"RIFF" + struct.pack("<I", len(body)) + body
    m = decode_avi(patched)
    assert m["frames"] == frames


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"XIFF" + b[4:], "bad RIFF magic"),
        (lambda b: b[:8] + b"WAVE" + b[12:], "bad 'AVI ' magic"),
        (lambda b: b[:-8], "declared size exceeds data"),
        (lambda b: b[:20], "truncated"),
    ],
)
def test_envelope_corruption_raises(mutate, msg):
    blob = encode_avi(9, 5, 40000, _frames(9, 5, 2))
    with pytest.raises(ValueError, match=msg):
        decode_avi(mutate(blob))


def test_compressed_codec_refused():
    """An MJPG handler (or nonzero biCompression) must refuse with the
    codec named — compressed video is the permanent stated waiver, and
    it must never decode wrong silently."""
    blob = bytearray(encode_avi(9, 5, 40000, _frames(9, 5, 1)))
    h_at = bytes(blob).index(b"vids") + 4  # handler fourcc follows fccType
    blob[h_at : h_at + 4] = b"MJPG"
    with pytest.raises(ValueError, match="MJPG"):
        decode_avi(bytes(blob))

    blob2 = bytearray(encode_avi(9, 5, 40000, _frames(9, 5, 1)))
    strf_at = bytes(blob2).index(b"strf") + 8  # chunk body
    # biCompression is at offset 16 within BITMAPINFOHEADER
    struct.pack_into("<I", blob2, strf_at + 16, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="biCompression"):
        decode_avi(bytes(blob2))


def test_frame_size_mismatch_raises():
    """A frame chunk whose byte count disagrees with stride*height must
    fail loudly — a silent partial frame is a wrong answer."""
    w, h = 9, 5
    blob = bytearray(encode_avi(w, h, 40000, _frames(w, h, 1)))
    db_at = bytes(blob).index(b"00db")
    (flen,) = struct.unpack_from("<I", blob, db_at + 4)
    struct.pack_into("<I", blob, db_at + 4, flen - 4)  # lie about the size
    with pytest.raises(ValueError, match="bytes, expected"):
        decode_avi(bytes(blob))


def test_declared_frame_count_enforced():
    """avih's dwTotalFrames must agree with the movi frame count — a
    demuxer that silently returns fewer frames than declared hides
    truncation."""
    blob = bytearray(encode_avi(9, 5, 40000, _frames(9, 5, 3)))
    avih_at = bytes(blob).index(b"avih") + 8
    struct.pack_into("<I", blob, avih_at + 16, 7)  # dwTotalFrames=7, movi has 3
    with pytest.raises(ValueError, match="declares 7 frames"):
        decode_avi(bytes(blob))


def test_movi_before_headers_raises():
    """Frames arriving before hdrl/strf must refuse (no dimensions yet) —
    same ordering rule as WAV's data-before-fmt."""
    blob = encode_avi(9, 5, 40000, _frames(9, 5, 1))
    hdrl_at = blob.index(b"LIST", 12)
    (hdrl_len,) = struct.unpack("<I", blob[hdrl_at + 4 : hdrl_at + 8])
    hdrl = blob[hdrl_at : hdrl_at + 8 + hdrl_len]
    movi = blob[hdrl_at + 8 + hdrl_len :]
    body = b"AVI " + movi + hdrl  # movi first
    swapped = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="movi before"):
        decode_avi(swapped)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="bad dimensions"):
        encode_avi(0, 5, 40000, [])
    with pytest.raises(ValueError, match="bad frame period"):
        encode_avi(4, 4, 0, [b"\x00" * 16])
    with pytest.raises(ValueError, match="expected 16"):
        encode_avi(4, 4, 40000, [b"\x00" * 15])


def test_negative_biheight_topdown_honored():
    """Review r9: a negative strf biHeight marks the DIB rows TOP-DOWN
    (the spec's flag); flipping such a frame would be a silent wrong
    answer. Patching the encoded (bottom-up) file's biHeight to -h must
    yield exactly the row-reversed frames — proving the flag is read,
    not ignored."""
    w, h = 9, 4
    frames = _frames(w, h, 2)
    blob = bytearray(encode_avi(w, h, 40000, frames))
    strf_at = bytes(blob).index(b"strf") + 8
    struct.pack_into("<i", blob, strf_at + 8, -h)  # biHeight at offset 8
    out = decode_avi(bytes(blob))["frames"]
    flipped = [
        b"".join(f[y * w : (y + 1) * w] for y in reversed(range(h)))
        for f in frames
    ]
    assert out == flipped


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=24),
    n=st.integers(min_value=1, max_value=6),
    us=st.integers(min_value=1, max_value=10_000_000),
    data=st.data(),
)
def test_roundtrip_property(w, h, n, us, data):
    """Property: ANY frame content at ANY dimensions/rate round-trips
    bit-exactly — the stride/flip math has no special-cased shapes."""
    frames = [
        bytes(data.draw(st.binary(min_size=w * h, max_size=w * h)))
        for _ in range(n)
    ]
    m = decode_avi(encode_avi(w, h, us, frames))
    assert (m["width"], m["height"], m["n_frames"], m["us_per_frame"]) == (
        w, h, n, us,
    )
    assert m["frames"] == frames


@settings(max_examples=200, deadline=None)
@given(
    pos=st.integers(min_value=0),
    val=st.integers(min_value=0, max_value=255),
    trunc=st.integers(min_value=0, max_value=60),
)
def test_fuzz_mutation_never_escapes_valueerror(pos, val, trunc):
    """Property: a single byte flip + tail truncation anywhere in a valid
    AVI either still decodes (the byte was dead space / frame content) or
    raises ValueError — NEVER IndexError/struct.error/KeyError, and never
    a frame set of the wrong shape. This is the executor-crash contract:
    corrupt objects in a 100 TB scan must fail as data errors a pipeline
    can quarantine, not as worker crashes."""
    base = bytearray(encode_avi(9, 5, 40000, _frames(9, 5, 2)))
    base[pos % len(base)] ^= val or 0xFF
    blob = bytes(base[: len(base) - trunc])
    try:
        m = decode_avi(blob)
    except ValueError:
        return
    assert m["width"] >= 1 and m["height"] >= 1
    for f in m["frames"]:
        assert len(f) == m["width"] * m["height"]
