"""GIF codec (functions/gif_codec.py): encode→decode losslessness through
a REAL variable-width LZW bitstream (including table overflow + CLEAR
resets and the KwKwK case), interlace de-weaving proven by construction,
and strict ValueError on every corruption class — the same bar the
PNG/WAV/AVI/MP4 codecs pinned, now extended to a COMPRESSED (losslessly
coded) format."""

import pytest

from hadoop_fs_ceph_spark.functions.gif_codec import (
    _interlace_order,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _pixels(w, h, seed=7):
    return bytes((seed * 37 + (k // w) * 11 + (k % w) * 5) % 256 for k in range(w * h))


@pytest.mark.parametrize(
    "w,h",
    [(1, 1), (7, 3), (13, 9), (16, 16), (255, 7), (64, 64)],
)
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_lossless(w, h, interlace):
    px = _pixels(w, h)
    m = decode_gif(encode_gif(w, h, px, interlace=interlace))
    assert (m["width"], m["height"], m["interlaced"]) == (w, h, interlace)
    assert m["pixels"] == px


def test_lzw_hard_cases_roundtrip():
    """The LZW shapes that break naive implementations: a constant run
    (KwKwK chains), a two-symbol alternation (rapid table growth), and
    enough high-entropy data to overflow the 4096-entry table repeatedly
    (CLEAR reset + width re-narrowing)."""
    import random

    rnd = random.Random(7)
    cases = [
        bytes([5]) * 10_000,
        bytes([1, 2] * 8_000),
        bytes(rnd.randrange(256) for _ in range(60_000)),
        bytes(rnd.randrange(3) for _ in range(30_000)),
    ]
    for c in cases:
        assert lzw_decode(lzw_encode(c, 8), 8, len(c)) == c
    small = bytes(rnd.randrange(4) for _ in range(5_000))
    assert lzw_decode(lzw_encode(small, 2), 2, len(small)) == small


def test_compression_is_real():
    """A structured image must come out SMALLER than raw — if the LZW
    stage were store-only (clear-code spam), this would fail; GIF's value
    at 100 TB is that payload bytes shrink before the shuffle."""
    w, h = 250, 240
    px = bytes((x // 16 + y // 16) % 4 * 60 for y in range(h) for x in range(w))
    assert len(encode_gif(w, h, px)) < w * h // 4


def test_interlace_order_is_the_spec_four_pass():
    """Rows 0,8,16.. then 4,12.. then 2,6,10.. then odd — GIF89a §20."""
    assert _interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    # a permutation of all rows at any height
    for hgt in (1, 2, 3, 7, 8, 9, 17):
        assert sorted(_interlace_order(hgt)) == list(range(hgt))


def test_interlace_deweave_is_load_bearing():
    """Decode the interlaced bytes AS IF non-interlaced (clear the flag)
    → the pixels come back PERMUTED, not equal — proving the encoder
    really wove the rows and the decoder's de-weave really restores
    them (not a no-op pair)."""
    w, h = 9, 10
    px = _pixels(w, h)
    blob = bytearray(encode_gif(w, h, px, interlace=True))
    desc_at = 6 + 7 + 768  # header + LSD + GCT → image descriptor
    assert blob[desc_at] == 0x2C
    assert blob[desc_at + 9] & 0x40  # interlace flag set
    blob[desc_at + 9] &= ~0x40  # lie: claim non-interlaced
    woven = decode_gif(bytes(blob))
    assert woven["pixels"] != px
    rows = [woven["pixels"][y * w : (y + 1) * w] for y in range(h)]
    restored = [b""] * h
    for src, dst in enumerate(_interlace_order(h)):
        restored[dst] = rows[src]
    assert b"".join(restored) == px


def test_local_color_table_overrides_global():
    """An image-level palette must win over the screen-level one."""
    px = _pixels(5, 4)
    blob = bytearray(encode_gif(5, 4, px))
    desc_at = 6 + 7 + 768
    blob[desc_at + 9] |= 0x87  # LCT present, 256 entries
    lct = bytes(v for g in range(256) for v in (g, 255 - g, 0))
    patched = bytes(blob[: desc_at + 10]) + lct + bytes(blob[desc_at + 10 :])
    m = decode_gif(patched)
    assert m["pixels"] == px
    assert m["palette"] == lct


def test_extensions_skipped():
    """89a extension blocks (GCE, comments, app extensions) must be
    skipped by sub-block lengths — they are ubiquitous in real files."""
    px = _pixels(7, 5)
    blob = encode_gif(7, 5, px)
    desc_at = 6 + 7 + 768
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    patched = blob[:desc_at] + gce + comment + blob[desc_at:]
    assert decode_gif(patched)["pixels"] == px


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"NOPE" + b[4:], "bad magic"),
        (lambda b: b[:10], "truncated GIF header"),
        (lambda b: b[:20], "truncated global color table"),
        (lambda b: b[: 6 + 7 + 768], "no image"),
        (lambda b: b[:-1], "missing GIF trailer"),
        (lambda b: b[: 6 + 7 + 768 + 5], "truncated image descriptor"),
    ],
)
def test_envelope_corruption_raises(mutate, msg):
    blob = encode_gif(13, 9, _pixels(13, 9))
    with pytest.raises(ValueError, match=msg):
        decode_gif(mutate(blob))


def test_multi_image_refused():
    """Animation is out of scope — a second image descriptor before the
    trailer must refuse loudly, never return frame 1 as 'the' image."""
    blob = encode_gif(13, 9, _pixels(13, 9))
    img = blob[6 + 7 + 768 : -1]
    with pytest.raises(ValueError, match="multi-image"):
        decode_gif(blob[:-1] + img + b"\x3b")


def test_image_exceeding_screen_refused():
    blob = bytearray(encode_gif(13, 9, _pixels(13, 9)))
    desc_at = 6 + 7 + 768
    import struct

    struct.pack_into("<H", blob, desc_at + 5, 99)  # image width 99 > screen 13
    with pytest.raises(ValueError, match="exceeds screen"):
        decode_gif(bytes(blob))


def test_pixel_count_mismatch_raises():
    """Declare a taller image than the LZW stream holds → the decoder
    must refuse at the exact-count check, not zero-fill."""
    import struct

    blob = bytearray(encode_gif(13, 9, _pixels(13, 9)))
    struct.pack_into("<H", blob, 6 + 2, 20)  # screen height
    desc_at = 6 + 7 + 768
    struct.pack_into("<H", blob, desc_at + 7, 20)  # image height 20, data has 9
    with pytest.raises(ValueError, match="of 260 declared pixels"):
        decode_gif(bytes(blob))


def test_invalid_lzw_code_raises():
    with pytest.raises(ValueError, match="invalid LZW code|not a literal"):
        # width 9 stream: clear(256) then code 400 (beyond fresh table)
        from hadoop_fs_ceph_spark.functions.gif_codec import _BitWriter

        bw = _BitWriter()
        bw.write(256, 9)
        bw.write(400, 9)
        lzw_decode(bw.flush(), 8, 10)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="bad dimensions"):
        encode_gif(0, 5, b"")
    with pytest.raises(ValueError, match="pixels for"):
        encode_gif(4, 4, b"\x00" * 15)
    with pytest.raises(ValueError, match="palette must be 768"):
        encode_gif(2, 2, b"\x00" * 4, palette=b"\x00" * 10)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=24),
    interlace=st.booleans(),
    data=st.data(),
)
def test_roundtrip_property(w, h, interlace, data):
    """Property: ANY pixel content at ANY dimensions round-trips
    bit-exactly through the LZW bitstream, interlaced or not."""
    px = bytes(data.draw(st.binary(min_size=w * h, max_size=w * h)))
    m = decode_gif(encode_gif(w, h, px, interlace=interlace))
    assert (m["width"], m["height"], m["interlaced"]) == (w, h, interlace)
    assert m["pixels"] == px


@settings(max_examples=200, deadline=None)
@given(
    pos=st.integers(min_value=0),
    val=st.integers(min_value=0, max_value=255),
    trunc=st.integers(min_value=0, max_value=60),
)
def test_fuzz_mutation_never_escapes_valueerror(pos, val, trunc):
    """Property: a single byte flip + tail truncation anywhere in a valid
    GIF either still decodes to a shape-consistent image (the byte was
    palette/pixel content) or raises ValueError — NEVER IndexError/
    struct.error/KeyError. The executor-crash contract: corrupt objects
    in a 100 TB scan must fail as quarantineable data errors, not worker
    crashes."""
    base = bytearray(encode_gif(13, 9, _pixels(13, 9), interlace=True))
    base[pos % len(base)] ^= val or 0xFF
    blob = bytes(base[: len(base) - trunc])
    try:
        m = decode_gif(blob)
    except ValueError:
        return
    assert m["width"] >= 1 and m["height"] >= 1
    assert len(m["pixels"]) == m["width"] * m["height"]


# ---------------------------------------------------------------- animation
from hadoop_fs_ceph_spark.functions.gif_codec import (  # noqa: E402
    decode_gif_animation,
    encode_gif_animation,
)


def _anim_frames(w, h, n, seed=9):
    return [
        bytes((seed * 41 + fr * 13 + k * 3) % 256 for k in range(w * h))
        for fr in range(n)
    ]


@pytest.mark.parametrize("interlace", [False, True])
def test_animation_roundtrip_lossless(interlace):
    w, h, n = 11, 7, 4
    frames = _anim_frames(w, h, n)
    delays = [0, 5, 10, 65535]
    m = decode_gif_animation(
        encode_gif_animation(w, h, frames, delays, interlace=interlace)
    )
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, n)
    assert m["frames"] == frames
    assert m["delays_cs"] == delays


def test_animation_reader_accepts_stills_and_still_reader_refuses_animations():
    """The two readers form a strict hierarchy: decode_gif_animation
    decodes a single-image GIF as a 1-frame, delay-0 animation, while
    decode_gif refuses multi-image input pointing at the animation
    API — no silent first-frame-only answers."""
    px = _pixels(9, 5)
    m = decode_gif_animation(encode_gif(9, 5, px))
    assert m["n_frames"] == 1 and m["delays_cs"] == [0] and m["frames"] == [px]
    anim = encode_gif_animation(9, 5, _anim_frames(9, 5, 2), [1, 2])
    with pytest.raises(ValueError, match="decode_gif_animation"):
        decode_gif(anim)


def test_animation_partial_frame_refused():
    import struct

    blob = bytearray(encode_gif_animation(11, 7, _anim_frames(11, 7, 2), [1, 2]))
    desc_at = 13 + 768 + 8  # header + GCT + first GCE
    assert blob[desc_at] == 0x2C
    struct.pack_into("<H", blob, desc_at + 1, 1)  # left = 1
    with pytest.raises(ValueError, match="partial frame"):
        decode_gif_animation(bytes(blob))


def test_animation_transparency_and_disposal_refused():
    blob = bytearray(encode_gif_animation(9, 5, _anim_frames(9, 5, 2), [1, 2]))
    gce_flags_at = 13 + 768 + 3  # 0x21 0xF9 0x04 <flags>
    t = bytearray(blob)
    t[gce_flags_at] |= 0x01  # transparency flag
    with pytest.raises(ValueError, match="transparency"):
        decode_gif_animation(bytes(t))
    d = bytearray(blob)
    d[gce_flags_at] |= 0x02 << 2  # disposal = restore-to-background
    with pytest.raises(ValueError, match="disposal method"):
        decode_gif_animation(bytes(d))


def test_animation_encoder_input_validation():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_gif_animation(4, 4, [], [])
    with pytest.raises(ValueError, match="delays for"):
        encode_gif_animation(4, 4, [b"\x00" * 16], [1, 2])
    with pytest.raises(ValueError, match="outside u16"):
        encode_gif_animation(4, 4, [b"\x00" * 16], [70000])
    with pytest.raises(ValueError, match="bytes for"):
        encode_gif_animation(4, 4, [b"\x00" * 15], [1])


@settings(max_examples=150, deadline=None)
@given(
    pos=st.integers(min_value=0),
    val=st.integers(min_value=0, max_value=255),
    trunc=st.integers(min_value=0, max_value=60),
)
def test_animation_fuzz_mutation_never_escapes_valueerror(pos, val, trunc):
    base = bytearray(
        encode_gif_animation(9, 6, _anim_frames(9, 6, 3), [2, 4, 6], interlace=True)
    )
    base[pos % len(base)] ^= val or 0xFF
    blob = bytes(base[: len(base) - trunc])
    try:
        m = decode_gif_animation(blob)
    except ValueError:
        return
    assert m["n_frames"] == len(m["frames"]) == len(m["delays_cs"])
    for f in m["frames"]:
        assert len(f) == m["width"] * m["height"]
