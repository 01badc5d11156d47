"""ISO BMFF box codec (functions/mp4_boxes.py): structural conformance
of the writer, lossless metadata extraction, unknown-box tolerance, and
loud ValueError-only failure on every corruption path — same posture as
test_png_codec.py / test_wav_codec.py. The VIDEO decode stub is
untouched; this layer is the container walk only."""

import struct

import pytest

from hadoop_fs_ceph_spark.functions.mp4_boxes import build_minimal_mp4, parse_boxes


def test_roundtrip_metadata():
    data = build_minimal_mp4("mp42", 1200, 3600, b"\x01" * 77, n_free=1)
    m = parse_boxes(data)
    assert m == {
        "n_top_boxes": 4,  # ftyp, free, moov, mdat
        "major_brand": "mp42",
        "timescale": 1200,
        "duration": 3600,
        "mdat_bytes": 77,
    }


def test_writer_is_spec_shaped():
    """Box framing any external ISO BMFF reader expects: u32 BE size
    including the 8-byte header, then the 4-char type."""
    data = build_minimal_mp4("isom", 600, 0, b"")
    (size,) = struct.unpack(">I", data[:4])
    assert data[4:8] == b"ftyp"
    assert data[8:12] == b"isom"
    nxt = size
    (msize,) = struct.unpack(">I", data[nxt : nxt + 4])
    assert data[nxt + 4 : nxt + 8] == b"moov"
    # moov's first child is mvhd with version 0
    assert data[nxt + 12 : nxt + 16] == b"mvhd"
    assert data[nxt + 16] == 0  # version byte
    last = nxt + msize
    assert data[last + 4 : last + 8] == b"mdat"


def test_unknown_boxes_skipped_by_declared_size():
    base = build_minimal_mp4("avc1", 900, 450, b"xyz")
    junk = struct.pack(">I", 8 + 5) + b"skip" + b"abcde"
    # splice an unknown box between ftyp and moov
    (ftyp_size,) = struct.unpack(">I", base[:4])
    spliced = base[:ftyp_size] + junk + base[ftyp_size:]
    m = parse_boxes(spliced)
    assert m["major_brand"] == "avc1"
    assert m["mdat_bytes"] == 3
    assert m["n_top_boxes"] == 4


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[: len(b) - 2], "truncated"),
        (lambda b: struct.pack(">I", 3) + b[4:], "size 3 < 8"),
        (lambda b: b[:20], r"(truncated|missing required)"),
        # inflate the declared ftyp size beyond the data
        (lambda b: struct.pack(">I", len(b) + 64) + b[4:], "overruns"),
    ],
)
def test_corruption_fails_loudly(mutate, msg):
    data = build_minimal_mp4("isom", 600, 1200, b"\x00" * 16)
    with pytest.raises(ValueError, match=msg):
        parse_boxes(mutate(data))


def test_mvhd_version1_rejected():
    data = bytearray(build_minimal_mp4("isom", 600, 1200, b""))
    i = data.find(b"mvhd")
    data[i + 4] = 1  # version byte -> v1 (64-bit fields we don't parse)
    with pytest.raises(ValueError, match="unsupported mvhd version"):
        parse_boxes(bytes(data))


def test_bad_build_inputs():
    with pytest.raises(ValueError):
        build_minimal_mp4("toolong", 600, 1, b"")
    with pytest.raises(ValueError):
        build_minimal_mp4("isom", 0, 1, b"")


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=200, deadline=None)
@_given(
    pos=_st.integers(min_value=0),
    val=_st.integers(min_value=0, max_value=255),
    trunc=_st.integers(min_value=0, max_value=40),
)
def test_fuzz_mutation_never_escapes_valueerror(pos, val, trunc):
    """Property (parity with the AVI/GIF/WAV codecs): a single byte
    flip + tail truncation anywhere in a valid MP4 either still parses
    to a shape-consistent box index or raises ValueError — NEVER
    struct.error/IndexError/KeyError."""
    base = bytearray(build_minimal_mp4("mp42", 1200, 3600, b"\x01" * 77, n_free=1))
    base[pos % len(base)] ^= val or 0xFF
    blob = bytes(base[: len(base) - trunc])
    try:
        m = parse_boxes(blob)
    except ValueError:
        return
    assert m["n_top_boxes"] >= 1
    assert m["timescale"] > 0
