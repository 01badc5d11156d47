"""Pure-stdlib WAV/PCM codec (functions/wav_codec.py): lossless
round-trip under hypothesis, spec conformance of the emitted header, and
loud ValueError-only failure on every corruption path — the same test
posture as test_png_codec.py (the codec retires the AUDIO half of the
media-decode stub, VERDICT r7 item 5)."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_fs_ceph_spark.functions.wav_codec import decode_wav, encode_wav


@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=192_000),
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), max_size=400),
)
def test_roundtrip_lossless(rate, samples):
    assert decode_wav(encode_wav(rate, samples)) == (rate, samples)


def test_output_is_spec_conformant_wav():
    """Canonical 44-byte header layout any external reader expects."""
    samples = [0, 1, -1, 32767, -32768, 12345]
    data = encode_wav(44100, samples)
    assert data[:4] == b"RIFF"
    (riff_len,) = struct.unpack("<I", data[4:8])
    assert riff_len == len(data) - 8
    assert data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt "
    assert struct.unpack("<I", data[16:20]) == (16,)
    fmt, ch, rate, byte_rate, align, bits = struct.unpack("<HHIIHH", data[20:36])
    assert (fmt, ch, rate, byte_rate, align, bits) == (1, 1, 44100, 88200, 2, 16)
    assert data[36:40] == b"data"
    assert struct.unpack("<I", data[40:44]) == (2 * len(samples),)
    assert list(struct.unpack(f"<{len(samples)}h", data[44:])) == samples


def test_unknown_chunks_are_skipped():
    """Real WAVs carry LIST/INFO/cue chunks; a strict reader must skip
    them by declared length (including the RIFF odd-length pad byte)."""
    base = encode_wav(8000, [7, -7, 99])
    # splice an odd-length unknown chunk (needs a pad byte) between
    # fmt and data
    head, tail = base[:36], base[36:]
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # pad to even
    spliced = head + junk + tail
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (8000, [7, -7, 99])


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "bad RIFF magic"),
        (lambda b: b[:8] + b"EVAW" + b[12:], "bad WAVE magic"),
        (lambda b: b[: len(b) - 1], "truncated"),
        (
            # drop the fmt chunk (bytes 12..36) and re-stamp the RIFF size
            lambda b: b"RIFF"
            + struct.pack("<I", len(b) - 8 - 24)
            + b[8:12]
            + b[36:],
            "data chunk before fmt",
        ),
        (lambda b: b[:44], r"(truncated|missing data)"),
    ],
)
def test_corruption_fails_loudly(mutate, msg):
    data = encode_wav(22050, list(range(-50, 50)))
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(data))


def test_unsupported_formats_rejected():
    """Float / 8-bit fmt words must be refused, never mis-decoded as
    s16 (round 10: multi-channel is now a SUPPORTED format —
    decode_wav_any takes it, the strict mono reader refuses it, and a
    mono body relabeled stereo fails frame geometry)."""
    from hadoop_fs_ceph_spark.functions.wav_codec import decode_wav_any

    base = bytearray(encode_wav(8000, [1, 2, 3]))
    for off, val in ((20, 3), (34, 8)):  # format=IEEE float, 8-bit
        data = bytearray(base)
        data[off : off + 2] = struct.pack("<H", val)
        with pytest.raises(ValueError, match="unsupported WAV"):
            decode_wav(bytes(data))
    # a 3-sample mono body relabeled 2-channel is a frame-geometry lie
    data = bytearray(base)
    data[22:24] = struct.pack("<H", 2)
    with pytest.raises(ValueError, match="whole 2-channel"):
        decode_wav(bytes(data))
    # real stereo: general reader decodes, strict mono reader refuses
    stereo = encode_wav(8000, [1, -2, 3, -4], channels=2)
    assert decode_wav_any(stereo) == (8000, 2, [1, -2, 3, -4])
    with pytest.raises(ValueError, match="strict mono reader"):
        decode_wav(stereo)
    # 17 channels exceeds the documented bound
    data = bytearray(base)
    data[22:24] = struct.pack("<H", 17)
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(data))


def test_odd_data_length_rejected():
    base = encode_wav(8000, [5, 6])
    # shrink the data chunk's declared length to 3 (odd) and truncate
    data = base[:40] + struct.pack("<I", 3) + base[44:47]
    data = b"RIFF" + struct.pack("<I", len(data) - 8) + data[8:]
    with pytest.raises(ValueError, match="odd data chunk length"):
        decode_wav(data)


def test_declared_riff_size_beyond_data_rejected():
    base = bytearray(encode_wav(8000, [5]))
    base[4:8] = struct.pack("<I", 10_000)
    with pytest.raises(ValueError, match="declared size exceeds"):
        decode_wav(bytes(base))


def test_bad_encode_inputs():
    with pytest.raises(ValueError):
        encode_wav(0, [1])
    with pytest.raises(ValueError):
        encode_wav(8000, [40000])


def test_chunk_overrunning_riff_envelope_rejected():
    """Review r8: a chunk whose declared length overruns the RIFF
    envelope end (but stays within the raw byte string) must raise, not
    decode the trailing bytes silently."""
    base = encode_wav(8000, [1, 2, 3])
    # shrink the declared RIFF size by 2: the data chunk now extends past
    # the envelope into 'trailing' bytes
    (riff_len,) = struct.unpack("<I", base[4:8])
    data = b"RIFF" + struct.pack("<I", riff_len - 2) + base[8:]
    with pytest.raises(ValueError, match="overruns RIFF envelope"):
        decode_wav(data)


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=200, deadline=None)
@_given(
    pos=_st.integers(min_value=0),
    val=_st.integers(min_value=0, max_value=255),
    trunc=_st.integers(min_value=0, max_value=60),
)
def test_fuzz_mutation_never_escapes_valueerror(pos, val, trunc):
    """Property (parity with the AVI/GIF codecs): a single byte flip +
    tail truncation anywhere in a valid WAV either still decodes to a
    shape-consistent result or raises ValueError — NEVER struct.error/
    IndexError. The executor-crash contract: corrupt objects in a
    100 TB scan must fail as quarantineable data errors, not worker
    crashes."""
    from hadoop_fs_ceph_spark.functions.wav_codec import decode_wav, encode_wav

    base = bytearray(
        encode_wav(16000, [(313 * i) % 65536 - 32768 for i in range(120)])
    )
    base[pos % len(base)] ^= val or 0xFF
    blob = bytes(base[: len(base) - trunc])
    try:
        rate, samples = decode_wav(blob)
    except ValueError:
        return
    assert rate > 0
    assert all(-32768 <= s <= 32767 for s in samples)
