"""Pure-stdlib WAV/PCM codec (mono 16-bit) — retires the AUDIO half of the
media-decode stub (VERDICT r7 item 5; PNG retired the image half in r6/r7).

WAV is the one mainstream audio container fully decodable with nothing but
``struct``: a RIFF envelope (``RIFF`` ‖ u32 size ‖ ``WAVE``) holding
length-prefixed chunks, of which PCM audio needs exactly two — ``fmt ``
(format code, channels, sample rate, bits/sample) and ``data`` (raw
little-endian sample frames). This module implements BOTH directions:

* :func:`encode_wav` — a spec-conformant writer (canonical 44-byte header;
  verifiable with any external WAV reader), mono 16-bit signed PCM.
* :func:`decode_wav` — a strict reader: validates the RIFF/WAVE magic,
  walks chunks by their declared lengths (tolerating unknown chunks, as
  real readers must — e.g. ``LIST``/``INFO``), requires a PCM mono 16-bit
  ``fmt `` before ``data``, and raises ``ValueError`` on any corruption
  (bad magic, truncated chunk, non-PCM format, odd data length, missing
  chunks) — never a struct.error and never a silent wrong answer.

Scope: mono (1-channel) 16-bit PCM only — the shape the multimodal
operators plant. Stereo/float/compressed inputs fail loudly rather than
decoding wrong. The reference connector never interprets bytes (its
contract ends at the stream: ``CephRgwInputStream.java:103-120``); this
codec is engine-side value-add for the multimodal-column family
(SURVEY.md §2B north-star rows), used by
``operators/multimodal.py::mm_wav_decode`` under ``mapInPandas``.
"""

from __future__ import annotations

import struct

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"

_PCM_FORMAT = 1  # WAVE_FORMAT_PCM
_CHANNELS = 1
_BITS = 16


def encode_wav(
    sample_rate: int, samples: list[int], channels: int = 1
) -> bytes:
    """Encode signed 16-bit PCM ``samples`` at ``sample_rate`` Hz as a
    canonical RIFF/WAVE file (44-byte header ‖ little-endian frames).
    ``channels`` > 1 (round 10): ``samples`` are channel-INTERLEAVED
    (frame = one sample per channel, the RIFF layout) and must divide
    evenly into frames."""
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    if channels < 1 or channels > 16:
        raise ValueError(f"bad channel count {channels}")
    if len(samples) % channels:
        raise ValueError(
            f"{len(samples)} samples do not divide into {channels}-channel frames"
        )
    if not all(-32768 <= s <= 32767 for s in samples):
        raise ValueError("sample out of s16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * _BITS // 8
    fmt = struct.pack(
        "<HHIIHH",
        _PCM_FORMAT,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        _BITS,
    )
    body = (
        WAVE_MAGIC
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Strict decode of a MONO 16-bit PCM RIFF/WAVE file (the original
    contract — multi-channel input refuses loudly; use
    :func:`decode_wav_any` to accept it).

    Returns ``(sample_rate, samples)`` with ``samples`` signed ints.
    Raises ``ValueError`` on bad magic, truncated chunks, non-PCM /
    non-mono / non-16-bit formats, odd data payloads, or a ``data``
    chunk appearing before ``fmt `` (readers need the format first).
    """
    rate, channels, samples = decode_wav_any(data)
    if channels != 1:
        raise ValueError(
            f"unsupported WAV: channels={channels} (strict mono reader; "
            "decode_wav_any handles multi-channel)"
        )
    return rate, samples


def decode_wav_any(data: bytes) -> tuple[int, int, list[int]]:
    """Strict decode of a 16-bit PCM RIFF/WAVE file, any channel count
    (round 10).

    Returns ``(sample_rate, channels, samples)`` — ``samples`` are
    channel-interleaved signed ints, whole frames only (a data chunk
    not divisible into frames refuses). Raises ``ValueError`` on bad
    magic, truncated chunks, non-PCM / non-16-bit formats, odd data
    payloads, or a ``data`` chunk appearing before ``fmt ``. Unknown
    chunks (LIST, INFO, cue, …) are skipped by declared length,
    honoring RIFF's word-alignment padding byte.
    """
    if data[:4] != RIFF_MAGIC:
        raise ValueError("not a WAV: bad RIFF magic")
    if len(data) < 12:
        raise ValueError("truncated RIFF header")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload (declared size exceeds data)")
    if data[8:12] != WAVE_MAGIC:
        raise ValueError("not a WAV: bad WAVE magic")
    pos = 12
    end = 8 + riff_len
    sample_rate = None
    channels = None
    pcm = None
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated chunk header")
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        # bound the body by the declared RIFF envelope end, not len(data):
        # a chunk overrunning the envelope into trailing bytes must fail
        # loudly, never decode silently (review r8)
        if pos + 8 + length > end:
            raise ValueError(f"truncated {tag!r} chunk body (overruns RIFF envelope)")
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"fmt chunk must be >=16 bytes, got {length}")
            audio_fmt, nch, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != _PCM_FORMAT or bits != _BITS or not 1 <= nch <= 16:
                raise ValueError(
                    f"unsupported WAV: format={audio_fmt} channels={nch} bits={bits}"
                )
            if rate <= 0:
                raise ValueError(f"bad sample rate {rate}")
            sample_rate = rate
            channels = nch
        elif tag == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            if length % 2:
                raise ValueError(f"odd data chunk length {length} for 16-bit PCM")
            pcm = body
        # unknown chunks: skip by declared length (+ RIFF pad byte)
        pos += 8 + length + (length & 1)
    if sample_rate is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    if len(pcm) % (2 * channels):
        raise ValueError(
            f"data chunk of {len(pcm)} bytes is not whole "
            f"{channels}-channel 16-bit frames"
        )
    return sample_rate, channels, list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
