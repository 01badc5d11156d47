"""ISO BMFF (MP4) box-structure codec — pure stdlib ``struct``.

The metadata pass a multimodal pipeline runs over video payloads BEFORE
any expensive decode: ISO base-media files are a tree of length-prefixed
boxes (``[u32 size BE][4-char type][payload]``, ISO/IEC 14496-12), and the
facts a curation pipeline keeps per clip — brand, timescale, duration,
media-payload size — live in ``ftyp`` and ``moov/mvhd``, reachable with a
plain box walk and zero codec work. Frame DECODE still requires a real
demuxer (av/ffmpeg, absent here) and remains the documented
NotImplementedError stub in ``operators/multimodal.py::_decode_media``;
this module makes the container-structure layer real, the same way
png_codec/wav_codec made the image/audio layers real.

* :func:`build_minimal_mp4` — a structurally-valid writer: ``ftyp`` ‖
  optional ``free`` ‖ ``moov``(``mvhd`` v0) ‖ ``mdat``.
* :func:`parse_boxes` — a strict reader: walks top-level boxes by their
  declared sizes, recurses into ``moov``, validates ``mvhd`` version/size,
  and raises ``ValueError`` on any corruption (truncated box, size < 8,
  missing ftyp/moov/mvhd/mdat) — never a struct.error, never a silent
  wrong answer.
"""

from __future__ import annotations

import struct


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def build_minimal_mp4(
    major_brand: str,
    timescale: int,
    duration: int,
    mdat_payload: bytes,
    n_free: int = 0,
) -> bytes:
    """Structurally-valid minimal ISO BMFF file: ftyp ‖ n_free×free ‖
    moov(mvhd v0) ‖ mdat."""
    if len(major_brand) != 4:
        raise ValueError(f"brand must be 4 chars, got {major_brand!r}")
    if timescale <= 0 or duration < 0:
        raise ValueError(f"bad timescale/duration {timescale}/{duration}")
    ftyp = _box(b"ftyp", major_brand.encode() + struct.pack(">I", 0) + b"isom")
    # mvhd version 0: ver/flags u32, creation u32, modification u32,
    # timescale u32, duration u32, rate u32, volume u16, 10 reserved bytes,
    # 36-byte identity matrix, 24 predefined bytes, next_track_id u32
    mvhd = _box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    free = _box(b"free", b"\x00" * 12) * n_free
    return ftyp + free + _box(b"moov", mvhd) + _box(b"mdat", mdat_payload)


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if size < 8:
            raise ValueError(f"box {tag!r} declares size {size} < 8")
        if pos + size > end:
            raise ValueError(f"truncated {tag!r} box (size {size} overruns data)")
        yield tag, pos + 8, pos + size
        pos += size


def parse_boxes(data: bytes) -> dict:
    """Strict metadata extraction from a minimal ISO BMFF stream.

    Returns ``{major_brand, timescale, duration, mdat_bytes,
    n_top_boxes}``. Raises ``ValueError`` on truncation, undersized
    boxes, a non-v0 or short mvhd, or a missing ftyp/moov/mvhd/mdat.
    """
    out: dict = {"n_top_boxes": 0}
    for tag, b0, b1 in _walk(data, 0, len(data)):
        out["n_top_boxes"] += 1
        if tag == b"ftyp":
            if b1 - b0 < 8:
                raise ValueError("ftyp too short for brand + minor version")
            out["major_brand"] = data[b0 : b0 + 4].decode("ascii")
        elif tag == b"moov":
            for t2, c0, c1 in _walk(data, b0, b1):
                if t2 == b"mvhd":
                    if c1 - c0 < 20:
                        raise ValueError("mvhd too short")
                    ver_flags, _cre, _mod, ts, dur = struct.unpack(
                        ">IIIII", data[c0 : c0 + 20]
                    )
                    if ver_flags >> 24 != 0:
                        raise ValueError(
                            f"unsupported mvhd version {ver_flags >> 24}"
                        )
                    if ts <= 0:
                        raise ValueError(f"bad mvhd timescale {ts}")
                    out["timescale"] = ts
                    out["duration"] = dur
        elif tag == b"mdat":
            out["mdat_bytes"] = b1 - b0
    for req in ("major_brand", "timescale", "mdat_bytes"):
        if req not in out:
            raise ValueError(f"missing required box for {req}")
    return out
