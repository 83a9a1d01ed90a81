"""IVF video container — the raw-bitstream wrapper libvpx ships
VP8/VP9/AV1 streams in (and the simplest real video container:
32-byte header + length-prefixed timestamped frames).

Pairs with the repo's RFC 6386 VP8 codec (`sources/vp8.py`): an IVF
of VP8 key frames is a genuinely DECODABLE video end to end with no
external codec — the container walk feeds `decode_vp8_rgba` frame
by frame, completing the video story next to the metadata-level
MP4/MKV walkers.  Reference parity note: no counterpart; multimodal
brief addition.

Layout (libvpx docs): ``DKIF`` magic, version(2) header-size(2) LE,
codec fourcc(4), width(2) height(2) LE, timebase denominator(4)
numerator(4) LE, frame count(4), reserved(4); then per frame
size(4) LE + pts(8) LE + payload.

Scale posture: payload/file grain like every codec here.
"""

from __future__ import annotations

import struct

__all__ = ["parse_ivf", "build_ivf"]


def parse_ivf(data: bytes) -> dict:
    """Parse IVF bytes -> dict(fourcc, width, height, timebase
    (den, num), frames list of (pts, payload)).  Raises ValueError
    on structural corruption."""
    if data[:4] != b"DKIF":
        raise ValueError("ivf: bad magic")
    if len(data) < 32:
        raise ValueError("ivf: truncated header")
    _ver, hdr_len = struct.unpack_from("<HH", data, 4)
    fourcc = data[8:12].decode("ascii", "replace")
    w, h = struct.unpack_from("<HH", data, 12)
    den, num = struct.unpack_from("<II", data, 16)
    frames = []
    pos = hdr_len
    while pos < len(data):
        if pos + 12 > len(data):
            raise ValueError("ivf: truncated frame header")
        (size,) = struct.unpack_from("<I", data, pos)
        (pts,) = struct.unpack_from("<q", data, pos + 4)
        body = data[pos + 12 : pos + 12 + size]
        if len(body) < size:
            raise ValueError("ivf: truncated frame payload")
        frames.append((pts, body))
        pos += 12 + size
    return {
        "fourcc": fourcc,
        "width": w,
        "height": h,
        "timebase": (den, num),
        "frames": frames,
    }


def build_ivf(
    frames: list[tuple[int, bytes]],
    width: int,
    height: int,
    fourcc: str = "VP80",
    timebase: tuple[int, int] = (30, 1),
) -> bytes:
    """Build an IVF byte string (inverse of :func:`parse_ivf`)."""
    out = bytearray(b"DKIF")
    out += struct.pack("<HH", 0, 32)
    out += fourcc.encode("ascii")
    out += struct.pack("<HH", width, height)
    out += struct.pack("<II", *timebase)
    out += struct.pack("<II", len(frames), 0)
    for pts, body in frames:
        out += struct.pack("<I", len(body))
        out += struct.pack("<q", pts)
        out += body
    return bytes(out)
