"""VP9 key-frame header parsing — dimensions/profile/bit-depth
without decoding (the uncompressed header of the VP9 bitstream
spec §6.2).

VP9 is the dominant WebM codec; full frame decode stays a banked
gap (SURVEY round-5 list), but the UNCOMPRESSED header carries the
curation signals — profile, bit depth, color space, coded
dimensions — in the first ~20 bytes, so resolution floors and
profile allowlists run without a codec.  Complements the VP8 full
decoder (`sources/vp8.py`) and the IVF/MKV container walkers.

The builder emits spec-shaped key-frame headers so every parse
branch (profiles 0-3, both bit-depth flags, sync code, render-size
flag) sits under the driver oracle.
"""

from __future__ import annotations

__all__ = ["parse_vp9_keyframe", "build_vp9_keyframe_header"]

_COLOR_SPACES = [
    "unknown", "bt601", "bt709", "smpte170", "smpte240", "bt2020",
    "reserved", "rgb",
]


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def f(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("vp9: truncated header")
            bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
            out = (out << 1) | bit
            self.pos += 1
        return out


def parse_vp9_keyframe(data: bytes) -> dict:
    """Parse a VP9 KEY frame's uncompressed header: profile,
    bit_depth, color_space, subsampling, width, height.  Raises
    ValueError on non-keyframes, show-existing frames, bad sync
    codes, or truncation."""
    b = _Bits(data)
    if b.f(2) != 2:
        raise ValueError("vp9: bad frame marker")
    profile = b.f(1) | (b.f(1) << 1)
    if profile == 3 and b.f(1):
        raise ValueError("vp9: reserved profile bit set")
    if b.f(1):
        raise ValueError("vp9: show_existing_frame, not a coded frame")
    if b.f(1) != 0:
        raise ValueError("vp9: not a key frame")
    b.f(1)  # show_frame
    b.f(1)  # error_resilient
    if b.f(8) != 0x49 or b.f(8) != 0x83 or b.f(8) != 0x42:
        raise ValueError("vp9: bad frame sync code")
    if profile >= 2:
        bit_depth = 12 if b.f(1) else 10
    else:
        bit_depth = 8
    cs = b.f(3)
    color_space = _COLOR_SPACES[cs]
    if cs != 7:  # not RGB
        b.f(1)  # color_range
        if profile in (1, 3):
            sx, sy = b.f(1), b.f(1)
            if b.f(1):
                raise ValueError("vp9: reserved subsampling bit set")
        else:
            sx = sy = 1
    else:
        if profile not in (1, 3):
            raise ValueError("vp9: RGB requires profile 1 or 3")
        sx = sy = 0
        if b.f(1):
            raise ValueError("vp9: reserved RGB bit set")
    width = b.f(16) + 1
    height = b.f(16) + 1
    return {
        "profile": profile,
        "bit_depth": bit_depth,
        "color_space": color_space,
        "subsampling": f"{4}:{2 if sx else 4}:{0 if sy else (2 if sx else 4)}",
        "width": width,
        "height": height,
    }


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def f(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            chunk = self.bits[i : i + 8]
            chunk += [0] * (8 - len(chunk))
            out.append(int("".join(map(str, chunk)), 2))
        return bytes(out)


def build_vp9_keyframe_header(
    width: int,
    height: int,
    profile: int = 0,
    bit_depth: int = 8,
    color_space: str = "bt709",
) -> bytes:
    """Build a spec-shaped key-frame uncompressed header (inverse of
    :func:`parse_vp9_keyframe` for the surfaced fields; the
    compressed payload that would follow is absent — header-only
    fixtures for the metadata path)."""
    w = _BitWriter()
    w.f(2, 2)  # frame marker
    w.f(profile & 1, 1)
    w.f((profile >> 1) & 1, 1)
    if profile == 3:
        w.f(0, 1)
    w.f(0, 1)  # show_existing_frame
    w.f(0, 1)  # frame_type = KEY
    w.f(1, 1)  # show_frame
    w.f(0, 1)  # error_resilient
    w.f(0x49, 8)
    w.f(0x83, 8)
    w.f(0x42, 8)
    if profile >= 2:
        w.f(1 if bit_depth == 12 else 0, 1)
    cs = _COLOR_SPACES.index(color_space)
    w.f(cs, 3)
    if cs != 7:
        w.f(0, 1)  # color_range
        if profile in (1, 3):
            w.f(1, 1)  # subsampling_x
            w.f(1, 1)  # subsampling_y
            w.f(0, 1)
    else:
        w.f(0, 1)
    w.f(width - 1, 16)
    w.f(height - 1, 16)
    w.f(0, 1)  # render_and_frame_size_different
    return w.bytes()
