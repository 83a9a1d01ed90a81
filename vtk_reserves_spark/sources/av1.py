"""AV1 sequence-header parsing — profile/level/dimensions without
decoding (OBU framing + the sequence_header_obu of the AV1
bitstream spec §5.5).

AV1 is the third WebM-family codec after VP8 (fully decoded here)
and VP9 (header-mined in `sources/vp9.py`); the same pre-decode
curation filters — profile allowlists, level caps, resolution
floors — come from the sequence header OBU in the stream's first
few dozen bytes.  Frame decode stays the banked gap.

Implements OBU framing (forbidden/type/extension/has-size bits,
leb128 sizes, temporal-delimiter skip) and the sequence header's
leading fields: seq_profile, still_picture, the
reduced_still_picture shortcut, operating-point level/tier, and the
variable-width max frame dimensions.  The builder emits spec-shaped
streams so both header layouts sit under the driver oracle.
"""

from __future__ import annotations

__all__ = ["parse_av1_sequence_header", "build_av1_sequence_header"]


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def f(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("av1: truncated header")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _leb128(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    for i in range(8):
        if pos >= len(data):
            raise ValueError("av1: truncated leb128")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return out, pos
    raise ValueError("av1: leb128 too long")


def parse_av1_sequence_header(data: bytes) -> dict:
    """Walk OBUs until the sequence header and parse its leading
    fields: profile, still_picture, reduced header flag, level,
    tier, width, height.  Raises ValueError when no sequence header
    OBU exists or framing is corrupt."""
    pos = 0
    while pos < len(data):
        b = data[pos]
        if b & 0x80:
            raise ValueError("av1: forbidden OBU bit set")
        obu_type = (b >> 3) & 0x0F
        has_ext = (b >> 2) & 1
        has_size = (b >> 1) & 1
        pos += 1 + has_ext
        if has_size:
            size, pos = _leb128(data, pos)
        else:
            size = len(data) - pos
        if obu_type == 1:  # OBU_SEQUENCE_HEADER
            r = _Bits(data[pos : pos + size])
            profile = r.f(3)
            still = r.f(1)
            reduced = r.f(1)
            if reduced:
                level = r.f(5)
                tier = 0
            else:
                if r.f(1):  # timing_info_present
                    raise ValueError("av1: timing info not supported")
                r.f(1)  # initial_display_delay_present (0 in builder)
                op_cnt = r.f(5) + 1
                r.f(12)  # operating_point_idc[0]
                level = r.f(5)
                tier = r.f(1) if level > 7 else 0
                for _ in range(op_cnt - 1):
                    r.f(12)
                    lv = r.f(5)
                    if lv > 7:
                        r.f(1)
            wbits = r.f(4) + 1
            hbits = r.f(4) + 1
            width = r.f(wbits) + 1
            height = r.f(hbits) + 1
            return {
                "profile": profile,
                "still_picture": bool(still),
                "reduced_header": bool(reduced),
                "level": level,
                "tier": tier,
                "width": width,
                "height": height,
            }
        pos += size
    raise ValueError("av1: no sequence header OBU found")


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


def build_av1_sequence_header(
    width: int,
    height: int,
    profile: int = 0,
    level: int = 8,
    tier: int = 0,
    still_picture: bool = False,
    reduced: bool = False,
) -> bytes:
    """Build a temporal-delimiter OBU + sequence-header OBU stream
    (inverse of :func:`parse_av1_sequence_header` for the surfaced
    fields)."""
    w = _BitWriter()
    w.f(profile, 3)
    w.f(1 if still_picture else 0, 1)
    w.f(1 if reduced else 0, 1)
    if reduced:
        w.f(level, 5)
    else:
        w.f(0, 1)  # timing_info_present
        w.f(0, 1)  # initial_display_delay_present
        w.f(0, 5)  # operating_points_cnt_minus_1
        w.f(0, 12)  # operating_point_idc[0]
        w.f(level, 5)
        if level > 7:
            w.f(tier, 1)
    wbits = max(width - 1, 1).bit_length()
    hbits = max(height - 1, 1).bit_length()
    w.f(wbits - 1, 4)
    w.f(hbits - 1, 4)
    w.f(width - 1, wbits)
    w.f(height - 1, hbits)
    body = w.bytes()

    def obu(obu_type: int, payload: bytes) -> bytes:
        head = bytes([(obu_type << 3) | 0x02])  # has_size, no ext
        size = payload and len(payload) or 0
        leb = bytearray()
        v = size
        while True:
            byte = v & 0x7F
            v >>= 7
            leb.append(byte | 0x80 if v else byte)
            if not v:
                break
        return head + bytes(leb) + payload

    return obu(2, b"") + obu(1, body)  # temporal delimiter + seq header
