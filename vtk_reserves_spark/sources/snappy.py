"""Snappy raw + framing format — pure-stdlib codec.

Snappy is the other half of the data-lake transfer-codec pair with
LZ4: Parquet pages, ORC stripes, Kafka batches and Hadoop
SequenceFiles default to it.  This implements the two public
specifications:

* the RAW format: varint uncompressed-length preamble, then
  tag-coded elements — literals (with 1-4 extra length bytes),
  1-byte-offset copies (len 4-11, 11-bit offset), 2-byte and
  4-byte little-endian offset copies — plus a greedy hash-table
  compressor emitting literals and 2-byte copies;
* the FRAMING format (.sz / Kafka "snappy-java" interchange):
  stream identifier chunk ``sNaPpY``, compressed (0x00) and
  uncompressed (0x01) data chunks carrying masked CRC-32C
  checksums of the uncompressed data, padding (0xFE) and reserved
  skippable chunks — CRC-32C (Castagnoli) implemented here from
  the public polynomial.

Scale posture: payload-grain calls inside Arrow batches
(`operators/multimodal.decompress_media`); bytes never reach the
driver.  ``decompress``/``decompress_framed`` dispatch the raw-block
inner decode to pyarrow's bundled native snappy when available (the
uncompressed length needed by the C API is the block's own varint
preamble) and fall back to the pure-python decoder — also the
differential-test oracle — on import failure or any native-side
error.  CRC-32C runs slice-by-16 (16 tables, one 16-byte stride per
Python-level iteration) and is the remaining pure-python cost in
the framed path; see SCALE.md.
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c", "compress", "decompress",
    "compress_framed", "decompress_framed",
]

try:  # bundled native codec (pyarrow ships snappy); optional
    import pyarrow as _pa
except ImportError:  # pragma: no cover - pyarrow is a hard dep elsewhere
    _pa = None

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"

# CRC-32C (Castagnoli), reflected polynomial 0x82F63B78 —
# slice-by-16: table k maps a byte XORed into the CRC k positions
# (bytes) ahead of the current window to its 32-bit contribution.
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)

_CRC_SLICE = [list(_CRC_TABLE)]
for _k in range(1, 16):
    _prev = _CRC_SLICE[-1]
    _CRC_SLICE.append(
        [_CRC_TABLE[_prev[_i] & 0xFF] ^ (_prev[_i] >> 8) for _i in range(256)]
    )
# _CRC_SLICE[k][b] advances byte b through k+1 zero bytes; reverse so
# index 0 is the FIRST byte of a 16-byte stride (needs 15 more shifts)
_T0, _T1, _T2, _T3, _T4, _T5, _T6, _T7, \
    _T8, _T9, _T10, _T11, _T12, _T13, _T14, _T15 = _CRC_SLICE[::-1]


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    n = len(data)
    pos = 0
    # slice-by-16 main loop: fold the current CRC into the first 4
    # bytes of the stride, then combine 16 independent table lookups
    end16 = n - (n % 16)
    while pos < end16:
        b = data[pos : pos + 16]
        crc = (
            _T0[(b[0] ^ crc) & 0xFF]
            ^ _T1[(b[1] ^ (crc >> 8)) & 0xFF]
            ^ _T2[(b[2] ^ (crc >> 16)) & 0xFF]
            ^ _T3[(b[3] ^ (crc >> 24)) & 0xFF]
            ^ _T4[b[4]] ^ _T5[b[5]] ^ _T6[b[6]] ^ _T7[b[7]]
            ^ _T8[b[8]] ^ _T9[b[9]] ^ _T10[b[10]] ^ _T11[b[11]]
            ^ _T12[b[12]] ^ _T13[b[13]] ^ _T14[b[14]] ^ _T15[b[15]]
        )
        pos += 16
    for i in range(pos, n):
        crc = _CRC_TABLE[(crc ^ data[i]) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------------ raw


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint too long")


def decompress(src: bytes, native: bool | None = None) -> bytes:
    """Raw Snappy block -> bytes.  Raises ValueError on malformed
    input or length mismatch.

    ``native=None`` (default) uses pyarrow's bundled snappy when
    importable (the C API's required uncompressed size is the
    block's own varint preamble) and falls back to the pure decoder
    on any native-side error so the error surface stays ours.
    ``native=False`` forces the pure path (the differential oracle).
    """
    expected, pos = _read_varint(src, 0)
    if native is None:
        native = _pa is not None
    if native and _pa is not None and expected <= 1 << 31:
        try:
            out = _pa.Codec("snappy").decompress(
                bytes(src), decompressed_size=expected, asbytes=True
            )
            if len(out) == expected:
                return out
        except Exception:
            pass  # pure decoder re-raises its own ValueError
    out = bytearray()
    n = len(src)
    while pos < n:
        tag = src[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(src[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: literal overruns input")
            out += src[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 7) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy")
            offset = ((tag >> 5) << 8) | src[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy")
            (offset,) = struct.unpack_from("<H", src, pos)
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy")
            (offset,) = struct.unpack_from("<I", src, pos)
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: bad copy offset")
        start = len(out) - offset
        if offset >= ln:
            out += out[start : start + ln]
        else:
            # periodic overlap copy (see lz4.decompress_block)
            chunk = bytes(out[start:])
            while len(chunk) < ln:
                chunk += chunk
            out += chunk[:ln]
    if len(out) != expected:
        raise ValueError(
            f"snappy: declared {expected} bytes, produced {len(out)}"
        )
    return bytes(out)


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    else:
        extra = (n.bit_length() + 7) // 8
        out.append((59 + extra) << 2)
        out += n.to_bytes(extra, "little")
    out += lit


def compress(src: bytes) -> bytes:
    """Greedy raw-Snappy compressor: 4-byte hash matcher emitting
    2-byte-offset copies (the format every decoder handles)."""
    out = bytearray()
    n = len(src)
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    while i + 4 <= n:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF or src[cand : cand + 4] != key:
            i += 1
            continue
        if i > anchor:
            _emit_literal(out, src[anchor:i])
        m = i + 4
        c = cand + 4
        while m < n and src[m] == src[c]:
            m += 1
            c += 1
        length = m - i
        offset = i - cand
        while length > 0:
            chunk = min(length, 64)
            if chunk < 4:
                # tail shorter than the 4-byte copy minimum: emit as
                # literal from the source position
                break
            out.append(((chunk - 1) << 2) | 2)
            out += struct.pack("<H", offset)
            length -= chunk
        anchor = m - length  # any un-emitted tail becomes literals
        i = anchor
    if anchor < n:
        _emit_literal(out, src[anchor:])
    return bytes(out)


# ------------------------------------------------------------- framing


def compress_framed(data: bytes, chunk_size: int = 65536) -> bytes:
    """bytes -> Snappy framing-format stream (stream identifier +
    compressed chunks with masked CRC-32C; incompressible chunks are
    stored uncompressed per the spec)."""
    out = bytearray(_STREAM_ID)
    for i in range(0, len(data), chunk_size) or [0]:
        raw = data[i : i + chunk_size]
        if not raw and data:
            break
        crc = _mask(crc32c(raw))
        comp = compress(raw)
        if len(comp) < len(raw):
            body = struct.pack("<I", crc) + comp
            out += bytes([0x00]) + len(body).to_bytes(3, "little") + body
        else:
            body = struct.pack("<I", crc) + raw
            out += bytes([0x01]) + len(body).to_bytes(3, "little") + body
        if not data:
            break
    return bytes(out)


def decompress_framed(data: bytes) -> bytes:
    """Snappy framing-format stream -> bytes, verifying every
    chunk's masked CRC-32C.  Raises ValueError on corruption."""
    if data[: len(_STREAM_ID)] != _STREAM_ID:
        raise ValueError("snappy: missing stream identifier")
    pos = len(_STREAM_ID)
    out = bytearray()
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("snappy: truncated chunk header")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + clen > n:
            raise ValueError("snappy: chunk overruns stream")
        body = data[pos : pos + clen]
        pos += clen
        if ctype == 0xFF:  # repeated stream identifier
            if body != _STREAM_ID[4:]:
                raise ValueError("snappy: bad repeated stream identifier")
            continue
        if ctype in (0x00, 0x01):
            if clen < 4:
                raise ValueError("snappy: chunk too short for checksum")
            (crc,) = struct.unpack_from("<I", body, 0)
            payload = body[4:]
            raw = payload if ctype == 0x01 else decompress(payload)
            if _mask(crc32c(raw)) != crc:
                raise ValueError("snappy: chunk checksum mismatch")
            out += raw
            continue
        if ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue  # padding / skippable
        raise ValueError(f"snappy: reserved unskippable chunk 0x{ctype:02x}")
    return bytes(out)
