"""MessagePack decoding — pure-stdlib, the full type table.

MessagePack streams (concatenated top-level objects) are the
compact-JSON of data dumps, Redis/Fluentd pipelines and API caches;
ingesting them without a client library completes the binary
interchange family next to Avro OCF and the protobuf census.

Implements the msgpack spec type table: positive/negative fixint,
fixmap/fixarray/fixstr, nil/bool, bin 8/16/32, float 32/64,
uint/int 8-64, str 8/16/32, array 16/32, map 16/32 (ext types are
surfaced as tagged bytes rather than rejected — timestamps etc.
stay inspectable).  Decoded values map to Python scalars /
lists / dicts; the Spark surface flattens top-level objects to
typed rows or JSON strings for `get_json_object` composition.
"""

from __future__ import annotations

import struct

__all__ = ["unpack_one", "unpack_stream", "pack"]


def unpack_one(data: bytes, pos: int = 0):
    """Decode one object at ``pos``; returns (value, new_pos).
    Ext types come back as ('__ext__', type, bytes) tuples.  Raises
    ValueError on truncation or reserved bytes."""
    if pos >= len(data):
        raise ValueError("msgpack: truncated")
    b = data[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _map(data, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _array(data, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        return _str(data, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _len(data, pos, b - 0xC4)
        return _bytes(data, pos, n)
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        n, pos = _len(data, pos, b - 0xC7)
        t = data[pos]
        raw, pos = _bytes(data, pos + 1, n)
        return ("__ext__", t - 0x100 if t >= 0x80 else t, raw), pos
    if b == 0xCA:
        return struct.unpack_from(">f", data, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8-64
        width = 1 << (b - 0xCC)
        return int.from_bytes(data[pos : pos + width], "big"), pos + width
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8-64
        width = 1 << (b - 0xD0)
        raw = data[pos : pos + width]
        if len(raw) < width:
            raise ValueError("msgpack: truncated int")
        return int.from_bytes(raw, "big", signed=True), pos + width
    if b in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        t = data[pos]
        raw, pos = _bytes(data, pos + 1, n)
        return ("__ext__", t - 0x100 if t >= 0x80 else t, raw), pos
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _len(data, pos, b - 0xD9)
        return _str(data, pos, n)
    if b in (0xDC, 0xDD):  # array 16/32
        n, pos = _len(data, pos, b - 0xDC + 1)
        return _array(data, pos, n)
    if b in (0xDE, 0xDF):  # map 16/32
        n, pos = _len(data, pos, b - 0xDE + 1)
        return _map(data, pos, n)
    raise ValueError(f"msgpack: reserved byte 0x{b:02x}")


def _len(data: bytes, pos: int, log2: int) -> tuple[int, int]:
    width = 1 << log2
    raw = data[pos : pos + width]
    if len(raw) < width:
        raise ValueError("msgpack: truncated length")
    return int.from_bytes(raw, "big"), pos + width


def _bytes(data: bytes, pos: int, n: int) -> tuple[bytes, int]:
    raw = data[pos : pos + n]
    if len(raw) < n:
        raise ValueError("msgpack: truncated payload")
    return raw, pos + n


def _str(data: bytes, pos: int, n: int):
    raw, pos = _bytes(data, pos, n)
    return raw.decode("utf-8", "replace"), pos


def _array(data: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = unpack_one(data, pos)
        out.append(v)
    return out, pos


def _map(data: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = unpack_one(data, pos)
        v, pos = unpack_one(data, pos)
        out[k] = v
    return out, pos


def unpack_stream(data: bytes) -> list:
    """Decode a stream of concatenated top-level objects."""
    out = []
    pos = 0
    while pos < len(data):
        v, pos = unpack_one(data, pos)
        out.append(v)
    return out


def pack(v) -> bytes:
    """Encode one object (inverse of :func:`unpack_one` for the
    JSON-ish types; chooses minimal-width encodings)."""
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for code, width in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < 1 << (8 * width):
                    return bytes([code]) + v.to_bytes(width, "big")
            raise ValueError("msgpack: uint too large")
        for code, width in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * width - 1)) <= v:
                return bytes([code]) + v.to_bytes(width, "big", signed=True)
        raise ValueError("msgpack: int too small")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        raw = v.encode()
        if len(raw) <= 31:
            return bytes([0xA0 | len(raw)]) + raw
        for code, width in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if len(raw) < 1 << (8 * width):
                return (bytes([code])
                        + len(raw).to_bytes(width, "big") + raw)
    if isinstance(v, (bytes, bytearray)):
        raw = bytes(v)
        for code, width in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if len(raw) < 1 << (8 * width):
                return (bytes([code])
                        + len(raw).to_bytes(width, "big") + raw)
    if isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < 1 << 16:
            head = b"\xdc" + n.to_bytes(2, "big")
        else:
            head = b"\xdd" + n.to_bytes(4, "big")
        return head + b"".join(pack(x) for x in v)
    if isinstance(v, dict):
        n = len(v)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n < 1 << 16:
            head = b"\xde" + n.to_bytes(2, "big")
        else:
            head = b"\xdf" + n.to_bytes(4, "big")
        return head + b"".join(pack(k) + pack(x) for k, x in v.items())
    raise ValueError(f"msgpack: cannot pack {type(v).__name__}")
