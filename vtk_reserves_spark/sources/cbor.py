"""CBOR decoding (RFC 8949) — pure stdlib, the core type system.

CBOR is MessagePack's IETF-standardized sibling (COSE/WebAuthn
payloads, IoT telemetry dumps, DAG-CBOR content stores); decoding
it completes the binary interchange family (Avro OCF, protobuf
census, MessagePack).

Implements the major-type system: unsigned/negative integers with
the 0-27 additional-info ladder, byte/text strings (definite AND
indefinite-length with break stops), arrays/maps (both length
forms), tags (surfaced as ('__tag__', n, value) so epoch dates and
bignums stay inspectable), simple values (false/true/null/
undefined), and float 16/32/64 — half-precision decoded manually,
the corner stdlibs miss.  Reserved/malformed encodings raise.
"""

from __future__ import annotations

import struct

__all__ = ["decode_one", "decode_stream", "encode"]

_BREAK = object()


def _read_uint(data: bytes, pos: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        if pos >= len(data):
            raise ValueError("cbor: truncated")
        return data[pos], pos + 1
    if info in (25, 26, 27):
        width = 2 << (info - 25)
        raw = data[pos : pos + width]
        if len(raw) < width:
            raise ValueError("cbor: truncated")
        return int.from_bytes(raw, "big"), pos + width
    raise ValueError(f"cbor: reserved additional info {info}")


def _half_to_float(h: int) -> float:
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    frac = h & 0x3FF
    if exp == 0:
        return sign * frac * 2.0**-24
    if exp == 31:
        return sign * (float("inf") if frac == 0 else float("nan"))
    return sign * (1 + frac / 1024.0) * 2.0 ** (exp - 15)


def decode_one(data: bytes, pos: int = 0):
    """Decode one data item at ``pos``; returns (value, new_pos).
    Tags surface as ('__tag__', number, inner); raises ValueError on
    malformed or reserved encodings."""
    v, pos = _decode(data, pos)
    if v is _BREAK:
        raise ValueError("cbor: unexpected break")
    return v, pos


def _decode(data: bytes, pos: int):
    if pos >= len(data):
        raise ValueError("cbor: truncated")
    b = data[pos]
    pos += 1
    major = b >> 5
    info = b & 0x1F
    if major == 0:
        return _read_uint(data, pos, info)
    if major == 1:
        n, pos = _read_uint(data, pos, info)
        return -1 - n, pos
    if major in (2, 3):
        if info == 31:  # indefinite: chunks until break
            out = b""
            while True:
                if pos >= len(data):
                    raise ValueError("cbor: unterminated indefinite string")
                if data[pos] == 0xFF:
                    pos += 1
                    break
                if data[pos] >> 5 != major or data[pos] & 0x1F == 31:
                    raise ValueError("cbor: bad indefinite chunk")
                chunk, pos = _decode(data, pos)
                out += chunk if major == 2 else chunk.encode()
            return (out if major == 2 else out.decode("utf-8", "replace")), pos
        n, pos = _read_uint(data, pos, info)
        raw = data[pos : pos + n]
        if len(raw) < n:
            raise ValueError("cbor: truncated string")
        pos += n
        return (raw if major == 2 else raw.decode("utf-8", "replace")), pos
    if major == 4:
        out = []
        if info == 31:
            while True:
                v, pos = _decode(data, pos)
                if v is _BREAK:
                    return out, pos
                out.append(v)
        n, pos = _read_uint(data, pos, info)
        for _ in range(n):
            v, pos = _decode(data, pos)
            if v is _BREAK:
                raise ValueError("cbor: break inside definite array")
            out.append(v)
        return out, pos
    if major == 5:
        out = {}
        if info == 31:
            while True:
                k, pos = _decode(data, pos)
                if k is _BREAK:
                    return out, pos
                v, pos = _decode(data, pos)
                out[k] = v
        n, pos = _read_uint(data, pos, info)
        for _ in range(n):
            k, pos = _decode(data, pos)
            v, pos = _decode(data, pos)
            out[k] = v
        return out, pos
    if major == 6:
        n, pos = _read_uint(data, pos, info)
        v, pos = _decode(data, pos)
        return ("__tag__", n, v), pos
    # major 7: simple / float / break
    if info == 20:
        return False, pos
    if info == 21:
        return True, pos
    if info == 22:
        return None, pos
    if info == 23:
        return ("__undefined__",), pos
    if info == 25:
        if pos + 2 > len(data):
            raise ValueError("cbor: truncated float16")
        (h,) = struct.unpack_from(">H", data, pos)
        return _half_to_float(h), pos + 2
    if info == 26:
        if pos + 4 > len(data):
            raise ValueError("cbor: truncated float32")
        return struct.unpack_from(">f", data, pos)[0], pos + 4
    if info == 27:
        if pos + 8 > len(data):
            raise ValueError("cbor: truncated float64")
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if info == 31:
        return _BREAK, pos
    if info < 20:
        return ("__simple__", info), pos
    if info == 24:
        n, pos = _read_uint(data, pos, info)
        if n < 32:
            # RFC 8949 §3.3: two-byte form for simple values 0-31 is
            # an invalid (non-minimal) encoding
            raise ValueError(f"cbor: simple value {n} in two-byte form")
        return ("__simple__", n), pos
    raise ValueError(f"cbor: reserved simple value {info}")


def decode_stream(data: bytes) -> list:
    """Decode a CBOR sequence (RFC 8742: concatenated items)."""
    out = []
    pos = 0
    while pos < len(data):
        v, pos = decode_one(data, pos)
        out.append(v)
    return out


def _head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    for info, width in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if n < 1 << (8 * width):
            return bytes([(major << 5) | info]) + n.to_bytes(width, "big")
    raise ValueError("cbor: length too large")


def encode(v) -> bytes:
    """Encode one item (inverse of :func:`decode_one` for the
    JSON-ish types; preferred minimal-width serialization)."""
    if v is False:
        return b"\xf4"
    if v is True:
        return b"\xf5"
    if v is None:
        return b"\xf6"
    if isinstance(v, int):
        return _head(0, v) if v >= 0 else _head(1, -1 - v)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return _head(2, len(v)) + v
    if isinstance(v, str):
        raw = v.encode()
        return _head(3, len(raw)) + raw
    if isinstance(v, (list, tuple)):
        if len(v) == 3 and v[0] == "__tag__":
            return _head(6, v[1]) + encode(v[2])
        return _head(4, len(v)) + b"".join(encode(x) for x in v)
    if isinstance(v, dict):
        return _head(5, len(v)) + b"".join(
            encode(k) + encode(x) for k, x in v.items()
        )
    raise ValueError(f"cbor: cannot encode {type(v).__name__}")
