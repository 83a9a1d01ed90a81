"""Roaring bitmap serialization — the Delta deletion-vector payload.

Implements the public RoaringFormatSpec
(github.com/RoaringBitmap/RoaringFormatSpec) for 32-bit bitmaps —
array, bitmap and RUN containers, both cookies — plus delta-spark's
``RoaringBitmapArray`` *portable* 64-bit wrapper (magic number +
u64 bitmap count + concatenated 32-bit bitmaps, one per high-32-bit
key) and the Z85 text encoding deletion-vector descriptors use for
UUIDs / inline payloads (the ZeroMQ RFC 32 alphabet).

The encoder emits the no-run form with array/bitmap containers
(always legal); the decoder accepts everything the spec allows, so
real delta-written DVs decode.  Like the other codec pairs, the
writer+reader round-trip under property tests and the driver oracle
(`sources/delta.py` q:delta_snapshot deletion-vector variant).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "z85_encode", "z85_decode",
    "serialize_roaring64", "deserialize_roaring64",
]

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}

#: delta-spark RoaringBitmapArray portable-format magic number
PORTABLE_MAGIC = 1681511377

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack_from(">I", data, i)
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INV:
                raise ValueError(f"z85: invalid character {c!r}")
            v = v * 85 + _Z85_INV[c]
        if v > 0xFFFFFFFF:
            raise ValueError("z85: chunk overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out)


# ------------------------------------------------- 32-bit roaring


def _serialize_rb32(vals: np.ndarray) -> bytes:
    """Sorted unique uint32 values -> standard serialized bitmap
    (no-run cookie; array containers <= 4096, bitmap above)."""
    vals = np.asarray(vals, np.uint32)
    keys = (vals >> 16).astype(np.uint16)
    out = bytearray()
    containers = []
    for k in np.unique(keys):
        low = (vals[keys == k] & 0xFFFF).astype(np.uint16)
        containers.append((int(k), low))
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(containers))
    for k, low in containers:
        out += struct.pack("<HH", k, len(low) - 1)
    # offsets (always present for the no-run cookie)
    pos = len(out) + 4 * len(containers)
    for _, low in containers:
        out += struct.pack("<I", pos)
        pos += (
            2 * len(low) if len(low) <= 4096 else 8192
        )
    for _, low in containers:
        if len(low) <= 4096:
            out += np.sort(low).astype("<u2").tobytes()
        else:
            bits = np.zeros(65536, np.bool_)
            bits[low] = True
            out += np.packbits(bits, bitorder="little").tobytes()
    return bytes(out)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """-> (sorted uint32 values, next position)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    run_flags = None
    if cookie16 == _SERIAL_COOKIE:
        (n_minus1,) = struct.unpack_from("<H", buf, pos + 2)
        n = n_minus1 + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, nbytes, pos), bitorder="little"
        )[:n].astype(bool)
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        cookie, n = struct.unpack_from("<II", buf, pos)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"roaring: bad cookie {cookie}")
        pos += 8
        run_flags = np.zeros(n, bool)
        has_offsets = True
    keys = np.empty(n, np.uint32)
    cards = np.empty(n, np.int64)
    for i in range(n):
        k, c1 = struct.unpack_from("<HH", buf, pos)
        keys[i] = k
        cards[i] = c1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # trust sequential layout; offsets are redundant
    parts = []
    for i in range(n):
        base = keys[i] << 16
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, "<u2", 2 * n_runs, pos).reshape(
                n_runs, 2
            )
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(ln) + 1, dtype=np.uint32)
                    for s, ln in runs
                ]
            ) if n_runs else np.empty(0, np.uint32)
        elif cards[i] <= 4096:
            vals = np.frombuffer(
                buf, "<u2", int(cards[i]), pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        else:
            words = np.frombuffer(buf, np.uint8, 8192, pos)
            pos += 8192
            vals = np.nonzero(
                np.unpackbits(words, bitorder="little")
            )[0].astype(np.uint32)
        parts.append(base + vals)
    out = (
        np.concatenate(parts) if parts else np.empty(0, np.uint32)
    )
    return out, pos


# --------------------------------------------- 64-bit portable array


def serialize_roaring64(values) -> bytes:
    """Sorted-or-not uint64 values -> delta-spark portable
    RoaringBitmapArray bytes."""
    vals = np.unique(np.asarray(list(values), np.uint64))
    highs = (vals >> np.uint64(32)).astype(np.uint32)
    n_maps = int(highs.max()) + 1 if len(vals) else 0
    out = bytearray(struct.pack("<Iq", PORTABLE_MAGIC, n_maps))
    for h in range(n_maps):
        sub = (vals[highs == h] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out += _serialize_rb32(sub)
    return bytes(out)


def deserialize_roaring64(buf: bytes) -> np.ndarray:
    """Portable RoaringBitmapArray bytes -> sorted uint64 values."""
    if len(buf) < 12:
        raise ValueError("roaring: truncated portable header")
    magic, n_maps = struct.unpack_from("<Iq", buf, 0)
    if magic != PORTABLE_MAGIC:
        raise ValueError(
            f"roaring: bad portable magic {magic} "
            f"(want {PORTABLE_MAGIC})"
        )
    if n_maps < 0:
        raise ValueError("roaring: negative bitmap count")
    pos = 12
    parts = []
    for h in range(n_maps):
        vals, pos = _deserialize_rb32(buf, pos)
        parts.append(vals.astype(np.uint64) | (np.uint64(h) << np.uint64(32)))
    return (
        np.concatenate(parts) if parts else np.empty(0, np.uint64)
    )
