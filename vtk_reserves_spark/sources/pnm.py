"""Netpbm codec (PBM/PGM/PPM, magics P1-P6) — pure python/numpy.

The simplest raster family still common in scientific corpora and as
an interchange format.  Decodes all six variants: ASCII (P1 bitmap,
P2 graymap, P3 pixmap) and binary (P4/P5/P6), with comments, arbitrary
whitespace, maxval scaling to 8-bit and 16-bit (big-endian) binary
samples.  The encoder writes P5/P6 (binary) for fixtures/export.
"""

from __future__ import annotations

import numpy as np


def _tokens(data: bytes, pos: int, n: int):
    """Yield n whitespace-separated numeric tokens (comments skipped)
    starting at pos; returns (values, new_pos)."""
    vals = []
    i = pos
    ln = len(data)
    while len(vals) < n:
        while i < ln and data[i : i + 1].isspace():
            i += 1
        if i < ln and data[i] == ord("#"):
            j = data.find(b"\n", i)
            i = ln if j < 0 else j + 1
            continue
        j = i
        while j < ln and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header/ASCII data")
        vals.append(int(data[i:j]))
        i = j
    return vals, i


def decode_pnm(data: bytes) -> np.ndarray:
    """PNM bytes -> (h, w) grayscale or (h, w, 3) RGB uint8 array
    (16-bit maxvals are rescaled to 8-bit)."""
    if len(data) < 2 or data[0] != ord("P") or data[1] not in b"123456":
        raise ValueError("not a PNM stream (magic P1-P6 expected)")
    kind = data[1] - ord("0")
    pos = 2
    (w, h), pos = _tokens(data, pos, 2)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNM geometry {w}x{h}")
    if kind in (1, 4):  # bitmap: no maxval
        maxval = 1
    else:
        (maxval,), pos = _tokens(data, pos, 1)
        if not 0 < maxval < 65536:
            raise ValueError(f"bad PNM maxval {maxval}")
    channels = 3 if kind in (3, 6) else 1
    n = w * h * channels

    if kind == 1:  # ASCII bitmap: digits may pack WITHOUT whitespace
        vals = []
        i = pos
        ln = len(data)
        while len(vals) < n and i < ln:
            c = data[i]
            if c in (0x30, 0x31):  # '0' / '1'
                vals.append(c - 0x30)
                i += 1
            elif c == ord("#"):
                j = data.find(b"\n", i)
                i = ln if j < 0 else j + 1
            elif data[i : i + 1].isspace():
                i += 1
            else:
                raise ValueError(f"bad P1 bitmap byte {data[i:i+1]!r}")
        if len(vals) < n:
            raise ValueError("truncated P1 raster")
        a = 1 - np.array(vals, np.int64)  # PBM: 1 = black
        maxval = 1
    elif kind in (2, 3):  # ASCII
        vals, _ = _tokens(data, pos, n)
        a = np.array(vals, np.int64)
    else:  # binary: exactly ONE whitespace byte after the header
        pos += 1
        if kind == 4:
            stride = (w + 7) // 8
            raw = np.frombuffer(data[pos : pos + stride * h], np.uint8)
            if raw.size < stride * h:
                raise ValueError("truncated PBM raster")
            bits = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w]
            a = (1 - bits).astype(np.int64).ravel()
            maxval = 1
        elif maxval < 256:
            raw = np.frombuffer(data[pos : pos + n], np.uint8)
            if raw.size < n:
                raise ValueError("truncated PNM raster")
            a = raw.astype(np.int64)
        else:  # 16-bit big-endian samples
            raw = np.frombuffer(data[pos : pos + 2 * n], ">u2")
            if raw.size < n:
                raise ValueError("truncated PNM raster")
            a = raw.astype(np.int64)

    if a.min(initial=0) < 0 or a.max(initial=0) > maxval:
        raise ValueError("PNM sample exceeds maxval")
    if maxval != 255:
        a = a * 255 // maxval
    a = a.astype(np.uint8)
    return a.reshape(h, w, 3) if channels == 3 else a.reshape(h, w)


def encode_pnm(img: np.ndarray, maxval: int = 255) -> bytes:
    """(h, w) -> binary PGM (P5); (h, w, 3) -> binary PPM (P6)."""
    a = np.asarray(img, np.uint8)
    if a.ndim == 2:
        magic, chan = b"P5", 1
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, chan = b"P6", 3
    else:
        raise ValueError(f"image must be (h, w) or (h, w, 3), got {a.shape}")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n{maxval}\n".encode() + a.tobytes()
