"""Windows BMP codec — pure ``struct``/numpy (public BITMAPINFOHEADER
format).  The fourth web-adjacent raster format after JPEG/PNG/GIF;
screenshots and legacy exports still carry it, so `decode_media`
decodes it for real like the other pure codecs.

Supported: BITMAPINFOHEADER (or larger V4/V5 headers), uncompressed
BI_RGB, 8-bit palette / 24-bit BGR / 32-bit BGRA, bottom-up and
top-down (negative height) row orders, 4-byte row padding.  RLE and
bitfield compressions raise.  The encoder writes standard bottom-up
24-bit BI_RGB.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB (alpha dropped from 32-bit)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (need >= 40)")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    (clr_used,) = struct.unpack("<I", data[46:50])
    if comp != 0:
        raise ValueError(f"unsupported BMP compression {comp} (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_raw < 0
    h = abs(h_raw)

    palette = None
    if bpp == 8:
        n = clr_used or 256
        ptab = np.frombuffer(
            data[14 + hdr_size : 14 + hdr_size + 4 * n], np.uint8
        ).reshape(n, 4)
        palette = ptab[:, [2, 1, 0]]  # BGRA table -> RGB

    stride = ((w * bpp // 8) + 3) & ~3
    rows = np.frombuffer(
        data[pixel_off : pixel_off + stride * h], np.uint8
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        return palette[np.clip(idx, 0, len(palette) - 1)]
    nch = bpp // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    return px[:, :, [2, 1, 0]].copy()  # BGR(A) -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w[, 3]) uint8 -> bottom-up 24-bit BI_RGB BMP bytes."""
    a = np.asarray(img, np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"image must be (h, w) or (h, w, 3), got {img.shape}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = a[:, :, [2, 1, 0]].reshape(h, w * 3)  # RGB -> BGR
    pixels = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return hdr + pixels
