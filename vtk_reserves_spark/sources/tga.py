"""Truevision TGA codec — pure ``struct``/numpy (public TGA 2.0 spec).

Still common in game-asset and texture corpora.  Decodes color-mapped
(type 1), true-color (type 2) and grayscale (type 3) images plus their
RLE variants (types 9/10/11), 8/15/16/24/32-bit pixel depths, both
vertical orders (descriptor bit 5) and left-right flip (bit 4).  The
encoder writes uncompressed bottom-up 24-bit true-color for fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


def _expand_pixels(raw: np.ndarray, depth: int, n: int) -> np.ndarray:
    """Packed pixel bytes -> (n, 4) RGBA uint8 (alpha 255 if absent)."""
    out = np.empty((n, 4), np.uint8)
    if depth == 8:
        out[:, 0] = out[:, 1] = out[:, 2] = raw[:n]
        out[:, 3] = 255
    elif depth in (15, 16):
        px = raw[: 2 * n].view("<u2").astype(np.uint32)
        out[:, 0] = ((px >> 10) & 31) * 255 // 31
        out[:, 1] = ((px >> 5) & 31) * 255 // 31
        out[:, 2] = (px & 31) * 255 // 31
        if depth == 15:
            out[:, 3] = 255
        else:
            # bit 15 is the attribute (alpha) bit — but most writers
            # leave it 0 while meaning opaque, so an all-zero attribute
            # plane decodes opaque (the de-facto rule)
            attr = (((px >> 15) & 1) * 255).astype(np.uint8)
            out[:, 3] = attr if attr.any() else 255
    elif depth == 24:
        bgr = raw[: 3 * n].reshape(n, 3)
        out[:, 0] = bgr[:, 2]
        out[:, 1] = bgr[:, 1]
        out[:, 2] = bgr[:, 0]
        out[:, 3] = 255
    elif depth == 32:
        bgra = raw[: 4 * n].reshape(n, 4)
        out[:, 0] = bgra[:, 2]
        out[:, 1] = bgra[:, 1]
        out[:, 2] = bgra[:, 0]
        out[:, 3] = bgra[:, 3]
    else:
        raise ValueError(f"unsupported TGA pixel depth {depth}")
    return out


def decode_tga(data: bytes) -> np.ndarray:
    """TGA bytes -> (h, w, 4) uint8 RGBA (top-down)."""
    if len(data) < 18:
        raise ValueError("truncated TGA header")
    (id_len, cmap_type, img_type, cmap_first, cmap_len, cmap_depth,
     _x0, _y0, w, h, depth, desc) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise ValueError(f"unsupported TGA image type {img_type}")
    if cmap_type not in (0, 1):
        raise ValueError(f"bad TGA color-map type {cmap_type}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad TGA geometry {w}x{h}")
    pos = 18 + id_len
    cmap = None
    if cmap_type == 1:
        csize = cmap_len * ((cmap_depth + 7) // 8)
        raw = np.frombuffer(data[pos : pos + csize], np.uint8)
        if raw.size < csize:
            raise ValueError("truncated TGA color map")
        cmap = _expand_pixels(raw, cmap_depth, cmap_len)
        pos += csize
    n = w * h
    bytes_px = (depth + 7) // 8

    if img_type >= 9:  # RLE
        buf = np.empty(n * bytes_px, np.uint8)
        filled = 0
        i = pos
        while filled < n * bytes_px:
            if i >= len(data):
                raise ValueError("truncated TGA RLE stream")
            hdr = data[i]
            i += 1
            cnt = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet
                px = data[i : i + bytes_px]
                if len(px) < bytes_px:
                    raise ValueError("truncated TGA RLE run")
                i += bytes_px
                rep = np.tile(np.frombuffer(px, np.uint8), cnt)
            else:  # raw packet
                need = cnt * bytes_px
                px = data[i : i + need]
                if len(px) < need:
                    raise ValueError("truncated TGA RLE raw packet")
                i += need
                rep = np.frombuffer(px, np.uint8)
            take = min(rep.size, n * bytes_px - filled)
            buf[filled : filled + take] = rep[:take]
            filled += take
        raw = buf
    else:
        need = n * bytes_px
        raw = np.frombuffer(data[pos : pos + need], np.uint8)
        if raw.size < need:
            raise ValueError("truncated TGA raster")

    if img_type in (1, 9):  # color-mapped
        if cmap is None:
            raise ValueError("color-mapped TGA without a color map")
        idx = raw[:n].astype(np.int64) - cmap_first
        if idx.min(initial=0) < 0 or idx.max(initial=0) >= len(cmap):
            raise ValueError("TGA palette index out of range")
        px = cmap[idx]
    else:
        px = _expand_pixels(raw, depth, n)
    img = px.reshape(h, w, 4)
    if not desc & 0x20:  # bit 5 clear -> bottom-up storage
        img = img[::-1]
    if desc & 0x10:  # bit 4 -> right-to-left
        img = img[:, ::-1]
    return np.ascontiguousarray(img)


def encode_tga(img: np.ndarray) -> bytes:
    """(h, w[, 3]) uint8 -> uncompressed bottom-up 24-bit TGA."""
    a = np.asarray(img, np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"image must be (h, w) or (h, w, 3), got {img.shape}")
    h, w, _ = a.shape
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, 24, 0)
    return hdr + a[::-1, :, [2, 1, 0]].tobytes()
