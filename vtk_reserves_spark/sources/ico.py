"""Windows ICO/CUR codec — pure ``struct``/numpy, reusing the PNG and
BMP decoders.

Favicons are everywhere in web crawls.  An ICO is a directory of
images, each either a PNG stream (modern, usually the 256px entry) or
a headerless DIB: a BITMAPINFOHEADER whose height covers BOTH the XOR
(color) block and the 1-bit AND (transparency) mask.  Decodes every
entry; :func:`decode_ico` returns the largest by pixel count (what a
thumbnailer wants).  The encoder writes single-entry PNG-based icons
for fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_ico_entries(data: bytes) -> list[np.ndarray]:
    """ICO/CUR bytes -> list of (h, w, 4) uint8 RGBA images."""
    if len(data) < 6:
        raise ValueError("truncated ICO header")
    reserved, kind, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or kind not in (1, 2):
        raise ValueError("not an ICO/CUR stream")
    if count == 0:
        raise ValueError("ICO has no images")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise ValueError("truncated ICO directory")
        (_w, _h, _ncol, _rsv, _planes, _bpp, size, start) = struct.unpack(
            "<BBBBHHII", data[off : off + 16]
        )
        blob = data[start : start + size]
        if len(blob) < size:
            raise ValueError("truncated ICO image data")
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            from vtk_reserves_spark.sources.image import decode_png

            img = decode_png(blob)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            if img.shape[2] == 3:
                img = np.dstack(
                    [img, np.full(img.shape[:2], 255, np.uint8)]
                )
            out.append(img)
        else:
            out.append(_decode_dib_entry(blob))
    return out


def _decode_dib_entry(blob: bytes) -> np.ndarray:
    """Headerless DIB: BITMAPINFOHEADER with doubled height (XOR block
    + 1-bit AND mask), bottom-up rows.  Reuses the BMP pixel logic by
    synthesizing a BMP file around the XOR block, then applies the
    mask as alpha."""
    if len(blob) < 40:
        raise ValueError("truncated ICO DIB header")
    hdr_size, w, h2 = struct.unpack("<Iii", blob[:12])
    planes, bpp = struct.unpack("<HH", blob[12:16])
    (comp,) = struct.unpack("<I", blob[16:20])
    if hdr_size != 40 or comp != 0:
        raise ValueError("unsupported ICO DIB (need plain BITMAPINFOHEADER)")
    h = h2 // 2
    if h <= 0 or w <= 0:
        raise ValueError(f"bad ICO DIB geometry {w}x{h2}")
    (clr_used,) = struct.unpack("<I", blob[32:36])
    n_pal = clr_used or (1 << bpp if bpp <= 8 else 0)
    xor_stride = ((w * bpp // 8) + 3) & ~3 if bpp >= 8 else ((w * bpp + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    xor_start = 40 + 4 * n_pal
    xor_end = xor_start + xor_stride * h
    mask_raw = blob[xor_end : xor_end + and_stride * h]

    if bpp in (8, 24, 32):
        # synthesize a BMP around the XOR block for the shared decoder
        from vtk_reserves_spark.sources.bmp import decode_bmp

        body = bytearray(blob[:xor_end])
        struct.pack_into("<i", body, 8, h)  # un-double the height
        off = 14 + xor_start
        bmp = (
            b"BM"
            + struct.pack("<IHHI", 14 + len(body), 0, 0, off)
            + bytes(body)
        )
        rgb = decode_bmp(bmp)
        if bpp == 32:
            # decode_bmp drops alpha; recover it from the XOR block
            rows = np.frombuffer(
                blob[xor_start:xor_end], np.uint8
            ).reshape(h, xor_stride)[::-1]
            alpha = rows[:, : 4 * w].reshape(h, w, 4)[:, :, 3]
        else:
            alpha = None
    elif bpp in (1, 4):
        pal = np.frombuffer(
            blob[40 : 40 + 4 * n_pal], np.uint8
        ).reshape(n_pal, 4)[:, [2, 1, 0]]
        rows = np.frombuffer(blob[xor_start:xor_end], np.uint8).reshape(
            h, xor_stride
        )[::-1]
        bits = np.unpackbits(rows, axis=1)
        if bpp == 1:
            idx = bits[:, :w]
        else:
            nib = (bits.reshape(h, -1, 4) * [8, 4, 2, 1]).sum(axis=2)
            idx = nib[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("ICO palette index out of range")
        rgb = pal[idx]
        alpha = None
    else:
        raise ValueError(f"unsupported ICO DIB bit depth {bpp}")

    img = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    if alpha is not None and alpha.any():
        img[:, :, 3] = alpha
    elif len(mask_raw) >= and_stride * h:
        mrows = np.frombuffer(mask_raw, np.uint8).reshape(h, and_stride)[::-1]
        mask = np.unpackbits(mrows, axis=1)[:, :w]
        img[:, :, 3] = np.where(mask == 1, 0, 255)  # 1 = transparent
    return img


def decode_ico(data: bytes) -> np.ndarray:
    """ICO/CUR bytes -> the largest entry as (h, w, 4) uint8 RGBA."""
    entries = decode_ico_entries(data)
    return max(entries, key=lambda e: e.shape[0] * e.shape[1])


def encode_ico(img: np.ndarray) -> bytes:
    """(h, w[, 3|4]) uint8 -> single-entry PNG-based ICO (the modern
    favicon layout)."""
    from vtk_reserves_spark.sources.image import encode_png

    a = np.asarray(img, np.uint8)
    h, w = a.shape[:2]
    if h > 256 or w > 256:
        raise ValueError("ICO entries are at most 256x256")
    png = encode_png(a)
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(png), 6 + 16
    )
    return struct.pack("<HHH", 0, 1, 1) + entry + png
