"""Windows BMP codec — pure ``struct``/numpy (public BITMAPINFOHEADER
format).  The fourth web-adjacent raster format after JPEG/PNG/GIF;
screenshots and legacy exports still carry it, so `decode_media`
decodes it for real like the other pure codecs.

Supported: BITMAPINFOHEADER (or larger V4/V5 headers), uncompressed
BI_RGB (8-bit palette / 16-bit RGB555 / 24-bit BGR / 32-bit BGRA),
BI_RLE8 and BI_RLE4 runs (encoded + absolute modes, EOL/EOB/delta
escapes), BI_BITFIELDS with arbitrary 16/32-bit channel masks (each
channel rescaled to 0..255), bottom-up and top-down row orders, 4-byte
row padding.  The encoder writes standard bottom-up 24-bit BI_RGB.
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
    if comp not in (0, 1, 2, 3):
        raise ValueError(
            f"unsupported BMP compression {comp} "
            "(BI_RGB / RLE8 / RLE4 / BITFIELDS)"
        )
    if comp == 0 and bpp not in (8, 16, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if comp == 3 and bpp not in (16, 32):
        raise ValueError("BI_BITFIELDS requires 16- or 32-bit pixels")
    if comp == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8-bit pixels")
    if comp == 2 and bpp != 4:
        raise ValueError("BI_RLE4 requires 4-bit pixels")
    top_down = h_raw < 0
    h = abs(h_raw)
    if comp in (1, 2) and top_down:
        raise ValueError("RLE BMPs are bottom-up by definition")

    palette = None
    if bpp in (4, 8):
        n = clr_used or (1 << bpp)
        ptab = np.frombuffer(
            data[14 + hdr_size : 14 + hdr_size + 4 * n], np.uint8
        ).reshape(n, 4)
        palette = ptab[:, [2, 1, 0]]  # BGRA table -> RGB

    if comp in (1, 2):
        idx = _decode_rle(data[pixel_off:], w, h, comp)
        idx = idx[::-1]  # stored bottom-up
        return palette[np.clip(idx, 0, len(palette) - 1)]
    stride = ((w * bpp // 8) + 3) & ~3
    rows = np.frombuffer(
        data[pixel_off : pixel_off + stride * h], np.uint8
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        return palette[np.clip(idx, 0, len(palette) - 1)]
    if comp == 3 or bpp == 16:
        # channel masks: BITMAPV2+/V4 headers carry them at header
        # offset 40 (file byte 54); a plain 40-byte BITMAPINFOHEADER
        # with BI_BITFIELDS is followed immediately by the 3 DWORD
        # masks — the SAME file position, so one read covers both.
        if comp == 3:
            if len(data) < 66:
                raise ValueError("truncated BMP: BI_BITFIELDS masks missing")
            rm, gm, bm = struct.unpack("<III", data[54:66])
        else:  # 16-bit BI_RGB defaults to RGB555
            rm, gm, bm = 0x7C00, 0x03E0, 0x001F
        word = np.uint16 if bpp == 16 else np.uint32
        px = (
            rows[:, : w * (bpp // 8)]
            .reshape(h, w, bpp // 8)
            .view(word)[:, :, 0]
            .astype(np.uint64)
        )
        out = np.zeros((h, w, 3), np.uint8)
        for ch, mask in enumerate((rm, gm, bm)):
            if mask == 0:
                continue
            shift = (mask & -mask).bit_length() - 1
            top = mask >> shift
            vals = (px & mask) >> shift
            # scale the channel's full range to 0..255
            out[:, :, ch] = (vals * 255 // top).astype(np.uint8)
        return out
    nch = bpp // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    return px[:, :, [2, 1, 0]].copy()  # BGR(A) -> RGB


def _decode_rle(data: bytes, w: int, h: int, comp: int) -> np.ndarray:
    """BI_RLE8 (comp 1) / BI_RLE4 (comp 2) -> (h, w) palette indices in
    STORED row order (bottom-up).  Escapes: 0,0 end-of-line; 0,1
    end-of-bitmap; 0,2 delta; 0,n absolute run (word-aligned)."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if comp == 1:
                px = [val] * cnt
            else:
                px = [(val >> 4) if k % 2 == 0 else (val & 15) for k in range(cnt)]
            take = min(cnt, w - x)
            out[y, x : x + take] = px[:take]
            x += take
            continue
        if val == 0:  # end of line
            x = 0
            y += 1
            if y >= h:
                break
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("truncated BMP RLE delta")
            x = min(w, x + data[i])
            y += data[i + 1]
            i += 2
            if y >= h:
                break
        else:  # absolute mode: val literal pixels
            if comp == 1:
                need = val
                px = list(data[i : i + need])
                i += need + (need & 1)  # word align
            else:
                need = (val + 1) // 2
                raw = data[i : i + need]
                if len(raw) < need:
                    raise ValueError("truncated BMP RLE absolute run")
                px = []
                for k in range(val):
                    b = raw[k // 2]
                    px.append((b >> 4) if k % 2 == 0 else (b & 15))
                i += need + (need & 1)
            if len(px) < val:
                raise ValueError("truncated BMP RLE absolute run")
            take = min(val, w - x)
            out[y, x : x + take] = px[:take]
            x += take
    return out


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
