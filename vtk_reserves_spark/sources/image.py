"""PNG pixel tables — image <-> DataFrame conversion with a pure
zlib/struct PNG codec (public PNG spec, RFC 2083), no PIL dependency.

The reference loads PNGs as pixel tables ``(x, y, ch0..chN)``
(``_gui.py:1251-1264``) and reassembles images from tables on write
(``_gui.py:1266-1277``).  The decoder covers the real-world feature
set: color types 0/2/3/4/6, bit depths 1/2/4/8/16, PLTE palettes with
tRNS alpha, Adam7 interlacing; the encoder writes 8-bit streams by
default plus the extended modes as options (decoder-parity fixtures
and export).

Decoding happens driver-side for a single file; for an image corpus use
``spark.read.format("binaryFile")`` and call :func:`decode_png` inside
``mapInPandas`` (the codec is plain bytes -> numpy, no global state).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel (3 = palette: 1 index per pixel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4 over ``h`` rows of ``stride`` bytes
    (``bpp`` = bytes per complete pixel, the filters' left-offset)."""
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for row in range(h):
        f = raw[p]
        cur = np.frombuffer(raw[p + 1 : p + 1 + stride], np.uint8).astype(np.int32)
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[row] = cur.astype(np.uint8)
        prev = cur
    return out


def _rows_to_samples(rows: np.ndarray, w: int, depth: int, ch: int) -> np.ndarray:
    """(h, stride) filtered bytes -> (h, w, ch) samples (uint8/uint16)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        a = rows[:, : w * ch * 2].reshape(h, w * ch, 2).astype(np.uint16)
        return ((a[:, :, 0] << 8) | a[:, :, 1]).reshape(h, w, ch)
    # sub-byte depths (grey / palette indices): unpack MSB-first
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : w * depth].reshape(h, w, depth)
    vals = np.zeros((h, w), np.uint8)
    for b in range(depth):
        vals = (vals << 1) | per[:, :, b]
    return vals[:, :, None]


def _expand_pixels(px: np.ndarray, ctype: int, depth: int, plte, trns):
    """Palette lookup / tRNS expansion; returns the user-facing array."""
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = px[:, :, 0]
        rgb = plte[np.clip(idx, 0, len(plte) - 1)]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            return np.dstack([rgb, alpha[np.clip(idx, 0, len(plte) - 1)]])
        return rgb
    if ctype == 0 and depth < 8:
        # scale sub-byte grey to full 8-bit range (PNG sample scaling)
        return (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return px


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) array.

    Full real-world feature set: color types 0/2/3/4/6, bit depths
    1/2/4/8/16 (16-bit returns uint16, everything else uint8), PLTE
    palettes with optional tRNS alpha, and Adam7 interlacing.  Palette
    images return RGB (RGBA when tRNS is present)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = depth = interlace = None
    plte = None
    trns = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">i", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">2i5B", body)
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if depth < 8 and ctype not in (0, 3):
                raise ValueError("sub-byte depth only valid for grey/palette")
            if depth == 16 and ctype == 3:
                raise ValueError("16-bit palette is not a valid PNG")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    ch = _CHANNELS[ctype]
    bpp = max(1, (depth * ch) // 8)

    def region(raw_bytes, rw, rh):
        stride = (rw * depth * ch + 7) // 8
        rows = _unfilter(raw_bytes, rh, stride, bpp)
        return _rows_to_samples(rows, rw, depth, ch), rh * (1 + stride)

    if interlace == 0:
        px, _ = region(raw, w, h)
    else:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, ch), np.uint16 if depth == 16 else np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            rw = (w - x0 + dx - 1) // dx
            rh = (h - y0 + dy - 1) // dy
            if rw == 0 or rh == 0:
                continue
            sub, used = region(raw[p:], rw, rh)
            p += used
            px[y0::dy, x0::dx] = sub
    return _expand_pixels(px, ctype, depth, plte, trns)

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">i", len(body)) + tag + body + struct.pack(">I", crc)


def _pack_rows(img: np.ndarray, depth: int) -> bytes:
    """(h, w, ch) samples -> filter-0 scanlines at ``depth`` bits."""
    h, w, ch = img.shape
    if depth == 8:
        return b"".join(b"\x00" + img[r].astype(np.uint8).tobytes() for r in range(h))
    if depth == 16:
        be = img.astype(">u2")
        return b"".join(b"\x00" + be[r].tobytes() for r in range(h))
    # sub-byte grey / palette indices: MSB-first packing per scanline
    out = bytearray()
    for r in range(h):
        vals = img[r, :, 0].astype(np.uint8)
        bits = ((vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1).ravel()
        out += b"\x00" + np.packbits(bits).tobytes()
    return bytes(out)


def encode_png(
    img: np.ndarray,
    palette: "np.ndarray | None" = None,
    trns: "bytes | None" = None,
    depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """(h, w[, channels]) array -> PNG bytes (filter 0 rows).

    Defaults write the classic 8-bit grey/RGB/RGBA stream.  Extended
    modes (decoder-parity fixtures and export): ``palette`` (Nx3
    uint8) writes color type 3 with ``img`` as indices and optional
    ``trns`` alpha; ``depth`` of 1/2/4 (grey levels or palette
    indices) or 16 (uint16 grey/RGB/RGBA); ``interlace=1`` writes the
    seven Adam7 sub-images."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if palette is not None:
        ctype = 3
        if ch != 1:
            raise ValueError("palette PNG takes a single index channel")
    elif depth < 8:
        ctype = 0
        if ch != 1:
            raise ValueError("sub-byte PNG must be grayscale")
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">2i5B", w, h, depth, ctype, 0, 0, interlace)
    if interlace == 0:
        raw = _pack_rows(arr, depth)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_pack_rows(sub, depth))
        raw = b"".join(parts)
    out = _SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
        if trns is not None:
            out += _png_chunk(b"tRNS", trns)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def png_to_df(spark: SparkSession, path: str) -> DataFrame:
    """PNG -> pixel table ``(x, y, ch0..chN)`` (``_gui.py:1251-1264``:
    x = column, y = row)."""
    import pandas as pd

    with open(path, "rb") as fh:
        img = decode_png(fh.read())
    h, w, ch = img.shape
    ys, xs = np.mgrid[0:h, 0:w]
    cols = {"x": xs.ravel().astype(np.int64), "y": ys.ravel().astype(np.int64)}
    for c in range(ch):
        cols[f"ch{c}"] = img[:, :, c].ravel().astype(np.int64)
    return spark.createDataFrame(pd.DataFrame(cols))


def iter_raster_strips(
    df: DataFrame,
    w: int,
    h: int,
    chans: list,
    dtype,
    strip_rows: int,
    x_col: str = "x",
    y_col: str = "y",
):
    """Yield ``(strip_h, w, ch)`` arrays covering rows 0..h-1 in order,
    WITHOUT materializing the raster on the driver.

    The frame is range-sorted by (row, col) and drained through
    ``toLocalIterator`` — Spark ships one sorted partition at a time,
    so driver memory is bounded by max(strip buffer, one partition of
    rows) regardless of raster size.  Missing pixels stay 0 (same
    zero-fill contract as the collect path)."""
    rows = (
        df.select(x_col, y_col, *chans)
        .sort(y_col, x_col)
        .toLocalIterator(prefetchPartitions=False)
    )
    nch = len(chans)
    start = 0
    buf = np.zeros((min(strip_rows, h), w, nch), dtype)
    for r in rows:
        y = r[1]
        while y >= start + buf.shape[0]:
            yield buf
            start += buf.shape[0]
            buf = np.zeros((min(strip_rows, h - start), w, nch), dtype)
        buf[y - start, r[0], :] = r[2:]
    while start < h:
        yield buf
        start += buf.shape[0]
        if start < h:
            buf = np.zeros((min(strip_rows, h - start), w, nch), dtype)


def _raster_shape(df: DataFrame, x_col: str, y_col: str):
    """(width, height, sorted channel columns) via ONE distributed agg."""
    from pyspark.sql import functions as F

    mx = df.agg(F.max(x_col), F.max(y_col)).first()
    chans = sorted(c for c in df.columns if c.startswith("ch"))
    return int(mx[0]) + 1, int(mx[1]) + 1, chans


def df_to_png(
    df: DataFrame,
    path: str,
    driver_threshold: int = 1 << 25,
    strip_rows: int = 512,
) -> None:
    """Pixel table -> PNG (inverse reshape, ``_gui.py:1266-1277``).

    Report-sized tables (``h*w*ch <= driver_threshold`` samples) use a
    single driver-side collect.  Larger rasters STREAM: sorted strips
    of ``strip_rows`` scanlines feed an incremental zlib compressor
    emitting one IDAT chunk per strip (PNG allows any number of IDATs
    — the concatenated stream is identical to the one-shot encode), so
    driver memory stays bounded while the raster does not."""
    pdf = None
    if driver_threshold:
        w, h, chans = _raster_shape(df, "x", "y")
        if h * w * len(chans) <= driver_threshold:
            pdf = df.toPandas()
    else:
        w, h, chans = _raster_shape(df, "x", "y")
    if pdf is not None:
        # assignment below is positional — no sort needed
        img = np.zeros((h, w, len(chans)), np.uint8)
        for ci, c in enumerate(chans):
            img[pdf["y"].to_numpy(), pdf["x"].to_numpy(), ci] = pdf[c].to_numpy()
        with open(path, "wb") as fh:
            fh.write(encode_png(img))
        return

    ctype = {1: 0, 3: 2, 4: 6}[len(chans)]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">i", len(body)) + tag + body + struct.pack(">I", crc)

    comp = zlib.compressobj()
    with open(path, "wb") as fh:
        fh.write(_SIG)
        fh.write(chunk(b"IHDR", struct.pack(">2i5B", w, h, 8, ctype, 0, 0, 0)))
        for strip in iter_raster_strips(
            df, w, h, chans, np.uint8, strip_rows, "x", "y"
        ):
            raw = b"".join(
                b"\x00" + strip[r].tobytes() for r in range(strip.shape[0])
            )
            out = comp.compress(raw)
            if out:
                fh.write(chunk(b"IDAT", out))
        fh.write(chunk(b"IDAT", comp.flush()))
        fh.write(chunk(b"IEND", b""))
