"""PNG pixel tables — image <-> DataFrame conversion with a pure
zlib/struct PNG codec (public PNG spec, RFC 2083), no PIL dependency.

The reference loads PNGs as pixel tables ``(x, y, ch0..chN)``
(``_gui.py:1251-1264``) and reassembles images from tables on write
(``_gui.py:1266-1277``).  Supported subset: 8-bit greyscale / RGB /
RGBA, non-interlaced — enough for the reference's spectral-image path;
anything else raises.

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
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> sample count


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (filters 0-4 undone)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">i", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">2i5B", body)
            if depth != 8 or ctype not in _CHANNELS or interlace:
                raise ValueError(
                    "unsupported PNG (need 8-bit grey/RGB/RGBA, non-interlaced)"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    ch = _CHANNELS[ctype]
    stride = w * ch
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for row in range(h):
        f = raw[p]
        cur = np.frombuffer(raw[p + 1 : p + 1 + stride], np.uint8).astype(np.int32)
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[row] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 array -> PNG bytes (filter 0, one IDAT)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">i", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">2i5B", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


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
