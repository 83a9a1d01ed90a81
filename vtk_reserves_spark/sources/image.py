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


def df_to_png(df: DataFrame, path: str) -> None:
    """Pixel table -> PNG (inverse reshape, ``_gui.py:1266-1277``) —
    ordered driver-side collect of a report-sized image table."""
    pdf = df.toPandas()  # assignment below is positional — no sort needed
    w = int(pdf["x"].max()) + 1
    h = int(pdf["y"].max()) + 1
    chans = sorted(c for c in pdf.columns if c.startswith("ch"))
    img = np.zeros((h, w, len(chans)), np.uint8)
    for ci, c in enumerate(chans):
        img[pdf["y"].to_numpy(), pdf["x"].to_numpy(), ci] = pdf[c].to_numpy()
    with open(path, "wb") as fh:
        fh.write(encode_png(img))
