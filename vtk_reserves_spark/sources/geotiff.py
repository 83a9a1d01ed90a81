"""GeoTIFF ingest/export — minimal pure-``struct`` baseline-TIFF codec
(public TIFF 6.0 + GeoTIFF specs): uncompressed strips, uint8/float32
samples, ModelPixelScale + ModelTiepoint affine georeferencing.  No
GDAL/rasterio dependency; anything fancier (compression, tiles) raises.

The reference reads GeoTIFF bands into rows carrying both the pixel
indices and the affine-transformed world coordinates
(``vulcan_save_tri.py:189-249``) and writes single-band float rasters
back (``vulcan_save_tri.py:251-280``); :func:`geotiff_to_df` /
:func:`df_to_geotiff` mirror that row model ``(xc, yc, x, y, ch0..)``.
The affine is applied as COLUMN EXPRESSIONS on the distributed frame —
only the raw band matrix is driver-side.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_PIXEL_SCALE, _TIEPOINT = 33550, 33922


def decode_tiff(data: bytes):
    """TIFF bytes -> (array (h, w, bands), pixel_scale, tiepoint)."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack(e + "H", data[2:4])
    if magic != 42:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    (n_tags,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
    type_fmt = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}
    for t in range(n_tags):
        off = ifd_off + 2 + 12 * t
        tag, typ, cnt = struct.unpack(e + "HHI", data[off : off + 8])
        size = type_size.get(typ, 4) * cnt
        if size <= 4:
            raw = data[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(e + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        if typ in type_fmt:
            tags[tag] = struct.unpack(e + str(cnt) + type_fmt[typ], raw)
    w = tags[256][0]
    h = tags[257][0]
    bits = tags.get(258, (8,))
    spp = tags.get(277, (1,))[0]
    comp = tags.get(259, (1,))[0]
    fmt = tags.get(339, (1,))[0]
    if comp != 1:
        raise ValueError("only uncompressed TIFF supported")
    if tags.get(284, (1,))[0] != 1:
        # PlanarConfiguration=2 stores each band as its own strip set;
        # reshaping it as pixel-interleaved would silently scramble bands
        raise ValueError("only chunky (PlanarConfiguration=1) TIFF supported")
    offsets = tags[273]
    counts = tags[279]
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    if fmt == 3 and bits[0] == 32:
        arr = np.frombuffer(raw, e + "f4")
    elif fmt in (1, 4) and bits[0] == 8:
        arr = np.frombuffer(raw, np.uint8)
    else:
        raise ValueError(f"unsupported sample format {fmt}/{bits[0]}bit")
    if arr.dtype.byteorder == ">":
        # Arrow rejects big-endian buffers — swap 'MM' samples to native
        arr = arr.astype(arr.dtype.newbyteorder("="))
    arr = arr.reshape(h, w, spp)
    scale = tags.get(_PIXEL_SCALE)
    tie = tags.get(_TIEPOINT)
    return arr, scale, tie


def encode_tiff(arr: np.ndarray, pixel_scale=None, tiepoint=None) -> bytes:
    """(h, w[, bands]) uint8/float32 array -> single-strip TIFF bytes."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    if arr.dtype == np.uint8:
        bits, fmt = 8, 1
    else:
        arr = arr.astype(np.float32)
        bits, fmt = 32, 3
    strip = arr.tobytes()

    entries = []  # (tag, type, count, packed-or-(data))
    extra: list[bytes] = []

    def add(tag, typ, vals, vfmt):
        cnt = len(vals)
        size = {3: 2, 4: 4, 12: 8}[typ] * cnt
        body = struct.pack("<" + str(cnt) + vfmt, *vals)
        entries.append([tag, typ, cnt, body if size <= 4 else None, body])

    add(256, 4, [w], "I")
    add(257, 4, [h], "I")
    add(258, 3, [bits] * spp, "H")
    add(259, 3, [1], "H")
    add(262, 3, [1], "H")
    add(273, 4, [0], "I")  # strip offset patched below
    add(277, 3, [spp], "H")
    add(278, 4, [h], "I")
    add(279, 4, [len(strip)], "I")
    add(339, 3, [fmt] * spp, "H")
    if pixel_scale is not None:
        add(_PIXEL_SCALE, 12, list(pixel_scale), "d")
    if tiepoint is not None:
        add(_TIEPOINT, 12, list(tiepoint), "d")
    entries.sort(key=lambda x: x[0])

    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    out_extra = b""
    for ent in entries:
        if ent[3] is None:
            ent[3] = struct.pack("<I", data_off + len(out_extra))
            out_extra += ent[4]
    strip_off = data_off + len(out_extra)
    for ent in entries:
        if ent[0] == 273:
            ent[3] = struct.pack("<I", strip_off)

    buf = struct.pack("<2sHI", b"II", 42, ifd_off)
    buf += struct.pack("<H", n)
    for tag, typ, cnt, packed, _ in entries:
        buf += struct.pack("<HHI", tag, typ, cnt) + packed.ljust(4, b"\x00")
    buf += struct.pack("<I", 0)  # next IFD
    buf += out_extra + strip
    return buf


def geotiff_to_df(spark: SparkSession, path: str) -> DataFrame:
    """GeoTIFF -> rows ``(xc, yc, x, y, ch0..)`` with the affine applied
    as column expressions (``vulcan_save_tri.py:189-249`` row model:
    xc/yc pixel indices, x/y world coordinates of the pixel center)."""
    import pandas as pd
    from pyspark.sql import functions as F

    with open(path, "rb") as fh:
        arr, scale, tie = decode_tiff(fh.read())
    h, w, bands = arr.shape
    ys, xs = np.mgrid[0:h, 0:w]
    cols = {"xc": xs.ravel().astype(np.int64), "yc": ys.ravel().astype(np.int64)}
    for b in range(bands):
        cols[f"ch{b}"] = arr[:, :, b].ravel()
    df = spark.createDataFrame(pd.DataFrame(cols))
    sx, sy = (scale[0], scale[1]) if scale else (1.0, 1.0)
    # ModelTiepoint maps raster (i, j) -> world (x, y); solve back to the
    # top-left corner so non-origin tiepoints georeference correctly
    ox = tie[3] - tie[0] * sx if tie else 0.0
    oy = tie[4] + tie[1] * sy if tie else 0.0
    # raster origin is the top-left corner; world y decreases with row
    x = F.lit(ox) + (F.col("xc") + F.lit(0.5)) * F.lit(sx)
    y = F.lit(oy) - (F.col("yc") + F.lit(0.5)) * F.lit(sy)
    chs = [f"ch{b}" for b in range(bands)]
    return df.select("xc", "yc", x.alias("x"), y.alias("y"), *chs)


def df_to_geotiff(
    df: DataFrame,
    path: str,
    pixel_scale=None,
    tiepoint=None,
    driver_threshold: int = 1 << 25,
    strip_rows: int = 512,
) -> None:
    """Pixel table -> single/multi-band GeoTIFF (float32), inverse of
    :func:`geotiff_to_df` (``vulcan_save_tri.py:251-280``).

    Report-sized rasters (``h*w*bands <= driver_threshold`` samples)
    collect once; larger ones STREAM sorted ``strip_rows``-scanline
    strips straight to disk as a multi-strip TIFF (strip data first,
    IFD written after the last strip, header's IFD pointer patched by
    seek) — driver memory stays bounded by one strip + one sorted
    partition.  :func:`decode_tiff` already concatenates multi-strip
    sample data, so round-trips are unchanged."""
    from vtk_reserves_spark.sources.image import (
        _raster_shape,
        iter_raster_strips,
    )

    w, h, chans = _raster_shape(df, "xc", "yc")
    if driver_threshold and h * w * len(chans) <= driver_threshold:
        pdf = df.toPandas()  # assignment below is positional — no sort needed
        arr = np.zeros((h, w, len(chans)), np.float32)
        for ci, c in enumerate(chans):
            arr[pdf["yc"].to_numpy(), pdf["xc"].to_numpy(), ci] = pdf[c].to_numpy()
        with open(path, "wb") as fh:
            fh.write(encode_tiff(arr, pixel_scale, tiepoint))
        return

    spp = len(chans)
    with open(path, "wb") as fh:
        # header with a placeholder IFD offset; strips stream next, the
        # IFD lands wherever the data ends, then the pointer is patched
        fh.write(struct.pack("<2sHI", b"II", 42, 0))
        strip_offs: list[int] = []
        strip_cnts: list[int] = []
        for strip in iter_raster_strips(
            df, w, h, chans, np.float32, strip_rows, "xc", "yc"
        ):
            raw = strip.tobytes()
            strip_offs.append(fh.tell())
            strip_cnts.append(len(raw))
            fh.write(raw)

        entries = []

        def add(tag, typ, vals, vfmt):
            entries.append(
                (tag, typ, len(vals), struct.pack("<" + str(len(vals)) + vfmt, *vals))
            )

        add(256, 4, [w], "I")
        add(257, 4, [h], "I")
        add(258, 3, [32] * spp, "H")
        add(259, 3, [1], "H")
        add(262, 3, [1], "H")
        add(273, 4, strip_offs, "I")
        add(277, 3, [spp], "H")
        add(278, 4, [min(strip_rows, h)], "I")
        add(279, 4, strip_cnts, "I")
        add(339, 3, [3] * spp, "H")
        if pixel_scale is not None:
            add(_PIXEL_SCALE, 12, list(pixel_scale), "d")
        if tiepoint is not None:
            add(_TIEPOINT, 12, list(tiepoint), "d")
        entries.sort(key=lambda x: x[0])

        ifd_off = fh.tell()
        n = len(entries)
        data_off = ifd_off + 2 + 12 * n + 4
        extra = b""
        fh.write(struct.pack("<H", n))
        for tag, typ, cnt, body in entries:
            if len(body) <= 4:
                packed = body.ljust(4, b"\x00")
            else:
                packed = struct.pack("<I", data_off + len(extra))
                extra += body
            fh.write(struct.pack("<HHI", tag, typ, cnt) + packed)
        fh.write(struct.pack("<I", 0))  # next IFD
        fh.write(extra)
        fh.seek(4)
        fh.write(struct.pack("<I", ifd_off))
