"""GeoTIFF ingest/export — minimal pure-``struct`` baseline-TIFF codec
(public TIFF 6.0 + GeoTIFF specs): uncompressed, LZW (early-change
variant), Deflate and PackBits strips, the horizontal-differencing
predictor, uint8/float32 samples, ModelPixelScale + ModelTiepoint
affine georeferencing, strip AND tiled layouts.  No GDAL/rasterio
dependency; other predictors raise.

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


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, initial
    9-bit codes, Clear=256 / EOI=257, and the "early change" rule (the
    code width grows one code EARLIER than the GIF variant)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # missing EOI: tolerated
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early change: widen when the NEXT entry would need more bits
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Inverse of :func:`_tiff_lzw_decode` (fixture/export side)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # early-change mirror: the encoder's table runs ONE entry ahead
        # of the decoder's (it assigns after writing, the decoder after
        # the NEXT read), so it widens at 2^width while the decoder
        # widens at 2^width - 1 — the libtiff-compatible pairing
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code == 4094:
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        put(table[prev], width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Simple PackBits writer: literal runs split at 128, repeat runs
    for >= 3 equal bytes."""
    out = bytearray()
    i = 0
    n = len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            while lit_start < i:
                take = min(128, i - lit_start)
                out += bytes([take - 1]) + data[lit_start : lit_start + take]
                lit_start += take
            out += bytes([257 - run, data[i]])
            i += run
            lit_start = i
        else:
            i += run
    while lit_start < i:
        take = min(128, i - lit_start)
        out += bytes([take - 1]) + data[lit_start : lit_start + take]
        lit_start += take
    return bytes(out)


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
    if comp not in (1, 5, 8, 32946, 32773):
        raise ValueError(
            f"unsupported TIFF compression {comp} (supported: none, LZW, "
            "Deflate, PackBits)"
        )
    if tags.get(284, (1,))[0] != 1:
        # PlanarConfiguration=2 stores each band as its own strip set;
        # reshaping it as pixel-interleaved would silently scramble bands
        raise ValueError("only chunky (PlanarConfiguration=1) TIFF supported")
    predictor = tags.get(317, (1,))[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    def decompress(chunk: bytes) -> bytes:
        if comp == 5:
            return _tiff_lzw_decode(chunk)
        if comp in (8, 32946):
            import zlib

            return zlib.decompress(chunk)
        if comp == 32773:
            return _packbits_decode(chunk)
        return chunk

    def to_samples(raw: bytes) -> np.ndarray:
        if fmt == 3 and bits[0] == 32:
            a = np.frombuffer(raw, e + "f4")
        elif fmt in (1, 4) and bits[0] == 8:
            a = np.frombuffer(raw, np.uint8)
        else:
            raise ValueError(f"unsupported sample format {fmt}/{bits[0]}bit")
        if a.dtype.byteorder == ">":
            # Arrow rejects big-endian buffers — swap 'MM' to native
            a = a.astype(a.dtype.newbyteorder("="))
        return a

    def unpredict(a: np.ndarray) -> np.ndarray:
        if predictor != 2:
            return a
        if a.dtype != np.uint8:
            raise ValueError("horizontal predictor only supported for uint8")
        # undo horizontal differencing: per-row, per-channel cumulative
        # sum mod 256 (TIFF 6.0 §14); rows restart per strip/tile row,
        # which the per-region application below respects
        return np.cumsum(a, axis=1, dtype=np.uint8)

    if 322 in tags:  # tiled layout (TIFF 6.0 §15)
        tw, th = tags[322][0], tags[323][0]
        offsets, counts = tags[324], tags[325]
        across = -(-w // tw)
        down = -(-h // th)
        if len(offsets) != across * down:
            raise ValueError("TIFF tile count does not match geometry")
        full = None
        for i, (o, c) in enumerate(zip(offsets, counts)):
            tile = to_samples(decompress(data[o : o + c]))
            tile = tile[: th * tw * spp].reshape(th, tw, spp)
            tile = unpredict(tile)
            if full is None:
                full = np.zeros((down * th, across * tw, spp), tile.dtype)
            ty, tx = divmod(i, across)
            full[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
        arr = full[:h, :w]
    else:
        offsets = tags[273]
        counts = tags[279]
        raw = b"".join(decompress(data[o : o + c]) for o, c in zip(offsets, counts))
        arr = unpredict(to_samples(raw).reshape(h, w, spp))
    scale = tags.get(_PIXEL_SCALE)
    tie = tags.get(_TIEPOINT)
    return arr, scale, tie


def encode_tiff(
    arr: np.ndarray, pixel_scale=None, tiepoint=None,
    compression: int = 1, predictor: int = 1,
) -> bytes:
    """(h, w[, bands]) uint8/float32 array -> single-strip TIFF bytes.

    ``compression``: 1 none, 5 LZW, 8 Deflate, 32773 PackBits.
    ``predictor=2`` applies horizontal differencing first (uint8 only —
    the standard pairing with LZW/Deflate on smooth rasters)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    if arr.dtype == np.uint8:
        bits, fmt = 8, 1
    else:
        arr = arr.astype(np.float32)
        bits, fmt = 32, 3
    if predictor == 2:
        if arr.dtype != np.uint8:
            raise ValueError("horizontal predictor only supported for uint8")
        d = arr.copy()
        d[:, 1:, :] = arr[:, 1:, :] - arr[:, :-1, :]  # uint8 wraps mod 256
        strip = d.tobytes()
    elif predictor == 1:
        strip = arr.tobytes()
    else:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if compression == 5:
        strip = _tiff_lzw_encode(strip)
    elif compression in (8, 32946):
        import zlib

        strip = zlib.compress(strip)
    elif compression == 32773:
        strip = _packbits_encode(strip)
    elif compression != 1:
        raise ValueError(f"unsupported TIFF compression {compression}")

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
    add(259, 3, [compression], "H")
    add(262, 3, [1], "H")
    if predictor != 1:
        add(317, 3, [predictor], "H")
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
