"""ESRI Shapefile ingest/export — pure ``struct`` implementation of the
public shapefile spec (ESRI Shapefile Technical Description, 1998), no
GDAL/geopandas dependency.

The reference explodes shapefile geometries into rows carrying
``oid`` (record id), ``part``, ``type`` (shape type code) and ``layer``
(file basename) next to the coordinates (``_gui.py:991-1036``); we emit
the same exploded schema so downstream mesh/polygon reshapes and the
breakdown engine work unchanged.  Attribute (.dbf) columns are out of
scope for v1 — the reference only carries the geometry + oid through
its pipeline too.

Parsing happens driver-side (shapefiles are small next to the block
model); the exploded table is a regular distributed DataFrame.  For a
directory of many shapefiles, parallelize with
``spark.read.format("binaryFile")`` + ``mapInPandas`` over this module's
record parser.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

#: shape type codes from the spec
POINT, POLYLINE, POLYGON, MULTIPOINT = 1, 3, 5, 8
POINT_Z, POLYLINE_Z, POLYGON_Z = 11, 13, 15
_HAS_Z = {POINT_Z, POLYLINE_Z, POLYGON_Z}
_MULTI = {POLYLINE, POLYGON, POLYLINE_Z, POLYGON_Z}


def parse_shp(data: bytes):
    """Yield ``(oid, part, type, x, y, z)`` rows from .shp file bytes."""
    (code,) = struct.unpack(">i", data[0:4])
    if code != 9994:
        raise ValueError("not a shapefile (bad magic)")
    pos = 100  # header is 100 bytes
    oid = 0
    while pos + 8 <= len(data):
        _, length_words = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        rec = data[pos : pos + 2 * length_words]
        pos += 2 * length_words
        (stype,) = struct.unpack("<i", rec[0:4])
        if stype == 0:  # null shape
            oid += 1
            continue
        if stype in (POINT, POINT_Z):
            x, y = struct.unpack("<2d", rec[4:20])
            z = struct.unpack("<d", rec[20:28])[0] if stype == POINT_Z else 0.0
            yield (oid, 0, stype, x, y, z)
        elif stype == MULTIPOINT:
            (n,) = struct.unpack("<i", rec[36:40])
            for i in range(n):
                x, y = struct.unpack("<2d", rec[40 + 16 * i : 56 + 16 * i])
                yield (oid, 0, stype, x, y, 0.0)
        elif stype in _MULTI:
            nparts, npoints = struct.unpack("<2i", rec[36:44])
            parts = struct.unpack(f"<{nparts}i", rec[44 : 44 + 4 * nparts])
            pts_off = 44 + 4 * nparts
            xs_ys = struct.unpack(
                f"<{2 * npoints}d", rec[pts_off : pts_off + 16 * npoints]
            )
            zs = [0.0] * npoints
            if stype in _HAS_Z:
                z_off = pts_off + 16 * npoints + 16  # skip zmin/zmax
                zs = list(
                    struct.unpack(f"<{npoints}d", rec[z_off : z_off + 8 * npoints])
                )
            bounds = list(parts) + [npoints]
            for p in range(nparts):
                for i in range(bounds[p], bounds[p + 1]):
                    yield (oid, p, stype, xs_ys[2 * i], xs_ys[2 * i + 1], zs[i])
        else:
            raise ValueError(f"unsupported shape type {stype}")
        oid += 1


def read_shp(spark: SparkSession, path: str) -> DataFrame:
    """Shapefile -> exploded DataFrame ``(oid, part, type, layer,
    x, y, z)`` (reference schema, ``_gui.py:991-1036``)."""
    import pandas as pd

    with open(path, "rb") as fh:
        data = fh.read()
    layer = os.path.splitext(os.path.basename(path))[0]
    rows = list(parse_shp(data))
    pdf = pd.DataFrame(rows, columns=["oid", "part", "type", "x", "y", "z"])
    pdf["layer"] = layer
    # explicit schema: a header-only shapefile (zero records is legal —
    # GIS tools write them for empty layers) yields an all-object empty
    # frame that createDataFrame cannot infer a schema from
    return spark.createDataFrame(
        pdf[["oid", "part", "type", "layer", "x", "y", "z"]],
        schema="oid long, part long, type int, layer string, "
               "x double, y double, z double",
    )


def _bbox(pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def write_shp(records, path: str, shape_type: int = POLYLINE) -> None:
    """Minimal 2-D .shp writer (Point/PolyLine/Polygon) + .shx index —
    counterpart of the reference's shp sink (``_gui.py:1038-1080``).

    ``records``: for POINT, a list of (x, y); otherwise a list of shapes,
    each a list of parts, each part a list of (x, y)."""
    recs = []
    for shape in records:
        if shape_type == POINT:
            x, y = shape
            body = struct.pack("<i2d", POINT, x, y)
        else:
            parts = shape
            flat = [pt for part in parts for pt in part]
            x0, y0, x1, y1 = _bbox(flat)
            offs, acc = [], 0
            for part in parts:
                offs.append(acc)
                acc += len(part)
            body = struct.pack("<i4d2i", shape_type, x0, y0, x1, y1, len(parts), len(flat))
            body += struct.pack(f"<{len(offs)}i", *offs)
            for x, y in flat:
                body += struct.pack("<2d", x, y)
        recs.append(body)

    all_pts = []
    for shape in records:
        if shape_type == POINT:
            all_pts.append(shape)
        else:
            for part in shape:
                all_pts.extend(part)
    x0, y0, x1, y1 = _bbox(all_pts) if all_pts else (0.0, 0.0, 0.0, 0.0)

    def header(file_words: int) -> bytes:
        h = struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, file_words)
        h += struct.pack("<2i", 1000, shape_type)
        h += struct.pack("<8d", x0, y0, x1, y1, 0, 0, 0, 0)
        return h

    shp_words = 50 + sum(4 + len(b) // 2 for b in recs)
    shx_words = 50 + 4 * len(recs)
    with open(path, "wb") as shp, open(os.path.splitext(path)[0] + ".shx", "wb") as shx:
        shp.write(header(shp_words))
        shx.write(header(shx_words))
        off_words = 50
        for i, body in enumerate(recs):
            shp.write(struct.pack(">2i", i + 1, len(body) // 2))
            shp.write(body)
            shx.write(struct.pack(">2i", off_words, len(body) // 2))
            off_words += 4 + len(body) // 2
