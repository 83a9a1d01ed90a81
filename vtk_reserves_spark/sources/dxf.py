"""DXF ingest/export — minimal pure-text implementation of the public
AutoCAD DXF ASCII format (group-code / value pairs), no ezdxf
dependency.

The reference explodes DXF entities into polyline rows with
``oid``/``layer`` columns (``_gui.py:1088-1126``); we emit the same
exploded schema.  Supported entities: POINT, LINE, LWPOLYLINE, POLYLINE
(+VERTEX/SEQEND), 3DFACE.  Anything else is skipped (the reference
likewise handles a fixed entity subset).  Parsing is driver-side; for a
directory of files use ``binaryFile`` + ``mapInPandas`` over
:func:`parse_dxf`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _pairs(text: str):
    lines = text.splitlines()
    for i in range(0, len(lines) - 1, 2):
        yield lines[i].strip(), lines[i + 1].strip()


def parse_dxf(text: str):
    """Yield ``(oid, etype, layer, n, x, y, z)`` rows (``n`` = vertex
    sequence within the entity, reference row model)."""
    oid = -1
    in_entities = False
    entity = None
    layer = ""
    elev = 0.0
    pts: list[list[float]] = []
    cur: list[float] | None = None

    def flush():
        nonlocal pts, cur, elev
        rows = []
        if entity and pts:
            for n, p in enumerate(pts):
                # LWPOLYLINE is planar: its vertices carry no 30 code,
                # the entity's group-38 elevation IS their z — without
                # it every contour collapses to z=0
                z = elev if entity == "LWPOLYLINE" else p[2]
                rows.append((oid, entity, layer, n, p[0], p[1], z))
        pts = []
        cur = None
        elev = 0.0
        return rows

    expect_section_name = False
    for code, val in _pairs(text):
        if expect_section_name:
            # section name arrives as a code-2 pair after 0/SECTION
            if code == "2":
                in_entities = val == "ENTITIES"
            expect_section_name = False
            continue
        if code == "0":
            if val == "SECTION":
                entity = None
                expect_section_name = True
            elif val == "ENDSEC":
                if in_entities:
                    yield from flush()
                in_entities = False
            elif in_entities:
                if val == "VERTEX":
                    cur = [0.0, 0.0, 0.0]
                    pts.append(cur)
                    continue
                if val == "SEQEND":
                    yield from flush()
                    entity = None
                    continue
                yield from flush()
                entity = val if val in (
                    "POINT", "LINE", "LWPOLYLINE", "POLYLINE", "3DFACE"
                ) else None
                if entity:
                    oid += 1
                cur = None
        elif in_entities and entity:
            if code == "8":
                layer = val
            elif code in ("10", "11", "12", "13"):
                if entity == "LWPOLYLINE" or (entity == "POLYLINE" and cur is None and code == "10"):
                    # LWPOLYLINE: each 10 starts a vertex; POLYLINE header 10 ignored
                    if entity == "LWPOLYLINE":
                        cur = [float(val), 0.0, 0.0]
                        pts.append(cur)
                    continue
                idx = int(code) - 10
                if entity in ("LINE", "3DFACE"):
                    while len(pts) <= idx:
                        pts.append([0.0, 0.0, 0.0])
                    pts[idx][0] = float(val)
                elif cur is not None:
                    cur[0] = float(val)
                elif entity == "POINT":
                    cur = [float(val), 0.0, 0.0]
                    pts.append(cur)
            elif code in ("20", "21", "22", "23"):
                idx = int(code) - 20
                if entity in ("LINE", "3DFACE"):
                    while len(pts) <= idx:
                        pts.append([0.0, 0.0, 0.0])
                    pts[idx][1] = float(val)
                elif entity == "LWPOLYLINE" and pts:
                    pts[-1][1] = float(val)
                elif cur is not None:
                    cur[1] = float(val)
            elif code == "38" and entity == "LWPOLYLINE":
                elev = float(val)
            elif code in ("30", "31", "32", "33"):
                idx = int(code) - 30
                if entity in ("LINE", "3DFACE"):
                    while len(pts) <= idx:
                        pts.append([0.0, 0.0, 0.0])
                    pts[idx][2] = float(val)
                elif entity == "LWPOLYLINE" and pts:
                    pts[-1][2] = float(val)
                elif cur is not None:
                    cur[2] = float(val)
    yield from flush()


def read_dxf(spark: SparkSession, path: str) -> DataFrame:
    """DXF -> exploded DataFrame ``(oid, type, layer, n, x, y, z)``."""
    import pandas as pd

    with open(path, "r", encoding="latin-1") as fh:
        rows = list(parse_dxf(fh.read()))
    pdf = pd.DataFrame(rows, columns=["oid", "type", "layer", "n", "x", "y", "z"])
    # explicit schema: an ENTITIES-free DXF (legal — header-only exports
    # exist) yields an all-object empty frame createDataFrame cannot
    # infer from (same guard as shapefile.py)
    return spark.createDataFrame(
        pdf,
        schema="oid long, type string, layer string, n long, "
               "x double, y double, z double",
    )


def write_dxf(polylines, path: str, layer: str = "0") -> None:
    """Polylines -> minimal DXF (LWPOLYLINE entities) — counterpart of
    the reference's dxf sink (``_gui.py:1128-1155``).  ``polylines`` is a
    list of [(x, y[, z]), ...] vertex lists."""
    out = ["0", "SECTION", "2", "ENTITIES"]
    for pl in polylines:
        out += ["0", "LWPOLYLINE", "8", layer, "90", str(len(pl))]
        for p in pl:
            out += ["10", f"{p[0]:.9g}", "20", f"{p[1]:.9g}"]
    out += ["0", "ENDSEC", "0", "EOF"]
    with open(path, "w", encoding="latin-1") as fh:
        fh.write("\n".join(out) + "\n")
