"""EXIF parser/builder tests (sources/exif.py + multimodal
exif_metadata): byte orders, envelopes, GPS sign resolution,
inline-vs-offset values, corruption quarantine."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vtk_reserves_spark.sources.exif import (
    build_exif,
    extract_exif,
    insert_exif_jpeg,
    parse_exif,
)

FIELDS = dict(
    make="NikonX",
    model="Cam 5",
    orientation=6,
    datetime_original="2024:01:02 03:04:06",
    exposure_time=(1, 250),
    fnumber=(28, 10),
    iso=400,
    focal_length=(50, 1),
    width=4000,
    height=3000,
    gps_lat=51.5074,
    gps_lon=-0.1278,
    gps_alt=-12.5,
)


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_both_orders(bo):
    p = parse_exif(build_exif(FIELDS, bo))
    assert p["make"] == "NikonX" and p["model"] == "Cam 5"
    assert p["orientation"] == 6
    assert p["exposure_time"] == 1 / 250
    assert p["fnumber"] == 2.8
    assert p["iso"] == 400 and p["focal_length"] == 50.0
    assert p["width"] == 4000 and p["height"] == 3000
    assert abs(p["gps_lat"] - 51.5074) < 1e-4
    assert abs(p["gps_lon"] + 0.1278) < 1e-4
    assert p["gps_alt"] == -12.5


def test_gps_dms_exact_and_positive_alt():
    p = parse_exif(
        build_exif(
            {
                "gps_lat_dms": ("S", 10, 30, 155),
                "gps_lon_dms": ("E", 2, 0, 0),
                "gps_alt": (125, 10),
            }
        )
    )
    assert p["gps_lat"] == -(10 + 30 / 60.0 + 15.5 / 3600.0)
    assert p["gps_lon"] == 2.0
    assert p["gps_alt"] == 12.5


def test_envelopes():
    from vtk_reserves_spark.sources.image import _png_chunk, encode_png
    from vtk_reserves_spark.sources.jpeg import encode_jpeg

    blob = build_exif(FIELDS)
    img = np.full((8, 8), 90, np.uint8)
    jpeg = insert_exif_jpeg(encode_jpeg(img), blob)
    assert extract_exif(jpeg)["make"] == "NikonX"
    png = encode_png(img)
    png = png[:-12] + _png_chunk(b"eXIf", blob) + png[-12:]
    assert extract_exif(png)["model"] == "Cam 5"
    chunk = b"EXIF" + struct.pack("<I", len(blob)) + blob
    if len(blob) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert extract_exif(riff)["iso"] == 400
    assert extract_exif(blob)["fnumber"] == 2.8  # raw TIFF


def test_no_exif_and_bad_container():
    from vtk_reserves_spark.sources.jpeg import encode_jpeg

    assert extract_exif(encode_jpeg(np.full((8, 8), 5, np.uint8))) is None
    with pytest.raises(ValueError):
        extract_exif(b"\x00\x01\x02\x03 not a container")


def test_corrupt_blob_raises():
    blob = build_exif(FIELDS)
    with pytest.raises(ValueError):
        parse_exif(blob[:10])  # IFD truncated away
    with pytest.raises(ValueError):
        parse_exif(b"XX" + blob[2:])  # bad byte order
    # offset-valued entry pointing outside the blob
    with pytest.raises(ValueError):
        parse_exif(blob[: len(blob) // 2])


def test_spark_operator_quarantine(spark):
    from vtk_reserves_spark.operators.multimodal import exif_metadata

    blob = build_exif(FIELDS)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"\xff\xd8garbage"))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in exif_metadata(df, on_error="null").collect()
    }
    assert rows[1]["make"] == "NikonX" and rows[1]["error"] is None
    assert rows[2]["make"] is None
    # a JPEG with no APP1 is "no exif", not an error; truncated marker
    # walk just finds nothing
    assert rows[2]["container"] == "jpeg"

    with pytest.raises(ValueError):
        exif_metadata(df, on_error="bogus")
