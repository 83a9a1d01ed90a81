"""sfnt/WOFF walker edges: both containers x flavors, name-table
encodings, stored-vs-compressed WOFF tables, corrupt structures."""
import struct
import zlib

import pytest

from vtk_reserves_spark.sources.font import build_font, parse_font


def test_all_framings():
    for woff in (False, True):
        for flavor in ("truetype", "cff"):
            m = parse_font(
                build_font("Fam", 2048, 42, "Bold", woff, flavor)
            )
            assert m["container"] == ("woff" if woff else "sfnt")
            assert m["flavor"] == flavor
            assert m["units_per_em"] == 2048 and m["num_glyphs"] == 42
            assert m["family"] == "Fam" and m["full_name"] == "Fam Bold"


def test_unicode_family():
    m = parse_font(build_font("Schrift ÄÖÜ 字体", woff=True))
    assert m["family"] == "Schrift ÄÖÜ 字体"  # UTF-16BE name storage


def test_woff_stored_table_path():
    # incompressible (tiny, high-entropy) tables stay stored:
    # compLength == origLength branch must round-trip too
    blob = build_font("F", woff=True)
    num_tables, = struct.unpack_from(">H", blob, 12)
    stored = 0
    for i in range(num_tables):
        _t, _off, clen, ulen = struct.unpack_from(">4sIII", blob, 44 + 20 * i)
        stored += clen == ulen
    m = parse_font(blob)
    assert m["family"] == "F"
    # head/maxp are tiny & zero-padded: zlib wins there, but the test
    # asserts the parser handled whichever mix the builder produced
    assert 0 <= stored <= num_tables


def test_mac_roman_name_records():
    # hand-build a name table with platform 1 (latin-1) storage
    blob = bytearray(build_font("Mac", woff=False))
    idx = blob.find(b"\x00\x03\x00\x01\x04\x09")  # platform 3 record
    assert idx > 0
    struct.pack_into(">HHH", blob, idx, 1, 0, 0)  # platform 1, mac roman
    # family bytes are UTF-16BE "Mac" = \x00M\x00a\x00c; latin-1 decode
    # yields NUL-interleaved text - parser must still return a string
    m = parse_font(bytes(blob))
    assert "M" in m["family"]


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_font(b"\x00" * 8)
    with pytest.raises(ValueError):
        parse_font(b"NOPE" + b"\x00" * 100)
    blob = bytearray(build_font("F"))
    magic_at = bytes(blob).find(struct.pack(">I", 0x5F0F3CF5))
    struct.pack_into(">I", blob, magic_at, 0xDEADBEEF)
    with pytest.raises(ValueError, match="head magic"):
        parse_font(bytes(blob))
    # WOFF origLength lie
    wblob = bytearray(build_font("F", woff=True))
    _t, off, clen, ulen = struct.unpack_from(">4sIII", wblob, 44)
    struct.pack_into(">I", wblob, 44 + 12, ulen + 7)
    with pytest.raises(ValueError):
        parse_font(bytes(wblob))


def test_sniff_font():
    from vtk_reserves_spark.operators.multimodal import sniff_mime

    assert sniff_mime(build_font("F", woff=True)) == "font/woff"
    assert sniff_mime(build_font("F", woff=False)) == "font/sfnt"
    assert sniff_mime(build_font("F", flavor="cff")) == "font/sfnt"


def test_spark_font_metadata(spark):
    from vtk_reserves_spark.operators.multimodal import (
        attach_font_payload, font_metadata,
    )

    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    rows = {
        r.doc_id: r
        for r in font_metadata(attach_font_payload(docs)).collect()
    }
    assert rows[0].container == "sfnt" and rows[1].container == "woff"
    assert rows[0].flavor == "cff" and rows[1].flavor == "truetype"
    assert rows[5].subfamily == "Bold"
    assert rows[7].family == "Font 7"
    assert all(r.error is None for r in rows.values())


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import font_metadata

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"wOFF" + b"\x00" * 8]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = font_metadata(df, on_error="null").collect()
    assert out[0].error is not None and out[0].family is None
