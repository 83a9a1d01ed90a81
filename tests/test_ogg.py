"""Ogg page/packet walker edges: CRC verification, multi-page
packet lacing, Vorbis vs Opus granule rates, comment parsing,
corrupt structures."""
import struct

import pytest

from vtk_reserves_spark.sources.ogg import _ogg_crc, build_ogg, parse_ogg

TAGS = {"title": "Tïtle", "artist": "A", "album": "B"}


def test_vorbis_roundtrip():
    m = parse_ogg(build_ogg("vorbis", TAGS, 2, 44100, 88200))
    assert m["codec"] == "vorbis"
    assert m["channels"] == 2 and m["sample_rate"] == 44100
    assert m["duration_s"] == pytest.approx(2.0)
    assert m["title"] == "Tïtle" and m["album"] == "B"


def test_opus_granules_at_48k():
    # input rate 8 kHz, but Opus granules always run at 48 kHz
    m = parse_ogg(build_ogg("opus", TAGS, 1, 8000, 144000))
    assert m["codec"] == "opus"
    assert m["sample_rate"] == 8000
    assert m["duration_s"] == pytest.approx(3.0)


def test_long_comment_spans_pages():
    # a >255-byte tag exercises 255-lacing continuation
    m = parse_ogg(build_ogg("vorbis", {"title": "x" * 700}, 2, 44100, 100))
    assert m["title"] == "x" * 700


def test_crc_rejected():
    blob = bytearray(build_ogg("vorbis", TAGS))
    blob[-1] ^= 0x5A  # flip a body byte; page CRC no longer matches
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(blob))


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_ogg(b"NotOgg")
    blob = build_ogg("vorbis", TAGS)
    with pytest.raises(ValueError):
        parse_ogg(blob + b"JUNK")  # trailing garbage
    with pytest.raises(ValueError):
        build_ogg("speex", TAGS)


def test_crc_known_zero():
    assert _ogg_crc(b"") == 0
    assert _ogg_crc(b"\x00" * 8) == 0


def test_spark_ogg_metadata(spark):
    from vtk_reserves_spark.operators.multimodal import (
        attach_ogg_payload, ogg_metadata,
    )

    docs = spark.range(13).withColumnRenamed("id", "doc_id")
    rows = {
        r.doc_id: r for r in ogg_metadata(attach_ogg_payload(docs)).collect()
    }
    assert rows[0].codec == "vorbis" and rows[1].codec == "opus"
    assert rows[0].album is None and rows[6].album is None  # %6 == 0
    assert rows[2].album == "OAlbum2"
    assert rows[1].duration_s == pytest.approx(960 * (1 % 300 + 1) / 48000)
    assert rows[4].duration_s == pytest.approx(1000 * 5 / 44100)
    assert all(r.error is None for r in rows.values())


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import ogg_metadata

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"OggS" + b"\x00" * 10]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = ogg_metadata(df, on_error="null").collect()
    assert out[0].error is not None and out[0].codec is None
