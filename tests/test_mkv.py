"""Matroska/WebM EBML walker edges: varint widths, float sizes,
TimestampScale scaling, language default, cluster stop, corrupt
structures."""
import struct

import pytest

from vtk_reserves_spark.sources.mkv import (
    _read_vint, build_mkv, parse_mkv,
)

VIDEO = {"type": "video", "codec": "V_VP9", "lang": "und",
         "width": 1920, "height": 1080}
AUDIO = {"type": "audio", "codec": "A_OPUS", "lang": "jpn",
         "sample_rate": 48000.0, "channels": 2}


def test_roundtrip():
    m = parse_mkv(build_mkv("webm", 123.5, [VIDEO, AUDIO]))
    assert m["doc_type"] == "webm"
    assert m["duration_s"] == pytest.approx(123.5)
    vid, aud = m["tracks"]
    assert vid["width"] == 1920 and vid["codec"] == "V_VP9"
    assert aud["sample_rate"] == 48000.0 and aud["lang"] == "jpn"


def test_timestamp_scale_units():
    # same wall duration through a non-default scale
    m = parse_mkv(build_mkv("matroska", 10.25, [AUDIO], ts_scale=2_000_000))
    assert m["duration_s"] == pytest.approx(10.25)


def test_language_spec_default():
    aud = dict(AUDIO, lang=None)
    m = parse_mkv(build_mkv("webm", 1.0, [aud]))
    assert m["tracks"][0]["lang"] == "eng"


def test_exact_eighth_second_duration():
    # binary-exact round trip (the fixture invariant)
    for k in (0, 1, 12345, 28799):
        m = parse_mkv(build_mkv("webm", k / 8.0, [AUDIO]))
        assert m["duration_s"] == k / 8.0  # exact, not approx


def test_vint_widths():
    # 1-byte: 0x81 -> 1; 2-byte ID keeps marker
    assert _read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert _read_vint(b"\x42\x82", 0, keep_marker=True) == (0x4282, 2)
    assert _read_vint(b"\x42\x82", 0, keep_marker=False) == (0x282, 2)
    with pytest.raises(ValueError):
        _read_vint(b"\x00\x01", 0, keep_marker=False)


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_mkv(b"\x00\x00\x00\x00")
    blob = build_mkv("webm", 1.0, [AUDIO])
    with pytest.raises(ValueError):
        parse_mkv(blob[: len(blob) // 2])  # element overruns parent
    # no EBML header at all (bare segment)
    with pytest.raises(ValueError):
        parse_mkv(b"\x18\x53\x80\x67\x80")


def test_float32_duration():
    # hand-build an Info whose Duration is a 4-byte float
    blob = bytearray(build_mkv("webm", 2.0, [AUDIO]))
    idx = blob.find(b"\x44\x89")  # Duration element id
    assert blob[idx + 2] == 0x88  # 8-byte size marker
    f64 = struct.unpack(">d", bytes(blob[idx + 3 : idx + 11]))[0]
    patched = (
        bytes(blob[:idx])
        + b"\x44\x89\x84" + struct.pack(">f", f64)
        + b"\xec\x82\x00\x00"  # Void element padding the 4 freed bytes
        + bytes(blob[idx + 11 :])
    )
    m = parse_mkv(patched)
    assert m["duration_s"] == pytest.approx(2.0)


def test_spark_mkv_metadata(spark):
    from vtk_reserves_spark.operators.multimodal import (
        attach_mkv_payload, mkv_metadata,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    rows = {
        r.doc_id: r for r in mkv_metadata(attach_mkv_payload(docs)).collect()
    }
    assert rows[0].video_codec is None and rows[0].n_tracks == 1
    assert rows[5].video_codec is None  # %5 == 0
    assert rows[1].video_codec == "V_VP8" and rows[1].doc_type == "matroska"
    assert rows[0].audio_lang == "eng"  # spec default path
    assert rows[2].audio_lang == "deu"
    assert rows[9].duration_s == 9 / 8.0
    assert all(r.error is None for r in rows.values())


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import mkv_metadata

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"\x1a\x45\xdf"]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = mkv_metadata(df, on_error="null").collect()
    assert out[0].error is not None and out[0].doc_type is None
