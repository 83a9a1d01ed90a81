"""MP4/ISO-BMFF box-walker edges: largesize boxes, version-0/1 full
boxes, audio-only files, corrupt structures, mime sniffing."""
import struct

import pytest

from vtk_reserves_spark.sources.mp4 import build_mp4, parse_mp4

VIDEO = {
    "handler": "vide", "codec": "avc1", "n_samples": 240,
    "sample_delta": 25, "timescale": 600, "lang": "und",
    "width": 1280.0, "height": 720.0,
}
AUDIO = {
    "handler": "soun", "codec": "mp4a", "n_samples": 430,
    "sample_delta": 1024, "timescale": 44100, "lang": "eng",
    "channels": 2, "sample_rate": 44100,
}


def test_roundtrip_both_versions():
    for ver in (0, 1):
        meta = parse_mp4(build_mp4(12.345, [VIDEO, AUDIO], "mp42", ver))
        assert meta["brand"] == "mp42"
        assert meta["duration_s"] == pytest.approx(12.345)
        vid, aud = meta["tracks"]
        assert vid["codec"] == "avc1" and vid["width"] == 1280.0
        assert vid["n_samples"] == 240
        assert aud["sample_rate"] == 44100 and aud["channels"] == 2
        assert aud["lang"] == "eng"


def test_audio_only():
    meta = parse_mp4(build_mp4(5.0, [AUDIO]))
    assert len(meta["tracks"]) == 1
    assert meta["tracks"][0]["handler"] == "soun"


def test_largesize_box():
    blob = build_mp4(1.0, [AUDIO])
    # rewrite the top-level moov as a largesize (size==1 + 64-bit) box
    pos, found = 0, None
    while pos + 8 <= len(blob):
        (size,) = struct.unpack_from(">I", blob, pos)
        if blob[pos + 4 : pos + 8] == b"moov":
            found = (pos, size)
            break
        pos += size
    pos, size = found
    big = (
        blob[:pos]
        + struct.pack(">I", 1) + b"moov" + struct.pack(">Q", size + 8)
        + blob[pos + 8 : pos + size]
        + blob[pos + size :]
    )
    meta = parse_mp4(big)
    assert meta["tracks"][0]["codec"] == "mp4a"


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 4)
    blob = build_mp4(1.0, [AUDIO])
    # box size overrunning the container
    bad = struct.pack(">I", 1 << 30) + blob[4:]
    with pytest.raises(ValueError):
        parse_mp4(bad)
    # no ftyp at all
    with pytest.raises(ValueError):
        parse_mp4(struct.pack(">I", 16) + b"free" + b"\x00" * 8)


def test_zero_timescale_raises():
    blob = bytearray(build_mp4(1.0, [AUDIO]))
    idx = blob.find(b"mvhd")
    # mvhd v0 timescale sits 4(ver/flags)+8(times) after the fourcc
    struct.pack_into(">I", blob, idx + 4 + 4 + 8, 0)
    with pytest.raises(ValueError):
        parse_mp4(bytes(blob))


def test_sniff_mp4_and_mp3():
    from vtk_reserves_spark.operators.multimodal import sniff_mime

    assert sniff_mime(build_mp4(1.0, [AUDIO])) == "video/mp4"
    assert sniff_mime(b"ID3\x04\x00\x00\x00\x00\x00\x00") == "audio/mpeg"
    assert sniff_mime(b"\xff\xfb\x90\x00" + b"\x00" * 16) == "audio/mpeg"
    assert sniff_mime(b"\xff\xd8\xff\xe0") == "image/jpeg"  # not mp3


def test_spark_mp4_metadata(spark):
    from vtk_reserves_spark.operators.multimodal import (
        attach_mp4_payload, mp4_metadata,
    )

    docs = spark.range(15).withColumnRenamed("id", "doc_id")
    rows = {
        r.doc_id: r
        for r in mp4_metadata(attach_mp4_payload(docs)).collect()
    }
    assert len(rows) == 15
    assert rows[0].video_codec is None  # 0 % 7 == 0: audio-only
    assert rows[0].n_tracks == 1
    assert rows[1].video_codec == "hev1" and rows[1].n_tracks == 2
    assert rows[3].fps == pytest.approx(600.0 / 4)
    assert rows[2].audio_codec == "mp4a" and rows[3].audio_codec == "Opus"
    assert all(r.error is None for r in rows.values())


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from vtk_reserves_spark.operators.multimodal import mp4_metadata

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "payload": [b"garbage!", b"\x00\x00"]}
        ),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = mp4_metadata(df, on_error="null").collect()
    assert all(r.error is not None for r in out)
    assert all(r.brand is None for r in out)
    with pytest.raises(Exception):
        mp4_metadata(df, on_error="raise").collect()
    with pytest.raises(ValueError):
        mp4_metadata(df, on_error="bogus")
