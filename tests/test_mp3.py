"""MP3 parser edges: ID3v2.3 vs v2.4 frame sizing, text encodings,
ID3v1 fallback, MPEG-1 vs MPEG-2 frame math, sync scanning past
junk, corrupt structures."""
import struct

import pytest

from vtk_reserves_spark.sources.mp3 import build_mp3, parse_mp3

FIELDS = {
    "title": "Söng", "artist": "A", "album": "B",
    "year": "2003", "genre": "Jazz", "track": "7/9",
}


@pytest.mark.parametrize("major,enc", [(3, 0), (3, 1), (4, 3), (4, 1)])
def test_id3v2_roundtrip(major, enc):
    m = parse_mp3(build_mp3(FIELDS, 20, 128, 44100, 2, major, enc))
    for k, v in FIELDS.items():
        assert m[k] == v
    assert m["n_frames"] == 20
    assert m["duration_s"] == pytest.approx(20 * 1152 / 44100)


def test_mpeg2_frame_math():
    m = parse_mp3(build_mp3(FIELDS, 30, 64, 16000, 1))
    assert m["sample_rate"] == 16000
    assert m["channels"] == 1
    assert m["duration_s"] == pytest.approx(30 * 576 / 16000)


def test_id3v1_fallback():
    audio = build_mp3({}, 5, 128, 44100, 2)[10:]  # strip empty v2 tag
    tag = (
        b"TAG" + b"T1".ljust(30, b"\x00") + b"A1".ljust(30, b"\x00")
        + b"L1".ljust(30, b"\x00") + b"1987" + b"\x00" * 30 + b"\x05"
    )
    m = parse_mp3(audio + tag)
    assert m["title"] == "T1" and m["year"] == "1987"
    assert m["n_frames"] == 5  # trailer excluded from the frame walk
    assert "genre" not in m


def test_sync_scan_past_junk():
    blob = build_mp3(FIELDS, 8, 128, 44100, 2)
    # inject junk between tag and first frame; scanner must skip it
    tag_end = 10 + ((blob[6] << 21) | (blob[7] << 14) | (blob[8] << 7) | blob[9])
    junked = blob[:tag_end] + b"\x12\x34\x56" + blob[tag_end:]
    m = parse_mp3(junked)
    assert m["n_frames"] == 8 and m["title"] == FIELDS["title"]


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_mp3(b"\x00\x01")
    with pytest.raises(ValueError):
        parse_mp3(b"ID3\x03\x00\x00\x00\x00\x00\x04" + b"\x00" * 64)
    # frame overrunning the tag
    bad = (
        b"ID3\x03\x00\x00\x00\x00\x00\x10"
        + b"TIT2" + struct.pack(">I", 9999) + b"\x00\x00" + b"\x00" * 6
    )
    with pytest.raises(ValueError):
        parse_mp3(bad)


def test_builder_validates_rate():
    with pytest.raises(ValueError):
        build_mp3(FIELDS, 5, 128, 11111)


def test_spark_mp3_metadata(spark):
    from vtk_reserves_spark.operators.multimodal import (
        attach_mp3_payload, mp3_metadata,
    )

    docs = spark.range(23).withColumnRenamed("id", "doc_id")
    rows = {
        r.doc_id: r
        for r in mp3_metadata(attach_mp3_payload(docs)).collect()
    }
    assert len(rows) == 23
    assert rows[0].genre is None and rows[11].genre is None  # v1 trailer
    assert rows[1].genre == "Genre1" and rows[1].track == "2/20"
    assert rows[5].title == "Träck 5"
    assert rows[3].sample_rate == 22050
    assert rows[3].duration_s == pytest.approx((3 % 40 + 5) * 576 / 22050)
    assert all(r.error is None for r in rows.values())


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import mp3_metadata

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"not an mp3 at all"]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = mp3_metadata(df, on_error="null").collect()
    assert out[0].error is not None and out[0].title is None


def test_id3v22_three_char_frames():
    """ID3v2.2 tags (3-char IDs, 3-byte plain sizes) parse instead
    of being skipped."""
    audio = build_mp3({}, 5, 128, 44100)[10:]

    def f22(fid, text):
        body = b"\x00" + text.encode("latin-1")
        return fid + len(body).to_bytes(3, "big") + body

    frames = (f22(b"TT2", "Old Title") + f22(b"TP1", "Old Artist")
              + f22(b"TAL", "LP") + f22(b"TYE", "1979")
              + f22(b"TRK", "7"))
    n = len(frames)
    tag = (b"ID3\x02\x00\x00"
           + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F]) + frames)
    m = parse_mp3(tag + audio)
    assert m["title"] == "Old Title" and m["artist"] == "Old Artist"
    assert m["album"] == "LP" and m["year"] == "1979" and m["track"] == "7"
    assert m["n_frames"] == 5


def _ss(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def test_id3v23_whole_tag_unsynchronisation():
    audio = build_mp3({}, 5, 128, 44100)[10:]
    body = b"\x00A\xffB"                        # latin-1 'AÿB'
    frame = b"TIT2" + struct.pack(">I", len(body)) + b"\x00\x00" + body
    stored = frame.replace(b"\xff", b"\xff\x00")
    tag = b"ID3\x03\x00\x80" + _ss(len(stored)) + stored
    m = parse_mp3(tag + audio)
    assert m["title"] == "A\xffB"
    assert m["n_frames"] == 5


def test_id3v23_extended_header_skipped():
    audio = build_mp3({}, 4, 128, 44100)[10:]
    body = b"\x00Ext"
    frame = b"TIT2" + struct.pack(">I", len(body)) + b"\x00\x00" + body
    ext = struct.pack(">I", 6) + b"\x00" * 6    # size excludes itself
    tag = b"ID3\x03\x00\x40" + _ss(len(ext) + len(frame)) + ext + frame
    m = parse_mp3(tag + audio)
    assert m["title"] == "Ext" and m["n_frames"] == 4


def test_id3v24_ext_header_frame_unsync_footer():
    audio = build_mp3({}, 3, 128, 44100)[10:]
    body = b"\x00A\xff"
    stored = body.replace(b"\xff", b"\xff\x00")
    frame = b"TIT2" + _ss(len(stored)) + b"\x00\x02" + stored
    ext = _ss(6) + b"\x01\x00"                  # size includes itself
    n = len(ext) + len(frame)
    tag = b"ID3\x04\x00\x50" + _ss(n) + ext + frame
    footer = b"3DI\x04\x00\x50" + _ss(n)
    m = parse_mp3(tag + footer + audio)
    assert m["title"] == "A\xff"
    assert m["n_frames"] == 3
