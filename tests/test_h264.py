"""H.264/HEVC parameter-set mining edges: Exp-Golomb + RBSP
escaping, SPS round-trips across profiles/chroma/bit-depth/crop,
Annex B NAL walking, avcC/hvcC records, MP4 stsd integration, the
Spark operator's crawl posture."""
import pytest

from vtk_reserves_spark.sources.h264 import (
    build_avcc,
    build_hvcc,
    build_sps_h264,
    build_sps_hevc,
    iter_annexb,
    parse_avcc,
    parse_hvcc,
    parse_sps_h264,
    parse_sps_hevc,
    rbsp_escape,
    rbsp_unescape,
    stream_info,
)


@pytest.mark.parametrize("w,h,p,lv,c,d", [
    (1920, 1080, 100, 42, 1, 8),
    (1280, 720, 66, 31, 1, 8),       # no extension block
    (640, 480, 77, 30, 1, 8),
    (3840, 2160, 110, 51, 1, 10),
    (720, 576, 122, 40, 2, 10),      # 4:2:2
    (444, 300, 244, 50, 3, 12),      # 4:4:4
    (100, 100, 100, 40, 0, 8),       # monochrome
    (1918, 1078, 100, 41, 1, 8),     # cropping both axes
])
def test_h264_sps_roundtrip(w, h, p, lv, c, d):
    m = parse_sps_h264(build_sps_h264(w, h, p, lv, chroma_format_idc=c,
                                      bit_depth=d))
    assert (m["width"], m["height"]) == (w, h)
    assert (m["profile_idc"], m["level_idc"]) == (p, lv)
    assert (m["chroma_format_idc"], m["bit_depth_luma"]) == (c, d)


@pytest.mark.parametrize("w,h,p,lv,t,c,d", [
    (1920, 1080, 1, 120, 0, 1, 8),
    (3840, 2160, 2, 153, 1, 1, 10),  # main10 high tier
    (1280, 720, 3, 93, 0, 1, 8),
    (444, 300, 4, 120, 0, 3, 12),    # rext 4:4:4 12-bit
    (722, 578, 2, 120, 0, 2, 10),    # 4:2:2 conformance window
    (64, 64, 1, 30, 0, 1, 8),        # no window needed
])
def test_hevc_sps_roundtrip(w, h, p, lv, t, c, d):
    m = parse_sps_hevc(build_sps_hevc(w, h, p, lv, tier=t,
                                      chroma_format_idc=c, bit_depth=d))
    assert (m["width"], m["height"]) == (w, h)
    assert (m["profile_idc"], m["level_idc"], m["tier"]) == (p, lv, t)
    assert (m["chroma_format_idc"], m["bit_depth_luma"]) == (c, d)


def test_rbsp_escape_inverse():
    for raw in (b"\x00\x00\x00", b"\x00\x00\x01\x02\x00\x00\x03",
                b"\xff" * 4, b"", b"\x00\x00\x02\x00\x00"):
        assert rbsp_unescape(rbsp_escape(raw)) == raw
    # escaped form never contains a start-code or 00 00 03 02 pattern
    esc = rbsp_escape(b"\x00\x00\x01\x00\x00\x00")
    assert b"\x00\x00\x01" not in esc and b"\x00\x00\x00" not in esc


def test_annexb_walk_mixed_start_codes():
    sps = build_sps_h264(320, 240, 66, 30)
    data = (b"\x00\x00\x00\x01\x09\x10"       # AUD, 4-byte start code
            + b"\x00\x00\x01" + sps            # 3-byte start code
            + b"\x00\x00\x01\x68\xce\x38\x80")  # PPS
    nals = list(iter_annexb(data))
    assert [n[0] & 0x1F for n in nals] == [9, 7, 8]
    assert parse_sps_h264(nals[1])["width"] == 320
    with pytest.raises(ValueError, match="start code"):
        list(iter_annexb(b"no start codes here"))


def test_avcc_record_roundtrip():
    sps = build_sps_h264(1920, 1080, 100, 42)
    rec = parse_avcc(build_avcc([sps], [b"\x68\xce\x38\x80"]))
    assert rec["profile_idc"] == 100 and rec["level_idc"] == 42
    assert rec["nal_length_size"] == 4
    assert rec["sps"] == [sps] and len(rec["pps"]) == 1
    with pytest.raises(ValueError, match="configurationVersion"):
        parse_avcc(b"\x02\x64\x00\x2a")


def test_hvcc_record_roundtrip():
    sps = build_sps_hevc(1920, 1080, 2, 123, tier=1, bit_depth=10)
    rec = parse_hvcc(build_hvcc([sps]))
    assert rec["profile_idc"] == 2 and rec["tier"] == 1
    assert rec["level_idc"] == 123 and rec["sps"] == [sps]


def test_stream_info_sniffs_all_framings():
    sps = build_sps_h264(1918, 1078, 100, 41)
    hs = build_sps_hevc(722, 400, 2, 123, tier=1, chroma_format_idc=2,
                        bit_depth=10)
    m = stream_info(build_avcc([sps], []))
    assert (m["framing"], m["codec"], m["width"]) == ("avcc", "h264", 1918)
    m = stream_info(build_hvcc([hs]))
    assert (m["framing"], m["codec"], m["height"]) == ("hvcc", "hevc", 400)
    m = stream_info(b"\x00\x00\x00\x01" + sps)
    assert (m["framing"], m["codec"]) == ("annexb", "h264")
    m = stream_info(b"\x00\x00\x00\x01" + bytes([35 << 1, 1, 0x50])
                    + b"\x00\x00\x00\x01" + hs)
    assert (m["framing"], m["codec"], m["bit_depth_luma"]) == (
        "annexb", "hevc", 10)
    with pytest.raises(ValueError):
        stream_info(b"\x00" * 40)


def test_sps_rejections():
    sps = bytearray(build_sps_h264(320, 240, 66, 30))
    with pytest.raises(ValueError, match="not an SPS"):
        parse_sps_h264(b"\x68\xce\x38\x80")
    with pytest.raises(ValueError, match="forbidden"):
        parse_sps_h264(bytes([sps[0] | 0x80]) + bytes(sps[1:]))
    with pytest.raises(ValueError, match="truncated"):
        parse_sps_h264(bytes(sps[:4]))
    with pytest.raises(ValueError, match="not an SPS"):
        parse_sps_hevc(bytes([34 << 1, 1]) + b"\x00" * 8)
    # unreachable dims: odd width under 4:2:0 chroma cropping
    with pytest.raises(ValueError, match="reachable"):
        build_sps_hevc(129, 64)
    with pytest.raises(ValueError, match="High-family"):
        build_sps_h264(320, 240, 66, 30, bit_depth=10)


def test_mp4_stsd_codec_config():
    from vtk_reserves_spark.sources.mp4 import build_mp4, parse_mp4

    sps = build_sps_h264(1920, 1080, 100, 42)
    cfg = build_avcc([sps], [b"\x68\xce\x38\x80"])
    blob = build_mp4(1.0, [{
        "handler": "vide", "codec": "avc1", "track_id": 1,
        "width": 1920.0, "height": 1080.0, "timescale": 600,
        "duration": 600, "lang": "und", "n_samples": 1,
        "sample_delta": 600, "codec_config": cfg,
        "codec_config_type": "avcC",
    }])
    t = parse_mp4(blob)["tracks"][0]
    assert t["codec_config_type"] == "avcC"
    assert stream_info(t["codec_config"])["width"] == 1920
    # a track without config still parses, with no codec_config key
    blob = build_mp4(1.0, [{
        "handler": "vide", "codec": "vp09", "track_id": 1,
        "width": 320.0, "height": 240.0, "timescale": 600,
        "duration": 600, "lang": "und", "n_samples": 1,
        "sample_delta": 600,
    }])
    assert "codec_config" not in parse_mp4(blob)["tracks"][0]


def test_spark_video_codec_info(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import (
        attach_video_codec_payload, video_codec_info,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(40))}),
        T.StructType([T.StructField("doc_id", T.LongType())]),
    )
    rows = {
        r.doc_id: r
        for r in video_codec_info(
            attach_video_codec_payload(docs)
        ).collect()
    }
    assert len(rows) == 40
    assert rows[0].codec == "h264" and rows[0].container == "mp4"
    assert rows[2].container == "raw" and rows[2].framing == "annexb"
    assert rows[1].codec == "hevc" and rows[1].framing == "hvcc"
    assert rows[4].profile == "high422" and rows[4].chroma_format_idc == 2
    assert rows[8].profile == "high10" and rows[8].bit_depth == 10
    assert rows[0].width == 320 and rows[0].height == 240
    assert rows[9].tier == 1  # doc 9: hevc, (9//8)%2 == 1


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import video_codec_info

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"not a video stream"]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = video_codec_info(df, on_error="null").collect()
    assert out[0].error is not None and out[0].codec is None
    with pytest.raises(Exception):
        video_codec_info(df, on_error="raise").collect()
