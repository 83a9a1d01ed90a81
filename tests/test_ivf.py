"""IVF container + end-to-end VP8 video edges: framing, pts,
unsupported codecs, corruption, the Spark frame pipeline."""
import numpy as np
import pytest

from vtk_reserves_spark.sources.ivf import build_ivf, parse_ivf


def _vp8_frame(level=3, qi=40):
    from vtk_reserves_spark.sources.vp8 import DC_PRED, encode_vp8_frame

    mb = {
        "y_mode": DC_PRED, "uv_mode": DC_PRED, "skip": False,
        "y2": [level] + [0] * 15,
        "u": [[0] * 16 for _ in range(4)],
        "v": [[0] * 16 for _ in range(4)],
    }
    return encode_vp8_frame(16, 16, [mb], qi=qi)


def test_container_roundtrip():
    frames = [(10, b"abc"), (20, b"defgh"), (-1, b"")]
    m = parse_ivf(build_ivf(frames, 320, 240, "VP90", (1000, 1)))
    assert m["fourcc"] == "VP90"
    assert (m["width"], m["height"]) == (320, 240)
    assert m["timebase"] == (1000, 1)
    assert m["frames"] == frames


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_ivf(b"NOPE" + b"\x00" * 40)
    blob = build_ivf([(0, b"xyz")], 16, 16)
    with pytest.raises(ValueError, match="truncated frame"):
        parse_ivf(blob[:-2])


def test_real_vp8_frames_decode():
    from vtk_reserves_spark.sources.vp8 import decode_vp8_rgba

    blob = build_ivf([(0, _vp8_frame(1)), (1, _vp8_frame(6))], 16, 16)
    m = parse_ivf(blob)
    means = [
        float(np.asarray(decode_vp8_rgba(b))[:, :, :3].mean())
        for _pts, b in m["frames"]
    ]
    assert means[1] > means[0]  # higher DC level -> brighter frame
    for v in means:
        assert 128 <= v <= 200


def test_spark_pipeline_and_codec_guard(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import (
        attach_ivf_payload, ivf_video_frames,
    )

    docs = spark.range(7).withColumnRenamed("id", "doc_id")
    rows = ivf_video_frames(attach_ivf_payload(docs)).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc[0]) == 1 and len(per_doc[5]) == 3
    assert all(r.fourcc == "VP80" and r.width == 16 for r in rows)
    # non-VP8 codec payload dead-letters under on_error='null'
    vp9 = build_ivf([(0, b"not decodable")], 16, 16, "VP90")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [vp9]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = ivf_video_frames(df, on_error="null").collect()
    assert out[0].error is not None and "VP90" in out[0].error
    with pytest.raises(Exception):
        ivf_video_frames(df).collect()
