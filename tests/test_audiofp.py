"""Audio-fingerprint edges: band boundaries, DC exclusion, silence,
ambiguous frames, stereo mixdown, FLAC path, tail truncation."""
import numpy as np
import pytest

from vtk_reserves_spark.operators.audiofp import (
    FRAME, frame_fingerprint_bytes,
)


def _tone(k, frames=1, amp=8000.0):
    t = np.arange(FRAME * frames)
    return np.sin(2 * np.pi * k * t / FRAME) * amp


def test_band_boundaries():
    # bins 1..64 are band 0, 65..128 band 1, ... (DC-stripped)
    for k, band in ((1, 0), (64, 0), (65, 1), (448, 6), (449, 7), (512, 7)):
        fp = frame_fingerprint_bytes(_tone(k))
        assert fp == bytes([1 << (7 - band)]), (k, band, fp.hex())


def test_dc_offset_excluded():
    # a huge DC offset must not mask the tone
    sig = _tone(100) + 30000.0
    assert frame_fingerprint_bytes(sig) == frame_fingerprint_bytes(_tone(100))


def test_silence_and_ambiguous_code_zero():
    assert frame_fingerprint_bytes(np.zeros(FRAME)) == b"\x00"
    # three equal tones in different bands: no band reaches 50%
    sig = _tone(100) + _tone(300) + _tone(500)
    assert frame_fingerprint_bytes(sig) == b"\x00"


def test_two_segment_sequence():
    sig = np.concatenate([_tone(100, 2), _tone(300, 3)])
    fp = frame_fingerprint_bytes(sig)
    assert fp == bytes([1 << (7 - 1)]) * 2 + bytes([1 << (7 - 4)]) * 3


def test_tail_dropped():
    sig = np.concatenate([_tone(100), np.ones(100)])
    assert len(frame_fingerprint_bytes(sig)) == 1


def test_spark_wav_and_flac(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.audiofp import audio_fingerprint
    from vtk_reserves_spark.sources.flac import encode_flac
    from vtk_reserves_spark.sources.wav import encode_wav

    samples = _tone(200, 3).astype(np.int16)
    wav = encode_wav(samples, 16000)
    flac = encode_flac(samples, 16000)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [wav, flac]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    rows = {r.doc_id: r for r in audio_fingerprint(df).collect()}
    band = (200 - 1) // 64
    expect = (bytes([1 << (7 - band)]) * 3).hex()
    assert rows[1].fp == expect
    assert rows[2].fp == expect  # same pixels, different codec framing
    assert rows[1].sample_rate == 16000 and rows[1].n_frames == 3


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.audiofp import audio_fingerprint

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"not audio"]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = audio_fingerprint(df, on_error="null").collect()
    assert out[0].error is not None and out[0].fp is None
    with pytest.raises(Exception):
        audio_fingerprint(df).collect()
