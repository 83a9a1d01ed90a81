"""Mel spectrogram / MFCC features: filterbank closed forms, the
pure-tone single-bin DFT property, DCT orthonormality, window and
error modes, and the Spark operators end-to-end over real WAV
payloads."""
import numpy as np
import pytest

from vtk_reserves_spark.operators.audiofeat import (
    mel_filterbank,
    mel_spectrogram,
    mfcc,
)
from vtk_reserves_spark.sources.wav import decode_wav, encode_wav

SR = 16000
NFFT = 1024


def test_filterbank_shape_and_triangles():
    fb = mel_filterbank(SR, NFFT, 26)
    assert fb.shape == (26, NFFT // 2 + 1)
    # each filter peaks at (or adjacent to) its center, max weight <= 1
    assert fb.max() <= 1.0 + 1e-12
    assert (fb >= 0).all()
    # filters tile the axis: every interior bin is covered by >= 1
    covered = fb.sum(axis=0)
    assert (covered[5:-5] > 0).all()


def test_filterbank_htk_edges_closed_form():
    """Edge frequencies follow the HTK mel formula exactly."""
    fb = mel_filterbank(SR, NFFT, 4, fmin=0.0)
    mel_max = 2595.0 * np.log10(1.0 + (SR / 2.0) / 700.0)
    edges = 700.0 * (10.0 ** (np.linspace(0, mel_max, 6) / 2595.0) - 1.0)
    bins = np.arange(NFFT // 2 + 1) * SR / NFFT
    # weight of filter 1 at a bin inside its rising slope
    j = np.searchsorted(bins, edges[1]) + 3
    expect = min(
        (bins[j] - edges[0]) / (edges[1] - edges[0]),
        (edges[2] - bins[j]) / (edges[2] - edges[1]),
    )
    assert fb[0, j] == pytest.approx(max(0.0, expect), abs=1e-12)


def test_pure_tone_single_bin():
    """Exact-bin tone + rectangular window -> one nonzero power bin
    (the closed form the driver oracle replays)."""
    from vtk_reserves_spark.operators.audiofeat import _frame_power

    k = 48
    t = np.arange(NFFT)
    x = np.sin(2 * np.pi * k * t / NFFT)
    spec = _frame_power(x, NFFT, NFFT, "rect", normalize=True)
    assert spec.shape == (1, NFFT // 2 + 1)
    assert spec[0, k] == pytest.approx(1.0, abs=1e-9)
    off = np.delete(spec[0], k)
    assert np.abs(off).max() < 1e-12


def test_mel_spectrogram_spark_tone(spark):
    k = 64
    t = np.arange(4 * NFFT)
    wav = encode_wav(
        np.sin(2 * np.pi * k * t / NFFT).astype(np.float32), SR
    )
    df = spark.createDataFrame([(1, bytearray(wav))],
                               "doc_id long, payload binary")
    out = mel_spectrogram(df, window="rect", normalize=True).toPandas()
    assert set(out.columns) == {"doc_id", "frame", "mel", "energy"}
    assert out["frame"].nunique() == 4
    fb = mel_filterbank(SR, NFFT, 26)
    got = out[out["frame"] == 0].sort_values("mel")["energy"].to_numpy()
    np.testing.assert_allclose(got, fb[:, k], atol=1e-9)


def test_mfcc_orthonormal_dct(spark):
    """MFCC of a tone equals the DCT of the log mel weights."""
    k = 80
    t = np.arange(NFFT)
    wav = encode_wav(
        np.sin(2 * np.pi * k * t / NFFT).astype(np.float32), SR
    )
    df = spark.createDataFrame([(7, bytearray(wav))],
                               "doc_id long, payload binary")
    out = mfcc(df, window="rect", normalize=True,
               log_eps=0.01).toPandas().sort_values("coef")
    fb = mel_filterbank(SR, NFFT, 26)
    v = np.log10(fb[:, k] + 0.01)
    n = 26
    jj = np.arange(n)
    expect = []
    for i in range(13):
        scale = np.sqrt(1.0 / n) if i == 0 else np.sqrt(2.0 / n)
        expect.append(
            scale * (v * np.cos(np.pi * i * (2 * jj + 1) / (2 * n))).sum()
        )
    np.testing.assert_allclose(out["value"].to_numpy(), expect,
                               atol=1e-9)


def test_hop_and_hann(spark):
    t = np.arange(3 * NFFT)
    wav = encode_wav(
        np.sin(2 * np.pi * 32 * t / NFFT).astype(np.float32), SR
    )
    df = spark.createDataFrame([(1, bytearray(wav))],
                               "doc_id long, payload binary")
    # hop = n_fft/2 -> 5 frames from 3*n_fft samples
    out = mel_spectrogram(df, hop=NFFT // 2).toPandas()
    assert out["frame"].nunique() == 5
    with pytest.raises(Exception, match="window"):
        mel_spectrogram(df, window="hamming").toPandas()


def test_error_modes(spark):
    df = spark.createDataFrame([(1, bytearray(b"not audio data"))],
                               "doc_id long, payload binary")
    with pytest.raises(Exception, match="WAV"):
        mel_spectrogram(df).toPandas()
    assert mel_spectrogram(df, on_error="null").count() == 0
    with pytest.raises(ValueError, match="on_error"):
        mfcc(df, on_error="skip")


def test_float_wav_roundtrip():
    x = (np.sin(np.linspace(0, 20, 5000)) * 0.8).astype(np.float32)
    out, sr = decode_wav(encode_wav(x, 12345))
    assert sr == 12345
    np.testing.assert_array_equal(out.reshape(-1).astype(np.float32), x)
