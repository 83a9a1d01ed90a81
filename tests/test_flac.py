"""FLAC codec tests: encoder round-trips for every subframe/stereo
mode, plus hand-assembled bitstreams for the decoder-only paths (LPC,
5-bit rice, partition orders > 0, raw-bits escapes, wasted bits) and
corruption rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vtk_reserves_spark.sources import flac as FL
from vtk_reserves_spark.sources.flac import decode_flac, encode_flac


def test_roundtrip_subframe_modes():
    rng = np.random.RandomState(0)
    s = rng.randint(-3000, 3000, 1000)
    for mode in ("verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"):
        out, rate, bits = decode_flac(
            encode_flac(s, 44100, 16, blocksize=256, subframe_mode=mode)
        )
        assert out.shape == (1000, 1)
        assert (out[:, 0] == s).all(), mode
        assert (rate, bits) == (44100, 16)


def test_roundtrip_auto_constant_and_multiframe():
    s = np.full(500, -123)
    out, _, _ = decode_flac(encode_flac(s, 8000, 16, blocksize=64))
    assert (out[:, 0] == s).all()
    # > 127 frames exercises multi-byte UTF-8 frame numbers
    rng = np.random.RandomState(1)
    s = rng.randint(-100, 100, 600)
    out, _, _ = decode_flac(encode_flac(s, 8000, 16, blocksize=4))
    assert (out[:, 0] == s).all()


def test_roundtrip_stereo_decorrelation_modes():
    rng = np.random.RandomState(2)
    st = rng.randint(-20000, 20000, (777, 2))
    for sm in ("independent", "left_side", "right_side", "mid_side"):
        out, _, _ = decode_flac(
            encode_flac(st, 48000, 16, blocksize=192, stereo_mode=sm)
        )
        assert (out == st).all(), sm


def test_roundtrip_bit_depths_and_range_check():
    rng = np.random.RandomState(3)
    for bits in (8, 12, 16, 20, 24):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        s = rng.randint(lo, hi + 1, 300)
        out, _, b = decode_flac(encode_flac(s, 16000, bits))
        assert (out[:, 0] == s).all() and b == bits
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([200]), 8000, 8)


def _mono_frame(subframe_bits, blocksize, bps=16, rate=8000):
    """Wrap hand-written subframe bits in a valid frame + stream."""
    out = bytearray(b"fLaC")
    si = FL._BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # mono
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    bw = FL._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit blocksize field
    bw.write(0, 4)  # rate from streaminfo
    bw.write(0, 4)  # 1 channel
    bw.write({8: 1, 16: 4}[bps], 3)
    bw.write(0, 1)
    FL._write_utf8_number(bw, 0)
    bw.write(blocksize - 1, 16)
    bw.align()
    hdr = bw.bytes()
    hdr += bytes([FL._crc8(hdr)])
    frame = hdr + subframe_bits
    frame += struct.pack(">H", FL._crc16(frame))
    return bytes(out + frame)


def test_lpc_subframe_decode():
    """Hand-built LPC order-2 subframe: coefs [12, -4], shift 3
    (predictor 1.5*s1 - 0.5*s2)."""
    s = [100, 130]
    coefs, shift = [12, -4], 3
    resid = []
    for i in range(2, 40):
        pred = (coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift
        nxt = pred + ((-1) ** i) * (i % 7)  # known residual pattern
        resid.append(nxt - pred)
        s.append(nxt)
    bw = FL._BitWriter()
    bw.write(0, 1)
    bw.write(32 + 1, 6)  # LPC order 2 (type 0b100000 + order-1)
    bw.write(0, 1)  # no wasted bits
    for w in s[:2]:
        bw.write(w, 16)
    bw.write(14, 4)  # precision-1 -> 15-bit coefs
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c, 15)
    bw.write(0, 2)  # 4-bit rice
    bw.write(0, 4)  # partition order 0
    param = FL._best_rice_param(resid)
    bw.write(param, 4)
    FL._write_rice(bw, resid, param)
    bw.align()
    out, _, _ = decode_flac(_mono_frame(bw.bytes(), len(s)))
    assert out[:, 0].tolist() == s


def test_rice5_partitions_and_escape():
    """Method-1 (5-bit) rice, partition order 2, one escaped raw
    partition and one all-zero escape."""
    rng = np.random.RandomState(5)
    s = rng.randint(-500, 500, 64).tolist()
    bw = FL._BitWriter()
    bw.write(0, 1)
    bw.write(8, 6)  # FIXED order 0 -> residual == samples
    bw.write(0, 1)
    bw.write(1, 2)  # 5-bit rice params
    bw.write(2, 4)  # partition order 2 -> 4 partitions of 16
    parts = [s[i : i + 16] for i in range(0, 64, 16)]
    # p0: rice; p1: raw escape 12 bits; p2: zeros via escape raw=0; p3 rice
    parts[2] = [0] * 16
    s = parts[0] + parts[1] + parts[2] + parts[3]
    for i, part in enumerate(parts):
        if i == 1:
            bw.write(31, 5)  # escape
            bw.write(12, 5)  # 12 raw bits per sample
            for v in part:
                bw.write(v, 12)
        elif i == 2:
            bw.write(31, 5)
            bw.write(0, 5)  # all-zero partition
        else:
            param = FL._best_rice_param(part)
            bw.write(param, 5)
            FL._write_rice(bw, part, param)
    bw.align()
    out, _, _ = decode_flac(_mono_frame(bw.bytes(), 64))
    assert out[:, 0].tolist() == s


def test_wasted_bits_decode():
    s = [v << 3 for v in (-100, 5, 77, -2, 0, 31)]
    bw = FL._BitWriter()
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(1, 1)  # wasted-bits flag
    bw.write(0b001, 3)  # unary 2 -> wasted = 3
    for v in s:
        bw.write(v >> 3, 13)  # bps 16 - 3 wasted
    bw.align()
    out, _, _ = decode_flac(_mono_frame(bw.bytes(), 6))
    assert out[:, 0].tolist() == s


def test_corruption_rejected():
    s = np.arange(-50, 50)
    good = encode_flac(s, 8000, 16)
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"RIFF" + good[4:])
    # flip a residual bit -> CRC-16 must catch it
    bad = bytearray(good)
    bad[-10] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="truncated|CRC|sync"):
        decode_flac(good[:-7])


def test_streaminfo_required():
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac(b"fLaC" + bytes([0x81, 0, 0, 1, 0]))


def test_audio_features_sniffs_flac(spark):
    """audio_features dispatches on the fLaC magic: the same square
    wave through FLAC yields the same features as the WAV test."""
    import pytest as _pt

    from vtk_reserves_spark.operators.multimodal import audio_features

    sq = np.tile(np.array([1000] * 4 + [-1000] * 4, np.int64), 10)
    payload = encode_flac(sq, 8000, 16, blocksize=32)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    r = audio_features(df).collect()[0]
    assert r.sample_rate == 8000 and r.n_samples == 80
    assert r.rms == _pt.approx(1000.0)
    assert r.peak == 1000
    assert r.zero_crossings == 19
