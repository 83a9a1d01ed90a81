"""Pure-struct WAV (RIFF PCM) codec — no audio libraries.

Companion to the pure-zlib PNG codec (`sources/image.py`): gives the
multimodal pipeline a REAL audio container to decode end-to-end in this
dependency-free environment.  Uncompressed integer PCM at
8/16/24/32 bits (8-bit unsigned recentered to int16 range, 24-bit
sign-extended to int32), IEEE 32-bit float, and the
WAVE_FORMAT_EXTENSIBLE wrapper are supported — that covers virtually
every .wav in the wild; compressed encodings raise a clear error
rather than misreading payload bytes.

Scale note: both functions are byte-level codecs meant to run INSIDE
Arrow-batched executors (`operators/multimodal.py` mapInPandas stages),
one payload at a time — the driver never touches media bytes.

Format reference: the public RIFF/WAVE specification (chunk = 4-byte
tag + uint32-LE size + payload, odd payloads padded to even offsets;
``fmt `` chunk carries format tag / channels / sample rate / bit
depth).
"""

from __future__ import annotations

import struct

import numpy as np

from vtk_reserves_spark.sources.riff import walk_chunks


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Serialize samples to a canonical RIFF/WAVE byte string.

    ``samples`` is ``(n,)`` mono or ``(n, channels)``; integer input
    is cast to little-endian int16 PCM (callers clip beforehand if
    needed), float input is written as IEEE 32-bit float (format
    tag 3) — the quantization-free stream the feature oracles need.
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, channels), got {a.shape}")
    n, ch = a.shape
    if a.dtype.kind == "f":
        data = a.astype("<f4").tobytes()
        width, tag = 4, 3
    else:
        data = a.astype("<i2").tobytes()
        width, tag = 2, 1
    byte_rate = sample_rate * ch * width
    fmt = struct.pack("<HHIIHH", tag, ch, sample_rate, byte_rate,
                      ch * width, width * 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE byte string to ``(samples, sample_rate)``.

    Returns samples shaped ``(n,)`` for mono or ``(n, channels)``
    otherwise — int16 for 8/16-bit PCM (8-bit is recentered and scaled),
    int32 for 24/32-bit PCM, float32 for IEEE-float streams.  Walks the chunk list properly (skipping LIST/fact/cue
    chunks, honoring the odd-size pad byte) instead of assuming a fixed
    44-byte header — many real encoders emit extra chunks before
    ``data``."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    end = min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    fmt = None
    fmt_raw = None
    data = None
    for tag, at, size in walk_chunks(buf, 12, end):
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} bytes)")
            fmt = struct.unpack("<HHIIHH", buf[at : at + 16])
            fmt_raw = buf[at : at + size]
        elif tag == b"data":
            data = buf[at : at + size]
    if fmt is None or data is None:
        raise ValueError("WAVE stream missing fmt or data chunk")
    tag_, ch, rate, _byte_rate, _align, bits = fmt
    if tag_ == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format tag is the first two
        # bytes of the SubFormat GUID (fmt chunk offset 24)
        if fmt_raw is None or len(fmt_raw) < 26:
            raise ValueError("extensible WAVE fmt chunk too short")
        (tag_,) = struct.unpack("<H", fmt_raw[24:26])
    if tag_ == 3:  # IEEE float
        if bits != 32:
            raise ValueError(f"unsupported float WAVE depth {bits}")
        a = np.frombuffer(data[: (len(data) // (4 * ch)) * 4 * ch], "<f4")
        a = a.reshape(-1, ch)
    elif tag_ == 1:
        if bits == 16:
            a = np.frombuffer(data[: (len(data) // (2 * ch)) * 2 * ch], "<i2")
            a = a.reshape(-1, ch)
        elif bits == 8:
            # 8-bit PCM is UNSIGNED; center and scale to int16 range
            u = np.frombuffer(data[: (len(data) // ch) * ch], np.uint8)
            a = ((u.astype(np.int16) - 128) << 8).reshape(-1, ch)
        elif bits == 24:
            usable = (len(data) // (3 * ch)) * 3 * ch
            b = np.frombuffer(data[:usable], np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v & 0x800000, v - (1 << 24), v).astype(np.int32)
            a = v.reshape(-1, ch)
        elif bits == 32:
            a = np.frombuffer(data[: (len(data) // (4 * ch)) * 4 * ch], "<i4")
            a = a.reshape(-1, ch)
        else:
            raise ValueError(f"unsupported PCM WAVE depth {bits}")
    else:
        raise ValueError(
            f"unsupported WAVE encoding (format tag {tag_}, {bits}-bit): "
            "integer PCM (8/16/24/32) and 32-bit float are supported"
        )
    return (a[:, 0] if ch == 1 else a), rate
