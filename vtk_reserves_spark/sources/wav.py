"""Pure-struct WAV (RIFF PCM) codec — no audio libraries.

Companion to the pure-zlib PNG codec (`sources/image.py`): gives the
multimodal pipeline a REAL audio container to decode end-to-end in this
dependency-free environment.  Only uncompressed integer PCM
(format tag 1, 16-bit) is supported — that covers the overwhelming
majority of .wav files in the wild; anything else raises a clear error
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
    """Serialize int16 PCM samples to a canonical RIFF/WAVE byte string.

    ``samples`` is ``(n,)`` mono or ``(n, channels)``; values are cast
    to little-endian int16 (callers clip beforehand if needed).
    """
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, channels), got {a.shape}")
    n, ch = a.shape
    data = a.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE byte string to ``(samples, sample_rate)``.

    Returns int16 samples shaped ``(n,)`` for mono or ``(n, channels)``
    otherwise.  Walks the chunk list properly (skipping LIST/fact/cue
    chunks, honoring the odd-size pad byte) instead of assuming a fixed
    44-byte header — many real encoders emit extra chunks before
    ``data``."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    end = min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    fmt = None
    data = None
    for tag, at, size in walk_chunks(buf, 12, end):
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} bytes)")
            fmt = struct.unpack("<HHIIHH", buf[at : at + 16])
        elif tag == b"data":
            data = buf[at : at + size]
    if fmt is None or data is None:
        raise ValueError("WAVE stream missing fmt or data chunk")
    tag_, ch, rate, _byte_rate, _align, bits = fmt
    if tag_ != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAVE encoding (format tag {tag_}, {bits}-bit): "
            "only 16-bit integer PCM is supported"
        )
    a = np.frombuffer(data[: (len(data) // (2 * ch)) * 2 * ch], dtype="<i2")
    a = a.reshape(-1, ch)
    return (a[:, 0] if ch == 1 else a), rate
