"""Pure-struct AVI (RIFF) container codec — no video libraries.

Completes the multimodal codec trio (`sources/image.py` PNG,
`sources/wav.py` WAV): a real video CONTAINER parser for the
dependency-free environment.  Only uncompressed frames are supported
(fourcc ``DIB `` / biCompression 0 — raw bottom-up BGR or 8-bit
grayscale in ``00db`` chunks); compressed codecs (MJPG, H.264, …) need
external decoders and raise a clear error instead of misreading bytes.

Frame EXTRACTION (offsets, sizes, per-frame pixel access) is the part a
training-data pipeline needs for frame sampling — that works on any
uncompressed AVI here; real deployments swap the chunk payload decode
for ffmpeg while keeping the same Spark plumbing
(`operators/multimodal.py`).

Format reference: the public RIFF/AVI specification (``RIFF('AVI '
LIST('hdrl' avih strl...) LIST('movi' 00db/00dc...))``; chunk = 4-byte
tag + uint32-LE size, odd payloads padded).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_avi(
    frames: np.ndarray, fps: int = 10
) -> bytes:
    """Serialize grayscale frames ``(n_frames, h, w)`` uint8 to a
    minimal uncompressed AVI (8-bit DIB with a grayscale palette,
    bottom-up row order per the BMP convention)."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError(f"frames must be (n, h, w) grayscale, got {a.shape}")
    n, h, w = a.shape
    row = (w + 3) // 4 * 4  # BMP rows pad to 4 bytes
    frame_bytes = row * h

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I", 10**6 // fps, frame_bytes * fps, 0, 0x10, n, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0,
        n, frame_bytes, 0, 0, 0, 0, int(w), int(h),
    )
    # BITMAPINFOHEADER + 256-entry grayscale palette (8-bit DIB)
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_bytes, 0, 0, 256, 0
    ) + b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b""
    for f in a:
        rows = np.zeros((h, row), np.uint8)
        rows[:, :w] = f
        movi_payload += chunk(b"00db", rows[::-1].tobytes())  # bottom-up
    movi = lst(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi(buf: bytes) -> tuple[np.ndarray, int, list[tuple[int, int]]]:
    """Parse an uncompressed AVI to ``(frames, fps, frame_spans)`` with
    ``frames`` shaped ``(n, h, w)`` uint8 grayscale and ``frame_spans``
    the ``(byte_offset, n_bytes)`` of each frame payload inside the
    container (what a frame SAMPLER needs even when it never decodes).

    Walks the chunk tree properly; compressed streams (non-'DIB '
    fourcc or biCompression != 0) raise a clear error."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    end = min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    w = h = None
    fps = 0
    bits = 8
    spans: list[tuple[int, int]] = []
    for tag, at, size in _walk(buf, 12, end):
        if tag != b"LIST":
            continue
        kind = buf[at : at + 4]
        if kind == b"hdrl":
            for t2, a2, s2 in _walk(buf, at + 4, at + size):
                if t2 == b"avih":
                    vals = struct.unpack("<14I", buf[a2 : a2 + 56])
                    w, h = vals[8], vals[9]
                    fps = 10**6 // vals[0] if vals[0] else 0
                elif t2 == b"LIST" and buf[a2 : a2 + 4] == b"strl":
                    for t3, a3, s3 in _walk(buf, a2 + 4, a2 + s2):
                        if t3 == b"strh":
                            fcc_type, fcc = struct.unpack("<4s4s", buf[a3 : a3 + 8])
                            if fcc_type == b"vids" and fcc not in (b"DIB ", b"\x00\x00\x00\x00"):
                                raise ValueError(
                                    f"unsupported AVI video codec {fcc!r}: only "
                                    "uncompressed 'DIB ' streams decode here"
                                )
                        elif t3 == b"strf":
                            hdr = struct.unpack("<IiiHHI", buf[a3 : a3 + 20])
                            bits = hdr[4]
                            if hdr[5] != 0:
                                raise ValueError(
                                    f"unsupported AVI biCompression {hdr[5]}: "
                                    "only uncompressed frames decode here"
                                )
        elif kind == b"movi":
            for t2, a2, s2 in _walk(buf, at + 4, at + size):
                if t2 in (b"00db", b"00dc"):
                    spans.append((a2, s2))
    if w is None or h is None:
        raise ValueError("AVI stream missing avih header")
    if bits not in (8, 24):
        raise ValueError(f"unsupported AVI bit depth {bits}")
    row = (w * (bits // 8) + 3) // 4 * 4
    frames = np.empty((len(spans), h, w), np.uint8)
    for i, (off, nb) in enumerate(spans):
        raw = np.frombuffer(buf[off : off + nb], np.uint8)
        if raw.size < row * h:
            raise ValueError(f"frame {i} truncated ({raw.size} < {row * h} bytes)")
        grid = raw[: row * h].reshape(h, row)[::-1]  # bottom-up -> top-down
        if bits == 8:
            frames[i] = grid[:, :w]
        else:  # 24-bit BGR: luma-free simple mean over channels
            px = grid[:, : w * 3].reshape(h, w, 3)
            frames[i] = px.mean(axis=2).astype(np.uint8)
    return frames, fps, spans
