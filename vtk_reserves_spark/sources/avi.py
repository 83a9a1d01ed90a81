"""Pure-struct AVI (RIFF) container codec — no video libraries.

Completes the multimodal codec trio (`sources/image.py` PNG,
`sources/wav.py` WAV): a real video CONTAINER parser for the
dependency-free environment.  Uncompressed frames (fourcc ``DIB `` /
biCompression 0 — raw bottom-up BGR or 8-bit grayscale) and
motion-JPEG (``MJPG`` — one baseline JPEG per frame, decoded by the
pure-numpy ``sources/jpeg.py`` codec) both decode for REAL; other
codecs (H.264, VP9, …) need external decoders and raise a clear error
instead of misreading bytes.

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

from vtk_reserves_spark.sources.riff import walk_chunks as _walk


def encode_avi(
    frames: np.ndarray, fps: int = 10, codec: str = "DIB "
) -> bytes:
    """Serialize grayscale frames ``(n_frames, h, w)`` uint8 to a
    minimal AVI.

    ``codec='DIB '`` (default) writes uncompressed 8-bit DIB frames
    with a grayscale palette, bottom-up row order per the BMP
    convention; ``codec='MJPG'`` writes one baseline JPEG per frame
    (``sources/jpeg.py``) in ``00dc`` chunks — a REAL motion-JPEG
    stream any standard player decodes."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError(f"frames must be (n, h, w) grayscale, got {a.shape}")
    if codec not in ("DIB ", "MJPG"):
        raise ValueError(f"codec must be 'DIB ' or 'MJPG', got {codec!r}")
    n, h, w = a.shape
    row = (w + 3) // 4 * 4  # BMP rows pad to 4 bytes

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    if codec == "MJPG":
        from vtk_reserves_spark.sources.jpeg import encode_jpeg

        payloads = [encode_jpeg(f) for f in a]
        movi_payload = b"".join(chunk(b"00dc", p) for p in payloads)
        frame_bytes = max((len(p) for p in payloads), default=0)
        compression = struct.unpack("<I", b"MJPG")[0]
        palette = b""
        clr_used = 0
        bits = 24
    else:
        frame_bytes = row * h
        movi_payload = b""
        for f in a:
            rows = np.zeros((h, row), np.uint8)
            rows[:, :w] = f
            movi_payload += chunk(b"00db", rows[::-1].tobytes())  # bottom-up
        compression = 0
        # 256-entry grayscale palette (8-bit DIB)
        palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
        clr_used = 256
        bits = 8

    avih = struct.pack(
        "<14I", 10**6 // fps, frame_bytes * fps, 0, 0x10, n, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", codec.encode("ascii"), 0, 0, 0, 0,
        1, fps, 0, n, frame_bytes, 0, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bits, compression,
        frame_bytes if codec == "MJPG" else row * h, 0, 0, clr_used, 0,
    ) + palette
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _collect_frames(
    buf: bytes, pos: int, end: int, spans: list[tuple[int, int]]
) -> None:
    """Collect stream-0 video frame spans under ``movi``, recursing into
    ``LIST('rec ')`` groups — the common interleaved layout muxers emit
    so one video frame plus its audio travels as a unit."""
    for tag, at, size in _walk(buf, pos, end):
        if tag in (b"00db", b"00dc"):
            spans.append((at, size))
        elif tag == b"LIST" and buf[at : at + 4] == b"rec ":
            _collect_frames(buf, at + 4, at + size, spans)


def decode_avi(buf: bytes) -> tuple[np.ndarray, int, list[tuple[int, int]]]:
    """Parse an AVI to ``(frames, fps, frame_spans)`` with ``frames``
    shaped ``(n, h, w)`` uint8 grayscale and ``frame_spans`` the
    ``(byte_offset, n_bytes)`` of each frame payload inside the
    container (what a frame SAMPLER needs even when it never decodes).

    Decodes uncompressed 'DIB ' streams AND motion-JPEG ('MJPG')
    streams — each MJPG frame is a standalone baseline JPEG decoded by
    ``sources/jpeg.py`` (the luma plane, bit-exact grayscale).  Other
    codecs (H.264, VP9, …) need external decoders and raise a clear
    error instead of misreading bytes."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    end = min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    w = h = None
    fps = 0
    bits = 8
    codec = b"DIB "
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
                    # stream type is declared by strh; an strf in the
                    # SAME strl list only carries a BITMAPINFOHEADER for
                    # 'vids' streams — an audio stream's strf is a
                    # WAVEFORMATEX and must not be parsed as bitmap info
                    cur_type = None
                    for t3, a3, s3 in _walk(buf, a2 + 4, a2 + s2):
                        if t3 == b"strh":
                            fcc_type, fcc = struct.unpack("<4s4s", buf[a3 : a3 + 8])
                            cur_type = fcc_type
                            if fcc_type == b"vids":
                                if fcc in (b"MJPG", b"mjpg"):
                                    codec = b"MJPG"
                                elif fcc not in (b"DIB ", b"\x00\x00\x00\x00"):
                                    raise ValueError(
                                        f"unsupported AVI video codec {fcc!r}: "
                                        "only 'DIB ' (uncompressed) and 'MJPG' "
                                        "streams decode here"
                                    )
                        elif t3 == b"strf" and cur_type == b"vids":
                            hdr = struct.unpack("<IiiHHI", buf[a3 : a3 + 20])
                            bits = hdr[4]
                            # MJPG carries its fourcc in biCompression
                            if hdr[5] != 0 and codec != b"MJPG":
                                raise ValueError(
                                    f"unsupported AVI biCompression {hdr[5]}: "
                                    "only uncompressed frames decode here"
                                )
        elif kind == b"movi":
            _collect_frames(buf, at + 4, at + size, spans)
    if w is None or h is None:
        raise ValueError("AVI stream missing avih header")
    if codec == b"MJPG":
        from vtk_reserves_spark.sources.jpeg import decode_jpeg

        frames = np.empty((len(spans), h, w), np.uint8)
        for i, (off, nb) in enumerate(spans):
            f = decode_jpeg(buf[off : off + nb], gray=True)
            if f.shape != (h, w):
                raise ValueError(
                    f"MJPG frame {i} is {f.shape}, container says {(h, w)}"
                )
            frames[i] = f
        return frames, fps, spans
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
