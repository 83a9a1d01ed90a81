"""MP3 metadata — pure-stdlib ID3v2/ID3v1 tag parser + MPEG audio
frame-header walker + fixture builder.

MP3 is the dominant audio payload in web crawls; audio curation
filters on its header metadata — duration windows, bitrate floors,
sample-rate checks, title/artist dedup keys — without decoding a
single sample.  Reference parity note: the reference repo has no
audio surface at all; this exists for the 100 TB multimodal brief
(same posture as ``sources/mp4.py``).

Two independent layers, matching the file structure (ISO/IEC 11172-3
frames, informal ID3 specs):

* **ID3v2.2/2.3/2.4 tag** at the file head: syncsafe tag size,
  4-char frame IDs with plain (2.3) vs syncsafe (2.4) frame sizes —
  or v2.2's 3-char IDs with 3-byte plain sizes — text frames in
  latin-1 / UTF-16-BOM / UTF-16-BE / UTF-8 encodings.
  Surfaced frames: TIT2 title, TPE1 artist, TALB album, TYER/TDRC
  year, TCON genre, TRCK track.  An ID3v1 trailer (128-byte ``TAG``
  block) is the fallback when no v2 tag exists.
* **MPEG audio frames** after the tag: 11-bit sync, version/layer
  bits, bitrate + sample-rate index tables, padding; frame length
  arithmetic walks frame-to-frame (CBR or VBR) counting frames, and
  duration = frames x samples-per-frame / sample rate (1152 for
  MPEG-1 Layer III, 576 for MPEG-2/2.5 Layer III).

The builder emits a valid ID3v2 tag plus N CBR frames so every parse
path sits under the driver oracle.  Corrupt structures raise
ValueError — the Spark operator (`multimodal.mp3_metadata`) maps
that to an error column under ``on_error='null'``, the crawl
posture.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp3", "build_mp3"]

# MPEG-1 Layer III bitrate table (kbps), index 1-14; 0=free, 15=bad.
_BITRATE_V1L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
# MPEG-2/2.5 Layer III bitrates.
_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SAMPLE_RATE = {
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}

_TEXT_FRAMES = {
    "TIT2": "title",
    "TPE1": "artist",
    "TALB": "album",
    "TYER": "year",
    "TDRC": "year",   # v2.4 replacement for TYER
    "TCON": "genre",
    "TRCK": "track",
}

# ID3v2.2 three-character frame IDs (3-byte plain sizes)
_TEXT_FRAMES_V22 = {
    "TT2": "title",
    "TP1": "artist",
    "TAL": "album",
    "TYE": "year",
    "TCO": "genre",
    "TRK": "track",
}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(body: bytes) -> str:
    if not body:
        return ""
    enc, rest = body[0], body[1:]
    if enc == 0:
        s = rest.decode("latin-1")
    elif enc == 1:
        s = rest.decode("utf-16")  # BOM-led
    elif enc == 2:
        s = rest.decode("utf-16-be")
    elif enc == 3:
        s = rest.decode("utf-8")
    else:
        raise ValueError(f"mp3: bad text encoding {enc}")
    return s.rstrip("\x00")


def _parse_id3v2(data: bytes) -> tuple[dict, int]:
    """Parse the leading ID3v2 tag; returns (fields, audio_offset).

    Header flags are honoured: unsynchronisation (0x80; whole-tag
    de-unsync for v2.2/v2.3, per-frame for v2.4), the v2.3/v2.4
    extended header (0x40; skipped — v2.3 sizes exclude the 4 size
    bytes and are plain big-endian, v2.4 sizes are syncsafe and
    include themselves), and the v2.4 footer (0x10; +10 bytes of
    audio offset)."""
    if data[:3] != b"ID3":
        return {}, 0
    major = data[3]
    if major not in (2, 3, 4):
        raise ValueError(f"mp3: unsupported ID3v2.{major}")
    flags = data[5]
    size = _syncsafe(data[6:10])
    audio_off = 10 + size + (10 if major == 4 and flags & 0x10 else 0)
    tag = data[10 : 10 + size]
    if flags & 0x80 and major in (2, 3):
        # v2.2/v2.3: unsynchronisation was applied to the whole tag
        # body after framing, so reversing it first restores every
        # frame boundary and size
        tag = tag.replace(b"\xff\x00", b"\xff")
    out: dict = {}
    if major == 2:
        if flags & 0x40:
            raise ValueError("mp3: ID3v2.2 compression flag set")
        # v2.2: 3-char frame IDs with 3-byte big-endian plain sizes
        pos = 0
        while pos + 6 <= len(tag):
            fid = tag[pos : pos + 3]
            if fid == b"\x00\x00\x00":
                break
            fsize = int.from_bytes(tag[pos + 3 : pos + 6], "big")
            body = tag[pos + 6 : pos + 6 + fsize]
            if len(body) < fsize:
                raise ValueError("mp3: ID3v2.2 frame overruns tag")
            name = _TEXT_FRAMES_V22.get(fid.decode("latin-1"))
            if name and name not in out:
                out[name] = _decode_text(body)
            pos += 6 + fsize
        return out, audio_off
    pos = 0
    if flags & 0x40:
        if len(tag) < 4:
            raise ValueError("mp3: ID3v2 extended header overruns tag")
        if major == 3:
            pos = 4 + struct.unpack(">I", tag[:4])[0]
        else:
            pos = _syncsafe(tag[:4])
        if pos > len(tag) or pos < 4:
            raise ValueError("mp3: ID3v2 extended header overruns tag")
    while pos + 10 <= len(tag):
        fid = tag[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        fsize = (
            _syncsafe(tag[pos + 4 : pos + 8])
            if major == 4
            else struct.unpack(">I", tag[pos + 4 : pos + 8])[0]
        )
        fmt_flags = tag[pos + 9]
        body = tag[pos + 10 : pos + 10 + fsize]
        if len(body) < fsize:
            raise ValueError("mp3: ID3 frame overruns tag")
        name = _TEXT_FRAMES.get(fid.decode("latin-1"))
        if name and name not in out:
            if major == 3 and fmt_flags & 0xC0:
                pass  # compressed/encrypted v2.3 frame: skip field
            else:
                if major == 4:
                    if fmt_flags & 0x01:
                        body = body[4:]  # data-length indicator
                    if fmt_flags & 0x02 or flags & 0x80:
                        body = body.replace(b"\xff\x00", b"\xff")
                out[name] = _decode_text(body)
        pos += 10 + fsize
    return out, audio_off


def _parse_id3v1(data: bytes) -> dict:
    if len(data) < 128 or data[-128:-125] != b"TAG":
        return {}
    t = data[-128:]

    def s(a, b):
        return t[a:b].split(b"\x00")[0].decode("latin-1").strip()

    out = {
        "title": s(3, 33),
        "artist": s(33, 63),
        "album": s(63, 93),
        "year": s(93, 97),
    }
    return {k: v for k, v in out.items() if v}


def _frame_info(hdr: int) -> tuple[int, int, int, int] | None:
    """Decode one 32-bit frame header -> (frame_len, sample_rate,
    bitrate_kbps, samples_per_frame), or None if not a valid Layer
    III header."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    version = (hdr >> 19) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (hdr >> 17) & 3            # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (hdr >> 9) & 1
    table = _BITRATE_V1L3 if version == 3 else _BITRATE_V2L3
    bitrate = table[br_idx] * 1000
    sr = _SAMPLE_RATE[version][sr_idx]
    spf = 1152 if version == 3 else 576
    frame_len = spf // 8 * bitrate // sr + padding
    return frame_len, sr, bitrate // 1000, spf


def parse_mp3(data: bytes) -> dict:
    """Parse MP3 metadata into a flat dict: ID3 text fields (v2
    preferred, v1 trailer fallback), ``channels`` (header mode),
    ``sample_rate``, ``bitrate_kbps`` (of the first frame; CBR
    assumption), ``n_frames`` (walked), ``duration_s``.  Raises
    ValueError on structural corruption (bad tag, no valid audio
    frame)."""
    if len(data) < 4:
        raise ValueError("mp3: too short")
    fields, pos = _parse_id3v2(data)
    if not fields:
        fields = _parse_id3v1(data)
    end = len(data) - (128 if data[-128:-125] == b"TAG" else 0)
    # find first frame sync (allow padding between tag and audio)
    first = None
    scan = pos
    while scan + 4 <= end:
        (hdr,) = struct.unpack_from(">I", data, scan)
        info = _frame_info(hdr)
        if info:
            first = info
            mode = (hdr >> 6) & 3
            pos = scan
            break
        scan += 1
    if first is None:
        raise ValueError("mp3: no valid MPEG frame found")
    _, sr, br, _ = first
    n_frames = 0
    samples = 0
    while pos + 4 <= end:
        (hdr,) = struct.unpack_from(">I", data, pos)
        info = _frame_info(hdr)
        if info is None:
            break
        flen, _, _, fspf = info
        n_frames += 1
        samples += fspf
        pos += flen
    out = dict(fields)
    out.update(
        channels=1 if mode == 3 else 2,
        sample_rate=sr,
        bitrate_kbps=br,
        n_frames=n_frames,
        duration_s=samples / sr,
    )
    return out


# ---------------------------------------------------------------- builder


def _id3_frame(fid: str, text: str, major: int, enc: int = 3) -> bytes:
    if enc == 0:
        body = b"\x00" + text.encode("latin-1")
    elif enc == 1:
        body = b"\x01" + text.encode("utf-16")
    else:
        body = b"\x03" + text.encode("utf-8")
    n = len(body)
    size = (
        bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
        if major == 4
        else struct.pack(">I", n)
    )
    return fid.encode() + size + b"\x00\x00" + body


def build_mp3(
    fields: dict,
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    id3_major: int = 3,
    encoding: int = 0,
) -> bytes:
    """Build a valid MP3: an ID3v2.3/2.4 tag carrying ``fields``
    (title/artist/album/year/genre/track) followed by ``n_frames``
    CBR MPEG-1-or-2 Layer III frames of silence.  ``sample_rate``
    picks the MPEG version (MPEG-1 rates 32/44.1/48k, MPEG-2 rates
    16/22.05/24k).  Inverse of :func:`parse_mp3` for the surfaced
    fields."""
    frames = b""
    year_fid = "TDRC" if id3_major == 4 else "TYER"
    for name, fid in (
        ("title", "TIT2"), ("artist", "TPE1"), ("album", "TALB"),
        ("year", year_fid), ("genre", "TCON"), ("track", "TRCK"),
    ):
        if name in fields:
            frames += _id3_frame(fid, str(fields[name]), id3_major, encoding)
    n = len(frames)
    tag = (
        b"ID3" + bytes([id3_major, 0, 0])
        + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                 (n >> 7) & 0x7F, n & 0x7F])
        + frames
    )
    if sample_rate in (44100, 48000, 32000):
        version, table, spf = 3, _BITRATE_V1L3, 1152
        sr_idx = [44100, 48000, 32000].index(sample_rate)
    elif sample_rate in (22050, 24000, 16000):
        version, table, spf = 2, _BITRATE_V2L3, 576
        sr_idx = [22050, 24000, 16000].index(sample_rate)
    else:
        raise ValueError(f"mp3 builder: unsupported sample rate {sample_rate}")
    br_idx = table.index(bitrate_kbps)
    mode = 3 if channels == 1 else 0
    hdr = (
        (0x7FF << 21) | (version << 19) | (1 << 17) | (1 << 16)
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
    )
    frame_len = spf // 8 * (bitrate_kbps * 1000) // sample_rate
    frame = struct.pack(">I", hdr) + b"\x00" * (frame_len - 4)
    return tag + frame * n_frames
