"""MP4 / ISO-BMFF container metadata — pure-stdlib box walker +
fixture builder.

MP4 (ISO/IEC 14496-12 ISO base media file format) is the dominant
video container in web crawls; curation pipelines filter on its
metadata long before any frame is decoded — duration windows,
resolution floors, codec allowlists, audio sample-rate checks and
language stratification are all header-level decisions.  Reference
parity note: the reference repo has no video surface at all; this
exists for the 100 TB multimodal brief (same posture as
``sources/exif.py``).

The walker reads the box tree directly (size+fourcc framing, 64-bit
``largesize`` boxes, version 0/1 full-box headers): ``ftyp`` brand,
``moov/mvhd`` movie duration, per-``trak`` ``tkhd`` (track id,
16.16-fixed presentation dims), ``mdia/mdhd`` (media timescale,
duration, packed 5-bit ISO-639-2 language), ``hdlr`` handler class,
and ``stbl`` sample tables — ``stsd`` codec fourcc, ``stts`` sample
count (frame count for video), ``stsz`` size table.  Frame DECODE of
the codecs inside (H.264/HEVC/VP9) is out of scope and raises in
``multimodal.decode_media`` — metadata extraction is deliberately a
bounded prefix walk that never touches ``mdat`` payload bytes.

The builder emits structurally valid minimal MP4s (ftyp + moov with
real sample tables + a stub mdat) so every parse path sits under the
driver oracle.  Corrupt structures raise ValueError — the Spark
operator (`multimodal.mp4_metadata`) maps that to an error column
under ``on_error='null'``, the crawl posture.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp4", "build_mp4"]


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [start, end); handles 64-bit largesize and size==0 (to end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("mp4: box overruns container")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _walk_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox(data: bytes, off: int) -> tuple[int, int]:
    """Read a full-box header; returns (version, body_offset)."""
    return data[off], off + 4


def _parse_mvhd(data: bytes, b: int) -> float:
    v, off = _fullbox(data, b)
    if v == 1:
        _, _, ts, dur = struct.unpack_from(">QQIQ", data, off)
    else:
        _, _, ts, dur = struct.unpack_from(">IIII", data, off)
    if ts == 0:
        raise ValueError("mp4: mvhd timescale 0")
    return dur / ts


def _parse_tkhd(data: bytes, b: int) -> dict:
    v, off = _fullbox(data, b)
    if v == 1:
        _, _, tid = struct.unpack_from(">QQI", data, off)
        off += 8 + 8 + 4 + 4 + 8  # ... reserved, duration
    else:
        _, _, tid = struct.unpack_from(">III", data, off)
        off += 4 + 4 + 4 + 4 + 4
    off += 8 + 2 + 2 + 2 + 2 + 36  # reserved[2], layer, alt, vol, pad, matrix
    w, h = struct.unpack_from(">II", data, off)
    return {"track_id": tid, "width": w / 65536.0, "height": h / 65536.0}


def _parse_mdhd(data: bytes, b: int) -> dict:
    v, off = _fullbox(data, b)
    if v == 1:
        _, _, ts, dur = struct.unpack_from(">QQIQ", data, off)
        off += 28
    else:
        _, _, ts, dur = struct.unpack_from(">IIII", data, off)
        off += 16
    (packed,) = struct.unpack_from(">H", data, off)
    lang = bytes(
        0x60 + ((packed >> s) & 0x1F) for s in (10, 5, 0)
    ).decode("ascii")
    if ts == 0:
        raise ValueError("mp4: mdhd timescale 0")
    return {"timescale": ts, "duration": dur, "lang": lang}


def _parse_stbl(data: bytes, b: int, e: int) -> dict:
    out: dict = {}
    stsd = _find(data, b, e, b"stsd")
    if stsd:
        _, off = _fullbox(data, stsd[0])
        (n,) = struct.unpack_from(">I", data, off)
        if n >= 1:
            # first sample entry: size + format fourcc
            out["codec"] = data[off + 8 : off + 12].decode("ascii", "replace")
            entry = off + 4 + 8
            fmt = out["codec"]
            if fmt in ("mp4a", "Opus", "opus", "fLaC", "samr", "ac-3"):
                # AudioSampleEntry: 6 reserved + 2 dref, 8 reserved,
                # channelcount(2), samplesize(2), pre_defined(2),
                # reserved(2), samplerate 16.16
                out["channels"], = struct.unpack_from(">H", data, entry + 16)
                sr, = struct.unpack_from(">I", data, entry + 24)
                out["sample_rate"] = sr >> 16
            else:
                # VisualSampleEntry: codec-config child boxes (avcC/
                # hvcC) start after its 78 fixed bytes; surfaced raw
                # for sources/h264.py parameter-set mining
                (esize,) = struct.unpack_from(">I", data, off + 4)
                entry_end = min(off + 4 + esize, e)
                if entry + 78 <= entry_end:
                    for cfc, cb, ce in _walk_boxes(data, entry + 78, entry_end):
                        if cfc in (b"avcC", b"hvcC"):
                            out["codec_config"] = data[cb:ce]
                            out["codec_config_type"] = cfc.decode()
                            break
    stts = _find(data, b, e, b"stts")
    if stts:
        _, off = _fullbox(data, stts[0])
        (n,) = struct.unpack_from(">I", data, off)
        total = 0
        for i in range(n):
            cnt, _delta = struct.unpack_from(">II", data, off + 4 + 8 * i)
            total += cnt
        out["n_samples"] = total
    return out


def _parse_trak(data: bytes, b: int, e: int) -> dict:
    out: dict = {}
    tkhd = _find(data, b, e, b"tkhd")
    if tkhd:
        out.update(_parse_tkhd(data, tkhd[0]))
    mdia = _find(data, b, e, b"mdia")
    if mdia:
        mb, me = mdia
        mdhd = _find(data, mb, me, b"mdhd")
        if mdhd:
            out.update(_parse_mdhd(data, mdhd[0]))
        hdlr = _find(data, mb, me, b"hdlr")
        if hdlr:
            _, off = _fullbox(data, hdlr[0])
            out["handler"] = data[off + 4 : off + 8].decode("ascii", "replace")
        minf = _find(data, mb, me, b"minf")
        if minf:
            stbl = _find(data, minf[0], minf[1], b"stbl")
            if stbl:
                out.update(_parse_stbl(data, stbl[0], stbl[1]))
    return out


def parse_mp4(data: bytes) -> dict:
    """Parse ISO-BMFF metadata into a flat dict.

    Returns ``brand`` (ftyp major), ``duration_s`` (mvhd) and a
    ``tracks`` list of per-trak dicts: ``track_id``, ``handler``
    (``vide``/``soun``), ``codec`` (stsd fourcc), presentation
    ``width``/``height`` (tkhd 16.16), media ``timescale`` /
    ``duration`` / ``lang`` (mdhd), ``n_samples`` (stts sum) and —
    for audio entries — ``channels`` / ``sample_rate``.  Raises
    ValueError on structural corruption."""
    if len(data) < 12:
        raise ValueError("mp4: too short")
    out: dict = {"tracks": []}
    saw_ftyp = False
    for fc, b, e in _walk_boxes(data, 0, len(data)):
        if fc == b"ftyp":
            out["brand"] = data[b : b + 4].decode("ascii", "replace")
            saw_ftyp = True
        elif fc == b"moov":
            mvhd = _find(data, b, e, b"mvhd")
            if mvhd:
                out["duration_s"] = _parse_mvhd(data, mvhd[0])
            for tfc, tb, te in _walk_boxes(data, b, e):
                if tfc == b"trak":
                    out["tracks"].append(_parse_trak(data, tb, te))
    if not saw_ftyp:
        raise ValueError("mp4: no ftyp box")
    return out


# ---------------------------------------------------------------- builder


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + body)


def _pack_lang(lang: str) -> int:
    a, b, c = (ord(ch) - 0x60 for ch in lang)
    return (a << 10) | (b << 5) | c


_UNITY = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def build_mp4(
    movie_duration_s: float,
    tracks: list[dict],
    brand: str = "isom",
    version: int = 0,
) -> bytes:
    """Build a minimal structurally-valid MP4 (inverse of
    :func:`parse_mp4` for the surfaced fields).  Each track dict:
    ``handler`` ('vide'|'soun'), ``codec`` (4-char), ``n_samples``,
    ``sample_delta``, ``timescale``, ``lang``, and either
    ``width``/``height`` (video) or ``channels``/``sample_rate``
    (audio).  ``version=1`` emits 64-bit mvhd/tkhd/mdhd full boxes
    (the large-presentation variant)."""
    movie_ts = 1000
    mvhd_dur = int(round(movie_duration_s * movie_ts))
    if version == 1:
        mvhd = _full(
            b"mvhd", 1,
            struct.pack(">QQIQ", 0, 0, movie_ts, mvhd_dur)
            + struct.pack(">i", 0x10000) + struct.pack(">h", 0x0100)
            + b"\x00" * 10 + _UNITY + b"\x00" * 24
            + struct.pack(">I", len(tracks) + 1),
        )
    else:
        mvhd = _full(
            b"mvhd", 0,
            struct.pack(">IIII", 0, 0, movie_ts, mvhd_dur)
            + struct.pack(">i", 0x10000) + struct.pack(">h", 0x0100)
            + b"\x00" * 10 + _UNITY + b"\x00" * 24
            + struct.pack(">I", len(tracks) + 1),
        )
    traks = b""
    for i, t in enumerate(tracks):
        media_dur = t["n_samples"] * t["sample_delta"]
        w = int(round(t.get("width", 0) * 65536))
        h = int(round(t.get("height", 0) * 65536))
        tk_dur = int(round(media_dur / t["timescale"] * movie_ts))
        if version == 1:
            tkhd = _full(
                b"tkhd", 1,
                struct.pack(">QQI", 0, 0, i + 1) + b"\x00" * 4
                + struct.pack(">Q", tk_dur) + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0, 0) + _UNITY
                + struct.pack(">II", w, h),
            )
        else:
            tkhd = _full(
                b"tkhd", 0,
                struct.pack(">III", 0, 0, i + 1) + b"\x00" * 4
                + struct.pack(">I", tk_dur) + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0, 0) + _UNITY
                + struct.pack(">II", w, h),
            )
        if version == 1:
            mdhd = _full(
                b"mdhd", 1,
                struct.pack(
                    ">QQIQ", 0, 0, t["timescale"], media_dur
                )
                + struct.pack(">HH", _pack_lang(t["lang"]), 0),
            )
        else:
            mdhd = _full(
                b"mdhd", 0,
                struct.pack(
                    ">IIII", 0, 0, t["timescale"], media_dur
                )
                + struct.pack(">HH", _pack_lang(t["lang"]), 0),
            )
        hdlr = _full(
            b"hdlr", 0,
            b"\x00" * 4 + t["handler"].encode()
            + b"\x00" * 12 + b"\x00",
        )
        if t["handler"] == "soun":
            entry = _box(
                t["codec"].encode(),
                b"\x00" * 6 + struct.pack(">H", 1)  # dref index
                + b"\x00" * 8
                + struct.pack(">HHHH", t["channels"], 16, 0, 0)
                + struct.pack(">I", t["sample_rate"] << 16),
            )
        else:
            cfg = b""
            if t.get("codec_config"):
                cfg = _box(
                    t.get("codec_config_type", "avcC").encode(),
                    t["codec_config"],
                )
            entry = _box(
                t["codec"].encode(),
                b"\x00" * 6 + struct.pack(">H", 1)
                + b"\x00" * 16
                + struct.pack(">HH", int(t.get("width", 0)),
                              int(t.get("height", 0)))
                + struct.pack(">II", 0x00480000, 0x00480000)
                + b"\x00" * 4 + struct.pack(">H", 1)
                + b"\x00" * 32
                + struct.pack(">Hh", 0x18, -1)
                + cfg,
            )
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stts = _full(
            b"stts", 0,
            struct.pack(">III", 1, t["n_samples"], t["sample_delta"]),
        )
        stsz = _full(
            b"stsz", 0, struct.pack(">III", 0x10, t["n_samples"], 0)
        )
        stsc = _full(
            b"stsc", 0, struct.pack(">IIII", 1, 1, t["n_samples"], 1)
        )
        stco = _full(b"stco", 0, struct.pack(">II", 1, 0))
        stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
        # dref with one self-contained "url " entry
        dref = _full(
            b"dref", 0,
            struct.pack(">I", 1)
            + struct.pack(">I", 12) + b"url " + struct.pack(">I", 1),
        )
        dinf = _box(b"dinf", dref)
        if t["handler"] == "soun":
            xmhd = _full(b"smhd", 0, struct.pack(">HH", 0, 0))
        else:
            xmhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
        minf = _box(b"minf", xmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    ftyp = _box(
        b"ftyp", brand.encode() + struct.pack(">I", 0x200)
        + b"isom" + b"mp41"
    )
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat
