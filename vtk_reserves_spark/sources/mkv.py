"""Matroska / WebM container metadata — pure-stdlib EBML walker +
fixture builder.

WebM (Matroska profiled for VP8/VP9/AV1 + Vorbis/Opus) is the
second video container of the web after MP4; the same pre-decode
curation filters apply — duration windows, resolution floors, codec
allowlists, language stratification.  Reference parity note: the
reference repo has no video surface; this completes the container
family (ISO-BMFF `sources/mp4.py`, AVI `sources/avi.py`) for the
100 TB multimodal brief.

The walker reads EBML directly (RFC 8794): variable-length element
IDs (marker bit kept) and sizes (marker bit stripped), descending
EBML header → DocType, Segment → Info (TimestampScale, float
Duration, MuxingApp) and Segment → Tracks → TrackEntry (track type,
CodecID, language, Video PixelWidth/PixelHeight, Audio
SamplingFrequency/Channels).  Cluster payloads are never read —
metadata is a bounded prefix walk, the crawl-scale posture.

The builder emits spec-shaped EBML so every parse path sits under
the driver oracle.  Corrupt structures raise ValueError — the Spark
operator (`multimodal.mkv_metadata`) maps that to an error column
under ``on_error='null'``.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mkv", "build_mkv"]

# element IDs (with marker bits, as they appear on the wire)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUXAPP = 0x4D80
_WRITAPP = 0x5741
_TRACKS = 0x1654AE6B
_TRACKENTRY = 0xAE
_TRACKTYPE = 0x83
_CODECID = 0x86
_LANGUAGE = 0x22B59C
_VIDEO = 0xE0
_PIXELW = 0xB0
_PIXELH = 0xBA
_AUDIO = 0xE1
_SAMPFREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """Read one EBML varint at pos; returns (value, new_pos)."""
    if pos >= len(data):
        raise ValueError("ebml: truncated varint")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: invalid varint lead byte 0")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("ebml: varint overruns buffer")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def _walk(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) within [start, end)."""
    pos = start
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError("ebml: element overruns parent")
        yield eid, pos, pos + size
        pos += size


def _uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def _float(data: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", data[b:e])[0]
    if n == 8:
        return struct.unpack(">d", data[b:e])[0]
    raise ValueError(f"ebml: bad float size {n}")


def _text(data: bytes, b: int, e: int) -> str:
    return data[b:e].decode("utf-8", "replace").rstrip("\x00")


def parse_mkv(data: bytes) -> dict:
    """Parse Matroska/WebM metadata into a flat dict: ``doc_type``
    ('webm'|'matroska'), ``duration_s`` (Info Duration x
    TimestampScale), ``muxing_app``, and a ``tracks`` list of dicts
    (``type`` 'video'|'audio'|other int, ``codec``, ``lang``,
    ``width``/``height`` or ``sample_rate``/``channels``).  Stops at
    the first Cluster — metadata only.  Raises ValueError on
    structural corruption."""
    out: dict = {"tracks": []}
    saw_ebml = False
    for eid, b, e in _walk(data, 0, len(data)):
        if eid == _EBML:
            saw_ebml = True
            for sid, sb, se in _walk(data, b, e):
                if sid == _DOCTYPE:
                    out["doc_type"] = _text(data, sb, se)
        elif eid == _SEGMENT:
            ts_scale = 1_000_000  # ns, spec default
            raw_duration = None
            for sid, sb, se in _walk(data, b, e):
                if sid == _INFO:
                    for iid, ib, ie in _walk(data, sb, se):
                        if iid == _TS_SCALE:
                            ts_scale = _uint(data, ib, ie)
                        elif iid == _DURATION:
                            raw_duration = _float(data, ib, ie)
                        elif iid == _MUXAPP:
                            out["muxing_app"] = _text(data, ib, ie)
                elif sid == _TRACKS:
                    for tid, tb, te in _walk(data, sb, se):
                        if tid != _TRACKENTRY:
                            continue
                        tr: dict = {"lang": "eng"}  # spec default
                        for fid, fb, fe in _walk(data, tb, te):
                            if fid == _TRACKTYPE:
                                tt = _uint(data, fb, fe)
                                tr["type"] = {1: "video", 2: "audio"}.get(
                                    tt, tt
                                )
                            elif fid == _CODECID:
                                tr["codec"] = _text(data, fb, fe)
                            elif fid == _LANGUAGE:
                                tr["lang"] = _text(data, fb, fe)
                            elif fid == _VIDEO:
                                for vid, vb, ve in _walk(data, fb, fe):
                                    if vid == _PIXELW:
                                        tr["width"] = _uint(data, vb, ve)
                                    elif vid == _PIXELH:
                                        tr["height"] = _uint(data, vb, ve)
                            elif fid == _AUDIO:
                                for aid, ab, ae in _walk(data, fb, fe):
                                    if aid == _SAMPFREQ:
                                        tr["sample_rate"] = _float(
                                            data, ab, ae
                                        )
                                    elif aid == _CHANNELS:
                                        tr["channels"] = _uint(data, ab, ae)
                        out["tracks"].append(tr)
                elif sid == _CLUSTER:
                    break
            if raw_duration is not None:
                out["duration_s"] = raw_duration * ts_scale / 1e9
    if not saw_ebml:
        raise ValueError("ebml: no EBML header")
    return out


# ---------------------------------------------------------------- builder


def _vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint_size(val: int) -> bytes:
    # shortest encoding with the marker bit
    for n in range(1, 9):
        if val < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | val).to_bytes(n, "big")
    raise ValueError("ebml: size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, val: int) -> bytes:
    n = max(1, (val.bit_length() + 7) // 8)
    return _el(eid, val.to_bytes(n, "big"))


def build_mkv(
    doc_type: str,
    duration_s: float,
    tracks: list[dict],
    ts_scale: int = 1_000_000,
    muxing_app: str = "vtk_reserves_spark",
) -> bytes:
    """Build a minimal spec-shaped Matroska/WebM blob (inverse of
    :func:`parse_mkv` for the surfaced fields).  Each track dict:
    ``type`` ('video'|'audio'), ``codec``, ``lang``, and
    ``width``/``height`` or ``sample_rate``/``channels``.  Duration
    is stored as an 8-byte float in ``ts_scale`` units."""
    ebml = _el(
        _EBML,
        _el_uint(0x4286, 1)          # EBMLVersion
        + _el_uint(0x42F7, 1)        # EBMLReadVersion
        + _el(_DOCTYPE, doc_type.encode())
        + _el_uint(0x4287, 4)        # DocTypeVersion
        + _el_uint(0x4285, 2),       # DocTypeReadVersion
    )
    info = _el(
        _INFO,
        _el_uint(_TS_SCALE, ts_scale)
        + _el(_DURATION, struct.pack(">d", duration_s * 1e9 / ts_scale))
        + _el(_MUXAPP, muxing_app.encode())
        + _el(_WRITAPP, muxing_app.encode()),
    )
    entries = b""
    for i, t in enumerate(tracks):
        body = (
            _el_uint(0xD7, i + 1)                       # TrackNumber
            + _el_uint(0x73C5, i + 1)                   # TrackUID
            + _el_uint(_TRACKTYPE, 1 if t["type"] == "video" else 2)
            + _el(_CODECID, t["codec"].encode())
        )
        if t.get("lang"):  # absent element -> spec default 'eng'
            body += _el(_LANGUAGE, t["lang"].encode())
        if t["type"] == "video":
            body += _el(
                _VIDEO,
                _el_uint(_PIXELW, t["width"])
                + _el_uint(_PIXELH, t["height"]),
            )
        else:
            body += _el(
                _AUDIO,
                _el(_SAMPFREQ, struct.pack(">d", float(t["sample_rate"])))
                + _el_uint(_CHANNELS, t["channels"]),
            )
        entries += _el(_TRACKENTRY, body)
    tracks_el = _el(_TRACKS, entries)
    cluster = _el(_CLUSTER, _el_uint(0xE7, 0))  # empty timestamped cluster
    segment = _el(_SEGMENT, info + tracks_el + cluster)
    return ebml + segment
