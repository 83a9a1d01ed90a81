"""EXIF metadata — pure-stdlib TIFF-IFD parser + fixture builder.

EXIF is the universal photo-metadata container (CIPA DC-008 / JEITA
CP-3451, structurally a TIFF byte stream): camera make/model,
capture time, exposure, pixel dimensions, orientation and GPS
position.  For crawl-scale image curation it is a first-class signal
— capture-time dedup, camera-source stratification, geo filtering
and orientation-aware decoding all key on it.  Reference parity
note: the reference repo has no image metadata surface at all; this
exists for the 100 TB multimodal brief.

The parser walks the TIFF structure directly (both byte orders,
inline-vs-offset values, IFD0 → Exif sub-IFD → GPS sub-IFD) and the
envelope sniffers pull the TIFF blob out of the four containers that
carry EXIF in the wild: JPEG (APP1 ``Exif\\0\\0``), TIFF itself, PNG
(``eXIf`` chunk, PNG 1.5), WebP (RIFF ``EXIF`` chunk).  The builder
emits valid blobs for fixtures so every parse path sits under the
driver oracle.  Corrupt structures raise ValueError — the Spark
operator (`multimodal.exif_metadata`) maps that to an error column
under ``on_error='null'``, the crawl posture.
"""

from __future__ import annotations

import struct

__all__ = ["parse_exif", "extract_exif", "build_exif", "insert_exif_jpeg"]

# tag -> (name, ifd) for the fields surfaced to the DataFrame layer.
_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0131: "software",
    0x0132: "datetime",
    0x8769: "_exif_ifd",
    0x8825: "_gps_ifd",
}
_EXIF_TAGS = {
    0x829A: "exposure_time",
    0x829D: "fnumber",
    0x8827: "iso",
    0x9003: "datetime_original",
    0x920A: "focal_length",
    0xA002: "width",
    0xA003: "height",
}
_GPS_TAGS = {
    0x0001: "gps_lat_ref",
    0x0002: "gps_lat",
    0x0003: "gps_lon_ref",
    0x0004: "gps_lon",
    0x0005: "gps_alt_ref",
    0x0006: "gps_alt",
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_entry(data: bytes, off: int, e: str):
    tag, typ, count = struct.unpack_from(e + "HHI", data, off)
    size = _TYPE_SIZE.get(typ, 1) * count
    if size <= 4:
        voff = off + 8
    else:
        (voff,) = struct.unpack_from(e + "I", data, off + 8)
    if voff + size > len(data):
        raise ValueError("EXIF value outside blob")
    if typ == 2:  # ASCII, NUL-terminated
        raw = data[voff : voff + count]
        return tag, raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ in (1, 7):
        raw = data[voff : voff + count]
        return tag, raw[0] if count == 1 else raw
    if typ == 3:
        vals = struct.unpack_from(f"{e}{count}H", data, voff)
    elif typ == 4:
        vals = struct.unpack_from(f"{e}{count}I", data, voff)
    elif typ == 9:
        vals = struct.unpack_from(f"{e}{count}i", data, voff)
    elif typ in (5, 10):
        fmt = "I" if typ == 5 else "i"
        nums = struct.unpack_from(f"{e}{2 * count}{fmt}", data, voff)
        vals = tuple(
            n / d if d else float("nan")
            for n, d in zip(nums[0::2], nums[1::2])
        )
    else:
        raise ValueError(f"unsupported EXIF type {typ}")
    return tag, vals[0] if count == 1 else vals


def _walk_ifd(data: bytes, off: int, e: str, names: dict) -> dict:
    if off + 2 > len(data):
        raise ValueError("EXIF IFD outside blob")
    (n,) = struct.unpack_from(e + "H", data, off)
    out = {}
    for i in range(n):
        eoff = off + 2 + 12 * i
        if eoff + 12 > len(data):
            raise ValueError("EXIF entry outside blob")
        try:
            tag, val = _read_entry(data, eoff, e)
        except ValueError:
            raise
        name = names.get(tag)
        if name:
            out[name] = val
    return out


def parse_exif(data: bytes) -> dict:
    """Parse a TIFF-structured EXIF blob into a flat dict.

    GPS coordinates are resolved to signed decimal degrees
    (``gps_lat`` / ``gps_lon``; S/W refs negate), altitude to signed
    meters (``gps_alt``; ref byte 1 = below sea level).  Missing
    fields are simply absent.  Raises ValueError on structural
    corruption."""
    if len(data) < 8:
        raise ValueError("EXIF blob too short")
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("bad EXIF byte order")
    magic, ifd0 = struct.unpack_from(e + "HI", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic in EXIF")
    out = _walk_ifd(data, ifd0, e, _IFD0_TAGS)
    exif_off = out.pop("_exif_ifd", None)
    if exif_off is not None:
        out.update(_walk_ifd(data, exif_off, e, _EXIF_TAGS))
    gps_off = out.pop("_gps_ifd", None)
    if gps_off is not None:
        gps = _walk_ifd(data, gps_off, e, _GPS_TAGS)
        for axis, neg in (("lat", "S"), ("lon", "W")):
            dms = gps.get(f"gps_{axis}")
            if dms is not None:
                if not isinstance(dms, tuple):
                    dms = (dms,)
                deg = sum(v / (60.0**i) for i, v in enumerate(dms))
                if gps.get(f"gps_{axis}_ref") == neg:
                    deg = -deg
                out[f"gps_{axis}"] = deg
        alt = gps.get("gps_alt")
        if alt is not None:
            if gps.get("gps_alt_ref", 0) == 1:
                alt = -alt
            out["gps_alt"] = alt
    return out


def extract_exif(payload: bytes) -> dict | None:
    """Sniff the container and parse its EXIF blob, or None when the
    container carries none.  Containers: JPEG APP1, raw TIFF, PNG
    eXIf chunk, WebP RIFF EXIF chunk."""
    if payload[:2] == b"\xff\xd8":  # JPEG: walk markers for APP1
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9 or marker == 0xDA:
                break
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            body = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
                return parse_exif(body[6:])
            pos += 2 + seglen
        return None
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return parse_exif(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        pos = 8
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            if tag == b"eXIf":
                return parse_exif(payload[pos + 8 : pos + 8 + clen])
            if tag == b"IEND":
                break
            pos += 12 + clen
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        pos = 12
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            if tag == b"EXIF":
                return parse_exif(payload[pos + 8 : pos + 8 + clen])
            pos += 8 + clen + (clen & 1)
        return None
    raise ValueError("unrecognized EXIF container")


# ---------------------------------------------------------------- builder


def _entries(fields: list[tuple[int, int, object]], e: str, base: int):
    """Serialize IFD entries; returns (entry_bytes, tail_bytes) where
    tail holds out-of-line values starting at ``base``."""
    entries = b""
    tail = b""
    for tag, typ, val in sorted(fields):
        if typ == 2:
            raw = val.encode("ascii") + b"\x00"
            count = len(raw)
        elif typ == 3:
            vals = val if isinstance(val, tuple) else (val,)
            raw = struct.pack(f"{e}{len(vals)}H", *vals)
            count = len(vals)
        elif typ == 4:
            vals = val if isinstance(val, tuple) else (val,)
            raw = struct.pack(f"{e}{len(vals)}I", *vals)
            count = len(vals)
        elif typ == 5:
            pairs = val if isinstance(val[0], tuple) else (val,)
            raw = b"".join(struct.pack(e + "II", n, d) for n, d in pairs)
            count = len(pairs)
        elif typ == 1:
            vals = val if isinstance(val, tuple) else (val,)
            raw = bytes(vals)
            count = len(vals)
        else:
            raise ValueError(f"builder: unsupported type {typ}")
        if len(raw) <= 4:
            vfield = raw.ljust(4, b"\x00")
        else:
            vfield = struct.pack(e + "I", base + len(tail))
            tail += raw + (b"\x00" if len(raw) & 1 else b"")
        entries += struct.pack(e + "HHI", tag, typ, count) + vfield
    return entries, tail


def _ifd(fields, e, off):
    """One IFD (count + entries + next=0) at offset ``off``; returns
    the serialized bytes."""
    n = len(fields)
    base = off + 2 + 12 * n + 4
    entries, tail = _entries(fields, e, base)
    return struct.pack(e + "H", n) + entries + struct.pack(e + "I", 0) + tail


def build_exif(
    fields: dict,
    byte_order: str = "II",
) -> bytes:
    """Build a TIFF-structured EXIF blob from a flat dict (inverse of
    :func:`parse_exif` for the surfaced fields).  GPS lat/lon are
    given as signed decimal degrees and split into D/M/S rationals
    (seconds in tenths); exposure/fnumber/focal_length as (num, den)
    rational tuples or floats (floats become value/10000)."""
    e = "<" if byte_order == "II" else ">"

    def rat(v):
        if isinstance(v, tuple):
            return v
        return (int(round(v * 10000)), 10000)

    ifd0 = []
    for tag, name in _IFD0_TAGS.items():
        if name in fields:
            typ = 2 if name in ("make", "model", "software", "datetime") else 3
            ifd0.append((tag, typ, fields[name]))
    exif = []
    for tag, name in _EXIF_TAGS.items():
        if name in fields:
            if name in ("iso",):
                exif.append((tag, 3, fields[name]))
            elif name in ("width", "height"):
                exif.append((tag, 4, fields[name]))
            else:
                typ = 2 if name == "datetime_original" else 5
                exif.append(
                    (tag, typ, fields[name] if typ == 2 else rat(fields[name]))
                )
    gps = []
    for axis, (ref_tag, val_tag), (pos_ref, neg_ref) in (
        ("gps_lat", (0x0001, 0x0002), ("N", "S")),
        ("gps_lon", (0x0003, 0x0004), ("E", "W")),
    ):
        # exact form: (ref, deg, min, sec_tenths) skips the float
        # decimal->DMS split (fixture closed forms need exactness)
        if f"{axis}_dms" in fields:
            ref, d, m, st = fields[f"{axis}_dms"]
            gps.append((ref_tag, 2, ref))
            gps.append((val_tag, 5, ((d, 1), (m, 1), (st, 10))))
            continue
        if axis in fields:
            v = fields[axis]
            ref = pos_ref if v >= 0 else neg_ref
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s_tenths = int(round(((v - d) * 60 - m) * 60 * 10))
            gps.append((ref_tag, 2, ref))
            gps.append((val_tag, 5, ((d, 1), (m, 1), (s_tenths, 10))))
    if "gps_alt" in fields:
        v = fields["gps_alt"]
        if isinstance(v, tuple):  # exact rational + explicit below flag
            below = bool(fields.get("gps_alt_below"))
            gps.append((0x0005, 1, 1 if below else 0))
            gps.append((0x0006, 5, v))
        else:
            gps.append((0x0005, 1, 1 if v < 0 else 0))
            gps.append((0x0006, 5, rat(abs(v))))

    # layout: header, IFD0 (+ pointers), Exif IFD, GPS IFD
    def sz(fields_):
        entries, tail = _entries(fields_, e, 0)
        return 2 + len(entries) + 4 + len(tail)

    ifd0_full = list(ifd0)
    off = 8
    exif_off = off + sz(ifd0_full + ([(0x8769, 4, 0)] if exif else [])
                        + ([(0x8825, 4, 0)] if gps else []))
    if exif:
        ifd0_full.append((0x8769, 4, exif_off))
    gps_off = exif_off + (sz(exif) if exif else 0)
    if gps:
        ifd0_full.append((0x8825, 4, gps_off))
    blob = struct.pack(e + "2sHI", byte_order.encode(), 42, 8)
    blob += _ifd(ifd0_full, e, 8)
    if exif:
        assert len(blob) == exif_off, (len(blob), exif_off)
        blob += _ifd(exif, e, exif_off)
    if gps:
        assert len(blob) == gps_off, (len(blob), gps_off)
        blob += _ifd(gps, e, gps_off)
    return blob


def insert_exif_jpeg(jpeg: bytes, exif_blob: bytes) -> bytes:
    """Insert an EXIF APP1 segment right after SOI (the spec
    position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    body = b"Exif\x00\x00" + exif_blob
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return jpeg[:2] + seg + jpeg[2:]
