"""Web-font metadata — pure-stdlib sfnt/WOFF table walker + fixture
builder.

Font files are a steady fraction of crawl payloads (every site ships
its WOFFs) and font curation keys on header metadata: family-name
dedup, glyph-count / units-per-em sanity filters, license strings.
Reference parity note: the reference repo has no font surface; this
extends the binary-format family for the 100 TB brief.

Two framings, per the public specs (OpenType sfnt; W3C WOFF 1.0):
* **sfnt** (TTF/OTF): offset table (version, numTables) then a
  table directory of (tag, checksum, offset, length); surfaced
  tables are ``head`` (unitsPerEm, flags), ``maxp`` (numGlyphs) and
  ``name`` (nameID 1 family / 2 subfamily / 4 full name, platform 3
  UTF-16BE or platform 1 latin-1 storage).
* **WOFF**: the ``wOFF`` wrapper whose directory entries carry each
  table zlib-compressed (or stored when incompressible); entries
  decompress independently, so the walker reassembles only the
  tables it needs.

The builder emits valid blobs for both framings so every parse path
sits under the driver oracle.  Corrupt structures raise ValueError.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["parse_font", "build_font"]


def _parse_name_table(data: bytes) -> dict:
    _fmt, count, str_off = struct.unpack_from(">HHH", data, 0)
    out: dict = {}
    names = {1: "family", 2: "subfamily", 4: "full_name"}
    for i in range(count):
        pid, _eid, _lang, nid, length, off = struct.unpack_from(
            ">HHHHHH", data, 6 + 12 * i
        )
        key = names.get(nid)
        if not key or key in out:
            continue
        raw = data[str_off + off : str_off + off + length]
        if pid == 3:  # windows: UTF-16BE
            out[key] = raw.decode("utf-16-be", "replace")
        else:  # mac roman ~ latin-1 for the surfaced range
            out[key] = raw.decode("latin-1", "replace")
    return out


def _parse_tables(tables: dict) -> dict:
    out: dict = {}
    head = tables.get(b"head")
    if head:
        magic, = struct.unpack_from(">I", head, 12)
        if magic != 0x5F0F3CF5:
            raise ValueError("font: bad head magic")
        out["units_per_em"], = struct.unpack_from(">H", head, 18)
    maxp = tables.get(b"maxp")
    if maxp:
        out["num_glyphs"], = struct.unpack_from(">H", maxp, 4)
    name = tables.get(b"name")
    if name:
        out.update(_parse_name_table(name))
    return out


def parse_font(data: bytes) -> dict:
    """Parse TTF/OTF/WOFF metadata into a flat dict: ``container``
    ('sfnt'|'woff'), ``flavor`` ('truetype'|'cff'), ``n_tables``,
    ``units_per_em``, ``num_glyphs``, and name-table ``family`` /
    ``subfamily`` / ``full_name``.  Raises ValueError on structural
    corruption."""
    if len(data) < 12:
        raise ValueError("font: too short")
    tag = data[:4]
    tables: dict[bytes, bytes] = {}
    if tag == b"wOFF":
        flavor_tag = data[4:8]
        num_tables, = struct.unpack_from(">H", data, 12)
        for i in range(num_tables):
            t, off, clen, ulen = struct.unpack_from(
                ">4sIII", data, 44 + 20 * i
            )
            raw = data[off : off + clen]
            if len(raw) < clen:
                raise ValueError("font: WOFF table overruns file")
            body = raw if clen == ulen else zlib.decompress(raw)
            if len(body) != ulen:
                raise ValueError("font: WOFF origLength mismatch")
            tables[t] = body
        container = "woff"
    elif tag in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
        flavor_tag = tag
        num_tables, = struct.unpack_from(">H", data, 4)
        for i in range(num_tables):
            t, _chk, off, length = struct.unpack_from(
                ">4sIII", data, 12 + 16 * i
            )
            body = data[off : off + length]
            if len(body) < length:
                raise ValueError("font: sfnt table overruns file")
            tables[t] = body
        container = "sfnt"
    else:
        raise ValueError("font: not an sfnt or WOFF payload")
    out = {
        "container": container,
        "flavor": "cff" if flavor_tag == b"OTTO" else "truetype",
        "n_tables": num_tables,
    }
    out.update(_parse_tables(tables))
    return out


# ---------------------------------------------------------------- builder


def _name_table(family: str, subfamily: str, full: str) -> bytes:
    recs = []
    storage = b""
    for nid, val in ((1, family), (2, subfamily), (4, full)):
        raw = val.encode("utf-16-be")
        recs.append((3, 1, 0x409, nid, len(raw), len(storage)))
        storage += raw
    hdr = struct.pack(">HHH", 0, len(recs), 6 + 12 * len(recs))
    body = b"".join(struct.pack(">HHHHHH", *r) for r in recs)
    return hdr + body + storage


def build_font(
    family: str,
    units_per_em: int = 1000,
    num_glyphs: int = 100,
    subfamily: str = "Regular",
    woff: bool = False,
    flavor: str = "truetype",
) -> bytes:
    """Build a minimal metadata-complete font (inverse of
    :func:`parse_font`): head + maxp + name tables in an sfnt or a
    WOFF wrapper (tables zlib-compressed when that helps, stored
    otherwise — both directory paths exercised)."""
    # head: version(4) fontRevision(4) checksumAdj(4) magic(4)
    # flags(2) unitsPerEm(2) then dates/bounds/etc.
    head = (
        struct.pack(">IhH", 0x00010000, 1, 0)      # version, revision
        + struct.pack(">I", 0)                      # checksum adjustment
        + struct.pack(">I", 0x5F0F3CF5)             # magic
        + struct.pack(">HH", 0, units_per_em)       # flags, unitsPerEm
        + b"\x00" * 34
    )
    maxp = struct.pack(">IH", 0x00010000, num_glyphs) + b"\x00" * 26
    name = _name_table(family, subfamily, f"{family} {subfamily}")
    sfnt_tag = b"OTTO" if flavor == "cff" else b"\x00\x01\x00\x00"
    tabs = [(b"head", head), (b"maxp", maxp), (b"name", name)]
    if not woff:
        off = 12 + 16 * len(tabs)
        directory = b""
        body = b""
        for t, payload in tabs:
            directory += struct.pack(
                ">4sIII", t, 0, off + len(body), len(payload)
            )
            body += payload + b"\x00" * (-len(payload) % 4)
        return (
            sfnt_tag + struct.pack(">HHHH", len(tabs), 16, 1, 0)
            + directory + body
        )
    off = 44 + 20 * len(tabs)
    directory = b""
    body = b""
    for t, payload in tabs:
        comp = zlib.compress(payload, 9)
        raw = comp if len(comp) < len(payload) else payload
        directory += struct.pack(
            ">4sIII", t, off + len(body), len(raw), len(payload)
        ) + struct.pack(">I", 0)
        body += raw + b"\x00" * (-len(raw) % 4)
    total = off + len(body)
    hdr = struct.pack(
        ">4s4sIHHIHHIIIII", b"wOFF", sfnt_tag, total, len(tabs), 0,
        12 + 16 * len(tabs) + sum(len(p) for _, p in tabs),
        1, 0, 0, 0, 0, 0, 0,
    )
    return hdr + directory + body
