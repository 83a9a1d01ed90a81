"""HEIF / AVIF still-image container metadata — ISO-BMFF item boxes.

HEIC (HEVC stills) and AVIF (AV1 stills) are the growing share of
web images a multimodal crawl must at least triage; like the video
side (`sources/mp4.py`, `h264.py`, `av1.py`) the pre-decode curation
signals — pixel dimensions, item types, Exif presence, payload sizes
— live entirely in the metadata boxes (ISO/IEC 23008-12):

* ``ftyp`` brands (avif / heic / mif1 …);
* ``meta``: ``hdlr`` ('pict'), ``pitm`` (primary item), ``iinf`` /
  ``infe`` (item ids + fourcc types), ``iprp`` = ``ipco`` (property
  container; ``ispe`` carries width/height) + ``ipma`` (item ->
  property associations), ``iloc`` (extent offsets/lengths).

Parsing walks the same box machinery as `sources/mp4.py` and never
touches ``mdat`` payload bytes — scan-bound like the other metadata
miners.  The builder emits the minimal spec-shaped layout (version-0
full boxes, 4-byte iloc offsets patched after sizing) for the
closed-form oracle fixtures (q:heif_metadata).

Frame DECODE stays out of scope with the same rationale as
H.264/HEVC (`SURVEY.md` round-5 notes): both payload codecs need
full intra prediction; the container layer here is the curation
surface.
"""

from __future__ import annotations

import struct

from vtk_reserves_spark.sources.mp4 import _fullbox, _walk_boxes

__all__ = ["parse_heif", "build_heif"]


def parse_heif(data: bytes) -> dict:
    """HEIF/AVIF bytes -> ``{"brand", "primary_item", "items":
    [{"item_id", "item_type", "item_name", "width", "height",
    "size", "n_extents"}]}`` (metadata only; mdat untouched)."""
    brand = None
    meta_span = None
    for fc, b, e in _walk_boxes(data, 0, len(data)):
        if fc == b"ftyp":
            brand = data[b : b + 4].decode("latin-1")
        elif fc == b"meta":
            _, off = _fullbox(data, b)
            meta_span = (off, e)
    if brand is None or meta_span is None:
        raise ValueError("heif: missing ftyp/meta box")
    mb, me = meta_span
    primary = None
    items: dict[int, dict] = {}
    props: list[dict] = []
    assoc: dict[int, list[int]] = {}
    for fc, b, e in _walk_boxes(data, mb, me):
        if fc == b"pitm":
            ver, off = _fullbox(data, b)
            primary = (
                struct.unpack_from(">H", data, off)[0]
                if ver == 0
                else struct.unpack_from(">I", data, off)[0]
            )
        elif fc == b"iinf":
            ver, off = _fullbox(data, b)
            off += 2 if ver == 0 else 4  # entry_count
            for ifc, ib, ie in _walk_boxes(data, off, e):
                if ifc != b"infe":
                    continue
                iver, ioff = _fullbox(data, ib)
                if iver < 2:
                    raise ValueError("heif: infe v0/v1 not supported")
                if iver == 2:
                    (iid,) = struct.unpack_from(">H", data, ioff)
                    ioff += 2
                else:
                    (iid,) = struct.unpack_from(">I", data, ioff)
                    ioff += 4
                ioff += 2  # protection index
                itype = data[ioff : ioff + 4].decode("latin-1")
                ioff += 4
                name_end = data.index(b"\x00", ioff, ie)
                items[iid] = {
                    "item_id": iid,
                    "item_type": itype,
                    "item_name": data[ioff:name_end].decode("utf-8"),
                    "width": None,
                    "height": None,
                    "size": 0,
                    "n_extents": 0,
                }
        elif fc == b"iprp":
            for pfc, pb, pe in _walk_boxes(data, b, e):
                if pfc == b"ipco":
                    for cfc, cb, ce in _walk_boxes(data, pb, pe):
                        p = {"type": cfc.decode("latin-1")}
                        if cfc == b"ispe":
                            _, coff = _fullbox(data, cb)
                            p["width"], p["height"] = struct.unpack_from(
                                ">II", data, coff
                            )
                        props.append(p)
                elif pfc == b"ipma":
                    ver, off = _fullbox(data, pb)
                    flags = struct.unpack_from(">I", data, pb)[0] & 0xFFFFFF
                    (n,) = struct.unpack_from(">I", data, off)
                    off += 4
                    for _ in range(n):
                        if ver == 0:
                            (iid,) = struct.unpack_from(">H", data, off)
                            off += 2
                        else:
                            (iid,) = struct.unpack_from(">I", data, off)
                            off += 4
                        cnt = data[off]
                        off += 1
                        idxs = []
                        for _ in range(cnt):
                            if flags & 1:
                                (v,) = struct.unpack_from(">H", data, off)
                                off += 2
                                idxs.append(v & 0x7FFF)
                            else:
                                idxs.append(data[off] & 0x7F)
                                off += 1
                        assoc[iid] = idxs
        elif fc == b"iloc":
            ver, off = _fullbox(data, b)
            sizes = data[off]
            offset_size, length_size = sizes >> 4, sizes & 0xF
            base_size = data[off + 1] >> 4
            off += 2
            if ver < 2:
                (n,) = struct.unpack_from(">H", data, off)
                off += 2
            else:
                (n,) = struct.unpack_from(">I", data, off)
                off += 4

            def read_n(o, w):
                if w == 0:
                    return 0, o
                v = int.from_bytes(data[o : o + w], "big")
                return v, o + w

            for _ in range(n):
                if ver < 2:
                    (iid,) = struct.unpack_from(">H", data, off)
                    off += 2
                else:
                    (iid,) = struct.unpack_from(">I", data, off)
                    off += 4
                if ver in (1, 2):
                    off += 2  # construction method
                off += 2  # data reference index
                _, off = read_n(off, base_size)
                (ec,) = struct.unpack_from(">H", data, off)
                off += 2
                total = 0
                for _ in range(ec):
                    _, off = read_n(off, offset_size)
                    ln, off = read_n(off, length_size)
                    total += ln
                if iid in items:
                    items[iid]["size"] = total
                    items[iid]["n_extents"] = ec
    # resolve ispe associations (property indices are 1-based)
    for iid, idxs in assoc.items():
        if iid not in items:
            continue
        for ix in idxs:
            if 1 <= ix <= len(props) and props[ix - 1].get("type") == "ispe":
                items[iid]["width"] = int(props[ix - 1]["width"])
                items[iid]["height"] = int(props[ix - 1]["height"])
    return {
        "brand": brand,
        "primary_item": primary,
        "items": [items[k] for k in sorted(items)],
    }


# --------------------------------------------------------------- builder


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes, flags: int = 0) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


def build_heif(
    items: list[dict],
    brand: str = "avif",
    primary_item: int | None = None,
) -> bytes:
    """items: dicts with ``item_id``, ``item_type`` (4cc), optional
    ``width``/``height`` (adds an ispe property), ``payload`` bytes
    -> minimal spec-shaped HEIF/AVIF."""
    if not items:
        raise ValueError("heif: need at least one item")
    primary = primary_item if primary_item is not None else items[0]["item_id"]
    compat = {"avif": b"avifmif1miaf", "heic": b"heicmif1miaf"}.get(
        brand, b"mif1miaf\x00\x00\x00\x00"[:12]
    )
    ftyp = _box(b"ftyp", brand.encode("latin-1")[:4].ljust(4)
                + struct.pack(">I", 0) + compat)
    hdlr = _full(
        b"hdlr", 0,
        struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"\x00",
    )
    pitm = _full(b"pitm", 0, struct.pack(">H", primary))
    infes = b"".join(
        _full(
            b"infe", 2,
            struct.pack(">HH", it["item_id"], 0)
            + it["item_type"].encode("latin-1")[:4].ljust(4)
            + it.get("item_name", "").encode() + b"\x00",
        )
        for it in items
    )
    iinf = _full(b"iinf", 0, struct.pack(">H", len(items)) + infes)
    # properties: one ispe per sized item, associated 1-based in order
    props = []
    assoc_entries = []
    for it in items:
        idxs = []
        if it.get("width") is not None:
            props.append(_full(
                b"ispe", 0,
                struct.pack(">II", int(it["width"]), int(it["height"])),
            ))
            idxs.append(len(props))  # 1-based
        assoc_entries.append((it["item_id"], idxs))
    ipco = _box(b"ipco", b"".join(props))
    ipma_body = struct.pack(">I", len(assoc_entries))
    for iid, idxs in assoc_entries:
        ipma_body += struct.pack(">H", iid) + bytes([len(idxs)])
        for ix in idxs:
            ipma_body += bytes([0x80 | ix])  # essential + 7-bit index
    ipma = _full(b"ipma", 0, ipma_body)
    iprp = _box(b"iprp", ipco + ipma)
    # iloc with 4-byte offsets patched after layout
    payloads = [bytes(it.get("payload", b"")) for it in items]
    iloc_body = bytearray(
        bytes([(4 << 4) | 4, 0]) + struct.pack(">H", len(items))
    )
    patch_at = []
    for it, pl in zip(items, payloads):
        iloc_body += struct.pack(">HH", it["item_id"], 0)
        iloc_body += struct.pack(">H", 1)  # extent_count
        patch_at.append(len(iloc_body))
        iloc_body += struct.pack(">II", 0, len(pl))
    iloc = _full(b"iloc", 0, bytes(iloc_body))
    meta = _full(b"meta", 0, hdlr + pitm + iinf + iprp + iloc)
    mdat_payload = b"".join(payloads)
    out = bytearray(ftyp + meta + _box(b"mdat", mdat_payload))
    # patch absolute extent offsets into the iloc copy inside `out`
    iloc_pos = bytes(out).index(b"iloc") + 4 + 4  # past fourcc + verflags
    body_pos = iloc_pos
    mdat_data_start = len(ftyp) + len(meta) + 8
    run = 0
    for pa, pl in zip(patch_at, payloads):
        struct.pack_into(">I", out, body_pos + pa, mdat_data_start + run)
        run += len(pl)
    return bytes(out)
