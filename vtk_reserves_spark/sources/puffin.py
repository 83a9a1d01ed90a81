"""Puffin file codec — Iceberg's stats/blob container, and the v3
home of DELETION VECTORS.

Implements the public Puffin spec (iceberg format/puffin-spec.md):

    Magic | Blob_1 | ... | Blob_n | Footer
    Footer = Magic | FooterPayload (JSON) | FooterPayloadSize
             (4 bytes LE) | Flags (4 bytes) | Magic

``FooterPayload`` is the ``FileMetadata`` JSON: a ``blobs`` list of
``{type, fields, snapshot-id, sequence-number, offset, length,
properties}`` plus file ``properties``.  Only uncompressed payloads
are written; compressed footers gate on read.

The ``deletion-vector-v1`` blob (Iceberg v3 row-level deletes,
deliberately Delta-compatible) frames the 64-bit portable
RoaringBitmapArray the SAME way Delta's DV files do
(`sources/roaring.py` provides the bitmap codec):

    | len (4 bytes BE) | vector (len bytes, starts with the
      portable magic 1681511377 LE) | crc-32 of vector (4 bytes BE) |

``content_offset`` in the manifest points at the length field and
``content_size_in_bytes`` covers the full frame (len + vector +
crc), so readers fetch the blob with one ranged read and never need
the footer.  TRANSCRIPTION NOTE: the framing layout is transcribed
from the public spec text without an in-container golden file from
a real v3 writer; the bitmap's own magic is strict-checked on read,
so a divergent wild blob raises instead of misreading.

Reference parity: the reference has no lakehouse layer; this
extends the Iceberg tier (SURVEY.md §8) to format-version 3 reads.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

__all__ = [
    "write_puffin", "read_puffin_footer", "read_puffin_blob",
    "dv_frame", "parse_dv_frame", "DV_BLOB_TYPE",
]

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"


def dv_frame(positions) -> bytes:
    """Row positions -> a deletion-vector-v1 blob frame
    (len + portable roaring64 + crc32)."""
    from vtk_reserves_spark.sources.roaring import serialize_roaring64

    vec = serialize_roaring64(positions)
    return (
        struct.pack(">i", len(vec))
        + vec
        + struct.pack(">I", zlib.crc32(vec) & 0xFFFFFFFF)
    )


def parse_dv_frame(buf: bytes) -> np.ndarray:
    """deletion-vector-v1 blob frame -> sorted uint64 positions.
    Strict: length, CRC and the bitmap's portable magic must all
    check out (never a silent misread of a wild blob)."""
    from vtk_reserves_spark.sources.roaring import deserialize_roaring64

    if len(buf) < 8:
        raise ValueError("puffin: truncated deletion-vector blob")
    (ln,) = struct.unpack_from(">i", buf, 0)
    if ln < 0 or 4 + ln + 4 > len(buf):
        raise ValueError(
            f"puffin: deletion-vector length {ln} exceeds blob "
            f"({len(buf)} bytes)"
        )
    vec = buf[4 : 4 + ln]
    (crc,) = struct.unpack_from(">I", buf, 4 + ln)
    if crc != (zlib.crc32(vec) & 0xFFFFFFFF):
        raise ValueError("puffin: deletion-vector CRC mismatch")
    return deserialize_roaring64(vec)


def write_puffin(path: str, blobs: list[dict],
                 properties: dict | None = None) -> list[dict]:
    """Write a Puffin file; ``blobs`` are dicts with ``type``,
    ``data`` (bytes) and optional ``fields`` / ``snapshot-id`` /
    ``sequence-number`` / ``properties``.  Returns the footer's blob
    metadata entries (offset/length filled in) — the manifests'
    ``content_offset`` / ``content_size_in_bytes`` come from
    these."""
    metas: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        off = len(MAGIC)
        for b in blobs:
            data = b["data"]
            meta = {
                "type": b["type"],
                "fields": list(b.get("fields") or []),
                "snapshot-id": int(b.get("snapshot-id", 0)),
                "sequence-number": int(b.get("sequence-number", 0)),
                "offset": off,
                "length": len(data),
            }
            if b.get("properties"):
                meta["properties"] = dict(b["properties"])
            metas.append(meta)
            fh.write(data)
            off += len(data)
        payload = json.dumps({
            "blobs": metas,
            "properties": dict(properties or {}),
        }).encode()
        fh.write(MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(struct.pack("<i", 0))  # flags: uncompressed footer
        fh.write(MAGIC)
    return metas


def read_puffin_footer(path: str) -> dict:
    """Puffin file -> FileMetadata dict (strict magic checks)."""
    with open(path, "rb") as fh:
        head = fh.read(4)
        if head != MAGIC:
            raise ValueError(f"puffin: bad leading magic {head!r}")
        fh.seek(0, 2)
        size = fh.tell()
        fh.seek(size - 12)
        tail = fh.read(12)
    (psize,) = struct.unpack_from("<i", tail, 0)
    (flags,) = struct.unpack_from("<i", tail, 4)
    if tail[8:] != MAGIC:
        raise ValueError("puffin: bad trailing magic")
    if flags & 1:
        raise ValueError(
            "puffin: compressed footer payload not supported"
        )
    start = size - 12 - psize
    with open(path, "rb") as fh:
        fh.seek(start - 4)
        if fh.read(4) != MAGIC:
            raise ValueError("puffin: bad footer magic")
        payload = fh.read(psize)
    return json.loads(payload.decode())


def read_puffin_blob(path: str, offset: int, length: int) -> bytes:
    """One ranged read of a blob (what DV readers do with the
    manifest's content_offset/content_size_in_bytes)."""
    with open(path, "rb") as fh:
        fh.seek(int(offset))
        buf = fh.read(int(length))
    if len(buf) != int(length):
        raise ValueError(
            f"puffin: short read ({len(buf)} of {length} bytes at "
            f"{offset})"
        )
    return buf
