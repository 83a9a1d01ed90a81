"""Ogg container metadata — pure-stdlib page/packet walker for
Vorbis and Opus streams + fixture builder.

Ogg (RFC 3533) wraps the two dominant open audio codecs in crawls —
Vorbis and Opus (RFC 7845) — and podcast/speech corpora lean heavily
on it.  Curation filters on header metadata: duration windows,
channel/sample-rate checks, VorbisComment title/artist dedup keys.
Reference parity note: the reference repo has no audio surface; this
completes the MP3/MP4/FLAC/WAV family for the 100 TB multimodal
brief.

The walker reads pages directly ("OggS" capture, 27-byte header,
segment lacing table, CRC-32 with the Ogg polynomial 0x04C11DB7
verified per page), reassembles the first packets of the first
logical stream to classify the codec (``\\x01vorbis`` ID header vs
``OpusHead``), pulls channels / sample rate / pre-skip, parses the
VorbisComment block (``\\x03vorbis`` / ``OpusTags``) for text tags,
and takes the stream's LAST page granule position for the
sample-exact duration (Opus granules run at 48 kHz minus pre-skip,
per RFC 7845 §4).

The builder emits valid pages (correct CRCs, lacing, BOS/EOS flags)
so every parse path sits under the driver oracle.  Corrupt
structures raise ValueError — the Spark operator
(`multimodal.ogg_metadata`) maps that to an error column under
``on_error='null'``, the crawl posture.
"""

from __future__ import annotations

import struct

__all__ = ["parse_ogg", "build_ogg"]


def _crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def _ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) & 0xFF) ^ b]
    return r


def _pages(data: bytes):
    """Yield (header_type, granule, serial, segments_bytes, lacing)
    per page, CRC-verified."""
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: bad capture pattern")
        (ver, htype, granule, serial, _seq, crc, nsegs) = struct.unpack_from(
            "<BBqIIIB", data, pos + 4
        )
        if ver != 0:
            raise ValueError(f"ogg: unsupported version {ver}")
        lacing = data[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(lacing)
        end = pos + 27 + nsegs + body_len
        if end > len(data):
            raise ValueError("ogg: page body overruns file")
        page = bytearray(data[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("ogg: page CRC mismatch")
        yield htype, granule, serial, data[pos + 27 + nsegs : end], lacing
        pos = end
    if pos != len(data):
        raise ValueError("ogg: trailing garbage")


def _packets(pages):
    """Reassemble packets across pages; yields complete packets."""
    buf = b""
    for _htype, _granule, _serial, body, lacing in pages:
        off = 0
        for lace in lacing:
            buf += body[off : off + lace]
            off += lace
            if lace < 255:
                yield buf
                buf = b""


def _comments(block: bytes) -> dict:
    (vlen,) = struct.unpack_from("<I", block, 0)
    pos = 4 + vlen
    vendor = block[4 : 4 + vlen].decode("utf-8", "replace")
    (n,) = struct.unpack_from("<I", block, pos)
    pos += 4
    out = {"vendor": vendor}
    for _ in range(n):
        (clen,) = struct.unpack_from("<I", block, pos)
        pos += 4
        item = block[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        if "=" in item:
            k, v = item.split("=", 1)
            out.setdefault(k.lower(), v)
    return out


def parse_ogg(data: bytes) -> dict:
    """Parse Ogg metadata into a flat dict: ``codec``
    ('vorbis'|'opus'), ``channels``, ``sample_rate`` (Vorbis rate /
    Opus input rate), ``duration_s`` (last-page granule;
    48 kHz-minus-pre-skip for Opus), plus lower-cased VorbisComment
    tags (``title``/``artist``/``album``/``vendor``...).  Raises
    ValueError on structural corruption (bad capture, CRC mismatch,
    unknown first packet)."""
    if data[:4] != b"OggS":
        raise ValueError("ogg: not an Ogg stream")
    page_list = list(_pages(data))
    first_serial = page_list[0][2]
    own = [p for p in page_list if p[2] == first_serial]
    pkts = _packets(iter(own))
    first = next(pkts, None)
    if first is None:
        raise ValueError("ogg: no packets")
    out: dict = {}
    if first[:7] == b"\x01vorbis":
        _, ch, sr = struct.unpack_from("<IBI", first, 7)
        out.update(codec="vorbis", channels=ch, sample_rate=sr)
        pre_skip = 0
        gr_rate = sr
        second = next(pkts, b"")
        if second[:7] == b"\x03vorbis":
            out.update(_comments(second[7:]))
    elif first[:8] == b"OpusHead":
        ch = first[9]
        (pre_skip,) = struct.unpack_from("<H", first, 10)
        (sr,) = struct.unpack_from("<I", first, 12)
        out.update(codec="opus", channels=ch, sample_rate=sr)
        gr_rate = 48000
        second = next(pkts, b"")
        if second[:8] == b"OpusTags":
            out.update(_comments(second[8:]))
    else:
        raise ValueError("ogg: unknown codec (first packet)")
    last_granule = max(
        (g for _h, g, _s, _b, _l in own if g >= 0), default=0
    )
    out["duration_s"] = max(0, last_granule - pre_skip) / gr_rate
    return out


# ---------------------------------------------------------------- builder


def _page(
    serial: int, seq: int, granule: int, packets: list[bytes],
    htype: int = 0,
) -> bytes:
    lacing = b""
    body = b""
    for p in packets:
        body += p
        n, rem = divmod(len(p), 255)
        lacing += b"\xff" * n + bytes([rem])
    hdr = (
        b"OggS"
        + struct.pack(
            "<BBqIIIB", 0, htype, granule, serial, seq, 0, len(lacing)
        )
        + lacing
    )
    crc = _ogg_crc(hdr + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def build_ogg(
    codec: str,
    comments: dict,
    channels: int = 2,
    sample_rate: int = 44100,
    total_samples: int = 44100,
    pre_skip: int = 312,
    vendor: str = "vtk_reserves_spark",
) -> bytes:
    """Build a valid Ogg stream (inverse of :func:`parse_ogg` for the
    surfaced fields): BOS page with the codec ID header, a comment
    page, and an EOS audio page whose granule position encodes
    ``total_samples`` (Opus: 48 kHz granules + ``pre_skip``, so
    duration_s = total_samples/48000)."""
    serial = 0x5053
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<IBI", 0, channels, sample_rate)
            + struct.pack("<iii", -1, 128000, -1)
            + b"\xb8\x01"
        )
        tag_magic = b"\x03vorbis"
        granule = total_samples
    elif codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)
            + struct.pack("<hB", 0, 0)
        )
        tag_magic = b"OpusTags"
        granule = total_samples + pre_skip
    else:
        raise ValueError(f"ogg builder: unsupported codec {codec!r}")
    items = [f"{k.upper()}={v}".encode() for k, v in comments.items()]
    vb = vendor.encode()
    tags = (
        tag_magic + struct.pack("<I", len(vb)) + vb
        + struct.pack("<I", len(items))
        + b"".join(struct.pack("<I", len(i)) + i for i in items)
    )
    audio = b"\x00" * 64  # stub frame payload; metadata never decodes it
    return (
        _page(serial, 0, 0, [ident], htype=2)
        + _page(serial, 1, -1 if codec == "opus" else 0, [tags])
        + _page(serial, 2, granule, [audio], htype=4)
    )
