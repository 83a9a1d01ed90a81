"""WARC (Web ARChive, ISO 28500) reader/writer — pure stdlib.

WARC is THE ingestion format for web-scale training corpora
(CommonCrawl ships ~90k gzipped WARC files of ~1 GB per monthly
crawl).  This parses WARC/1.0 and /1.1 record streams — plain or
gzipped with the CommonCrawl convention of one gzip MEMBER per record
(the format's seekability trick) — and splits HTTP response records
into status / headers / payload.

Scale shape: WARC gzip members are not splittable without an external
index, so the distributed reader (`read_warc`) parallelizes at FILE
granularity via Spark's ``binaryFile`` source + ``mapInPandas`` —
exactly the right grain for CommonCrawl's ~1 GB shards on a
1000-executor cluster: one task per file, records never leave the
executor, and the driver sees only the schema.  Record payloads above
``max_payload`` bytes are truncated (the standard CC text-pipeline
guard against multi-GB binaries).

The companion :func:`write_warc` emits valid (optionally
member-gzipped) WARC bytes for fixtures and re-export.
"""

from __future__ import annotations

import gzip
import io
import struct  # noqa: F401  (parity with the other codecs' imports)
import zlib

_CRLF = b"\r\n"


def _split_headers(block: bytes) -> dict:
    """Header block (after the version / status line) -> dict with
    lower-cased keys; duplicate keys keep the first value (WARC and
    HTTP both allow repeats; first-wins is the common reader choice)."""
    out = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        key = k.strip().lower().decode("latin-1")
        if key and key not in out:
            out[key] = v.strip().decode("latin-1", "replace")
    return out


def _gunzip_members(data: bytes):
    """Yield decompressed gzip members from a concatenated-member
    stream (the CommonCrawl per-record layout).  Feeds the
    decompressor in bounded chunks: slicing the whole remaining buffer
    per member would copy O(members x filesize) bytes on a
    50k-record shard."""
    pos = 0
    n = len(data)
    chunk_size = 1 << 20
    while pos < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = []
        fed = pos
        while not d.eof and fed < n:
            out.append(d.decompress(data[fed : fed + chunk_size]))
            fed += chunk_size
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        yield b"".join(out)
        consumed = min(fed, n) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("empty gzip member in WARC stream")
        pos += consumed


def parse_warc(data: bytes, max_payload: int | None = None) -> list[dict]:
    """WARC bytes (plain or gzipped members) -> list of record dicts:
    ``warc_type, target_uri, date, record_id, content_type,
    content_length, http_status, http_content_type, payload``.

    For ``application/http`` response/request records the HTTP header
    block is split off: ``payload`` is the entity body and
    ``http_status`` / ``http_content_type`` are filled; other records
    carry their raw content block as ``payload``."""
    if data[:2] == b"\x1f\x8b":
        records = []
        for member in _gunzip_members(data):
            records.extend(parse_warc(member, max_payload))
        return records

    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated WARC: no version line terminator")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        ver = version[5:].decode("latin-1")
        if ver not in ("1.0", "1.1"):
            raise ValueError(f"unsupported WARC version {ver!r}")
        hdr_end = data.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            raise ValueError("truncated WARC: unterminated header block")
        headers = _split_headers(data[eol + 2 : hdr_end])
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record lacks a numeric Content-Length")
        body_start = hdr_end + 4
        body = data[body_start : body_start + clen]
        if len(body) < clen:
            raise ValueError("truncated WARC: body shorter than Content-Length")
        pos = body_start + clen
        if data[pos : pos + 4] == _CRLF + _CRLF:
            pos += 4  # the spec's two-CRLF record separator

        ctype = headers.get("content-type", "")
        status = None
        http_ctype = None
        payload = body
        if ctype.startswith("application/http"):
            split = body.find(b"\r\n\r\n")
            if split >= 0:
                status_line, _, rest = body[:split].partition(_CRLF)
                http_headers = _split_headers(rest)
                parts = status_line.split(b" ", 2)
                if parts[0].startswith(b"HTTP/") and len(parts) > 1:
                    try:
                        status = int(parts[1])
                    except ValueError:
                        status = None
                http_ctype = http_headers.get("content-type")
                payload = body[split + 4 :]
        if max_payload is not None and len(payload) > max_payload:
            payload = payload[:max_payload]
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id"),
                "content_type": ctype or None,
                "content_length": clen,
                "http_status": status,
                "http_content_type": http_ctype,
                "payload": payload,
            }
        )
    return records


def write_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Records (dicts with ``warc_type``; optional ``target_uri``,
    ``record_id``, ``date``, ``payload``; response records may carry
    ``http_status`` + ``http_content_type`` to grow an HTTP envelope)
    -> WARC/1.0 bytes, optionally one gzip member per record (the
    CommonCrawl layout)."""
    out = []
    for i, rec in enumerate(records):
        payload = rec.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        wtype = rec.get("warc_type", "resource")
        if rec.get("http_status") is not None:
            body = (
                f"HTTP/1.1 {rec['http_status']} OK\r\n"
                f"Content-Type: {rec.get('http_content_type', 'text/html')}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
            ctype = "application/http; msgtype=response"
        else:
            body = payload
            ctype = rec.get("content_type", "application/octet-stream")
        hdrs = [
            b"WARC/1.0",
            b"WARC-Type: " + wtype.encode("latin-1"),
            b"WARC-Record-ID: "
            + rec.get("record_id", f"<urn:uuid:rec-{i}>").encode("latin-1"),
            b"WARC-Date: " + rec.get("date", "2024-01-01T00:00:00Z").encode("latin-1"),
        ]
        if rec.get("target_uri"):
            hdrs.append(b"WARC-Target-URI: " + rec["target_uri"].encode("latin-1"))
        hdrs.append(b"Content-Type: " + ctype.encode("latin-1"))
        hdrs.append(b"Content-Length: " + str(len(body)).encode("latin-1"))
        blob = _CRLF.join(hdrs) + _CRLF + _CRLF + body + _CRLF + _CRLF
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(blob)
            blob = buf.getvalue()
        out.append(blob)
    return b"".join(out)


#: one row per WARC record; payload stays binary (decode downstream)
WARC_RECORD_SCHEMA = (
    "path string, warc_type string, target_uri string, date string, "
    "record_id string, content_type string, content_length long, "
    "http_status int, http_content_type string, payload binary"
)


def read_warc(spark, path, max_payload: int | None = None):
    """Distributed WARC ingestion: ``binaryFile`` source (one task per
    shard — the natural CommonCrawl grain; gzip members are not
    splittable) -> ``mapInPandas`` parse -> one row per record.

    Column pruning matters at 100 TB: project away ``payload`` before
    wide shuffles; the parse itself is executor-local and
    scan-bound."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content), max_payload):
                    rows.append(
                        (
                            p,
                            rec["warc_type"],
                            rec["target_uri"],
                            rec["date"],
                            rec["record_id"],
                            rec["content_type"],
                            rec["content_length"],
                            rec["http_status"],
                            rec["http_content_type"],
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "warc_type", "target_uri", "date", "record_id",
                    "content_type", "content_length", "http_status",
                    "http_content_type", "payload",
                ],
            )

    return files.mapInPandas(run, WARC_RECORD_SCHEMA)
