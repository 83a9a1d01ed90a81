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
executor, and the driver sees only the schema.  When a cdx-style
per-record index exists (CC publishes one), `read_warc_indexed`
rebalances skewed shards at RECORD granularity via ranged reads;
`build_warc_index` derives the (offset, length) spans.  Record
payloads above ``max_payload`` bytes are truncated (the standard CC
text-pipeline guard against multi-GB binaries).

zstd-compressed WARC (`.warc.zst`, CC's announced future format —
concatenated zstd frames, optionally led by a skippable frame
carrying a shared dictionary) IS supported: dict-less frames decode
through pyarrow's bundled libzstd, dict-referencing frames through
the pure-python RFC 8878 decoder (`sources/zstd_pure.py`), and
`build_warc_index` walks frame headers without decompressing so the
cdx/ranged-read path works at frame grain (`read_warc_indexed`
auto-fetches the shard-head dictionary once per path).

The companion :func:`write_warc` emits valid (optionally
member-gzipped or zstd-framed) WARC bytes for fixtures and re-export.
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


def parse_warc(
    data: bytes,
    max_payload: int | None = None,
    zstd_dict: bytes | None = None,
) -> list[dict]:
    """WARC bytes (plain or gzipped members) -> list of record dicts:
    ``warc_type, target_uri, date, record_id, content_type,
    content_length, http_status, http_content_type, payload``.

    For ``application/http`` response/request records the HTTP header
    block is split off: ``payload`` is the entity body and
    ``http_status`` / ``http_content_type`` are filled; other records
    carry their raw content block as ``payload``."""
    if data[:4] in (b"\x28\xb5\x2f\xfd", b"\x5d\x2a\x4d\x18") or (
        len(data) >= 4
        and data[1:4] == b"\x2a\x4d\x18"
        and 0x50 <= data[0] <= 0x5F
    ):
        # CommonCrawl's announced future format: concatenated zstd
        # frames (one or more records per frame), optionally led by a
        # 0x184D2A5D skippable frame carrying a shared dictionary.
        # Frames without a dictionary decode via pyarrow's bundled
        # libzstd; dict-referencing frames via the pure-python RFC 8878
        # decoder (sources/zstd_pure.py).
        from vtk_reserves_spark.sources import zstd as _zstd

        dict_bytes = _zstd.extract_warc_dictionary(data)
        if dict_bytes is None:
            # ranged reads of dict-referencing shards fetch the
            # shard-head dictionary separately and pass it here
            dict_bytes = zstd_dict
        return parse_warc(
            _zstd.decompress(data, dict_bytes=dict_bytes), max_payload
        )
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


def write_warc(
    records: list[dict],
    gzip_members: bool = False,
    zstd_frames: bool = False,
    zstd_dict: bytes | None = None,
) -> bytes:
    """Records (dicts with ``warc_type``; optional ``target_uri``,
    ``record_id``, ``date``, ``payload``; response records may carry
    ``http_status`` + ``http_content_type`` to grow an HTTP envelope)
    -> WARC/1.0 bytes; ``gzip_members`` emits one gzip member per
    record (the current CommonCrawl layout), ``zstd_frames`` one zstd
    frame per record (the announced ``.warc.zst`` layout), optionally
    led by the 0x184D2A5D skippable dictionary frame when
    ``zstd_dict`` is given (frames written here carry dict_id 0 —
    libzstd's buffer API can't attach one — so the dictionary frame
    exercises readers' skip/extract path, not reference decoding;
    dict-REFERENCING fixtures come from zstd_pure's test encoder)."""
    if gzip_members and zstd_frames:
        raise ValueError("pick one of gzip_members / zstd_frames")
    out = []
    if zstd_frames and zstd_dict is not None:
        from vtk_reserves_spark.sources.zstd import make_skippable_frame

        out.append(make_skippable_frame(zstd_dict))
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
        elif zstd_frames:
            from vtk_reserves_spark.sources.zstd import compress_frame

            blob = compress_frame(blob)
        out.append(blob)
    return b"".join(out)


#: one row per WARC record; payload stays binary (decode downstream)
WARC_RECORD_SCHEMA = (
    "path string, warc_type string, target_uri string, date string, "
    "record_id string, content_type string, content_length long, "
    "http_status int, http_content_type string, payload binary"
)


_WARC_COLUMNS = [
    "path", "warc_type", "target_uri", "date", "record_id",
    "content_type", "content_length", "http_status",
    "http_content_type", "payload",
]


def _file_parse_runner(max_payload):
    """mapInPandas generator over (path, content) batches — shared by
    the batch and streaming readers."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content), max_payload):
                    rows.append(tuple(rec_get(rec, p)))
            yield pd.DataFrame(rows, columns=_WARC_COLUMNS)

    def rec_get(rec, p):
        return (
            p, rec["warc_type"], rec["target_uri"], rec["date"],
            rec["record_id"], rec["content_type"], rec["content_length"],
            rec["http_status"], rec["http_content_type"], rec["payload"],
        )

    return run


def read_warc(spark, path, max_payload: int | None = None):
    """Distributed WARC ingestion: ``binaryFile`` source (one task per
    shard — the natural CommonCrawl grain; gzip members are not
    splittable) -> ``mapInPandas`` parse -> one row per record.

    Column pruning matters at 100 TB: project away ``payload`` before
    wide shuffles; the parse itself is executor-local and
    scan-bound."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_file_parse_runner(max_payload), WARC_RECORD_SCHEMA)


def read_warc_stream(spark, path, max_payload: int | None = None):
    """STREAMING WARC ingestion: the continuous-drop workflow (a crawler
    or transfer job keeps landing shards in a directory; downstream
    wants exactly-once record rows).  ``readStream`` over the
    binaryFile source (explicit schema — streaming sources cannot
    infer) discovers new shards per micro-batch; the same stateless
    mapInPandas parse yields records, so checkpointing gives
    exactly-once per SHARD — the right unit, since a shard is written
    atomically.  Compose with the checkpointed parquet append sink
    (streaming/sinks.py) or ``trigger(availableNow=True)`` for
    catch-up batch runs."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_file_parse_runner(max_payload), WARC_RECORD_SCHEMA)


def build_warc_index(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) of every record in a WARC byte stream — the
    CDX-style index CommonCrawl publishes alongside each crawl.  For
    member-gzipped WARCs these are gzip-member boundaries (found by
    walking the deflate streams); for plain WARCs, record boundaries.
    Runs once at index-build time; readers then seek directly.

    For ``.warc.zst`` the spans are zstd FRAME boundaries (CC's "one
    or more records per frame" layout makes frames the record-group
    grain), found by the header-only walker in `sources/zstd.py` —
    no decompression.  The leading dictionary skippable frame, when
    present, is excluded: ranged readers of dict-referencing streams
    must fetch it separately (`extract_warc_dictionary`) and pass it
    to `parse_warc` alongside each frame."""
    spans = []
    if data[:4] == b"\x28\xb5\x2f\xfd" or (
        len(data) >= 4
        and data[1:4] == b"\x2a\x4d\x18"
        and 0x50 <= data[0] <= 0x5F
    ):
        from vtk_reserves_spark.sources import zstd as _zstd

        return [
            (h["offset"], h["length"])
            for h in _zstd.split_frames(data)
            if h["kind"] == "zstd"
        ]
    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        chunk = 1 << 20
        while pos < n:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            fed = pos
            while not d.eof and fed < n:
                d.decompress(data[fed : fed + chunk])
                fed += chunk
            if not d.eof:
                raise ValueError("truncated gzip member in WARC stream")
            end = min(fed, n) - len(d.unused_data)
            if end <= pos:
                raise ValueError("empty gzip member in WARC stream")
            spans.append((pos, end - pos))
            pos = end
        return spans
    pos = 0
    n = len(data)
    while pos < n:
        start = pos
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC: unterminated header block")
        eol = data.find(b"\r\n", pos)
        headers = _split_headers(data[eol + 2 : hdr_end])
        clen = int(headers["content-length"])
        pos = hdr_end + 4 + clen
        if data[pos : pos + 4] == _CRLF + _CRLF:
            pos += 4
        spans.append((start, pos - start))
    return spans


def index_warc_files(spark, path):
    """Distributed cdx-style index build: one task per shard (the same
    binaryFile grain as `read_warc` — indexing is the one pass that
    inherently reads whole members), emitting ``path, offset, length``
    rows.  Build once, persist, then every re-read rebalances at
    record grain via `read_warc_indexed`."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for off, ln in build_warc_index(bytes(content)):
                    rows.append((p, off, ln))
            yield pd.DataFrame(rows, columns=["path", "offset", "length"])

    return files.mapInPandas(run, "path string, offset long, length long")


def read_cdx(spark, path, base: str = ""):
    """CommonCrawl CDXJ index files -> the ``path, offset, length``
    DataFrame `read_warc_indexed` consumes (plus url/status/mime for
    pre-filtering).  CDXJ lines are ``<urlkey> <timestamp> <json>``
    with the WARC location in the json's ``filename``/``offset``/
    ``length`` string fields.  Pure Catalyst: text source ->
    substring split -> from_json — predicate pushdown and column
    pruning keep a filtered index build scan-bound, which matters
    because one CC crawl's index is ~200 GB of text.  ``base`` is
    prefixed onto ``filename`` to resolve the store root."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    # the json block starts at the first '{' (urlkey/timestamp cannot
    # contain one; the json itself contains spaces, so split here)
    j = F.expr("substring(value, instr(value, '{'))")
    head = F.trim(F.expr("substring(value, 1, instr(value, '{') - 1)"))
    parsed = F.from_json(
        j,
        "url string, mime string, status string, digest string, "
        "filename string, offset string, length string",
    )
    return lines.select(
        F.split(head, " ").getItem(0).alias("urlkey"),
        F.split(head, " ").getItem(1).alias("timestamp"),
        parsed.getField("url").alias("url"),
        parsed.getField("mime").alias("mime"),
        parsed.getField("status").cast("int").alias("status"),
        F.concat(F.lit(base), parsed.getField("filename")).alias("path"),
        parsed.getField("offset").cast("long").alias("offset"),
        parsed.getField("length").cast("long").alias("length"),
    )


def write_cdx(records) -> str:
    """Fixture/test writer: (urlkey, timestamp, dict) tuples -> CDXJ
    text (one line per record, CC field order)."""
    import json as _json

    lines = []
    for urlkey, ts, fields in records:
        lines.append(f"{urlkey} {ts} {_json.dumps(fields)}")
    return "\n".join(lines) + "\n"


def _local_opener(path: str):
    """Default byte-range opener: the local filesystem (paths may be
    Spark ``file:``-prefixed URIs).  On a cluster, pass an opener that
    returns a seekable stream for your store (an fsspec/boto3 ranged
    reader for s3://, a pyarrow HadoopFileSystem stream for hdfs://) —
    the reader only calls ``seek`` + ``read(length)``, so any ranged
    GET maps onto it without reading the shard."""
    p = path
    if p.startswith("file://"):
        p = p[7:]
    elif p.startswith("file:"):
        p = p[5:]
    return open(p, "rb")


def read_warc_indexed(spark, index_df, max_payload: int | None = None,
                      opener=None):
    """RECORD-grain distributed WARC ingestion from a CDX-style index.

    ``read_warc``'s file-grain tasks are the right default for ~1 GB
    CommonCrawl shards, but skewed shards (one 10 GB file among 1 GB
    peers) serialize on one executor.  CC publishes per-record gzip
    member offsets (the cdx index); given ``index_df`` with columns
    ``path string, offset long, length long``, this reads each record
    by ranged access — tasks rebalance at RECORD granularity, so a
    hot shard spreads across the cluster instead of pinning a core.

    The index rows are repartitioned round-robin before the read so
    co-located records from one shard spread out; each task seeks,
    reads ``length`` bytes, and parses the single member via
    ``parse_warc`` (gzip, zstd frames, or plain all work — the member
    is a self-contained WARC stream).  For `.warc.zst` shards whose
    frames reference a shared dictionary, the dictionary lives in a
    skippable frame at the shard HEAD (outside every indexed span) —
    the runner fetches it once per path (one extra ranged read) and
    threads it into every frame parse.  ``opener`` abstracts the
    byte-range source (see ``_local_opener``)."""
    import pandas as pd

    open_fn = opener or _local_opener
    par = 2 * spark.sparkContext.defaultParallelism
    idx = index_df.select("path", "offset", "length").repartition(par)

    def head_dict(fh) -> bytes | None:
        from vtk_reserves_spark.sources import zstd as _zstd

        fh.seek(0)
        head = fh.read(8)
        if len(head) < 8:
            return None
        magic = int.from_bytes(head[:4], "little")
        if magic != _zstd.WARC_DICT_MAGIC:
            return None
        size = int.from_bytes(head[4:8], "little")
        return _zstd.extract_warc_dictionary(head + fh.read(size))

    def run(batches):
        handles: dict[str, object] = {}
        zdicts: dict[str, bytes | None] = {}
        try:
            for pdf in batches:
                rows = []
                for p, off, ln in zip(
                    pdf["path"], pdf["offset"].astype("int64"),
                    pdf["length"].astype("int64"),
                ):
                    fh = handles.get(p)
                    if fh is None:
                        fh = handles[p] = open_fn(p)
                    fh.seek(int(off))
                    blob = fh.read(int(ln))
                    zd = None
                    if blob[:4] == b"\x28\xb5\x2f\xfd":
                        if p not in zdicts:
                            zdicts[p] = head_dict(fh)
                        zd = zdicts[p]
                    for rec in parse_warc(blob, max_payload, zstd_dict=zd):
                        rows.append(
                            (
                                p, rec["warc_type"], rec["target_uri"],
                                rec["date"], rec["record_id"],
                                rec["content_type"], rec["content_length"],
                                rec["http_status"], rec["http_content_type"],
                                rec["payload"],
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "path", "warc_type", "target_uri", "date",
                        "record_id", "content_type", "content_length",
                        "http_status", "http_content_type", "payload",
                    ],
                )
        finally:
            for fh in handles.values():
                try:
                    fh.close()
                except Exception:
                    pass

    return idx.mapInPandas(run, WARC_RECORD_SCHEMA)


# ------------------------------------------------------- WET / WAT


def build_wet(pages: list[dict], gzip_members: bool = True) -> bytes:
    """Pages ``{url, text, date?}`` -> a WET file (the CommonCrawl
    extracted-text sidecar): a leading ``warcinfo`` record, then one
    ``conversion`` record of ``text/plain`` per page.  Rides the
    same member-gzip framing as the main crawl files."""
    records: list[dict] = [{
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "payload": (
            "software: vtk-reserves-spark\r\n"
            "format: WARC File Format 1.0\r\n"
            "conformsTo: WET extraction sidecar\r\n"
        ),
    }]
    for p in pages:
        records.append({
            "warc_type": "conversion",
            "target_uri": p["url"],
            "date": p.get("date", "2024-01-01T00:00:00Z"),
            "content_type": "text/plain",
            "payload": (p.get("text") or "").encode("utf-8"),
        })
    return write_warc(records, gzip_members=gzip_members)


def parse_wet(data: bytes) -> list[dict]:
    """WET bytes -> list of ``{url, date, text}`` from the
    ``conversion`` records (warcinfo and anything else skipped)."""
    out = []
    for rec in parse_warc(data):
        if rec["warc_type"] != "conversion":
            continue
        out.append({
            "url": rec["target_uri"],
            "date": rec["date"],
            "text": (rec["payload"] or b"").decode("utf-8", "replace"),
        })
    return out


def build_wat(pages: list[dict], gzip_members: bool = True) -> bytes:
    """Pages ``{url, title?, links?, date?}`` -> a WAT file (the
    CommonCrawl metadata sidecar): one ``metadata`` record of
    ``application/json`` per page carrying the Envelope structure
    real WAT readers consume — ``Envelope.Payload-Metadata.
    HTTP-Response-Metadata.HTML-Metadata`` with ``Head.Title`` and
    a ``Links`` array of ``{path, url}``."""
    import json as _json

    records: list[dict] = [{
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "payload": "format: WAT metadata sidecar\r\n",
    }]
    for p in pages:
        env = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": p["url"],
                    "WARC-Type": "response",
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": p.get("title", "")},
                            "Links": [
                                {"path": "A@/href", "url": u}
                                for u in p.get("links", [])
                            ],
                        },
                    },
                },
            },
        }
        records.append({
            "warc_type": "metadata",
            "target_uri": p["url"],
            "date": p.get("date", "2024-01-01T00:00:00Z"),
            "content_type": "application/json",
            "payload": _json.dumps(env, sort_keys=True).encode(),
        })
    return write_warc(records, gzip_members=gzip_members)


def parse_wat(data: bytes) -> list[dict]:
    """WAT bytes -> list of ``{url, date, title, links}`` from the
    ``metadata`` records' JSON envelopes (missing HTML metadata
    yields empty title/links rather than raising — real WAT files
    carry non-HTML records too)."""
    import json as _json

    out = []
    for rec in parse_warc(data):
        if rec["warc_type"] != "metadata":
            continue
        try:
            env = _json.loads(rec["payload"] or b"{}")
        except ValueError:
            continue
        html_meta = (
            env.get("Envelope", {})
            .get("Payload-Metadata", {})
            .get("HTTP-Response-Metadata", {})
            .get("HTML-Metadata", {})
        )
        out.append({
            "url": rec["target_uri"],
            "date": rec["date"],
            "title": html_meta.get("Head", {}).get("Title", ""),
            "links": [
                link.get("url")
                for link in html_meta.get("Links", [])
                if link.get("url")
            ],
        })
    return out
