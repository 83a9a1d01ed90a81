"""Hudi log-file (``.log``) block codec — the MERGE_ON_READ delta
format, transcribed from the PUBLIC Hudi tech-specs
(hudi.apache.org/tech-specs, "Log File Format") without the
hudi-spark bundle.

A log file is a sequence of blocks, each:

========================  =======================================
magic                     6 bytes ``#HUDI#``
block size                8-byte BE long (bytes after this field,
                          including the trailing total length)
log format version        4-byte BE int (``1``)
block type                4-byte BE int (1 command, 2 delete,
                          3 corrupt, 4 avro data, 5 hfile,
                          6 parquet, 7 cdc)
header                    map: 4-byte count, then per entry
                          4-byte metadata ordinal + 4-byte length
                          + utf8 bytes
content length            8-byte BE long
content                   bytes
footer                    map (same encoding as header)
total block length        8-byte BE long (whole block incl. magic —
                          supports reverse traversal)
========================  =======================================

Header metadata ordinals (tech-specs ``HeaderMetadataType``):
1 INSTANT_TIME, 2 TARGET_INSTANT_TIME, 3 SCHEMA,
4 COMMAND_BLOCK_TYPE, 5 COMPACTED_BLOCK_TIMES.

AVRO data block content (``HoodieAvroDataBlock`` v3): 4-byte format
version, 4-byte record count, then per record a 4-byte length +
Avro binary-encoded record (schema = the block's SCHEMA header).
DELETE block content here is the same layout over an Avro record
list ``{recordKey, partitionPath, orderingVal}`` with the schema in
the SCHEMA header (self-describing; real Hudi v6 serializes a
``HoodieDeleteRecordList`` whose schema ships with the jar —
documented divergence, flagged below).

Validation caveat (same posture as ``sources/vp8.py``): no real
Hudi MOR table can be generated in this container, so byte-parity
with hudi-written log files is UNVERIFIED — the reader therefore
refuses anything it cannot fully parse (bad magic, unknown block
type, unknown format version, short block) instead of guessing,
per the round-8 verdict's "gate lifted only for tables whose log
format the reader fully parses".

Reference parity: the reference engine has no lakehouse/MOR tier at
all (``vtk_reserves`` delegates storage to pandas/pyvista); this
module exists for the LLM-pipeline storage inventory.
"""

from __future__ import annotations

import struct

from vtk_reserves_spark.sources.avro import _compile, _read, _write

__all__ = [
    "HUDI_LOG_MAGIC", "read_log_file", "write_log_blocks",
    "avro_schema_for_spark",
]

HUDI_LOG_MAGIC = b"#HUDI#"
_LOG_FORMAT_VERSION = 1
_DATA_BLOCK_VERSION = 3

BLOCK_COMMAND, BLOCK_DELETE, BLOCK_CORRUPT = 1, 2, 3
BLOCK_AVRO, BLOCK_HFILE, BLOCK_PARQUET, BLOCK_CDC = 4, 5, 6, 7

H_INSTANT_TIME, H_TARGET_INSTANT, H_SCHEMA = 1, 2, 3
H_COMMAND_TYPE, H_COMPACTED_TIMES = 4, 5

DELETE_SCHEMA = {
    "type": "record", "name": "HoodieDeleteRecord",
    "fields": [
        {"name": "recordKey", "type": "string"},
        {"name": "partitionPath", "type": ["null", "string"],
         "default": None},
        {"name": "orderingVal", "type": ["null", "string"],
         "default": None},
    ],
}


def _write_map(out: bytearray, m: dict[int, str]) -> None:
    out += struct.pack(">i", len(m))
    for k, v in m.items():
        raw = v.encode("utf-8")
        out += struct.pack(">ii", int(k), len(raw))
        out += raw


def _read_map(data: bytes, pos: int) -> tuple[dict[int, str], int]:
    (n,) = struct.unpack_from(">i", data, pos)
    pos += 4
    out = {}
    for _ in range(n):
        k, ln = struct.unpack_from(">ii", data, pos)
        pos += 8
        out[k] = data[pos : pos + ln].decode("utf-8")
        pos += ln
    return out, pos


def _encode_records(schema: dict, rows: list[dict]) -> bytes:
    root = _compile(schema, {})
    out = bytearray(struct.pack(">ii", _DATA_BLOCK_VERSION, len(rows)))
    for row in rows:
        body = bytearray()
        _write(body, root, row)
        out += struct.pack(">i", len(body))
        out += body
    return bytes(out)


def _decode_records(schema: dict, content: bytes) -> list[dict]:
    ver, count = struct.unpack_from(">ii", content, 0)
    if ver != _DATA_BLOCK_VERSION:
        raise ValueError(f"hudi log: data block version {ver} unknown")
    root = _compile(schema, {})
    pos, rows = 8, []
    for _ in range(count):
        (ln,) = struct.unpack_from(">i", content, pos)
        pos += 4
        body = content[pos : pos + ln]
        if len(body) < ln:
            raise ValueError("hudi log: record overruns block")
        pos += ln
        row, used = _read(body, 0, root)
        if used != ln:
            raise ValueError("hudi log: record length mismatch")
        rows.append(row)
    return rows


def write_log_blocks(
    blocks: list[tuple[int, dict, list[dict], dict[int, str]]],
) -> bytes:
    """``(block_type, avro_schema, rows, extra_headers)`` list ->
    log-file bytes.  AVRO blocks carry data rows, DELETE blocks carry
    ``DELETE_SCHEMA`` rows; the schema JSON always rides in the
    SCHEMA header so every block is self-describing."""
    import json as _json

    out = bytearray()
    for btype, schema, rows, extra in blocks:
        if btype not in (BLOCK_AVRO, BLOCK_DELETE):
            raise ValueError(f"hudi log: writer block type {btype}")
        headers = {H_SCHEMA: _json.dumps(schema)}
        headers.update(extra or {})
        hdr = bytearray()
        _write_map(hdr, headers)
        content = _encode_records(schema, rows)
        ftr = bytearray()
        _write_map(ftr, {})
        # [version 4][type 4][header][clen 8][content][footer][total 8]
        inner = (
            struct.pack(">ii", _LOG_FORMAT_VERSION, btype)
            + bytes(hdr)
            + struct.pack(">q", len(content))
            + content
            + bytes(ftr)
        )
        total = len(HUDI_LOG_MAGIC) + 8 + len(inner) + 8
        out += HUDI_LOG_MAGIC
        out += struct.pack(">q", len(inner) + 8)
        out += inner
        out += struct.pack(">q", total)
    return bytes(out)


def read_log_file(data: bytes) -> list[dict]:
    """Log-file bytes -> block dicts ``{type, headers, rows}``,
    oldest first.  STRICT: anything unparseable raises (the
    MERGE_ON_READ read gate stays down unless every block parses)."""
    import json as _json

    pos, blocks = 0, []
    while pos < len(data):
        if data[pos : pos + 6] != HUDI_LOG_MAGIC:
            raise ValueError(
                f"hudi log: bad magic at offset {pos} "
                f"({data[pos:pos + 6]!r})"
            )
        pos += 6
        (bsize,) = struct.unpack_from(">q", data, pos)
        pos += 8
        end = pos + bsize
        if end > len(data):
            raise ValueError("hudi log: block overruns file")
        ver, btype = struct.unpack_from(">ii", data, pos)
        if ver != _LOG_FORMAT_VERSION:
            raise ValueError(f"hudi log: format version {ver} unknown")
        if btype == BLOCK_CORRUPT:
            raise ValueError("hudi log: corrupt block present")
        if btype not in (BLOCK_AVRO, BLOCK_DELETE, BLOCK_COMMAND):
            raise ValueError(
                f"hudi log: block type {btype} not supported "
                "(hfile/parquet/cdc blocks need their own readers)"
            )
        headers, hpos = _read_map(data, pos + 8)
        (clen,) = struct.unpack_from(">q", data, hpos)
        hpos += 8
        content = data[hpos : hpos + clen]
        if len(content) < clen:
            raise ValueError("hudi log: content overruns block")
        hpos += clen
        _footer, hpos = _read_map(data, hpos)
        (total,) = struct.unpack_from(">q", data, hpos)
        hpos += 8
        if hpos != end or total != end - (pos - 14):
            raise ValueError("hudi log: block length mismatch")
        rows: list[dict] = []
        if btype in (BLOCK_AVRO, BLOCK_DELETE):
            if H_SCHEMA not in headers:
                raise ValueError("hudi log: block missing SCHEMA header")
            schema = _json.loads(headers[H_SCHEMA])
            rows = _decode_records(schema, content)
        blocks.append({"type": btype, "headers": headers, "rows": rows})
        pos = end
    return blocks


_SPARK_TO_AVRO = {
    "long": "long", "integer": "int", "short": "int", "byte": "int",
    "double": "double", "float": "float", "string": "string",
    "boolean": "boolean", "binary": "bytes",
}


def avro_schema_for_spark(schema, name: str = "HoodieRecord") -> dict:
    """Spark StructType -> Avro record schema (nullable unions) for
    the primitive subset MOR log blocks carry; anything outside it
    gates with a clear error rather than a silently lossy encode."""
    fields = []
    for f in schema.fields:
        tn = f.dataType.typeName()
        if tn == "date":
            at: object = {"type": "int", "logicalType": "date"}
        elif tn.startswith("timestamp"):
            at = {"type": "long", "logicalType": "timestamp-micros"}
        elif tn in _SPARK_TO_AVRO:
            at = _SPARK_TO_AVRO[tn]
        else:
            raise ValueError(
                f"hudi log: column {f.name!r} type {tn} outside the "
                "MOR log subset"
            )
        fields.append({
            "name": f.name, "type": ["null", at], "default": None,
        })
    return {"type": "record", "name": name, "fields": fields}
