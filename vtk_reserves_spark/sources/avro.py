"""Avro Object Container Files — pure-stdlib reader/writer.

Avro OCF is the row-oriented interchange format of the Hadoop/Kafka
world; data vendors still ship it and pipelines must ingest it
without a plugin (the spark-avro package is not bundled with
pyspark).  This implements the container spec (Apache Avro 1.11.x
"Object Container Files" + binary encoding) for the subset that
covers interchange tables: records of null / boolean / int / long /
float / double / string / bytes fields, with per-field
``["null", T]`` union nullability, null or deflate block codecs,
and the 16-byte sync-marker framing that makes OCF blocks
SPLITTABLE — the property that matters at 100 TB (each block is
independently decodable after a sync scan, exactly like WARC's gzip
members).

Scale posture matches `sources/webdataset.py`: file-grain
binaryFile tasks, blocks decoded inside the task, bytes never on
the driver.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_avro_bytes", "write_avro_bytes", "read_avro"]

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- binary
def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(out: bytearray, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise ValueError("avro: truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (acc >> 1) ^ -(acc & 1), pos


def _read_value(data: bytes, pos: int, typ: str):
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return bool(data[pos]), pos + 1
    if typ in ("int", "long"):
        return _read_long(data, pos)
    if typ == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _read_long(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("avro: bad length")
        raw = data[pos : pos + n]
        return (raw.decode() if typ == "string" else raw), pos + n
    raise ValueError(f"avro: unsupported type {typ!r}")


def _write_value(out: bytearray, typ: str, v) -> None:
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        raw = str(v).encode()
        _write_long(out, len(raw))
        out += raw
    elif typ == "bytes":
        _write_long(out, len(v))
        out += bytes(v)
    else:
        raise ValueError(f"avro: unsupported type {typ!r}")


def _field_type(t) -> tuple[str, bool]:
    """Resolve a field schema to (primitive, nullable)."""
    if isinstance(t, str):
        return t, False
    if isinstance(t, list):  # union; support ["null", prim] both orders
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or not isinstance(non_null[0], str):
            raise ValueError(f"avro: unsupported union {t!r}")
        return non_null[0], "null" in t
    raise ValueError(f"avro: unsupported schema {t!r}")


def read_avro_bytes(data: bytes):
    """Parse an OCF byte string -> (schema_dict, rows list-of-dicts).
    Verifies magic, honors null/deflate codecs, checks each block's
    sync marker.  Raises ValueError on structural corruption."""
    if data[:4] != _MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta = {}
    while True:
        count, pos = _read_long(data, pos)
        if count == 0:
            break
        if count < 0:  # block with byte size prefix
            count = -count
            _, pos = _read_long(data, pos)
        for _ in range(count):
            k, pos = _read_value(data, pos, "string")
            v, pos = _read_value(data, pos, "bytes")
            meta[k] = v
    sync = data[pos : pos + 16]
    pos += 16
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise ValueError("avro: only record schemas supported")
    fields = [
        (f["name"], *_field_type(f["type"])) for f in schema["fields"]
    ]
    rows = []
    while pos < len(data):
        n_rows, pos = _read_long(data, pos)
        n_bytes, pos = _read_long(data, pos)
        block = data[pos : pos + n_bytes]
        if len(block) < n_bytes:
            raise ValueError("avro: block overruns file")
        pos += n_bytes
        if data[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        bpos = 0
        for _ in range(n_rows):
            row = {}
            for name, typ, nullable in fields:
                if nullable:
                    branch, bpos = _read_long(block, bpos)
                    if branch == 0:
                        row[name] = None
                        continue
                v, bpos = _read_value(block, bpos, typ)
                row[name] = v
            rows.append(row)
    return schema, rows


def write_avro_bytes(
    schema: dict,
    rows: list[dict],
    codec: str = "null",
    rows_per_block: int = 1000,
    sync: bytes = b"\x00\x11\x22\x33\x44\x55\x66\x77"
                  b"\x88\x99\xaa\xbb\xcc\xdd\xee\xff",
) -> bytes:
    """Serialize rows to an OCF byte string (inverse of
    :func:`read_avro_bytes`).  Nullable fields must be declared as
    ``["null", T]`` unions; blocks of ``rows_per_block`` keep files
    splittable."""
    fields = [
        (f["name"], *_field_type(f["type"])) for f in schema["fields"]
    ]
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_value(out, "string", k)
        _write_value(out, "bytes", v)
    _write_long(out, 0)
    out += sync
    for i in range(0, max(len(rows), 1), rows_per_block):
        chunk = rows[i : i + rows_per_block]
        if not chunk:
            break
        body = bytearray()
        for row in chunk:
            for name, typ, nullable in fields:
                v = row.get(name)
                if nullable:
                    _write_long(body, 0 if v is None else 1)
                    if v is None:
                        continue
                _write_value(body, typ, v)
        payload = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(),
    "double": T.DoubleType(), "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def read_avro(
    spark: SparkSession, path_glob: str, schema: dict
) -> DataFrame:
    """Read Avro OCF files into a DataFrame — file-grain binaryFile
    tasks, blocks decoded in-task.  The writer schema must be
    supplied (and is verified against each file's embedded schema)
    so the Spark schema is known at plan time; schema drift raises
    rather than silently miscasting."""
    fields = [
        (f["name"], *_field_type(f["type"])) for f in schema["fields"]
    ]
    spark_schema = T.StructType(
        [T.StructField(n, _AVRO_TO_SPARK[t], True) for n, t, _ in fields]
    )
    expected = json.dumps(schema, sort_keys=True)
    raw = (
        spark.read.format("binaryFile").load(path_glob)
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [n for n, _, _ in fields]
        for b in batches:
            for content in b["content"]:
                got, rows = read_avro_bytes(bytes(content))
                if json.dumps(got, sort_keys=True) != expected:
                    raise ValueError(
                        "avro: file schema differs from expected schema"
                    )
                yield pd.DataFrame(
                    [[r.get(c) for c in cols] for r in rows],
                    columns=cols,
                )

    return raw.mapInPandas(run, spark_schema)
