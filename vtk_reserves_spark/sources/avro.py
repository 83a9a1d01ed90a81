"""Avro Object Container Files — pure-stdlib reader/writer.

Avro OCF is the row-oriented interchange format of the Hadoop/Kafka
world; data vendors still ship it and pipelines must ingest it
without a plugin (the spark-avro package is not bundled with
pyspark).  This implements the container spec (Apache Avro 1.11.x
"Object Container Files" + binary encoding) for the full type
system real OCF dumps contain:

* primitives: null / boolean / int / long / float / double /
  string / bytes;
* complex types: records (arbitrarily nested), arrays, maps, enums,
  fixed, and general unions (any branch count, resolved by the
  encoded branch index; named-type references — including recursive
  schemas — resolve through a name registry);
* logical types: ``decimal`` (bytes or fixed backing →
  ``decimal.Decimal``), ``date`` (→ ``datetime.date``),
  ``timestamp-millis``/``timestamp-micros`` (→ naive UTC
  ``datetime``), ``uuid`` (string passthrough); ``time-*`` values
  stay raw ints (Spark has no time-of-day type);
* null or deflate block codecs, and the 16-byte sync-marker framing
  that makes OCF blocks SPLITTABLE — the property that matters at
  100 TB (each block is independently decodable after a sync scan,
  exactly like WARC's gzip members).

Scale posture matches `sources/webdataset.py`: file-grain
binaryFile tasks, blocks decoded inside the task, bytes never on
the driver.  ``read_avro`` maps records→structs, arrays→arrays,
maps→maps, enums→strings, fixed→binary, decimal→DecimalType and
date/timestamp to their Spark types, so nested Avro lands as
first-class nested Spark columns.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_avro_bytes", "write_avro_bytes", "read_avro", "to_spark_type"]

_MAGIC = b"Obj\x01"
_PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "string", "bytes")
)
_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


# ---------------------------------------------------------------- binary
def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(out: bytearray, n: int) -> None:
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"avro: value {n} out of 64-bit long range")
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


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("avro: bad length")
    return data[pos : pos + n], pos + n


# ------------------------------------------------------- schema compile


def _compile(schema, names: dict) -> dict:
    """JSON schema -> node dict; named types register in ``names`` so
    later references (incl. recursive ones) resolve."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return {"kind": "prim", "type": schema}
        if schema in names:
            return names[schema]
        raise ValueError(f"avro: unknown type name {schema!r}")
    if isinstance(schema, list):
        return {
            "kind": "union",
            "branches": [_compile(b, names) for b in schema],
        }
    if not isinstance(schema, dict):
        raise ValueError(f"avro: unsupported schema {schema!r}")
    t = schema["type"]
    logical = schema.get("logicalType")
    if t in _PRIMITIVES:
        node = {"kind": "prim", "type": t, "logical": logical}
        if logical == "decimal":
            node["scale"] = schema.get("scale", 0)
            node["precision"] = schema.get("precision", 38)
        return node
    if t == "record" or t == "error":
        node = {"kind": "record", "name": schema["name"], "fields": []}
        names[schema["name"]] = node  # register BEFORE fields: recursion
        node["fields"] = [
            (f["name"], _compile(f["type"], names))
            for f in schema["fields"]
        ]
        return node
    if t == "array":
        return {"kind": "array", "items": _compile(schema["items"], names)}
    if t == "map":
        return {"kind": "map", "values": _compile(schema["values"], names)}
    if t == "enum":
        node = {
            "kind": "enum", "name": schema["name"],
            "symbols": list(schema["symbols"]),
        }
        names[schema["name"]] = node
        return node
    if t == "fixed":
        node = {
            "kind": "fixed", "name": schema["name"],
            "size": int(schema["size"]), "logical": logical,
        }
        if logical == "decimal":
            node["scale"] = schema.get("scale", 0)
            node["precision"] = schema.get("precision", 38)
        names[schema["name"]] = node
        return node
    raise ValueError(f"avro: unsupported type {t!r}")


def _logical_decode(node: dict, v):
    lg = node.get("logical")
    if lg is None or lg == "uuid":
        return v
    if lg == "decimal":
        unscaled = int.from_bytes(v, "big", signed=True)
        return _decimal.Decimal(unscaled).scaleb(-node["scale"])
    if lg == "date":
        return _EPOCH_DATE + _dt.timedelta(days=v)
    if lg == "timestamp-millis":
        return _EPOCH_DT + _dt.timedelta(milliseconds=v)
    if lg == "timestamp-micros":
        return _EPOCH_DT + _dt.timedelta(microseconds=v)
    return v  # time-millis/micros and unknown logicals: raw value


def _logical_encode(node: dict, v):
    lg = node.get("logical")
    if lg is None or lg == "uuid":
        return v
    if lg == "decimal":
        if isinstance(v, _decimal.Decimal):
            v = int(v.scaleb(node["scale"]).to_integral_value())
        n = int(v)
        size = node.get("size") or max(1, (n.bit_length() + 8) // 8)
        return n.to_bytes(size, "big", signed=True)
    if lg == "date" and isinstance(v, _dt.date):
        return (v - _EPOCH_DATE).days
    if lg == "timestamp-millis" and isinstance(v, _dt.datetime):
        return round((v - _EPOCH_DT).total_seconds() * 1000)
    if lg == "timestamp-micros" and isinstance(v, _dt.datetime):
        d = v - _EPOCH_DT
        return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
    return v


def _read(data: bytes, pos: int, node: dict):
    kind = node["kind"]
    if kind == "prim":
        t = node["type"]
        if t == "null":
            return None, pos
        if t == "boolean":
            if pos >= len(data):
                raise ValueError("avro: truncated boolean")
            return bool(data[pos]), pos + 1
        if t in ("int", "long"):
            v, pos = _read_long(data, pos)
            return _logical_decode(node, v), pos
        if t == "float":
            if pos + 4 > len(data):
                raise ValueError("avro: truncated float")
            return struct.unpack_from("<f", data, pos)[0], pos + 4
        if t == "double":
            if pos + 8 > len(data):
                raise ValueError("avro: truncated double")
            return struct.unpack_from("<d", data, pos)[0], pos + 8
        raw, pos = _read_bytes(data, pos)
        if t == "string":
            return raw.decode(), pos
        return _logical_decode(node, raw), pos
    if kind == "record":
        row = {}
        for name, fnode in node["fields"]:
            row[name], pos = _read(data, pos, fnode)
        return row, pos
    if kind == "array":
        out = []
        while True:
            count, pos = _read_long(data, pos)
            if count == 0:
                return out, pos
            if count < 0:  # size-prefixed block (skippable form)
                count = -count
                _, pos = _read_long(data, pos)
            for _ in range(count):
                v, pos = _read(data, pos, node["items"])
                out.append(v)
    if kind == "map":
        out = {}
        while True:
            count, pos = _read_long(data, pos)
            if count == 0:
                return out, pos
            if count < 0:
                count = -count
                _, pos = _read_long(data, pos)
            for _ in range(count):
                raw, pos = _read_bytes(data, pos)
                v, pos = _read(data, pos, node["values"])
                out[raw.decode()] = v
    if kind == "enum":
        idx, pos = _read_long(data, pos)
        if not 0 <= idx < len(node["symbols"]):
            raise ValueError(f"avro: enum index {idx} out of range")
        return node["symbols"][idx], pos
    if kind == "fixed":
        size = node["size"]
        if pos + size > len(data):
            raise ValueError("avro: truncated fixed")
        raw = data[pos : pos + size]
        return _logical_decode(node, raw), pos + size
    if kind == "union":
        idx, pos = _read_long(data, pos)
        if not 0 <= idx < len(node["branches"]):
            raise ValueError(f"avro: union branch {idx} out of range")
        return _read(data, pos, node["branches"][idx])
    raise ValueError(f"avro: unsupported node {kind!r}")


def _accepts(node: dict, v) -> bool:
    kind = node["kind"]
    if kind == "prim":
        t = node["type"]
        lg = node.get("logical")
        if t == "null":
            return v is None
        if t == "boolean":
            return isinstance(v, bool)
        if t in ("int", "long"):
            if lg == "date":
                return isinstance(v, _dt.date)
            if lg in ("timestamp-millis", "timestamp-micros"):
                return isinstance(v, _dt.datetime)
            return isinstance(v, int) and not isinstance(v, bool)
        if t in ("float", "double"):
            return isinstance(v, float)
        if t == "string":
            return isinstance(v, str)
        if lg == "decimal":
            return isinstance(v, (_decimal.Decimal, int))
        return isinstance(v, (bytes, bytearray))
    if kind == "record" or kind == "map":
        return isinstance(v, dict)
    if kind == "array":
        return isinstance(v, (list, tuple))
    if kind == "enum":
        return isinstance(v, str) and v in node["symbols"]
    if kind == "fixed":
        if node.get("logical") == "decimal":
            return isinstance(v, (_decimal.Decimal, int))
        return isinstance(v, (bytes, bytearray)) and len(v) == node["size"]
    return False


def _write(out: bytearray, node: dict, v) -> None:
    kind = node["kind"]
    if kind == "prim":
        t = node["type"]
        v = _logical_encode(node, v)
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            iv = int(v)
            if t == "int" and not -(1 << 31) <= iv < (1 << 31):
                raise ValueError(f"avro: value {iv} out of 32-bit int range")
            _write_long(out, iv)
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "string":
            raw = str(v).encode()
            _write_long(out, len(raw))
            out += raw
        else:
            _write_long(out, len(v))
            out += bytes(v)
        return
    if kind == "record":
        for name, fnode in node["fields"]:
            _write(out, fnode, v.get(name))
        return
    if kind == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _write(out, node["items"], item)
        _write_long(out, 0)
        return
    if kind == "map":
        if v:
            _write_long(out, len(v))
            for k, item in v.items():
                raw = str(k).encode()
                _write_long(out, len(raw))
                out += raw
                _write(out, node["values"], item)
        _write_long(out, 0)
        return
    if kind == "enum":
        try:
            _write_long(out, node["symbols"].index(v))
        except ValueError:
            raise ValueError(f"avro: {v!r} not an enum symbol")
        return
    if kind == "fixed":
        raw = _logical_encode(node, v)
        if len(raw) != node["size"]:
            raise ValueError("avro: fixed size mismatch")
        out += bytes(raw)
        return
    if kind == "union":
        # first branch (declaration order) accepting the value — the
        # standard writer resolution; None always hits a null branch
        for i, branch in enumerate(node["branches"]):
            if _accepts(branch, v):
                _write_long(out, i)
                _write(out, branch, v)
                return
        raise ValueError(f"avro: no union branch accepts {type(v).__name__}")
    raise ValueError(f"avro: unsupported node {kind!r}")


# ---------------------------------------------------------------- OCF


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
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k.decode()] = v
    sync = data[pos : pos + 16]
    pos += 16
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    root = _compile(schema, {})
    if root["kind"] != "record":
        raise ValueError("avro: only record schemas supported at top level")
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
            row, bpos = _read(block, bpos, root)
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
    :func:`read_avro_bytes`) — the full compiled type system: nested
    records, arrays, maps, enums, fixed, general unions (first
    accepting branch in declaration order) and the decimal / date /
    timestamp logical types.  Blocks of ``rows_per_block`` keep
    files splittable."""
    root = _compile(schema, {})
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        raw = k.encode()
        _write_long(out, len(raw))
        out += raw
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync
    for i in range(0, max(len(rows), 1), rows_per_block):
        chunk = rows[i : i + rows_per_block]
        if not chunk:
            break
        body = bytearray()
        for row in chunk:
            _write(body, root, row)
        payload = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


# ---------------------------------------------------------------- spark

_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(),
    "double": T.DoubleType(), "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def to_spark_type(node: dict) -> T.DataType:
    """Compiled Avro node -> Spark type.  Nullable ``["null", X]``
    unions collapse to X (nullability is per-StructField in Spark);
    other multi-branch unions have no Spark analogue and raise."""
    kind = node["kind"]
    if kind == "prim":
        lg = node.get("logical")
        if lg == "decimal":
            return T.DecimalType(node["precision"], node["scale"])
        if lg == "date":
            return T.DateType()
        if lg in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        return _PRIM_TO_SPARK[node["type"]]
    if kind == "record":
        return T.StructType(
            [
                T.StructField(n, to_spark_type(f), True)
                for n, f in node["fields"]
            ]
        )
    if kind == "array":
        return T.ArrayType(to_spark_type(node["items"]), True)
    if kind == "map":
        return T.MapType(T.StringType(), to_spark_type(node["values"]), True)
    if kind == "enum":
        return T.StringType()
    if kind == "fixed":
        if node.get("logical") == "decimal":
            return T.DecimalType(node["precision"], node["scale"])
        return T.BinaryType()
    if kind == "union":
        non_null = [b for b in node["branches"] if b.get("type") != "null"]
        if len(non_null) == 1:
            return to_spark_type(non_null[0])
        raise ValueError("avro: general unions have no Spark column type")
    raise ValueError(f"avro: unsupported node {kind!r}")


def read_avro(
    spark: SparkSession, path_glob: str, schema: dict
) -> DataFrame:
    """Read Avro OCF files into a DataFrame — file-grain binaryFile
    tasks, blocks decoded in-task; nested records/arrays/maps land
    as nested Spark columns.  The writer schema must be supplied
    (and is verified against each file's embedded schema) so the
    Spark schema is known at plan time; schema drift raises rather
    than silently miscasting."""
    root = _compile(schema, {})
    if root["kind"] != "record":
        raise ValueError("avro: only record schemas supported at top level")
    spark_schema = to_spark_type(root)
    expected = json.dumps(schema, sort_keys=True)
    raw = (
        spark.read.format("binaryFile").load(path_glob)
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [n for n, _ in root["fields"]]
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
