"""TFRecord + tf.train.Example reader/writer — pure stdlib + the
in-repo protobuf wire walker.

TFRecord is the TensorFlow training-data interchange format; together
with WebDataset (`sources/webdataset.py`) it covers the two dominant
sharded-example layouts an LLM data pipeline must emit.  Both layers
are public specs:

* **record framing** (tensorflow/core/lib/io/record_writer.h): each
  record is ``u64le length | u32le masked_crc32c(length bytes) |
  payload | u32le masked_crc32c(payload)`` where the mask is
  ``((crc >> 15) | (crc << 17)) + 0xa282ead8`` — CRC32C rides the
  existing slice-by-16 implementation (`sources/snappy.py`).
* **tf.train.Example** (tensorflow/core/example/example.proto,
  feature.proto): ``Example{features: Features}`` with
  ``Features{feature: map<string, Feature>}``; each ``Feature`` is a
  oneof of ``BytesList`` (field 1, repeated LEN), ``FloatList``
  (field 2, packed float32) and ``Int64List`` (field 3, packed
  varint, two's-complement for negatives).  Encode/decode reuse
  `sources/protobuf.py`'s ``parse_fields``/``build_message`` — map
  entries are ordinary nested messages (key=1, value=2) on the wire.

Scale posture: SHARD grain like WARC — one task per .tfrecord file,
records streamed inside Arrow batches; the writer emits ONE shard per
input partition (temp-name + ``os.replace`` so task retries stay
idempotent), so a 100 TB dump fans out with no driver data path and
no shuffle beyond the caller's own partitioning.  Reference parity:
no counterpart in the reference; training-data-pipeline family
(100 TB brief).
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from vtk_reserves_spark.sources.protobuf import build_message
from vtk_reserves_spark.sources.snappy import crc32c

__all__ = [
    "masked_crc", "read_tfrecord_records", "write_tfrecord_file",
    "example_encode", "example_decode", "sniff_tfrecord_spec",
    "read_tfrecord_df", "write_tfrecord_df",
]

_MASK_DELTA = 0xA282EAD8


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def _open_maybe_gzip(path: str):
    """TFRecordOptions GZIP shards (.tfrecord.gz) stream through
    gzip; plain shards open raw.  Sniffed by magic, not extension,
    so mislabeled files still read."""
    import gzip

    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_tfrecord_records(path: str):
    """Yield record payloads, verifying both masked CRCs."""
    with _open_maybe_gzip(path) as fh:
        while True:
            head = fh.read(12)
            if not head:
                return
            if len(head) < 12:
                raise ValueError("tfrecord: truncated length header")
            (n,) = struct.unpack_from("<Q", head, 0)
            (lcrc,) = struct.unpack_from("<I", head, 8)
            if masked_crc(head[:8]) != lcrc:
                raise ValueError("tfrecord: length checksum mismatch")
            payload = fh.read(n)
            tail = fh.read(4)
            if len(payload) < n or len(tail) < 4:
                raise ValueError("tfrecord: truncated record")
            (dcrc,) = struct.unpack_from("<I", tail, 0)
            if masked_crc(payload) != dcrc:
                raise ValueError("tfrecord: data checksum mismatch")
            yield payload


def write_tfrecord_file(
    path: str, payloads, compress: bool = False
) -> int:
    """Write raw record payloads with the framing + masked CRCs;
    returns the record count.  ``compress`` (or a ``.gz`` path)
    gzips the whole stream — TFRecordOptions GZIP."""
    import gzip

    n = 0
    opener = (
        (lambda: gzip.open(path, "wb", compresslevel=6))
        if compress or path.endswith(".gz")
        else (lambda: open(path, "wb"))
    )
    with opener() as fh:
        for p in payloads:
            p = bytes(p)
            head = struct.pack("<Q", len(p))
            fh.write(head)
            fh.write(struct.pack("<I", masked_crc(head)))
            fh.write(p)
            fh.write(struct.pack("<I", masked_crc(p)))
            n += 1
    return n


# ------------------------------------------------------- Example codec

_KINDS = ("bytes", "float", "int64")


def _encode_int64_list(vals) -> bytes:
    out = bytearray()
    for v in vals:
        u = int(v) & 0xFFFFFFFFFFFFFFFF  # two's complement varint
        while True:
            b = u & 0x7F
            u >>= 7
            out.append(b | 0x80 if u else b)
            if not u:
                break
    return bytes(out)


def _decode_int64_list(raw: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(raw):
        acc = 0
        shift = 0
        while True:
            if pos >= len(raw):
                raise ValueError("tfrecord: truncated packed varint")
            b = raw[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("tfrecord: packed varint too long")
        if acc >= 1 << 63:
            acc -= 1 << 64
        out.append(acc)
    return out


def example_encode(features: dict) -> bytes:
    """``{name: (kind, values)}`` -> one tf.train.Example payload.
    kind: "bytes" (values: list of bytes/str), "float" (packed
    float32) or "int64" (packed varint)."""
    entries = []
    for name in sorted(features):
        kind, vals = features[name]
        if kind == "bytes":
            lst = build_message([
                (1, 2, v if isinstance(v, (bytes, bytearray)) else
                 str(v).encode())
                for v in vals
            ])
            feat = build_message([(1, 2, lst)])
        elif kind == "float":
            packed = np.asarray(vals, "<f4").tobytes()
            feat = build_message([(2, 2, build_message([(1, 2, packed)]))])
        elif kind == "int64":
            feat = build_message(
                [(3, 2, build_message([(1, 2, _encode_int64_list(vals))]))]
            )
        else:
            raise ValueError(f"tfrecord: feature kind {kind!r}")
        entries.append((1, 2, build_message([(1, 2, name), (2, 2, feat)])))
    return build_message([(1, 2, build_message(entries))])


def example_decode(payload: bytes) -> dict:
    """tf.train.Example payload -> ``{name: (kind, values)}``."""
    out: dict = {}
    fields = _fields_bytes(payload)
    for fno, raw in fields:
        if fno != 1:
            continue  # Example.features
        for eno, entry in _fields_bytes(raw):
            if eno != 1:
                continue  # Features.feature map entry
            name = None
            feat = None
            for kno, kraw in _fields_bytes(entry):
                if kno == 1:
                    name = kraw.decode("utf-8")
                elif kno == 2:
                    feat = kraw
            if name is None or feat is None:
                raise ValueError("tfrecord: malformed feature map entry")
            out[name] = _decode_feature(feat)
    return out


def _fields_bytes(data: bytes) -> list[tuple[int, bytes]]:
    """(field_no, LEN payload) pairs of one message (LEN fields
    only; scalar fields rejected — Example's tree is all LEN)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        tag = 0
        shift = 0
        while True:
            if pos >= n:
                raise ValueError("tfrecord: truncated tag")
            b = data[pos]
            pos += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fno, wt = tag >> 3, tag & 7
        if wt != 2:
            raise ValueError(
                f"tfrecord: unexpected wire type {wt} in Example tree"
            )
        ln = 0
        shift = 0
        while True:
            if pos >= n:
                raise ValueError("tfrecord: truncated length")
            b = data[pos]
            pos += 1
            ln |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if pos + ln > n:
            raise ValueError("tfrecord: truncated LEN payload")
        out.append((fno, bytes(data[pos : pos + ln])))
        pos += ln
    return out


def _decode_feature(feat: bytes) -> tuple[str, list]:
    kinds = _fields_bytes(feat)
    if not kinds:
        return ("bytes", [])
    kno, raw = kinds[-1]  # oneof: last one wins, proto semantics
    if kno == 1:  # BytesList
        return ("bytes", [v for n_, v in _fields_bytes(raw) if n_ == 1])
    if kno == 2:  # FloatList (packed f32; unpacked also legal)
        vals: list[float] = []
        for n_, v in _fields_bytes(raw):
            if n_ == 1:
                vals.extend(np.frombuffer(v, "<f4").tolist())
        return ("float", vals)
    if kno == 3:  # Int64List
        vals = []
        for n_, v in _fields_bytes(raw):
            if n_ == 1:
                vals.extend(_decode_int64_list(v))
        return ("int64", vals)
    raise ValueError(f"tfrecord: unknown Feature kind field {kno}")


# ---------------------------------------------------------------- spark


def _spec_to_schema(spec: dict) -> str:
    parts = []
    for name, kind in spec.items():
        t = {
            "int64": "bigint", "float": "double", "string": "string",
            "bytes": "binary", "int64_list": "array<bigint>",
            "float_list": "array<double>",
        }.get(kind)
        if t is None:
            raise ValueError(f"tfrecord: spec kind {kind!r}")
        parts.append(f"{name} {t}")
    return ", ".join(parts)


def sniff_tfrecord_spec(path: str) -> dict:
    """Infer a read spec from the FIRST record of one shard: int64 /
    float scalars become lists when the first record holds more than
    one value; BytesList features that decode as UTF-8 map to
    "string", else "bytes".  A heuristic by nature (later records
    may be wider) — pass an explicit spec when the schema is known."""
    payload = next(iter(read_tfrecord_records(path)), None)
    if payload is None:
        raise ValueError(f"tfrecord: {path} has no records to sniff")
    spec: dict = {}
    for name, (kind, vals) in sorted(example_decode(payload).items()):
        if kind == "bytes":
            try:
                (vals[0] if vals else b"").decode("utf-8")
                spec[name] = "string"
            except UnicodeDecodeError:
                spec[name] = "bytes"
        elif len(vals) > 1:
            spec[name] = f"{kind}_list"
        else:
            spec[name] = kind
    return spec


def read_tfrecord_df(
    spark: SparkSession, paths, spec: dict | None = None
) -> DataFrame:
    """.tfrecord shard(s) -> DataFrame at SHARD grain (one task per
    file).  ``spec`` maps feature name -> "int64" / "float" /
    "string" / "bytes" (scalars: first value) or "int64_list" /
    "float_list" (full arrays); ``None`` sniffs it from the first
    record (:func:`sniff_tfrecord_spec`)."""
    import glob as _glob

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                _glob.glob(os.path.join(paths, "*.tfrecord"))
                + _glob.glob(os.path.join(paths, "*.tfrecord.gz"))
            )
        else:
            files = sorted(_glob.glob(paths)) or [paths]
    else:
        files = sorted(paths)
    if not files:
        raise ValueError(f"tfrecord: no shards under {paths!r}")
    if spec is None:
        spec = sniff_tfrecord_spec(files[0])
    schema = _spec_to_schema(spec)
    spec_items = list(spec.items())
    files_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for path in pdf["path"]:
                cols: dict[str, list] = {n: [] for n, _ in spec_items}
                for payload in read_tfrecord_records(path):
                    ex = example_decode(payload)
                    for name, kind in spec_items:
                        got = ex.get(name)
                        vals = got[1] if got else []
                        if kind == "int64_list":
                            cols[name].append(
                                [int(v) for v in vals]
                            )
                        elif kind == "float_list":
                            cols[name].append(
                                [float(v) for v in vals]
                            )
                        elif not vals:
                            cols[name].append(None)
                        elif kind == "string":
                            cols[name].append(
                                vals[0].decode("utf-8")
                                if isinstance(vals[0], bytes) else
                                str(vals[0])
                            )
                        elif kind == "bytes":
                            cols[name].append(bytes(vals[0]))
                        elif kind == "int64":
                            cols[name].append(int(vals[0]))
                        else:  # float
                            cols[name].append(float(vals[0]))
                yield pd.DataFrame(cols)

    return files_df.mapInPandas(parse, schema)


def write_tfrecord_df(
    df: DataFrame, out_dir: str, spec: dict, compress: bool = False
) -> int:
    """DataFrame -> directory of .tfrecord shards, ONE per input
    partition (control shard count with ``df.repartition(n)``).
    ``spec`` as in :func:`read_tfrecord_df`; string/bytes columns
    land as BytesList, numeric scalars as one-element lists, array
    columns as full lists.  Atomic per-shard rename keeps task
    retries/speculation idempotent; returns the shard count."""
    os.makedirs(out_dir, exist_ok=True)
    spec_items = list(spec.items())
    need = [n for n, _ in spec_items]
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise ValueError(f"tfrecord: input is missing columns {missing}")

    def write_part(batches):
        import uuid

        import pandas as pd
        from pyspark import TaskContext

        import gzip

        pid = TaskContext.get().partitionId()
        ext = ".tfrecord.gz" if compress else ".tfrecord"
        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}{ext}")
        n_rec = 0
        opener = (
            (lambda: gzip.open(tmp, "wb", compresslevel=6))
            if compress else (lambda: open(tmp, "wb"))
        )
        with opener() as fh:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    feats = {}
                    for name, kind in spec_items:
                        v = getattr(row, name)
                        if kind in ("int64", "int64_list"):
                            vals = (
                                [int(x) for x in v]
                                if kind.endswith("list") else [int(v)]
                            )
                            feats[name] = ("int64", vals)
                        elif kind in ("float", "float_list"):
                            vals = (
                                [float(x) for x in v]
                                if kind.endswith("list") else [float(v)]
                            )
                            feats[name] = ("float", vals)
                        else:  # string / bytes
                            feats[name] = ("bytes", [v])
                    p = example_encode(feats)
                    head = struct.pack("<Q", len(p))
                    fh.write(head)
                    fh.write(struct.pack("<I", masked_crc(head)))
                    fh.write(p)
                    fh.write(struct.pack("<I", masked_crc(p)))
                    n_rec += 1
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        os.replace(tmp, final)
        yield pd.DataFrame({"shard": [final], "records": [n_rec]})

    manifest = df.mapInPandas(write_part, "shard string, records long")
    return manifest.count()
