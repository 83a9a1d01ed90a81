"""safetensors reader/writer — the model-weight / embedding-dump
tensor format (huggingface/safetensors, public spec).

Layout: ``u64 LE header length`` + UTF-8 JSON header mapping tensor
name -> ``{"dtype", "shape", "data_offsets": [begin, end)}`` (offsets
relative to the byte buffer that follows; optional ``__metadata__``
string map) + the raw little-endian tensor buffer.  The format is
zero-copy by design, which makes the distributed read trivial: slab
any tensor by its first dimension and every task reads its own byte
range.

Dtypes: F64/F32/F16/I64/I32/I16/I8/U8/BOOL map to numpy directly;
BF16 has no numpy dtype and is surfaced as its exact float32
widening (pad 16 zero mantissa bits) with the raw uint16 view
available via ``raw_bf16=True``.

Scale posture: header-only driver walk (KBs) + row-slab byte-range
reads, the `sources/hdf5.py` contiguous-dataset shape — one task per
~32 MB slab, zero shuffle.  Writer is driver-side (fixture/report
scale) like the other array stores.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_safetensors_header", "read_safetensors", "write_safetensors",
    "read_safetensors_df",
]

_DTYPES = {
    "F64": "<f8", "F32": "<f4", "F16": "<f2",
    "I64": "<i8", "I32": "<i4", "I16": "<i2", "I8": "i1",
    "U8": "u1", "BOOL": "?",
}
_TO_ST = {
    "float64": "F64", "float32": "F32", "float16": "F16",
    "int64": "I64", "int32": "I32", "int16": "I16", "int8": "I8",
    "uint8": "U8", "bool": "BOOL",
}


def _load(path_or_bytes) -> bytes:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes)
    with open(path_or_bytes, "rb") as fh:
        return fh.read()


def read_safetensors_header(path_or_bytes) -> tuple[dict, int]:
    """-> (header dict incl. ``__metadata__`` if present, byte offset
    where the tensor buffer starts)."""
    data = _load(path_or_bytes)
    if len(data) < 8:
        raise ValueError("safetensors: truncated header length")
    (hlen,) = struct.unpack_from("<Q", data, 0)
    if 8 + hlen > len(data):
        raise ValueError("safetensors: header overruns file")
    header = json.loads(data[8 : 8 + hlen].decode("utf-8"))
    if not isinstance(header, dict):
        raise ValueError("safetensors: header is not a JSON object")
    buf_start = 8 + hlen
    buf_len = len(data) - buf_start
    for name, info in header.items():
        if name == "__metadata__":
            continue
        b, e = info["data_offsets"]
        if not (0 <= b <= e <= buf_len):
            raise ValueError(
                f"safetensors: tensor {name!r} offsets outside buffer"
            )
        if info["dtype"] not in _DTYPES and info["dtype"] != "BF16":
            raise ValueError(
                f"safetensors: unsupported dtype {info['dtype']!r}"
            )
    return header, buf_start


def _decode(raw: bytes, info: dict, raw_bf16: bool) -> np.ndarray:
    shape = tuple(int(s) for s in info["shape"])
    st = info["dtype"]
    if st == "BF16":
        u16 = np.frombuffer(raw, "<u2")
        if raw_bf16:
            return u16.reshape(shape)
        # exact widening: bf16 is the top 16 bits of an f32
        return (
            (u16.astype(np.uint32) << 16).view(np.float32).reshape(shape)
        )
    arr = np.frombuffer(raw, _DTYPES[st])
    return arr.reshape(shape)


def read_safetensors(
    path_or_bytes, name: str, raw_bf16: bool = False
) -> np.ndarray:
    data = _load(path_or_bytes)
    header, start = read_safetensors_header(data)
    if name not in header or name == "__metadata__":
        avail = sorted(k for k in header if k != "__metadata__")
        raise KeyError(f"safetensors: no tensor {name!r}; have {avail}")
    info = header[name]
    b, e = info["data_offsets"]
    return _decode(data[start + b : start + e], info, raw_bf16)


def write_safetensors(
    path_or_none, tensors: dict, metadata: dict | None = None
) -> bytes:
    """``{name: ndarray}`` -> safetensors bytes (and optionally a
    file).  Arrays convert to little-endian; names sort for a
    deterministic layout."""
    entries = {}
    buf = bytearray()
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        st = _TO_ST.get(arr.dtype.name)
        if st is None:
            raise ValueError(
                f"safetensors: unsupported dtype {arr.dtype} for {name!r}"
            )
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        raw = arr.tobytes()
        entries[name] = {
            "dtype": st,
            "shape": list(arr.shape),
            "data_offsets": [len(buf), len(buf) + len(raw)],
        }
        buf += raw
    if metadata:
        entries["__metadata__"] = {
            str(k): str(v) for k, v in metadata.items()
        }
    hjson = json.dumps(entries, separators=(",", ":")).encode()
    hjson += b" " * (-len(hjson) % 8)  # spec: pad header to 8 bytes
    out = struct.pack("<Q", len(hjson)) + hjson + bytes(buf)
    if path_or_none is not None:
        with open(path_or_none, "wb") as fh:
            fh.write(out)
    return out


def read_safetensors_df(
    spark: SparkSession, path: str, name: str
) -> DataFrame:
    """Tensor -> exploded DataFrame by row slabs (~32 MB byte ranges
    along the first dimension; one task per slab, header-only driver
    work) — columns ``i0..i{ndim-1}`` + ``value``, matching the
    Zarr/HDF5 readers."""
    header, start = read_safetensors_header(path)
    if name not in header or name == "__metadata__":
        avail = sorted(k for k in header if k != "__metadata__")
        raise KeyError(f"safetensors: no tensor {name!r}; have {avail}")
    info = header[name]
    shape = [int(s) for s in info["shape"]]
    ndim = len(shape)
    if ndim == 0:
        raise ValueError("safetensors: 0-d tensors have no tabular form")
    st = info["dtype"]
    itemsize = 2 if st in ("F16", "BF16") else np.dtype(
        _DTYPES.get(st, "<u2")
    ).itemsize
    val_t = "double" if st in ("F64", "F32", "F16", "BF16") else "bigint"
    schema = ", ".join(
        f"i{d} bigint" for d in range(ndim)
    ) + f", value {val_t}"
    row_elems = int(np.prod(shape[1:], dtype=np.int64)) if ndim > 1 else 1
    row_bytes = row_elems * itemsize
    rows_per = max(1, (32 << 20) // max(1, row_bytes))
    b0, _ = info["data_offsets"]
    tasks = []
    for r0 in range(0, shape[0], rows_per):
        nrows = min(rows_per, shape[0] - r0)
        tasks.append((r0, start + b0 + r0 * row_bytes,
                      nrows * row_bytes, nrows))
    tasks_df = spark.createDataFrame(
        tasks, "r0 long, addr long, nbytes long, nrows long"
    ).repartition(max(1, len(tasks)))
    tail = shape[1:]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with open(path, "rb") as fh:
                    fh.seek(int(row.addr))
                    raw = fh.read(int(row.nbytes))
                arr = _decode(
                    raw,
                    {"dtype": st, "shape": [int(row.nrows)] + tail},
                    raw_bf16=False,
                )
                idx = np.indices(arr.shape).reshape(ndim, -1)
                cols = {f"i{d}": idx[d] for d in range(ndim)}
                cols["i0"] = cols["i0"] + int(row.r0)
                vals = arr.reshape(-1)
                cols["value"] = (
                    vals.astype(np.float64)
                    if val_t == "double"
                    else vals.astype(np.int64)
                )
                yield pd.DataFrame(cols)

    return tasks_df.mapInPandas(decode, schema)
