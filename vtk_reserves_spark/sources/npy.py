"""NumPy ``.npy`` / ``.npz`` files as a Spark source — embedding
and tensor interchange at file grain.

``.npy`` is how embedding dumps, probe activations and evaluation
tensors actually move between ML jobs; ``.npz`` bundles several
named arrays in one (uncompressed or deflated) zip.  numpy parses
its own format (version 1/2/3 headers), so like ``sqlite.py`` /
``arrow_ipc.py`` this wraps the reference implementation —
``allow_pickle=False`` ALWAYS, because pickled object arrays are
arbitrary code execution and a crawl-scale ingest must never load
them.

Scale posture: one FILE is the task grain (binaryFile); a 2-D array
streams out as one row per matrix row (``row_idx`` + a double
array), 1-D as a single row; batches of 4096 rows bound peak Arrow
memory.  ``read_npz`` exposes each member the same way with a
``member`` column.  Non-numeric dtypes raise a clear error.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_npy", "read_npz", "npy_bytes", "npz_bytes"]

NPY_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("member", T.StringType()),
    T.StructField("row_idx", T.LongType()),
    T.StructField("values", T.ArrayType(T.DoubleType())),
])


def npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr), allow_pickle=False)
    return buf.getvalue()


def npz_bytes(compressed: bool = False, **arrays: np.ndarray) -> bytes:
    buf = io.BytesIO()
    savez = np.savez_compressed if compressed else np.savez
    savez(buf, **arrays)
    return buf.getvalue()


def _rows(path: str, member: str, arr: np.ndarray):
    if arr.dtype.kind not in "fiub":
        raise ValueError(
            f"npy: non-numeric dtype {arr.dtype} in {member or path!r}"
        )
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    elif arr.ndim != 2:
        raise ValueError(
            f"npy: expected 1-D or 2-D array, got shape {arr.shape}"
        )
    mat = arr.astype(np.float64, copy=False)
    for start in range(0, mat.shape[0], 4096):
        chunk = mat[start : start + 4096]
        yield pd.DataFrame({
            "path": path,
            "member": member,
            "row_idx": np.arange(start, start + chunk.shape[0]),
            "values": list(chunk),
        })


def _reader(npz: bool):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path, content in zip(b["path"], b["content"]):
                data = io.BytesIO(bytes(content))
                if npz:
                    with np.load(data, allow_pickle=False) as z:
                        for name in z.files:
                            yield from _rows(path, name, z[name])
                else:
                    arr = np.load(data, allow_pickle=False)
                    yield from _rows(path, "", arr)

    return run


def read_npy(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read ``.npy`` files -> ``(path, member='', row_idx, values)``
    — one row per matrix row, file-grain tasks."""
    raw = (
        spark.read.format("binaryFile").load(path_glob)
        .select("path", "content")
    )
    return raw.mapInPandas(_reader(npz=False), NPY_SCHEMA)


def read_npz(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read ``.npz`` bundles -> ``(path, member, row_idx, values)``
    for every named array."""
    raw = (
        spark.read.format("binaryFile").load(path_glob)
        .select("path", "content")
    )
    return raw.mapInPandas(_reader(npz=True), NPY_SCHEMA)
