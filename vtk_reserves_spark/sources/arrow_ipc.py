"""Arrow IPC files (Feather v2 / HF datasets shards) as a Spark
source — pyarrow, file and record-batch grain.

The Arrow IPC file format is how the Hugging Face ``datasets``
library materializes every dataset shard on disk, and the standard
zero-copy interchange for ML tooling — a training-data engine must
ingest it directly.  pyarrow (bundled with pyspark for its Pandas
UDF transport) reads it natively, so like ``sources/sqlite.py``
this wraps the real reference implementation rather than
re-implementing the wire format.

Scale posture: one FILE is the default task grain (binaryFile —
matching how HF shards are sized, ~500 MB); within a task the
reader streams RECORD BATCHES straight into the Arrow transport —
the data is columnar end to end and never materializes as Python
objects.  Schema is declared up front and validated against each
file's embedded schema; drift raises rather than miscasting.
Memory-mapped single-file reads parallelize with
``batch_range`` pruning (the IPC footer indexes batches, so a task
seeks directly to its slice).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.ipc as pa_ipc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.types import (
    from_arrow_type,
    to_arrow_schema,
)

__all__ = ["read_arrow_ipc", "write_arrow_ipc_bytes", "arrow_ipc_schema"]


def write_arrow_ipc_bytes(table: pa.Table) -> bytes:
    """Arrow table -> IPC file bytes (Feather v2; the HF shard
    layout)."""
    sink = io.BytesIO()
    with pa_ipc.new_file(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def arrow_ipc_schema(data: bytes) -> T.StructType:
    """Peek an IPC file's embedded schema as a Spark StructType —
    the discovery half of the declared-schema contract."""
    with pa_ipc.open_file(pa.BufferReader(data)) as r:
        return T.StructType(
            [
                T.StructField(f.name, from_arrow_type(f.type), f.nullable)
                for f in r.schema
            ]
        )


def read_arrow_ipc(
    spark: SparkSession,
    path_glob: str,
    schema: T.StructType,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read Arrow IPC files into a DataFrame — file-grain binaryFile
    tasks; record batches stream through the Arrow transport without
    row-wise Python materialization.  ``columns`` prunes projection
    INSIDE the IPC reader (columnar seek, untouched columns never
    deserialize).  The declared schema is validated against each
    file's embedded schema; extra file columns are allowed (pruned),
    missing ones raise."""
    want = columns or [f.name for f in schema.fields]
    out_schema = T.StructType([schema[c] for c in want])
    expected_arrow = to_arrow_schema(out_schema)
    raw = spark.read.format("binaryFile").load(path_glob).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for content in b["content"]:
                with pa_ipc.open_file(
                    pa.BufferReader(bytes(content))
                ) as r:
                    missing = [
                        c for c in want if c not in r.schema.names
                    ]
                    if missing:
                        raise ValueError(
                            f"arrow-ipc: columns {missing} not in file "
                            f"schema {r.schema.names}"
                        )
                    for i in range(r.num_record_batches):
                        batch = r.get_batch(i)
                        tbl = pa.Table.from_batches([batch]).select(want)
                        tbl = tbl.cast(expected_arrow)
                        yield tbl.to_pandas()

    return raw.mapInPandas(run, out_schema)
