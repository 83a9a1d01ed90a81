"""Parquet footer introspection — row-group statistics as a table.

The data-skipping audit tool every lake pipeline needs: whether a
filter CAN prune depends on footer min/max tightness, row-group
sizing and null counts — `SCALE.md`'s Z-order writer asserts exactly
these properties in tests, and this module turns the same
introspection into a first-class distributed operator.

Scale posture: **footer grain** — each task opens its file with
``pyarrow.parquet.ParquetFile`` and reads ONLY the footer (KBs at
the end of the file; no data pages are touched), so auditing a
100 TB lake costs one metadata fetch per file.  The per-row-group
output is tiny (files x row-groups x columns), so downstream
aggregation is negligible.

Correctness device (q:parquet_stats): footer statistics must equal
the statistics of the data itself — the Spark side reads only
footers, the DuckDB oracle recomputes COUNT / null-count / MIN /
MAX from the rows, and the hash compare proves the two agree.  No
file paths leak into the oracle.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["parquet_rowgroup_stats", "parquet_column_stats"]

_SCHEMA = (
    "file string, row_group int, path_in_schema string, "
    "num_values long, null_count long, "
    "total_compressed_size long, total_uncompressed_size long, "
    "min_value double, max_value double"
)


def parquet_rowgroup_stats(
    spark: SparkSession, path_glob: str, columns: list[str] | None = None
) -> DataFrame:
    """One row per (file, row group, column) from footers only.

    ``min_value``/``max_value`` surface for numeric physical types
    (cast to double — exact for int32/float and for int64 within
    2^53); NULL otherwise or when the writer omitted stats.
    """
    files = sorted(_glob.glob(path_glob))
    if not files and os.path.exists(path_glob):
        files = [path_glob]
    if not files:
        raise ValueError(f"parquet_meta: no files match {path_glob!r}")
    fdf = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(max(1, len(files)))
    want = set(columns) if columns else None

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                pf = pq.ParquetFile(path)
                base = os.path.basename(path)
                meta = pf.metadata
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        if want is not None and name not in want:
                            continue
                        st = c.statistics
                        mn = mx = None
                        nulls = None
                        if st is not None:
                            nulls = st.null_count
                            if st.has_min_max and isinstance(
                                st.min, (int, float)
                            ) and not isinstance(st.min, bool):
                                mn = float(st.min)
                                mx = float(st.max)
                        rows.append(
                            (base, rg, name, c.num_values, nulls,
                             c.total_compressed_size,
                             c.total_uncompressed_size, mn, mx)
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "row_group", "path_in_schema", "num_values",
                    "null_count", "total_compressed_size",
                    "total_uncompressed_size", "min_value", "max_value",
                ],
            )

    return fdf.mapInPandas(read_footers, _SCHEMA)


def parquet_column_stats(
    spark: SparkSession, path_glob: str, columns: list[str] | None = None
) -> DataFrame:
    """Footer stats aggregated per column across all row groups —
    the shape the footer-vs-data oracle compares: ``(path_in_schema,
    n_values, n_nulls, min_value, max_value)``."""
    rg = parquet_rowgroup_stats(spark, path_glob, columns)
    return rg.groupBy("path_in_schema").agg(
        F.sum("num_values").alias("n_values"),
        F.sum("null_count").alias("n_nulls"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
