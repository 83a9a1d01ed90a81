"""Sinks — Spark rebuild of ``pd_save_dataframe`` (``_gui.py:335-395``).

Two write paths, chosen by intent:

- :func:`save_table` — distributed ``df.write`` for data-scale outputs
  (parquet/csv/json directories); this is the 100 TB path.
- :func:`save_report` — driver-side single-file outputs for report-sized
  results (csv/xlsx/json), matching the reference's single-file behavior
  including the empty-result guard that prints ``"empty"``
  (``_gui.py:394-395``).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame


def save_table(df: DataFrame, path: str, fmt: str | None = None, mode: str = "overwrite") -> None:
    ext = (fmt or os.path.splitext(path.lower())[1].lstrip(".") or "parquet")
    writer = df.write.mode(mode)
    if ext == "parquet":
        writer.parquet(path)
    elif ext == "csv":
        writer.option("header", True).csv(path)
    elif ext == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported table output format: {ext!r}")


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols,
    n_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted parquet table for co-located joins: two tables
    bucketed the same way join WITHOUT a shuffle (the per-bucket files
    are already hash-partitioned and sorted on the key), which at 100 TB
    turns the dominant join cost into a streaming merge per bucket.

    Registers ``table`` in the session catalog (bucket metadata lives
    there, not in the parquet footers); ``path`` overrides the warehouse
    location."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def save_report(df: DataFrame, path: str | None) -> None:
    """Small-result single-file writer. ``path`` empty -> print to stdout
    (reference ``vtk_reserves.py:125-128``)."""
    pdf = df.toPandas()
    if pdf.empty:
        print("empty")  # reference _gui.py:394-395
        return
    if not path:
        print(pdf.to_string(index=False))
        return
    ext = os.path.splitext(path.lower())[1]
    if ext in (".xlsx", ".xls"):
        try:
            pdf.to_excel(path, index=False)
        except ImportError:
            # openpyxl not in the container: use the built-in writer
            from vtk_reserves_spark.sources.xlsx import write_xlsx

            write_xlsx({"report": pdf}, path)
    elif ext == ".csv":
        try:
            pdf.to_csv(path, index=False, encoding="utf-8")
        except UnicodeEncodeError:  # reference falls back encodings (_gui.py:383-391)
            pdf.to_csv(path, index=False, encoding="latin-1")
    elif ext == ".json":
        pdf.to_json(path, orient="records")
    else:
        raise ValueError(f"unsupported report output format: {ext!r}")
