"""SQLite database files as a Spark source — stdlib sqlite3, file
grain.

SQLite is the world's most deployed database file format: app data
exports, annotation tools, scraped-data dumps and research datasets
all ship ``.db``/``.sqlite`` files.  Python bundles the real engine
in the standard library, so unlike the other binary sources this
one does NOT re-implement the format — it mounts each database
inside the executor task (sqlite3 requires a filesystem path, so
bytes land in a task-local temp file that is removed before the
task ends) and scans the requested table through the battle-tested
C engine.

Scale posture: one FILE is the task grain (`binaryFile`, like WARC
shards) — a directory of thousands of .sqlite dumps parallelizes
across the cluster, each task streaming its rows out through Arrow.
A single huge .sqlite does not split (the format is a B-tree, not a
log); the documented recourse is ``shard_rowid`` ranges, which
emits one task per rowid window using the native index.

Schema is declared up front (Spark needs plan-time types); the
reader validates it against ``PRAGMA table_info`` and raises on
drift rather than miscasting.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_sqlite", "read_sqlite_sharded", "write_sqlite_bytes"]

_SPARK_TO_SQLITE = {
    "long": "INTEGER", "integer": "INTEGER", "short": "INTEGER",
    "double": "REAL", "float": "REAL", "string": "TEXT",
    "binary": "BLOB", "boolean": "INTEGER",
}


def write_sqlite_bytes(
    table: str, schema: T.StructType, rows: list[tuple]
) -> bytes:
    """Rows -> a complete SQLite database file as bytes (fixture and
    export helper; the inverse of :func:`read_sqlite`)."""
    fd, path = tempfile.mkstemp(suffix=".sqlite")
    os.close(fd)
    try:
        con = sqlite3.connect(path)
        cols = ", ".join(
            f'"{f.name}" {_SPARK_TO_SQLITE[f.dataType.typeName()]}'
            for f in schema.fields
        )
        con.execute(f'CREATE TABLE "{table}" ({cols})')
        ph = ", ".join("?" for _ in schema.fields)
        con.executemany(f'INSERT INTO "{table}" VALUES ({ph})', rows)
        con.commit()
        con.close()
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)


def _open_bytes(content: bytes) -> tuple[sqlite3.Connection, str]:
    if content[:16] != b"SQLite format 3\x00":
        raise ValueError("sqlite: bad magic (not a SQLite 3 database)")
    fd, path = tempfile.mkstemp(suffix=".sqlite")
    with os.fdopen(fd, "wb") as fh:
        fh.write(content)
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True), path


def _check_schema(
    con: sqlite3.Connection, table: str, schema: T.StructType
) -> None:
    info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    if not info:
        raise ValueError(f"sqlite: table {table!r} not found")
    have = [r[1] for r in info]
    want = [f.name for f in schema.fields]
    missing = [c for c in want if c not in have]
    if missing:
        raise ValueError(
            f"sqlite: columns {missing} not in table {table!r} "
            f"(has {have})"
        )


def read_sqlite(
    spark: SparkSession,
    path_glob: str,
    table: str,
    schema: T.StructType,
    where: str | None = None,
) -> DataFrame:
    """Read one table from every matching SQLite file — file-grain
    binaryFile tasks; an optional ``where`` clause is pushed into
    the sqlite engine (it scans B-tree pages, not Spark rows)."""
    cols = ", ".join(f'"{f.name}"' for f in schema.fields)
    sql = f'SELECT {cols} FROM "{table}"'
    if where:
        sql += f" WHERE {where}"
    raw = spark.read.format("binaryFile").load(path_glob).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in schema.fields]
        for b in batches:
            for content in b["content"]:
                con, path = _open_bytes(bytes(content))
                try:
                    _check_schema(con, table, schema)
                    cur = con.execute(sql)
                    while True:
                        chunk = cur.fetchmany(10_000)
                        if not chunk:
                            break
                        yield pd.DataFrame(chunk, columns=names)
                finally:
                    con.close()
                    os.unlink(path)

    return raw.mapInPandas(run, schema)


def read_sqlite_sharded(
    spark: SparkSession,
    path: str,
    table: str,
    schema: T.StructType,
    n_shards: int = 32,
) -> DataFrame:
    """Read ONE large SQLite file with ``n_shards`` parallel tasks,
    each scanning a rowid range through the native index — the
    recourse for the single-huge-file case where file grain gives
    no parallelism.  The file must be reachable from every executor
    (shared filesystem), which is the same contract as any Spark
    input path."""
    shards = spark.range(n_shards).select(
        F.col("id").cast("int").alias("shard")
    )
    cols = ", ".join(f'"{f.name}"' for f in schema.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in schema.fields]
        for b in batches:
            for shard in b["shard"]:
                con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    _check_schema(con, table, schema)
                    (lo, hi) = con.execute(
                        f'SELECT MIN(rowid), MAX(rowid) FROM "{table}"'
                    ).fetchone()
                    if lo is None:
                        continue
                    span = hi - lo + 1
                    a = lo + span * int(shard) // n_shards
                    z = lo + span * (int(shard) + 1) // n_shards
                    cur = con.execute(
                        f'SELECT {cols} FROM "{table}" '
                        f"WHERE rowid >= ? AND rowid < ?",
                        (a, z),
                    )
                    while True:
                        chunk = cur.fetchmany(10_000)
                        if not chunk:
                            break
                        yield pd.DataFrame(chunk, columns=names)
                finally:
                    con.close()

    return shards.mapInPandas(run, schema)
