"""SQLite source edges: byte round-trip, magic/schema validation,
engine-side WHERE pushdown, rowid-sharded single-file reads."""
import pandas as pd
import pytest
from pyspark.sql import types as T

from vtk_reserves_spark.sources.sqlite import (
    read_sqlite,
    read_sqlite_sharded,
    write_sqlite_bytes,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("blob", T.BinaryType()),
])


def _rows(n):
    return [(i, f"n{i}", i / 8.0, bytes([i % 256, 0, 255])) for i in range(n)]


def test_roundtrip(spark, tmp_path):
    rows = _rows(25)
    for i in range(2):
        (tmp_path / f"p{i}.sqlite").write_bytes(
            write_sqlite_bytes("t", SCHEMA, rows)
        )
    df = read_sqlite(spark, str(tmp_path / "*.sqlite"), "t", SCHEMA)
    got = df.collect()
    assert len(got) == 50
    one = next(r for r in got if r.id == 7)
    assert one.name == "n7" and one.score == 7 / 8
    assert one.blob == bytes([7, 0, 255])


def test_where_pushdown(spark, tmp_path):
    (tmp_path / "a.sqlite").write_bytes(
        write_sqlite_bytes("t", SCHEMA, _rows(30))
    )
    df = read_sqlite(
        spark, str(tmp_path / "a.sqlite"), "t", SCHEMA, where="id >= 20"
    )
    assert sorted(r.id for r in df.collect()) == list(range(20, 30))


def test_bad_magic_and_missing_table(spark, tmp_path):
    (tmp_path / "bad.sqlite").write_bytes(b"not a database at all")
    with pytest.raises(Exception, match="magic"):
        read_sqlite(
            spark, str(tmp_path / "bad.sqlite"), "t", SCHEMA
        ).collect()
    (tmp_path / "ok.sqlite").write_bytes(
        write_sqlite_bytes("t", SCHEMA, _rows(3))
    )
    with pytest.raises(Exception, match="not found"):
        read_sqlite(
            spark, str(tmp_path / "ok.sqlite"), "missing", SCHEMA
        ).collect()
    bad_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("nope", T.LongType())]
    )
    with pytest.raises(Exception, match="nope"):
        read_sqlite(
            spark, str(tmp_path / "ok.sqlite"), "t", bad_schema
        ).collect()


def test_sharded_single_file(spark, tmp_path):
    p = tmp_path / "big.sqlite"
    p.write_bytes(write_sqlite_bytes("t", SCHEMA, _rows(1000)))
    df = read_sqlite_sharded(spark, str(p), "t", SCHEMA, n_shards=7)
    got = df.select("id").toPandas()["id"]
    assert sorted(got) == list(range(1000))  # shards tile exactly
