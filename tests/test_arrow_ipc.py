"""Arrow IPC source edges: round-trip, column pruning, schema
discovery and drift, multi-batch files."""
import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import types as T

from vtk_reserves_spark.sources.arrow_ipc import (
    arrow_ipc_schema,
    read_arrow_ipc,
    write_arrow_ipc_bytes,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
])


def _table(n):
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "name": [f"n{i}" for i in range(n)],
        "score": [i / 8.0 for i in range(n)],
        "tags": [[f"t{i % 3}"] * (i % 2 + 1) for i in range(n)],
    })


def test_roundtrip_and_nested(spark, tmp_path):
    for i in range(2):
        (tmp_path / f"p{i}.arrow").write_bytes(
            write_arrow_ipc_bytes(_table(20))
        )
    df = read_arrow_ipc(spark, str(tmp_path / "*.arrow"), SCHEMA)
    got = df.collect()
    assert len(got) == 40
    one = next(r for r in got if r.id == 5 )
    assert one.name == "n5" and one.score == 5 / 8
    assert one.tags == ["t2", "t2"]


def test_column_pruning(spark, tmp_path):
    (tmp_path / "a.arrow").write_bytes(write_arrow_ipc_bytes(_table(10)))
    df = read_arrow_ipc(
        spark, str(tmp_path / "a.arrow"), SCHEMA, columns=["id", "score"]
    )
    assert df.columns == ["id", "score"]
    assert df.count() == 10


def test_schema_discovery(tmp_path):
    blob = write_arrow_ipc_bytes(_table(3))
    st = arrow_ipc_schema(blob)
    assert [f.name for f in st.fields] == ["id", "name", "score", "tags"]
    assert st["tags"].dataType.typeName() == "array"


def test_missing_column_raises(spark, tmp_path):
    (tmp_path / "a.arrow").write_bytes(write_arrow_ipc_bytes(_table(3)))
    bad = T.StructType(
        list(SCHEMA.fields) + [T.StructField("nope", T.LongType())]
    )
    with pytest.raises(Exception, match="nope"):
        read_arrow_ipc(spark, str(tmp_path / "a.arrow"), bad).collect()


def test_multibatch_file(spark, tmp_path):
    import io

    import pyarrow.ipc as pa_ipc

    tbl = _table(100)
    sink = io.BytesIO()
    with pa_ipc.new_file(sink, tbl.schema) as w:
        for batch in tbl.to_batches(max_chunksize=17):
            w.write_batch(batch)
    (tmp_path / "m.arrow").write_bytes(sink.getvalue())
    df = read_arrow_ipc(spark, str(tmp_path / "m.arrow"), SCHEMA)
    assert sorted(r.id for r in df.select("id").collect()) == list(range(100))
