"""Avro OCF edges: zigzag longs, union branches, both codecs,
multi-block sync framing, corrupt structures, schema verification,
file-grain Spark reads."""
import pytest

from vtk_reserves_spark.sources.avro import (
    read_avro_bytes, write_avro_bytes,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "blob", "type": ["null", "bytes"]},
        {"name": "small", "type": "int"},
        {"name": "ratio", "type": "float"},
    ],
}


def _rows(n=25):
    return [
        {
            "id": (-1) ** i * i * 1_000_000_007,
            "name": None if i % 3 == 0 else f"nameé {i}",
            "score": i / 8,
            "ok": bool(i % 2),
            "blob": None if i % 2 else bytes(range(i % 7)),
            "small": i - 10,
            "ratio": float(i) / 4,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_multiblock(codec):
    rows = _rows()
    blob = write_avro_bytes(SCHEMA, rows, codec, rows_per_block=7)
    schema, got = read_avro_bytes(blob)
    assert schema == SCHEMA
    assert got == rows


def test_zigzag_extremes():
    rows = [dict(_rows(1)[0], id=v) for v in
            (0, -1, 1, 2**62, -(2**62), 63, -64)]
    _, got = read_avro_bytes(write_avro_bytes(SCHEMA, rows))
    assert [r["id"] for r in got] == [r["id"] for r in rows]


def test_corrupt_raises():
    with pytest.raises(ValueError):
        read_avro_bytes(b"NotAvro!")
    blob = bytearray(write_avro_bytes(SCHEMA, _rows(5)))
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        read_avro_bytes(bytes(blob))
    with pytest.raises(ValueError):
        read_avro_bytes(write_avro_bytes(SCHEMA, _rows(3))[:-20])


def test_unsupported_schema_rejected():
    bad = {"type": "record", "name": "x", "fields": [
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ]}
    with pytest.raises(ValueError):
        write_avro_bytes(bad, [])
    with pytest.raises(ValueError):
        write_avro_bytes(
            {"type": "record", "name": "x", "fields": [
                {"name": "u", "type": ["string", "long"]},
            ]},
            [],
        )


def test_spark_read_avro(spark, tmp_path):
    from vtk_reserves_spark.sources.avro import read_avro

    rows = _rows(30)
    for i in range(2):
        (tmp_path / f"p{i}.avro").write_bytes(
            write_avro_bytes(SCHEMA, rows[i * 15 : (i + 1) * 15],
                             codec="deflate", rows_per_block=4)
        )
    df = read_avro(spark, str(tmp_path / "*.avro"), SCHEMA)
    got = sorted(df.collect(), key=lambda r: abs(r.id))
    assert len(got) == 30
    assert got[3].name == "nameé 3" or got[3].name is None
    assert df.schema["score"].dataType.typeName() == "double"


def test_spark_schema_drift_raises(spark, tmp_path):
    from vtk_reserves_spark.sources.avro import read_avro

    (tmp_path / "a.avro").write_bytes(write_avro_bytes(SCHEMA, _rows(3)))
    other = dict(SCHEMA, name="other")
    with pytest.raises(Exception, match="differs"):
        read_avro(spark, str(tmp_path / "*.avro"), other).collect()
