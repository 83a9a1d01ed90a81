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
    # maps and general unions are now first-class; what still raises:
    # unknown named types, non-record top level, bad enum symbols
    with pytest.raises(ValueError, match="unknown type name"):
        write_avro_bytes({"type": "record", "name": "x", "fields": [
            {"name": "r", "type": "NoSuchType"},
        ]}, [])
    with pytest.raises(ValueError, match="top level"):
        read_avro_bytes(write_avro_bytes(
            {"type": "record", "name": "x", "fields": []}, []
        ).replace(b'"record"', b'"string"', 1))
    enum_schema = {"type": "record", "name": "x", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "C",
                               "symbols": ["A", "B"]}},
    ]}
    with pytest.raises(ValueError, match="enum symbol"):
        write_avro_bytes(enum_schema, [{"c": "Z"}])


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


COMPLEX_SCHEMA = {
    "type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "color", "type": {"type": "enum", "name": "Color",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "fp", "type": {"type": "fixed", "name": "FP", "size": 4}},
        {"name": "price", "type": {"type": "bytes",
                                   "logicalType": "decimal",
                                   "precision": 10, "scale": 2}},
        {"name": "born", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "addr", "type": ["null", {
            "type": "record", "name": "Addr", "fields": [
                {"name": "street", "type": "string"},
                {"name": "zip", "type": "int"},
            ]}]},
        {"name": "alt", "type": ["string", "long", "null"]},
    ],
}


def _complex_rows():
    import datetime
    import decimal

    return [
        {
            "id": 1, "tags": ["a", "b"], "attrs": {"x": 1, "y": -2},
            "color": "GREEN", "fp": b"\x01\x02\x03\x04",
            "price": decimal.Decimal("123.45"),
            "born": datetime.date(1999, 12, 31),
            "ts": datetime.datetime(2020, 6, 1, 12, 30, 15, 123456),
            "addr": {"street": "Main St 5", "zip": 12345},
            "alt": "s-branch",
        },
        {
            "id": -2, "tags": [], "attrs": {},
            "color": "RED", "fp": b"\xff\xfe\xfd\xfc",
            "price": decimal.Decimal("-0.07"),
            "born": datetime.date(1970, 1, 1),
            "ts": datetime.datetime(1969, 12, 31, 23, 59, 59),
            "addr": None,
            "alt": 77,
        },
    ]


def test_complex_types_roundtrip():
    rows = _complex_rows()
    for codec in ("null", "deflate"):
        schema, got = read_avro_bytes(
            write_avro_bytes(COMPLEX_SCHEMA, rows, codec=codec)
        )
        assert got == rows, codec


def test_recursive_named_type():
    schema = {"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "int"},
        {"name": "next", "type": ["null", "Node"]},
    ]}
    rows = [{"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}]
    _, got = read_avro_bytes(write_avro_bytes(schema, rows))
    assert got == rows


def test_fixed_decimal_and_uuid():
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "d", "type": {"type": "fixed", "name": "Dec", "size": 8,
                               "logicalType": "decimal",
                               "precision": 18, "scale": 4}},
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
    ]}
    import decimal

    rows = [{"d": decimal.Decimal("-12345.6789"),
             "u": "0f8fad5b-d9cb-469f-a165-70867728950e"}]
    _, got = read_avro_bytes(write_avro_bytes(schema, rows))
    assert got == rows


def test_spark_read_avro_nested(spark, tmp_path):
    import decimal

    from vtk_reserves_spark.sources.avro import read_avro

    # general unions (the "alt" field) have no Spark column type by
    # design — read over the Spark-mappable subset of the schema
    schema = dict(
        COMPLEX_SCHEMA,
        fields=[f for f in COMPLEX_SCHEMA["fields"] if f["name"] != "alt"],
    )
    rows = [{k: v for k, v in r.items() if k != "alt"}
            for r in _complex_rows()]
    p = tmp_path / "nested.avro"
    p.write_bytes(write_avro_bytes(schema, rows))
    df = read_avro(spark, str(p), schema)
    assert df.schema["addr"].dataType.typeName() == "struct"
    assert df.schema["tags"].dataType.typeName() == "array"
    assert df.schema["attrs"].dataType.typeName() == "map"
    assert df.schema["price"].dataType.simpleString() == "decimal(10,2)"
    out = {r.id: r for r in df.collect()}
    assert out[1].addr.street == "Main St 5" and out[1].addr.zip == 12345
    assert out[1].attrs == {"x": 1, "y": -2}
    assert out[1].price == decimal.Decimal("123.45")
    assert out[-2].addr is None and out[-2].tags == []
    assert str(out[1].born) == "1999-12-31"


def test_out_of_range_ints_raise():
    """Values outside the declared int/long width must raise, not
    silently wrap into corrupt-but-valid-looking OCF data."""
    ok = _rows(1)[0]
    for v in (2**63, -(2**63) - 1):
        with pytest.raises(ValueError, match="long range"):
            write_avro_bytes(SCHEMA, [dict(ok, id=v)])
    for v in (2**31, -(2**31) - 1):
        with pytest.raises(ValueError, match="int range"):
            write_avro_bytes(SCHEMA, [dict(ok, small=v)])
    # boundary values still encode
    rows = [dict(ok, id=2**63 - 1, small=2**31 - 1),
            dict(ok, id=-(2**63), small=-(2**31))]
    _, got = read_avro_bytes(write_avro_bytes(SCHEMA, rows))
    assert [(r["id"], r["small"]) for r in got] == \
        [(r["id"], r["small"]) for r in rows]
