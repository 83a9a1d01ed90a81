"""Protobuf wire-format walker edges: varint boundaries, all wire
types, UTF-8 heuristic, group rejection, truncation."""
import pytest

from vtk_reserves_spark.sources.protobuf import (
    build_message, parse_fields,
)


def test_varint_length_boundaries():
    for v, n in ((0, 1), (127, 1), (128, 2), (16383, 2), (16384, 3)):
        f = parse_fields(build_message([(1, 0, v)]))[0]
        assert (f["uint"], f["n_bytes"]) == (v, n)


def test_all_wire_types():
    msg = build_message([
        (1, 0, 300), (2, 1, 2**40), (3, 5, 12345), (4, 2, "tëxt"),
        (5, 2, b"\xff\x00\x01"),
    ])
    fields = parse_fields(msg)
    assert [f["wire_type"] for f in fields] == [0, 1, 5, 2, 2]
    assert fields[1]["uint"] == 2**40
    assert fields[3]["text"] == "tëxt"
    assert fields[4]["text"] is None  # invalid UTF-8 stays binary


def test_control_char_text_rejected():
    # decodes as UTF-8 but contains control bytes: not "text"
    f = parse_fields(build_message([(1, 2, b"ab\x00cd")]))[0]
    assert f["text"] is None and f["n_bytes"] == 5


def test_high_field_numbers():
    f = parse_fields(build_message([(536870911, 0, 1)]))[0]
    assert f["field_no"] == 536870911  # max 29-bit field number


def test_malformed_raises():
    with pytest.raises(ValueError, match="field number 0"):
        parse_fields(b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        parse_fields(build_message([(1, 1, 5)])[:-2])
    with pytest.raises(ValueError, match="truncated LEN"):
        parse_fields(b"\x0a\x7fshort")
    with pytest.raises(ValueError, match="wire type"):
        parse_fields(bytes([(1 << 3) | 3]))  # deprecated group start


def test_spark_census(spark):
    from vtk_reserves_spark.sources.protobuf import (
        attach_protobuf_payload, protobuf_census,
    )

    docs = spark.range(9).withColumnRenamed("id", "doc_id")
    rows = protobuf_census(attach_protobuf_payload(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 5 and len(by_doc[3]) == 6  # %3 extra field
    f2 = next(r for r in by_doc[4] if r.field_no == 2)
    assert f2.text == "msg 4" and f2.wire_type == 2
    f5 = next(r for r in by_doc[4] if r.field_no == 5)
    assert f5.text is None and f5.n_bytes == 2
    assert all(r.error is None for r in rows)


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.sources.protobuf import protobuf_census

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"\x00\x00"]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = protobuf_census(df, on_error="null").collect()
    assert out[0].error is not None
