"""TFRecord framing + tf.train.Example codec + Spark shard paths."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from vtk_reserves_spark.sources.tfrecord import (
    example_decode,
    example_encode,
    masked_crc,
    read_tfrecord_df,
    read_tfrecord_records,
    write_tfrecord_df,
    write_tfrecord_file,
)


def test_masked_crc_known_shape():
    # the mask formula is an involution-free rotation + delta; check
    # unmasking algebraically: ((m - delta) rotr 17) == crc
    data = b"tfrecord"
    from vtk_reserves_spark.sources.snappy import crc32c

    m = masked_crc(data)
    c = crc32c(data)
    um = (m - 0xA282EAD8) & 0xFFFFFFFF
    assert ((um << 15) | (um >> 17)) & 0xFFFFFFFF == c


def test_example_roundtrip_all_kinds():
    ex = example_encode({
        "i": ("int64", [0, 1, -1, 2**62, -(2**62)]),
        "f": ("float", [0.5, -3.75]),
        "b": ("bytes", [b"\x00raw", "text"]),
    })
    back = example_decode(ex)
    assert back["i"] == ("int64", [0, 1, -1, 2**62, -(2**62)])
    assert back["f"] == ("float", [0.5, -3.75])
    assert back["b"] == ("bytes", [b"\x00raw", b"text"])


def test_record_framing_and_checksums(tmp_path):
    p = str(tmp_path / "a.tfrecord")
    payloads = [b"x" * n for n in (0, 1, 100)]
    assert write_tfrecord_file(p, payloads) == 3
    assert list(read_tfrecord_records(p)) == payloads
    raw = bytearray(open(p, "rb").read())
    raw[8] ^= 0xFF  # flip a bit in the first length CRC
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="length checksum"):
        list(read_tfrecord_records(p))


def test_truncated_record_rejected(tmp_path):
    p = str(tmp_path / "t.tfrecord")
    write_tfrecord_file(p, [b"hello world"])
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-6])
    with pytest.raises(ValueError, match="truncated"):
        list(read_tfrecord_records(p))


def test_unpacked_float_list_also_decodes():
    # proto2-era writers may emit unpacked repeated floats (one I32
    # field per value); the spec says readers accept both — ours
    # reads each LEN fragment, so emulate two packed fragments
    from vtk_reserves_spark.sources.protobuf import build_message

    frag1 = np.asarray([1.0], "<f4").tobytes()
    frag2 = np.asarray([2.0, 3.0], "<f4").tobytes()
    flist = build_message([(1, 2, frag1), (1, 2, frag2)])
    feat = build_message([(2, 2, flist)])
    entry = build_message([(1, 2, "x"), (2, 2, feat)])
    ex = build_message([(1, 2, build_message([(1, 2, entry)]))])
    assert example_decode(ex)["x"] == ("float", [1.0, 2.0, 3.0])


def test_spark_write_read_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "shards")
    df = (
        spark.range(50)
        .withColumn("txt", F.concat(F.lit("d-"), F.col("id")))
        .withColumn(
            "emb",
            F.array(F.col("id") * 1.0, F.col("id") * -0.5),
        )
        .repartition(4)
    )
    n = write_tfrecord_df(
        df, out,
        {"id": "int64", "txt": "string", "emb": "float_list"},
    )
    assert n == 4
    shards = sorted(os.listdir(out))
    assert shards == [f"part-{i:05d}.tfrecord" for i in range(4)]
    back = read_tfrecord_df(
        spark, out,
        {"id": "int64", "txt": "string", "emb": "float_list"},
    ).toPandas().sort_values("id").reset_index(drop=True)
    assert list(back["id"]) == list(range(50))
    assert back["txt"][7] == "d-7"
    assert back["emb"][3] == [3.0, -1.5]


def test_spark_missing_feature_is_null(spark, tmp_path):
    p = str(tmp_path / "m.tfrecord")
    write_tfrecord_file(p, [
        example_encode({"a": ("int64", [1])}),
        example_encode({"a": ("int64", [2]), "b": ("bytes", ["x"])}),
    ])
    back = read_tfrecord_df(
        spark, p, {"a": "int64", "b": "string"}
    ).toPandas().sort_values("a")
    assert list(back["a"]) == [1, 2]
    assert back["b"].tolist()[0] is None
    assert back["b"].tolist()[1] == "x"


def test_spec_sniffing_and_loader_dispatch(spark, tmp_path):
    from vtk_reserves_spark.sources.loaders import (
        load_dataframe as load_df,
    )
    from vtk_reserves_spark.sources.tfrecord import sniff_tfrecord_spec

    p = str(tmp_path / "s.tfrecord")
    write_tfrecord_file(p, [
        example_encode({
            "id": ("int64", [3]),
            "name": ("bytes", ["seven"]),
            "raw": ("bytes", [b"\xff\x00"]),
            "emb": ("float", [1.0, 2.0]),
        }),
    ])
    spec = sniff_tfrecord_spec(p)
    assert spec == {"emb": "float_list", "id": "int64",
                    "name": "string", "raw": "bytes"}
    df = load_df(spark, p)
    row = df.collect()[0]
    assert row["id"] == 3 and row["name"] == "seven"
    assert bytes(row["raw"]) == b"\xff\x00"
    assert row["emb"] == [1.0, 2.0]


def test_gzip_shards(spark, tmp_path):
    import gzip

    from pyspark.sql import functions as F

    # raw file API: .gz path gzips, magic-sniffed on read
    p = str(tmp_path / "a.tfrecord.gz")
    write_tfrecord_file(p, [b"one", b"two"])
    assert open(p, "rb").read(2) == b"\x1f\x8b"
    assert list(read_tfrecord_records(p)) == [b"one", b"two"]
    # distributed writer/reader with compress=True
    out = str(tmp_path / "shards")
    df = spark.range(20).withColumn(
        "txt", F.concat(F.lit("d-"), F.col("id"))
    ).repartition(2)
    n = write_tfrecord_df(
        df, out, {"id": "int64", "txt": "string"}, compress=True
    )
    assert n == 2
    assert sorted(os.listdir(out)) == [
        "part-00000.tfrecord.gz", "part-00001.tfrecord.gz"
    ]
    back = read_tfrecord_df(
        spark, out, {"id": "int64", "txt": "string"}
    ).toPandas().sort_values("id")
    assert list(back["id"]) == list(range(20))
    # a gzipped stream still detects payload corruption
    raw = gzip.decompress(
        open(os.path.join(out, "part-00000.tfrecord.gz"), "rb").read()
    )
    bad = bytearray(raw)
    bad[14] ^= 0xFF
    open(os.path.join(out, "part-00000.tfrecord.gz"), "wb").write(
        gzip.compress(bytes(bad))
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="checksum"):
        read_tfrecord_df(
            spark, out, {"id": "int64", "txt": "string"}
        ).collect()
