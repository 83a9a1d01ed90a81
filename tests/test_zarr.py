"""Zarr v2 store + c-blosc1 chunk codec: blosc round-trips across
inner codecs/shuffle/typesize, store metadata handling (compressors,
fill_value, F order, dimension_separator, missing chunks), the
chunk-grain Spark reader, and malformed-input rejection."""
import json
import os
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vtk_reserves_spark.sources.zarr import (
    blosc_decode,
    blosc_encode,
    read_zarr_array,
    read_zarr_df,
    write_zarr_array,
)

RNG = np.random.RandomState(11)


@pytest.mark.parametrize("cname", ["lz4", "zlib", "zstd", "snappy"])
@pytest.mark.parametrize("shuffle", [0, 1])
def test_blosc_roundtrip_codecs(cname, shuffle):
    data = RNG.randint(0, 1000, 5000).astype("<i4").tobytes()
    chunk = blosc_encode(data, typesize=4, cname=cname, shuffle=shuffle)
    assert blosc_decode(chunk) == data
    assert len(chunk) < len(data)  # low-entropy ints compress


def test_blosc_incompressible_memcpy():
    data = RNG.bytes(4096)
    chunk = blosc_encode(data, typesize=1)
    assert chunk[2] & 0x2  # memcpy flag
    assert blosc_decode(chunk) == data


def test_blosc_multi_block_and_leftover():
    # force several blocks plus a non-multiple tail
    data = (b"abcdefgh" * 5000)[:-3]
    chunk = blosc_encode(data, typesize=8, blocksize=4096)
    assert blosc_decode(chunk) == data


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 30000),
    typesize=st.sampled_from([1, 2, 4, 8]),
    cname=st.sampled_from(["lz4", "zlib", "zstd", "snappy"]),
    shuffle=st.integers(0, 1),
    seed=st.integers(0, 2**31 - 1),
)
def test_blosc_roundtrip_property(n, typesize, cname, shuffle, seed):
    rs = np.random.RandomState(seed)
    data = rs.randint(0, 8, n).astype(np.uint8).tobytes()
    chunk = blosc_encode(
        data, typesize=typesize, cname=cname, shuffle=shuffle,
        blocksize=7936,
    )
    assert blosc_decode(chunk) == data


def test_blosc_malformed_rejected():
    with pytest.raises(ValueError, match="truncated"):
        blosc_decode(b"\x02\x00\x00\x01")
    good = bytearray(blosc_encode(b"hello world " * 100, typesize=1))
    bad = bytearray(good)
    struct.pack_into("<i", bad, 4, -5)  # negative nbytes
    with pytest.raises(ValueError):
        blosc_decode(bytes(bad))
    # bit-shuffle flag
    bad = bytearray(good)
    bad[2] |= 0x4
    with pytest.raises(ValueError, match="bit-shuffle"):
        blosc_decode(bytes(bad))


COMPRESSORS = [
    None,
    {"id": "zlib", "level": 5},
    {"id": "gzip", "level": 4},
    {"id": "bz2", "level": 1},
    {"id": "lzma"},
    {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 0},
]


@pytest.mark.parametrize("comp", COMPRESSORS, ids=[
    (c or {}).get("id", "null") + (c or {}).get("cname", "")
    for c in COMPRESSORS
])
def test_store_roundtrip_compressors(tmp_path, comp):
    data = RNG.randn(37, 13).astype("<f4")
    write_zarr_array(str(tmp_path), "emb", data, chunks=(10, 13),
                     compressor=comp)
    out = read_zarr_array(str(tmp_path), "emb")
    np.testing.assert_array_equal(out, data)
    # .zgroup written at the store root
    assert json.load(open(tmp_path / ".zgroup"))["zarr_format"] == 2


def test_store_int_and_1d(tmp_path):
    ids = np.arange(100, dtype="<i8") * 7
    write_zarr_array(str(tmp_path), "ids", ids, chunks=(32,),
                     compressor={"id": "zlib", "level": 1})
    np.testing.assert_array_equal(read_zarr_array(str(tmp_path), "ids"), ids)


def test_store_fortran_order(tmp_path):
    data = RNG.randn(8, 5).astype("<f8")
    write_zarr_array(str(tmp_path), "f", data, chunks=(4, 5), order="F")
    np.testing.assert_array_equal(read_zarr_array(str(tmp_path), "f"), data)


def test_store_missing_chunk_fill_value(tmp_path):
    data = np.ones((20, 4), dtype="<f4")
    write_zarr_array(str(tmp_path), "a", data, chunks=(10, 4),
                     fill_value=-1.0)
    os.remove(tmp_path / "a" / "1.0")
    out = read_zarr_array(str(tmp_path), "a")
    assert (out[:10] == 1).all() and (out[10:] == -1).all()


def test_store_slash_separator(tmp_path):
    data = np.arange(24, dtype="<i4").reshape(6, 4)
    write_zarr_array(str(tmp_path), "s", data, chunks=(3, 2),
                     dimension_separator="/")
    assert (tmp_path / "s" / "0" / "1").exists()
    np.testing.assert_array_equal(read_zarr_array(str(tmp_path), "s"), data)


def test_unsupported_rejected(tmp_path):
    data = np.zeros(4)
    write_zarr_array(str(tmp_path), "x", data)
    meta = json.load(open(tmp_path / "x" / ".zarray"))
    meta["filters"] = [{"id": "delta"}]
    json.dump(meta, open(tmp_path / "x" / ".zarray", "w"))
    with pytest.raises(ValueError, match="filter"):
        read_zarr_array(str(tmp_path), "x")
    meta["filters"] = None
    meta["zarr_format"] = 3
    json.dump(meta, open(tmp_path / "x" / ".zarray", "w"))
    with pytest.raises(ValueError, match="zarr_format"):
        read_zarr_array(str(tmp_path), "x")


def test_spark_reader_chunk_grain(spark, tmp_path):
    data = RNG.randn(23, 7).astype("<f4")
    write_zarr_array(
        str(tmp_path), "emb", data, chunks=(10, 7),
        compressor={"id": "blosc", "cname": "lz4", "shuffle": 1},
    )
    df = read_zarr_df(spark, str(tmp_path), "emb")
    assert df.columns == ["i0", "i1", "value"]
    pdf = df.toPandas().sort_values(["i0", "i1"]).reset_index(drop=True)
    assert len(pdf) == 23 * 7
    got = pdf["value"].to_numpy().reshape(23, 7)
    np.testing.assert_array_equal(got, data.astype(np.float64))
    # one input partition per chunk (3 row-chunks x 1 col-chunk)
    assert df.rdd.getNumPartitions() == 3


def test_spark_reader_int_1d(spark, tmp_path):
    ids = np.arange(50, dtype="<i8") * 3
    write_zarr_array(str(tmp_path), "ids", ids, chunks=(16,))
    df = read_zarr_df(spark, str(tmp_path), "ids")
    assert dict(df.dtypes)["value"] == "bigint"
    pdf = df.toPandas().sort_values("i0")
    np.testing.assert_array_equal(pdf["value"].to_numpy(), ids)


def test_write_zarr_df_distributed_roundtrip(spark, tmp_path):
    """Distributed writer: exploded rows shuffle to their owning
    chunk, each task writes its own chunk file; the result reads
    back identically through BOTH the driver reader and the
    chunk-grain Spark reader."""
    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, read_zarr_df, write_zarr_df,
    )

    rng = np.random.RandomState(11)
    data = rng.randn(23, 13).astype("<f8")
    rows = [
        (int(i), int(j), float(data[i, j]))
        for i in range(23) for j in range(13)
    ]
    df = spark.createDataFrame(rows, "i0 long, i1 long, value double")
    n = write_zarr_df(
        df, str(tmp_path), "emb", shape=(23, 13), chunks=(10, 5),
        compressor={"id": "zlib", "level": 5},
    )
    assert n == 9  # ceil(23/10) * ceil(13/5)
    np.testing.assert_array_equal(read_zarr_array(str(tmp_path), "emb"),
                                  data)
    pdf = (
        read_zarr_df(spark, str(tmp_path), "emb")
        .toPandas().sort_values(["i0", "i1"])
    )
    np.testing.assert_array_equal(
        pdf["value"].to_numpy().reshape(23, 13), data
    )


def test_write_zarr_df_sparse_chunks_fill(spark, tmp_path):
    """Chunks with no rows are not written and read back as fill."""
    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, write_zarr_df,
    )

    df = spark.createDataFrame(
        [(0, 0, 5.0), (19, 3, 7.0)], "i0 long, i1 long, value double"
    )
    n = write_zarr_df(
        df, str(tmp_path), "sp", shape=(20, 4), chunks=(5, 4),
        fill_value=-1.0,
    )
    assert n == 2  # only the two touched chunks exist on disk
    out = read_zarr_array(str(tmp_path), "sp")
    expect = np.full((20, 4), -1.0)
    expect[0, 0] = 5.0
    expect[19, 3] = 7.0
    np.testing.assert_array_equal(out, expect)


def test_write_zarr_df_blosc_and_bounds(spark, tmp_path):
    import numpy as np
    import pytest as _pytest

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, write_zarr_df,
    )

    data = np.arange(40, dtype="<i8").reshape(8, 5)
    rows = [(int(i), int(j), int(data[i, j]))
            for i in range(8) for j in range(5)]
    df = spark.createDataFrame(rows, "i0 long, i1 long, value long")
    write_zarr_df(
        df, str(tmp_path), "b", shape=(8, 5), chunks=(3, 5),
        dtype="<i8",
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5,
                    "shuffle": 1},
    )
    np.testing.assert_array_equal(read_zarr_array(str(tmp_path), "b"),
                                  data)
    # out-of-bounds index -> executor-side error
    bad = spark.createDataFrame([(99, 0, 1.0)],
                                "i0 long, i1 long, value double")
    with _pytest.raises(Exception, match="out of bounds"):
        write_zarr_df(bad, str(tmp_path), "bad", shape=(8, 5),
                      chunks=(3, 5))


# ----------------------------------------------------------------- v3


def test_v3_store_roundtrip_codecs(tmp_path):
    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, write_zarr_array,
    )

    rng = np.random.default_rng(7)
    data = rng.normal(size=(7, 9)).astype("<f4")
    for comp in (
        None,
        {"id": "zstd", "level": 3},
        {"id": "gzip", "level": 4},
        {"id": "blosc", "cname": "lz4", "shuffle": 1},
    ):
        store = str(tmp_path / f"v3_{(comp or {}).get('id', 'raw')}")
        write_zarr_array(
            store, "", data, chunks=(3, 4), compressor=comp,
            zarr_format=3, checksum=True,
        )
        # v3 layout on disk: zarr.json + c/i/j chunk keys
        assert (tmp_path / f"v3_{(comp or {}).get('id', 'raw')}"
                / "zarr.json").exists()
        assert (tmp_path / f"v3_{(comp or {}).get('id', 'raw')}"
                / "c" / "0" / "0").exists()
        back = read_zarr_array(store)
        np.testing.assert_array_equal(back, data)


def test_v3_crc32c_detects_corruption(tmp_path):
    import numpy as np
    import pytest as _pytest

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, write_zarr_array,
    )

    store = str(tmp_path / "v3")
    write_zarr_array(
        store, "", np.arange(12, dtype="<i4").reshape(3, 4),
        chunks=(3, 4), zarr_format=3, checksum=True,
    )
    p = tmp_path / "v3" / "c" / "0" / "0"
    raw = bytearray(p.read_bytes())
    raw[0] ^= 0xFF
    p.write_bytes(bytes(raw))
    with _pytest.raises(ValueError, match="crc32c"):
        read_zarr_array(store)


def test_v3_fortran_transpose_and_big_endian(tmp_path):
    import json as _json

    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, write_zarr_array,
    )

    store = str(tmp_path / "v3f")
    data = np.arange(30, dtype=">i2").reshape(5, 6)
    write_zarr_array(store, "", data, chunks=(2, 3), order="F",
                     zarr_format=3)
    doc = _json.loads((tmp_path / "v3f" / "zarr.json").read_text())
    names = [c["name"] for c in doc["codecs"]]
    assert names[0] == "transpose"
    assert doc["codecs"][1]["configuration"]["endian"] == "big"
    np.testing.assert_array_equal(read_zarr_array(store), data)


def test_v3_missing_chunk_fill_and_nan(tmp_path):
    import json as _json

    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, write_zarr_array,
    )

    store = str(tmp_path / "v3nan")
    data = np.ones((4, 4), dtype="<f8")
    write_zarr_array(store, "", data, chunks=(2, 2),
                     fill_value=float("nan"), zarr_format=3)
    # spec spells non-finite fills as strings in zarr.json
    doc = _json.loads((tmp_path / "v3nan" / "zarr.json").read_text())
    assert doc["fill_value"] == "NaN"
    import shutil

    shutil.rmtree(tmp_path / "v3nan" / "c" / "1")
    back = read_zarr_array(store)
    assert np.isnan(back[2:, :]).all() and (back[:2, :] == 1).all()


def test_v3_gates(tmp_path):
    import json as _json

    import pytest as _pytest

    from vtk_reserves_spark.sources.zarr import read_zarray_meta

    store = tmp_path / "v3bad"
    store.mkdir()

    def put(doc):
        (store / "zarr.json").write_text(_json.dumps(doc))

    base = {
        "zarr_format": 3, "node_type": "array", "shape": [4],
        "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [2]}},
        "chunk_key_encoding": {"name": "default"},
        "fill_value": 0,
        "codecs": [{"name": "bytes",
                    "configuration": {"endian": "little"}}],
    }
    put({**base, "codecs": [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "sharding_indexed", "configuration": {}},
    ]})
    with _pytest.raises(ValueError, match="sharding_indexed"):
        read_zarray_meta(str(store))
    put({**base, "data_type": "complex128"})
    with _pytest.raises(ValueError, match="data_type"):
        read_zarray_meta(str(store))
    put({**base, "chunk_grid": {"name": "rectilinear",
                                "configuration": {}}})
    with _pytest.raises(ValueError, match="chunk grid"):
        read_zarray_meta(str(store))


def test_v3_spark_reader_and_distributed_writer(spark, tmp_path):
    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, read_zarr_df, write_zarr_df,
    )

    store = str(tmp_path / "v3spark")
    src = spark.range(40).selectExpr(
        "id % 8 as i0", "cast(id / 8 as bigint) as i1",
        "cast(id as double) as value",
    )
    n = write_zarr_df(
        src, store, "emb", shape=(8, 5), chunks=(4, 2),
        compressor={"id": "zstd", "level": 3}, zarr_format=3,
        checksum=True,
    )
    assert n == 6
    arr = read_zarr_array(store, "emb")
    want = np.array([[i + 8 * j for j in range(5)] for i in range(8)],
                    dtype="<f8")
    np.testing.assert_array_equal(arr, want)
    back = read_zarr_df(spark, store, "emb").toPandas()
    assert len(back) == 40
    got = back.sort_values(["i0", "i1"])["value"].to_numpy()
    np.testing.assert_array_equal(got, want.reshape(-1))


def test_v3_loader_dispatch(spark, tmp_path):
    import numpy as np

    from vtk_reserves_spark.sources.loaders import load_dataframe as load_df
    from vtk_reserves_spark.sources.zarr import write_zarr_array

    store = str(tmp_path / "v3store")
    write_zarr_array(store, "emb", np.arange(6, dtype="<f8"),
                     chunks=(3,), zarr_format=3)
    # group without selector lists the members
    import pytest as _pytest

    with _pytest.raises(ValueError, match="emb"):
        load_df(spark, store)
    df = load_df(spark, f"{store}!emb")
    assert df.count() == 6


# ----------------------------------------------------------- v3 sharding


def test_v3_sharding_roundtrip_and_layout(tmp_path):
    import json as _json

    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, read_zarray_meta, write_zarr_array,
    )

    store = str(tmp_path / "sh")
    rng = np.random.default_rng(5)
    data = rng.normal(size=(10, 12)).astype("<f4")
    write_zarr_array(
        store, "", data, chunks=(5, 6), inner_chunks=(5, 3),
        compressor={"id": "zstd", "level": 3},
        zarr_format=3, checksum=True,
    )
    doc = _json.loads((tmp_path / "sh" / "zarr.json").read_text())
    assert [c["name"] for c in doc["codecs"]] == ["sharding_indexed"]
    conf = doc["codecs"][0]["configuration"]
    assert [c["name"] for c in conf["codecs"]] == [
        "bytes", "zstd", "crc32c"
    ]
    assert [c["name"] for c in conf["index_codecs"]] == [
        "bytes", "crc32c"
    ]
    np.testing.assert_array_equal(read_zarr_array(store), data)
    m = read_zarray_meta(store)
    assert m["_shard"]["inner"] == [5, 3]


def test_v3_sharding_sparse_and_corruption(tmp_path):
    import numpy as np
    import pytest as _pytest

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, write_zarr_array,
    )

    store = str(tmp_path / "sp")
    d = np.zeros((8, 8), dtype="<i4")
    d[0, 0] = 7
    write_zarr_array(store, "", d, chunks=(8, 8), inner_chunks=(4, 4),
                     fill_value=0, zarr_format=3)
    shard = tmp_path / "sp" / "c" / "0" / "0"
    raw = shard.read_bytes()
    idx = np.frombuffer(raw[-(16 * 4 + 4):-4], "<u8").reshape(-1, 2)
    # 3 of the 4 inner chunks are all-fill -> absent (2^64-1 pairs)
    assert int((idx == (1 << 64) - 1).all(axis=1).sum()) == 3
    np.testing.assert_array_equal(read_zarr_array(store), d)
    bad = bytearray(raw)
    bad[-2] ^= 0xFF
    shard.write_bytes(bytes(bad))
    with _pytest.raises(ValueError, match="index checksum"):
        read_zarr_array(store)


def test_v3_sharding_gates(tmp_path):
    import numpy as np
    import pytest as _pytest

    from vtk_reserves_spark.sources.zarr import write_zarr_array

    d = np.zeros((4, 4))
    with _pytest.raises(ValueError, match="v3 codec"):
        write_zarr_array(str(tmp_path / "a"), "", d, chunks=(4, 4),
                         inner_chunks=(2, 2))
    with _pytest.raises(ValueError, match="must divide"):
        write_zarr_array(str(tmp_path / "b"), "", d, chunks=(4, 4),
                         inner_chunks=(3, 2), zarr_format=3)
    with _pytest.raises(ValueError, match="C-order"):
        write_zarr_array(str(tmp_path / "c"), "", d, chunks=(4, 4),
                         inner_chunks=(2, 2), order="F", zarr_format=3)


def test_v3_sharded_distributed_roundtrip(spark, tmp_path):
    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, read_zarr_df, write_zarr_df,
    )

    store = str(tmp_path / "shspark")
    src = spark.range(48).selectExpr(
        "id % 8 as i0", "cast(id / 8 as bigint) as i1",
        "cast(id as double) as value",
    )
    n = write_zarr_df(
        src, store, "emb", shape=(8, 6), chunks=(4, 6),
        inner_chunks=(4, 2), compressor={"id": "zstd", "level": 3},
        zarr_format=3, checksum=True,
    )
    assert n == 2  # shards, each holding 3 inner chunks
    want = np.array([[i + 8 * j for j in range(6)] for i in range(8)],
                    dtype="<f8")
    np.testing.assert_array_equal(read_zarr_array(store, "emb"), want)
    back = read_zarr_df(spark, store, "emb").toPandas()
    got = back.sort_values(["i0", "i1"])["value"].to_numpy()
    np.testing.assert_array_equal(got, want.reshape(-1))


def test_write_zarr_df_sharded_inner_parallel_sparse(spark, tmp_path):
    """The two-stage sharded writer (inner-chunk tasks + shard
    assembly): all-fill inner chunks stay ABSENT index holes, edge
    shards pad with fill, and the .partial spill dir is cleaned."""
    import numpy as np

    from vtk_reserves_spark.sources.zarr import (
        read_zarr_array, read_zarr_df, write_zarr_df,
    )

    store = str(tmp_path / "shsp2")
    # only the top-left 3x3 corner holds non-fill data of a 10x7
    # array -> most inner chunks are holes; shape not divisible by
    # chunks -> edge shards pad
    rows = [(i, j, float(10 * i + j + 1)) for i in range(3)
            for j in range(3)]
    src = spark.createDataFrame(rows, "i0 long, i1 long, value double")
    n = write_zarr_df(
        src, store, "a", shape=(10, 7), chunks=(8, 4),
        inner_chunks=(2, 2), zarr_format=3, fill_value=0.0,
        compressor={"id": "zstd", "level": 1},
    )
    assert n == 1  # only the shard with non-fill inner chunks lands
    # no side-channel spill dir: bodies travel through the shuffle
    assert not os.path.exists(os.path.join(store, "a", ".partial"))
    want = np.zeros((10, 7))
    for i, j, v in rows:
        want[i, j] = v
    np.testing.assert_array_equal(read_zarr_array(store, "a"), want)
    back = read_zarr_df(spark, store, "a").toPandas()
    assert len(back) == 70
    got = back.sort_values(["i0", "i1"])["value"].to_numpy().reshape(10, 7)
    np.testing.assert_array_equal(got, want)
