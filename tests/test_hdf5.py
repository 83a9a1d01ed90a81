"""HDF5 subset codec: superblock/object-header/B-tree walk,
contiguous + chunked + compact layouts, deflate/shuffle filters,
fletcher32, dtype coverage, the chunk-grain Spark reader, and
malformed-input rejection."""
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vtk_reserves_spark.sources.hdf5 import (
    _fletcher32,
    list_datasets,
    read_hdf5_array,
    read_hdf5_df,
    read_hdf5_meta,
    write_hdf5,
)

RNG = np.random.RandomState(4)


@pytest.mark.parametrize("dtype", ["<i1", "<i2", "<i4", "<i8",
                                   "<u1", "<u2", "<u4", "<u8",
                                   "<f4", "<f8"])
def test_contiguous_dtypes_roundtrip(dtype):
    data = RNG.randint(0, 100, (11, 5)).astype(dtype)
    blob = write_hdf5(None, {"d": data})
    out = read_hdf5_array(blob, "d")
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, data)


@pytest.mark.parametrize("opts", [
    {"chunks": (7, 5)},
    {"chunks": (7, 5), "deflate": 6},
    {"chunks": (7, 5), "deflate": 4, "shuffle": True},
    {"chunks": (64, 13)},  # single oversize chunk
])
def test_chunked_roundtrip(opts):
    data = RNG.randn(23, 13).astype("<f4")
    blob = write_hdf5(None, {"d": (data, opts)})
    np.testing.assert_array_equal(read_hdf5_array(blob, "d"), data)


def test_multi_dataset_and_names(tmp_path):
    p = str(tmp_path / "t.h5")
    a = np.arange(10, dtype="<i4")
    b = RNG.randn(4, 4).astype("<f8")
    names = np.array([b"aa", b"bb", b"cc"], dtype="S2")
    write_hdf5(p, {"a": a, "b": b, "names": names})
    assert list_datasets(p) == ["/a", "/b", "/names"]
    np.testing.assert_array_equal(read_hdf5_array(p, "a"), a)
    np.testing.assert_array_equal(read_hdf5_array(p, "b"), b)
    np.testing.assert_array_equal(read_hdf5_array(p, "names"), names)


def test_3d_chunked():
    data = RNG.randint(0, 1000, (9, 7, 5)).astype("<i4")
    blob = write_hdf5(None, {"v": (data, {"chunks": (4, 3, 5),
                                          "deflate": 1})})
    np.testing.assert_array_equal(read_hdf5_array(blob, "v"), data)


@settings(max_examples=25, deadline=None)
@given(
    rows=st.integers(1, 60),
    cols=st.integers(1, 20),
    crows=st.integers(1, 60),
    deflate=st.one_of(st.none(), st.integers(1, 9)),
    shuffle=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(rows, cols, crows, deflate, shuffle, seed):
    rs = np.random.RandomState(seed)
    data = rs.randint(-1000, 1000, (rows, cols)).astype("<i4")
    opts = {"chunks": (crows, cols)}
    if deflate:
        opts["deflate"] = deflate
    if shuffle:
        opts["shuffle"] = True
    blob = write_hdf5(None, {"d": (data, opts)})
    np.testing.assert_array_equal(read_hdf5_array(blob, "d"), data)


def _h5_fletcher32_ref(data: bytes) -> int:
    """Literal transcription of libhdf5's H5_checksum_fletcher32
    (big-endian word assembly, odd byte in the HIGH byte, fold
    reduction every 360 words on uint32-wrapped accumulators)."""
    M = 0xFFFFFFFF
    s1 = 0
    s2 = 0
    nwords = len(data) // 2
    i = 0
    while nwords:
        tlen = min(nwords, 360)
        nwords -= tlen
        for _ in range(tlen):
            s1 = (s1 + ((data[i] << 8) | data[i + 1])) & M
            s2 = (s2 + s1) & M
            i += 2
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    if len(data) % 2:
        s1 = (s1 + (data[-1] << 8)) & M
        s2 = (s2 + s1) & M
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    return (s2 << 16) | s1


def test_fletcher32_reference_values():
    """Spot values per libhdf5's algorithm: 16-bit words assembled
    BIG-endian, an odd trailing byte in the high byte."""
    assert _fletcher32(b"") == 0
    # manual: b"ab" -> one word 0x6162 -> s1 = s2 = 0x6162
    assert _fletcher32(b"ab") == (0x6162 << 16) | 0x6162
    # odd length: b"abc" -> word 0x6162 then odd byte as 0x6300;
    # s1 = 0xC462, s2 = 0x6162+0xC462 = 0x125C4 -> fold 0x25C5
    assert _fletcher32(b"abc") == 0x25C5C462
    # single odd byte: contributes in the HIGH byte
    assert _fletcher32(b"a") == 0x61006100
    # hand-worked with the end-of-block fold:
    # words [0xdead, 0xbeef]: s1=0x19d9c->fold 0x9d9d,
    # s2=0xdead+0x19d9c=0x27c49->fold 0x7c4b
    assert _fletcher32(b"\xde\xad\xbe\xef") == 0x7C4B9D9D


@given(st.binary(min_size=0, max_size=3000), st.integers(0, 3))
@settings(max_examples=60, deadline=None)
def test_fletcher32_matches_literal_c_transcription(data, pad):
    data = data + b"\xff" * pad  # bias toward high bytes (overflow)
    assert _fletcher32(data) == _h5_fletcher32_ref(data)


def test_fletcher32_block_overflow_path():
    # all-0xff data long enough to wrap the 32-bit sum2 accumulator
    data = b"\xff" * 4000
    assert _fletcher32(data) == _h5_fletcher32_ref(data)


@pytest.mark.parametrize("opts", [
    {"chunks": (7, 5), "fletcher32": True},
    {"chunks": (7, 5), "deflate": 4, "shuffle": True, "fletcher32": True},
])
def test_fletcher32_filter_roundtrip(opts):
    data = RNG.randn(23, 13).astype("<f4")
    blob = write_hdf5(None, {"d": (data, opts)})
    np.testing.assert_array_equal(read_hdf5_array(blob, "d"), data)


def test_fletcher32_detects_corruption():
    data = np.arange(35, dtype="<i4").reshape(7, 5)
    blob = bytearray(write_hdf5(
        None, {"d": (data, {"chunks": (7, 5), "fletcher32": True})}
    ))
    # flip a byte inside the stored chunk payload
    needle = data.tobytes()[:16]
    pos = bytes(blob).index(needle)
    blob[pos + 3] ^= 0xFF
    with pytest.raises(ValueError, match="fletcher32"):
        read_hdf5_array(bytes(blob), "d")


def test_fill_value_roundtrip_and_unallocated_chunks():
    data = np.full((20, 6), -99.0, "<f8")
    data[3:7, :] = RNG.randn(4, 6)  # only chunk row 0 gets real data
    blob = write_hdf5(
        None, {"d": (data, {"chunks": (10, 6), "fillvalue": -99.0})}
    )
    metas = read_hdf5_meta(blob)
    ds = metas["/d"]
    assert float(ds.fill) == -99.0
    assert len(ds.chunks()) == 1  # the all-fill chunk is unallocated
    np.testing.assert_array_equal(ds.read(), data)


def test_fill_value_spark_reader_emits_fill_rows(spark, tmp_path):
    p = str(tmp_path / "fill.h5")
    data = np.full((20, 6), 7.5, "<f8")
    data[0, 0] = 1.25
    write_hdf5(p, {"d": (data, {"chunks": (10, 6), "fillvalue": 7.5})})
    df = read_hdf5_df(spark, p, "d")
    pdf = df.toPandas().sort_values(["i0", "i1"])
    assert len(pdf) == 120  # dense: unallocated chunk rows included
    got = pdf["value"].to_numpy().reshape(20, 6)
    np.testing.assert_array_equal(got, data)


def test_fill_value_message_versions():
    from vtk_reserves_spark.sources.hdf5 import _parse_fill_value
    dt = np.dtype("<i4")
    v = np.array(42, dt).tobytes()
    # v1: ver, alloc, write, defined, size, data
    assert _parse_fill_value(
        bytes([1, 2, 0, 1]) + struct.pack("<I", 4) + v, dt) == 42
    # v2 undefined
    assert _parse_fill_value(bytes([2, 2, 0, 0]), dt) is None
    # v3 defined / undefined
    assert _parse_fill_value(
        bytes([3, 0x23]) + struct.pack("<I", 4) + v, dt) == 42
    assert _parse_fill_value(bytes([3, 0x13]), dt) is None
    # v3 defined but size 0 -> default
    assert _parse_fill_value(
        bytes([3, 0x23]) + struct.pack("<I", 0), dt) is None


def test_malformed_rejected():
    with pytest.raises(ValueError, match="signature"):
        read_hdf5_meta(b"not an hdf5 file" + b"\x00" * 100)
    blob = bytearray(write_hdf5(None, {"d": np.arange(4)}))
    blob[8] = 9  # unsupported superblock version
    with pytest.raises(ValueError, match="superblock"):
        read_hdf5_meta(bytes(blob))


def test_missing_dataset_keyerror():
    blob = write_hdf5(None, {"d": np.arange(4)})
    with pytest.raises(KeyError, match="nope"):
        read_hdf5_array(blob, "nope")


def test_spark_reader_chunk_grain(spark, tmp_path):
    p = str(tmp_path / "emb.h5")
    data = RNG.randn(23, 7).astype("<f4")
    write_hdf5(p, {"emb": (data, {"chunks": (10, 7), "deflate": 5,
                                  "shuffle": True})})
    df = read_hdf5_df(spark, p, "emb")
    assert df.columns == ["i0", "i1", "value"]
    pdf = df.toPandas().sort_values(["i0", "i1"])
    got = pdf["value"].to_numpy().reshape(23, 7)
    np.testing.assert_array_equal(got, data.astype(np.float64))
    assert df.rdd.getNumPartitions() == 3  # one task per chunk


def test_spark_reader_contiguous_slabs(spark, tmp_path):
    p = str(tmp_path / "ids.h5")
    ids = (np.arange(100) * 3).astype("<i8")
    write_hdf5(p, {"ids": ids})
    df = read_hdf5_df(spark, p, "ids")
    assert dict(df.dtypes)["value"] == "bigint"
    pdf = df.toPandas().sort_values("i0")
    np.testing.assert_array_equal(pdf["value"].to_numpy(), ids)


def test_v2_superblock_and_ohdr_with_compact_links():
    """Hand-built 'new-style' file: superblock v2 + OHDR-v2 root
    group with a compact link message pointing at a v1 dataset —
    the layout h5py emits under libver='latest' (subset).  The
    chunk-0 size excludes the trailing checksum; a short final
    message must still parse."""
    from vtk_reserves_spark.sources.hdf5 import (
        _SIG, _UNDEF, _MemSink, _Writer,
    )

    data = np.arange(12, dtype="<i4").reshape(3, 4)
    sink = _MemSink()
    sink.extend(b"\x00" * 48)  # superblock v2 placeholder

    w = _Writer()
    hdr = w._dataset_header(data, {}, sink)
    sink.align()
    ds_addr = sink.tell()
    sink.extend(hdr)
    sink.align()
    blobs = sink.buf
    # link message (type 0x06): v1, flags 0 -> 1-byte name length
    link_body = bytes([1, 0, len(b"dset")]) + b"dset" + struct.pack(
        "<Q", ds_addr
    )
    msg = bytes([0x06]) + struct.pack("<H", len(link_body)) + bytes(
        [0]
    ) + link_body
    root_addr = len(blobs)
    ohdr = (
        b"OHDR" + bytes([2, 0]) + bytes([len(msg)]) + msg
        + b"\x00" * 4  # gated checksum (not verified by the subset)
    )
    blobs.extend(ohdr)
    eof = len(blobs)
    sb = (
        _SIG + bytes([2, 8, 8, 0])
        + struct.pack("<QQQQ", 0, _UNDEF, eof, root_addr)
        + b"\x00" * 4  # superblock checksum (not verified)
    )
    blobs[: len(sb)] = sb
    from vtk_reserves_spark.sources.hdf5 import (
        list_datasets, read_hdf5_array,
    )

    assert list_datasets(bytes(blobs)) == ["/dset"]
    np.testing.assert_array_equal(
        read_hdf5_array(bytes(blobs), "dset"), data
    )


def test_write_hdf5_df_distributed_roundtrip(spark, tmp_path):
    """Distributed writer: chunk encode fans out, the driver only
    streams encoded payloads + metadata; result reads back through
    both the driver reader and the chunk-grain Spark reader."""
    from vtk_reserves_spark.sources.hdf5 import write_hdf5_df

    p = str(tmp_path / "dist.h5")
    rng = np.random.RandomState(21)
    data = rng.randn(23, 13).astype("<f8")
    rows = [(int(i), int(j), float(data[i, j]))
            for i in range(23) for j in range(13)]
    df = spark.createDataFrame(rows, "i0 long, i1 long, value double")
    n = write_hdf5_df(
        df, p, "emb", shape=(23, 13), chunks=(10, 5),
        deflate=5, shuffle=True, fletcher32=True,
    )
    assert n == 9
    np.testing.assert_array_equal(read_hdf5_array(p, "emb"), data)
    pdf = (
        read_hdf5_df(spark, p, "emb")
        .toPandas().sort_values(["i0", "i1"])
    )
    np.testing.assert_array_equal(
        pdf["value"].to_numpy().reshape(23, 13), data
    )


def test_write_hdf5_df_sparse_chunks_fill(spark, tmp_path):
    from vtk_reserves_spark.sources.hdf5 import write_hdf5_df

    p = str(tmp_path / "sp.h5")
    df = spark.createDataFrame(
        [(0, 0, 5.0), (19, 3, 7.0)], "i0 long, i1 long, value double"
    )
    n = write_hdf5_df(df, p, "d", shape=(20, 4), chunks=(5, 4),
                      fillvalue=-1.0)
    assert n == 2  # untouched chunks stay unallocated
    out = read_hdf5_array(p, "d")
    expect = np.full((20, 4), -1.0)
    expect[0, 0] = 5.0
    expect[19, 3] = 7.0
    np.testing.assert_array_equal(out, expect)
    # the Spark reader emits the fill rows too (dense view)
    pdf = read_hdf5_df(spark, p, "d").toPandas()
    assert len(pdf) == 80


def test_write_hdf5_df_int_and_bounds(spark, tmp_path):
    from vtk_reserves_spark.sources.hdf5 import write_hdf5_df

    p = str(tmp_path / "i.h5")
    data = np.arange(40, dtype="<i8").reshape(8, 5)
    rows = [(int(i), int(j), int(data[i, j]))
            for i in range(8) for j in range(5)]
    df = spark.createDataFrame(rows, "i0 long, i1 long, value long")
    write_hdf5_df(df, p, "d", shape=(8, 5), chunks=(3, 5), dtype="<i8")
    np.testing.assert_array_equal(read_hdf5_array(p, "d"), data)
    bad = spark.createDataFrame([(99, 0, 1.0)],
                                "i0 long, i1 long, value double")
    with pytest.raises(Exception, match="out of bounds"):
        write_hdf5_df(bad, str(tmp_path / "bad.h5"), "d",
                      shape=(8, 5), chunks=(3, 5))


def test_jenkins_lookup3_vectors():
    """Published lookup3 self-test vectors (hashlittle)."""
    from vtk_reserves_spark.sources.hdf5 import jenkins_lookup3

    # from lookup3.c's driver: hashlittle("", 0) = 0xdeadbeef
    assert jenkins_lookup3(b"") == 0xDEADBEEF
    # hashlittle("Four score and seven years ago", 0) = 0x17770551
    assert jenkins_lookup3(b"Four score and seven years ago") == 0x17770551
    # hashlittle("Four score and seven years ago", 1) = 0xcd628161
    assert jenkins_lookup3(b"Four score and seven years ago", 1) == \
        0xCD628161


def test_dense_group_roundtrip():
    """Dense link storage (fractal heap + v2 B-tree): 20 datasets —
    well past libhdf5's 8-link compact limit — round-trip through
    the dense writer and the fractal-heap reader."""
    data = {
        f"ds{i:02d}": np.arange(i + 1, dtype="<i4") for i in range(20)
    }
    blob = write_hdf5(None, data, dense_links=True)
    assert list_datasets(blob) == sorted("/" + k for k in data)
    for k, v in data.items():
        np.testing.assert_array_equal(read_hdf5_array(blob, k), v)


def test_dense_group_mixed_options(tmp_path):
    p = str(tmp_path / "dense.h5")
    vals = RNG.randn(30, 7).astype("<f8")
    data = {
        "chunked": (vals, {"chunks": (10, 7), "deflate": 3,
                           "shuffle": True}),
        "plain": np.arange(9, dtype="<i8"),
        "named_with_longer_name_than_most": vals[:5],
    }
    write_hdf5(p, data, dense_links=True)
    np.testing.assert_array_equal(read_hdf5_array(p, "chunked"), vals)
    np.testing.assert_array_equal(
        read_hdf5_array(p, "plain"), np.arange(9, dtype="<i8"))
    np.testing.assert_array_equal(
        read_hdf5_array(p, "named_with_longer_name_than_most"), vals[:5])


def test_dense_group_spark_reader(spark, tmp_path):
    p = str(tmp_path / "dense2.h5")
    data = {f"d{i}": np.full(4, float(i)) for i in range(12)}
    write_hdf5(p, data, dense_links=True)
    pdf = read_hdf5_df(spark, p, "d7").toPandas()
    assert pdf["value"].tolist() == [7.0] * 4
