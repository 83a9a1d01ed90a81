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


def test_fletcher32_reference_values():
    """Spot values cross-checked against the published HDF5
    checksum algorithm (16-bit words, mod-65535 sums)."""
    assert _fletcher32(b"") == 0
    # manual: words [0x6261] -> s1 = s2 = 0x6261
    assert _fletcher32(b"ab") == (0x6261 << 16) | 0x6261
    # odd length zero-pads: b"abc" -> words [0x6261, 0x0063]
    s1 = (0x6261 + 0x0063) % 65535
    s2 = (0x6261 + s1) % 65535
    assert _fletcher32(b"abc") == (s2 << 16) | s1
    # long input exercises the blocked reduction
    data = bytes(range(256)) * 100
    ref_s1 = 0
    ref_s2 = 0
    words = np.frombuffer(data, "<u2")
    for w in words.astype(int):
        ref_s1 = (ref_s1 + w) % 65535
        ref_s2 = (ref_s2 + ref_s1) % 65535
    assert _fletcher32(data) == (ref_s2 << 16) | ref_s1


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
    from vtk_reserves_spark.sources.hdf5 import _SIG, _UNDEF, _Writer

    data = np.arange(12, dtype="<i4").reshape(3, 4)
    blobs = bytearray(b"\x00" * 48)  # superblock v2 placeholder

    def align(n=8):
        while len(blobs) % n:
            blobs.append(0)

    w = _Writer()
    hdr = w._dataset_header(data, {}, blobs, align)
    align()
    ds_addr = len(blobs)
    blobs.extend(hdr)
    align()
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
