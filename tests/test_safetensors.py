"""safetensors codec: header contract, dtype coverage incl. BF16
widening, metadata, slab-grain Spark reads, malformed rejection."""
import json
import struct

import numpy as np
import pytest

from vtk_reserves_spark.sources.safetensors import (
    read_safetensors,
    read_safetensors_df,
    read_safetensors_header,
    write_safetensors,
)

RNG = np.random.RandomState(6)


@pytest.mark.parametrize("dtype", ["<f8", "<f4", "<f2", "<i8", "<i4",
                                   "<i2", "i1", "u1", "?"])
def test_roundtrip_dtypes(dtype):
    data = (RNG.randint(0, 2, (7, 3)) if dtype == "?"
            else RNG.randint(0, 100, (7, 3))).astype(dtype)
    blob = write_safetensors(None, {"t": data})
    out = read_safetensors(blob, "t")
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, data)


def test_multi_tensor_and_metadata():
    a = RNG.randn(5, 4).astype("<f4")
    ids = np.arange(5, dtype="<i8")
    blob = write_safetensors(None, {"vectors": a, "ids": ids},
                             metadata={"source": "fixture"})
    header, start = read_safetensors_header(blob)
    assert header["__metadata__"] == {"source": "fixture"}
    assert header["vectors"]["dtype"] == "F32"
    assert start % 8 == 0  # header padded to 8 bytes per spec
    np.testing.assert_array_equal(read_safetensors(blob, "vectors"), a)
    np.testing.assert_array_equal(read_safetensors(blob, "ids"), ids)


def test_bf16_exact_widening():
    """BF16 payload decodes to the exact float32 widening (pad 16
    mantissa zero bits); the raw uint16 view stays available."""
    f32 = np.array([1.0, -2.5, 3.140625, 0.0], np.float32)
    bf16 = (f32.view(np.uint32) >> 16).astype("<u2")  # exact-in-bf16 set
    header = {"t": {"dtype": "BF16", "shape": [4],
                    "data_offsets": [0, 8]}}
    hj = json.dumps(header).encode()
    hj += b" " * (-len(hj) % 8)
    blob = struct.pack("<Q", len(hj)) + hj + bf16.tobytes()
    np.testing.assert_array_equal(read_safetensors(blob, "t"), f32)
    np.testing.assert_array_equal(
        read_safetensors(blob, "t", raw_bf16=True), bf16
    )


def test_malformed_rejected():
    with pytest.raises(ValueError, match="truncated"):
        read_safetensors_header(b"\x01\x02")
    blob = bytearray(write_safetensors(None, {"t": np.arange(4)}))
    struct.pack_into("<Q", blob, 0, 10**9)
    with pytest.raises(ValueError, match="overruns"):
        read_safetensors_header(bytes(blob))
    # offsets beyond buffer
    header = {"t": {"dtype": "F32", "shape": [4],
                    "data_offsets": [0, 999]}}
    hj = json.dumps(header).encode()
    bad = struct.pack("<Q", len(hj)) + hj + b"\x00" * 16
    with pytest.raises(ValueError, match="offsets"):
        read_safetensors_header(bad)
    with pytest.raises(KeyError, match="nope"):
        read_safetensors(write_safetensors(None, {"t": np.arange(4)}),
                         "nope")


def test_spark_reader_slabs(spark, tmp_path):
    p = str(tmp_path / "e.safetensors")
    vec = RNG.randn(23, 7).astype("<f4")
    ids = (np.arange(23) * 3).astype("<i8")
    write_safetensors(p, {"vectors": vec, "ids": ids})
    df = read_safetensors_df(spark, p, "vectors")
    assert df.columns == ["i0", "i1", "value"]
    pdf = df.toPandas().sort_values(["i0", "i1"])
    np.testing.assert_array_equal(
        pdf["value"].to_numpy().reshape(23, 7), vec.astype(np.float64)
    )
    ddf = read_safetensors_df(spark, p, "ids")
    assert dict(ddf.dtypes)["value"] == "bigint"
    np.testing.assert_array_equal(
        ddf.toPandas().sort_values("i0")["value"].to_numpy(), ids
    )


def test_loader_dispatch_selector(spark, tmp_path):
    from vtk_reserves_spark.sources.loaders import load_dataframe

    p = str(tmp_path / "t.safetensors")
    write_safetensors(p, {"ids": np.arange(9, dtype="<i8")})
    with pytest.raises(ValueError, match="ids"):
        load_dataframe(spark, p)
    assert load_dataframe(spark, p + "!ids").count() == 9
