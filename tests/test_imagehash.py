"""Perceptual-hash edges: exact area resize (integer and fractional
coverage), dHash/aHash bit packing, luma conversion, re-encoding
invariance, Hamming banding."""
import numpy as np
import pytest

from vtk_reserves_spark.operators.imagehash import (
    ahash_bits, area_resize, dhash_bits,
)


def test_area_resize_exact_blocks():
    v = np.arange(9, dtype=float) * 10
    img = np.repeat(np.tile(v, (16, 1)), 2, axis=1)
    g = area_resize(img, 8, 9)
    assert np.allclose(g, np.tile(v, (8, 1)))


def test_area_resize_fractional():
    g = area_resize(np.array([[0.0, 3.0, 6.0]]), 1, 2)
    # cells cover [0,1.5) and [1.5,3): (0 + 3*0.5)/1.5, (3*0.5 + 6)/1.5
    assert np.allclose(g, [[1.0, 5.0]])


def test_area_resize_preserves_mean():
    rng = np.random.RandomState(7)
    img = rng.rand(13, 17) * 255
    g = area_resize(img, 8, 8)
    assert g.mean() == pytest.approx(img.mean())


def test_dhash_monotone_extremes():
    inc = np.tile(np.arange(9, dtype=np.uint8) * 20, (16, 2))
    inc = np.repeat(np.arange(9, dtype=np.uint8)[None, :] * 20, 16, 0)
    inc = np.repeat(inc, 2, axis=1)
    assert dhash_bits(inc) == 0xFFFFFFFFFFFFFFFF
    assert dhash_bits(inc[:, ::-1]) == 0


def test_ahash_flat_is_zero():
    flat = np.full((32, 32), 128, np.uint8)
    assert ahash_bits(flat) == 0  # no cell exceeds the mean strictly


def test_luma_channels():
    # rgb vs its own gray projection must hash identically
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (24, 24, 3), np.uint8)
    gray = rgb.astype(float) @ np.array([0.299, 0.587, 0.114])
    assert dhash_bits(rgb) == dhash_bits(gray)
    one_chan = gray[..., None]
    assert dhash_bits(one_chan) == dhash_bits(gray)


def test_reencode_invariance():
    # the whole point: PNG and BMP encodings of the same pixels hash equal
    from vtk_reserves_spark.sources.bmp import decode_bmp, encode_bmp
    from vtk_reserves_spark.sources.image import decode_png, encode_png

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (20, 20), np.uint8)
    png = decode_png(encode_png(img))
    rgb = np.repeat(img[..., None], 3, axis=2)
    bmp = decode_bmp(encode_bmp(rgb))
    assert dhash_bits(np.asarray(png)) == dhash_bits(np.asarray(bmp))


def test_spark_image_hashes_and_banding(spark):
    from vtk_reserves_spark.operators.imagehash import (
        attach_column_png_payload, image_hashes, near_dup_image_pairs,
    )

    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    hashes = image_hashes(attach_column_png_payload(docs))
    rows = {r.doc_id: r for r in hashes.collect()}
    assert rows[0].width == 18 and rows[0].height == 16
    # closed form: byte from the gradient comparisons
    def byte(did):
        v = [(did * 7 + c * 13) % 256 for c in range(9)]
        return sum((1 << (7 - c)) for c in range(8) if v[c] < v[c + 1])
    for did in (0, 7, 33):
        assert rows[did].dhash == f"{byte(did):02x}" * 8
    pairs = near_dup_image_pairs(hashes, bands=4, max_hamming=6).collect()
    expect = {
        (a, b)
        for a in range(40) for b in range(a + 1, 40)
        if byte(a) == byte(b)
    }
    assert {(p.id_a, p.id_b) for p in pairs} == expect
    assert all(p.hamming == 0 for p in pairs)
    with pytest.raises(ValueError):
        near_dup_image_pairs(hashes, bands=3)


def test_spark_on_error_null(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.imagehash import image_hashes

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"not an image"]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = image_hashes(df, on_error="null").collect()
    assert out[0].error is not None and out[0].dhash is None
    with pytest.raises(Exception):
        image_hashes(df).collect()
