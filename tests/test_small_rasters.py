"""PNM / TGA / ICO codec tests."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vtk_reserves_spark.sources.ico import decode_ico, decode_ico_entries, encode_ico
from vtk_reserves_spark.sources.pnm import decode_pnm, encode_pnm
from vtk_reserves_spark.sources.tga import decode_tga, encode_tga


def test_pnm_binary_roundtrips():
    rng = np.random.RandomState(0)
    g = rng.randint(0, 256, (5, 7), dtype=np.int64).astype(np.uint8)
    assert (decode_pnm(encode_pnm(g)) == g).all()
    c = rng.randint(0, 256, (4, 6, 3), dtype=np.int64).astype(np.uint8)
    assert (decode_pnm(encode_pnm(c)) == c).all()


def test_pnm_ascii_variants_and_comments():
    # P2 with comments and ragged whitespace
    p2 = b"P2\n# a comment\n3 2 # inline\n255\n0 128  255\n\t64 32 16\n"
    img = decode_pnm(p2)
    assert img.tolist() == [[0, 128, 255], [64, 32, 16]]
    # P1 bitmap: 1 = black -> 0
    p1 = b"P1\n# bits\n4 2\n1 0 1 0\n0 1 0 1\n"
    img = decode_pnm(p1)
    assert img.tolist() == [
        [0, 255, 0, 255],
        [255, 0, 255, 0],
    ]
    # P3 with non-255 maxval rescales
    p3 = b"P3 2 1 15\n15 0 7 0 15 7\n"
    img = decode_pnm(p3)
    assert img.tolist() == [[[255, 0, 119], [0, 255, 119]]]


def test_pnm_p4_packing_and_16bit_p5():
    # P4: packed bits, row-padded to bytes; 5 wide forces padding
    raw = bytes([0b10110000, 0b01001000])
    img = decode_pnm(b"P4\n5 2\n" + raw)
    assert img.tolist() == [
        [0, 255, 0, 0, 255],
        [255, 0, 255, 255, 0],
    ]
    # P5 maxval 65535: big-endian 16-bit, scaled to 8-bit
    vals = np.array([[0, 32768], [65535, 16384]], ">u2")
    img = decode_pnm(b"P5\n2 2\n65535\n" + vals.tobytes())
    assert img.tolist() == [[0, 127], [255, 63]]


def test_pnm_rejects_bad():
    with pytest.raises(ValueError, match="magic"):
        decode_pnm(b"P9\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_pnm(b"P5\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_pnm(b"P2 1 1 70000\n5\n")
    with pytest.raises(ValueError, match="exceeds"):
        decode_pnm(b"P2 1 1 10\n11\n")


def test_tga_truecolor_roundtrip_and_orders():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (6, 9, 3), dtype=np.int64).astype(np.uint8)
    out = decode_tga(encode_tga(img))
    assert (out[:, :, :3] == img).all()
    assert (out[:, :, 3] == 255).all()
    # top-down flag (descriptor bit 5): hand-patch the header
    data = bytearray(encode_tga(img))
    data[17] |= 0x20
    out2 = decode_tga(bytes(data))
    assert (out2[:, :, :3] == img[::-1]).all()


def test_tga_rle_and_palette():
    # RLE true-color: run of 3 red + raw of 2 (green, blue), 24-bit
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, 5, 1, 24, 0x20)
    rle = bytes([0x82, 0, 0, 255]) + bytes([0x01, 0, 255, 0, 255, 0, 0])
    out = decode_tga(hdr + rle)
    assert out.shape == (1, 5, 4)
    assert out[0, :3, :3].tolist() == [[255, 0, 0]] * 3
    assert out[0, 3, :3].tolist() == [0, 255, 0]
    assert out[0, 4, :3].tolist() == [0, 0, 255]
    # color-mapped (type 1): 2-entry 24-bit palette
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 2, 24, 0, 0, 2, 2, 8, 0x20)
    pal = bytes([0, 0, 255]) + bytes([255, 255, 255])  # BGR: red, white
    idx = bytes([0, 1, 1, 0])
    out = decode_tga(hdr + pal + idx)
    assert out[0, 0, :3].tolist() == [255, 0, 0]
    assert out[0, 1, :3].tolist() == [255, 255, 255]


def test_tga_16bit_and_grayscale():
    # 16-bit RGB555 with attribute bit clear -> opaque
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 1, 16, 0x20)
    px = np.array([(31 << 10) | (0 << 5) | 0, (0 << 10) | (31 << 5) | 15], "<u2")
    out = decode_tga(hdr + px.tobytes())
    assert out[0, 0].tolist() == [255, 0, 0, 255]
    assert out[0, 1].tolist() == [0, 255, 15 * 255 // 31, 255]
    # grayscale (type 3)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 3, 1, 8, 0x20)
    out = decode_tga(hdr + bytes([0, 128, 255]))
    assert out[0, :, 0].tolist() == [0, 128, 255]


def test_tga_rejects_bad():
    with pytest.raises(ValueError, match="image type"):
        decode_tga(struct.pack("<BBBHHBHHHHBB", 0, 0, 7, 0, 0, 0, 0, 0, 1, 1, 24, 0) + b"\x00" * 3)
    with pytest.raises(ValueError, match="truncated"):
        decode_tga(encode_tga(np.zeros((4, 4), np.uint8))[:-5])


def test_ico_png_roundtrip_and_largest():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (16, 16, 4), dtype=np.int64).astype(np.uint8)
    data = encode_ico(img)
    out = decode_ico(data)
    assert (out == img).all()
    assert len(decode_ico_entries(data)) == 1


def test_ico_dib_entry_with_and_mask():
    """Hand-built 24-bit DIB entry: 2x2 colors + AND mask marking one
    pixel transparent."""
    w = h = 2
    # XOR block: bottom-up BGR rows padded to 4 bytes
    row0 = bytes([255, 0, 0]) + bytes([0, 255, 0]) + b"\x00\x00"  # bottom
    row1 = bytes([0, 0, 255]) + bytes([255, 255, 255]) + b"\x00\x00"
    # AND mask: bottom-up, 4-byte stride; top-left pixel transparent
    mask_bottom = bytes([0b00000000, 0, 0, 0])
    mask_top = bytes([0b10000000, 0, 0, 0])
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, 0, 0, 0, 0, 0
    ) + row0 + row1 + mask_bottom + mask_top
    entry = struct.pack("<BBBBHHII", w, h, 0, 0, 1, 24, len(dib), 22)
    data = struct.pack("<HHH", 0, 1, 1) + entry + dib
    out = decode_ico(data)
    assert out.shape == (2, 2, 4)
    assert out[1, 0, :3].tolist() == [0, 0, 255]  # blue BGR -> RGB
    assert out[0, 1, :3].tolist() == [255, 255, 255]
    assert out[0, 0, 3] == 0  # masked transparent
    assert out[1, 1, 3] == 255


def test_ico_rejects_bad():
    with pytest.raises(ValueError, match="ICO"):
        decode_ico(b"\x00\x01\x02\x03\x04\x05")
    with pytest.raises(ValueError, match="no images"):
        decode_ico(struct.pack("<HHH", 0, 1, 0))


def test_decode_media_new_mimes():
    from vtk_reserves_spark.operators.multimodal import decode_media

    g = np.full((3, 5), 100, np.uint8)
    r = decode_media(encode_pnm(g), "image/x-portable-graymap")
    assert (r["width"], r["height"], r["mean_byte"]) == (5, 3, 100.0)
    r = decode_media(encode_tga(g), "image/tga")
    assert (r["width"], r["height"], r["mean_byte"]) == (5, 3, 100.0)
    sq = np.full((4, 4, 4), 7, np.uint8)
    sq[:, :, 3] = 255
    r = decode_media(encode_ico(sq), "image/x-icon")
    assert (r["width"], r["height"], r["mean_byte"]) == (4, 4, 7.0)


def test_pnm_p1_packed_digits():
    # the spec allows bits with NO separating whitespace in P1
    img = decode_pnm(b"P1\n4 2\n1010\n0101")
    assert img.tolist() == [
        [0, 255, 0, 255],
        [255, 0, 255, 0],
    ]
    with pytest.raises(ValueError, match="P1"):
        decode_pnm(b"P1\n2 1\n12\n")


def test_decode_media_tiff_real():
    """decode_media routes image/tiff to the real GeoTIFF codec."""
    import numpy as np

    from vtk_reserves_spark.operators.multimodal import (
        decode_media, sniff_mime,
    )
    from vtk_reserves_spark.sources.geotiff import encode_tiff

    img = np.arange(48, dtype=np.float64).reshape(6, 8)
    blob = encode_tiff(img)
    assert sniff_mime(blob) == "image/tiff"
    for mime in ("image/tiff", "auto"):
        got = decode_media(blob, mime)
        assert (got["width"], got["height"]) == (8, 6)
        assert got["mean_byte"] == img.mean()


def test_decompress_payload_all_codecs():
    import bz2
    import gzip
    import lzma
    import zlib

    from vtk_reserves_spark.operators.multimodal import (
        decompress_payload, sniff_compression,
    )
    from vtk_reserves_spark.sources.zstd import compress_frame

    raw = b"the quick brown payload" * 20
    cases = [
        ("gzip", gzip.compress(raw, mtime=0)),
        ("bzip2", bz2.compress(raw)),
        ("xz", lzma.compress(raw)),
        ("zlib", zlib.compress(raw)),
        ("zstd", compress_frame(raw)),
        ("none", raw),
    ]
    for codec, blob in cases:
        assert sniff_compression(blob) == (None if codec == "none" else codec)
        got_codec, out = decompress_payload(blob)
        assert (got_codec, out) == (codec, raw), codec


def test_decompress_media_error_quarantine(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.operators.multimodal import decompress_media

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"\x1f\x8btruncated"]}),
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    out = decompress_media(df, on_error="null").collect()
    assert out[0].error is not None and out[0].payload is None
    import pytest as _pytest
    with _pytest.raises(Exception):
        decompress_media(df).collect()
