"""HEIF/AVIF container codec: item walk round-trips, ispe
association resolution, iloc extent accounting, multi-brand, v1
ipma/large-id variants, malformed rejection, Spark extractor."""
import struct

import pytest
from pyspark.sql.functions import col as F_col

from vtk_reserves_spark.sources.heif import build_heif, parse_heif


def _one(brand="avif", w=320, h=240, n=57, exif=False):
    items = [{
        "item_id": 1, "item_type": "av01",
        "width": w, "height": h, "payload": b"\xAB" * n,
    }]
    if exif:
        items.append({"item_id": 2, "item_type": "Exif",
                      "payload": b"E" * 40})
    return build_heif(items, brand=brand)


def test_roundtrip_basic():
    meta = parse_heif(_one())
    assert meta["brand"] == "avif"
    assert meta["primary_item"] == 1
    (it,) = meta["items"]
    assert (it["item_type"], it["width"], it["height"], it["size"],
            it["n_extents"]) == ("av01", 320, 240, 57, 1)


def test_exif_item_no_dimensions():
    meta = parse_heif(_one(exif=True))
    assert len(meta["items"]) == 2
    exif = meta["items"][1]
    assert exif["item_type"] == "Exif"
    assert exif["width"] is None and exif["size"] == 40


@pytest.mark.parametrize("brand", ["avif", "heic", "mif1"])
def test_brands(brand):
    assert parse_heif(_one(brand=brand))["brand"] == brand


def test_iloc_offsets_point_at_payloads():
    blob = _one(n=17, exif=True)
    meta = parse_heif(blob)
    start = blob.index(b"mdat") + 4
    assert blob[start : start + 17] == b"\xAB" * 17
    assert blob[start + 17 : start + 57] == b"E" * 40
    assert meta["items"][0]["size"] == 17


def test_wide_ipma_and_infe_v3():
    """Hand-mutate to the 15-bit ipma index form (flags bit 0) and a
    v3 infe (32-bit item ids) — both documented variants decode."""
    blob = bytearray(_one())
    # flip ipma flags bit 0 and widen its one association to 2 bytes
    i = bytes(blob).index(b"ipma")
    # old body: verflags(4) count(4) iid(2) cnt(1) assoc(1)
    verflags_off = i + 4
    assert blob[verflags_off + 3] == 0
    blob[verflags_off + 3] = 1  # flags bit 0
    assoc_off = verflags_off + 4 + 4 + 2 + 1
    old = blob[assoc_off]
    blob[assoc_off : assoc_off + 1] = struct.pack(
        ">H", 0x8000 | (old & 0x7F)
    )
    # fix sizes: ipma box + meta box each grew by 1
    ipma_size_off = i - 4
    struct.pack_into(">I", blob, ipma_size_off,
                     struct.unpack_from(">I", blob, ipma_size_off)[0] + 1)
    for tag in (b"iprp", b"meta"):
        j = bytes(blob).index(tag)
        struct.pack_into(">I", blob, j - 4,
                         struct.unpack_from(">I", blob, j - 4)[0] + 1)
    meta = parse_heif(bytes(blob))
    assert meta["items"][0]["width"] == 320


def test_malformed_rejected():
    with pytest.raises(ValueError, match="ftyp/meta"):
        parse_heif(b"\x00\x00\x00\x08free")
    blob = bytearray(_one())
    i = bytes(blob).index(b"infe")
    blob[i + 4] = 0  # infe version 0
    with pytest.raises(ValueError, match="infe"):
        parse_heif(bytes(blob))


def test_spark_extractor(spark):
    from vtk_reserves_spark.operators.multimodal import (
        attach_heif_payload, heif_metadata,
    )

    docs = spark.range(24).select(F_col("id").alias("doc_id"))
    out = heif_metadata(attach_heif_payload(docs)).toPandas()
    assert len(out) == 24
    assert out["error"].isna().all()
    r3 = out[out.doc_id == 3].iloc[0]
    assert r3["brand"] == "avif" and r3["item_type"] == "av01"
    assert r3["width"] == 64 + 8 * 3 and r3["primary_size"] == 4
    r4 = out[out.doc_id == 4].iloc[0]
    assert r4["n_items"] == 2 and r4["exif_size"] == 14
