"""glTF/GLB codec: container parse, accessor decode (all component
types, interleaved strides), texture decode, writer round-trips,
loader dispatch, malformed-input rejection."""
import base64
import json
import struct

import numpy as np
import pytest

from vtk_reserves_spark.sources.gltf import (
    GltfMesh,
    read_glb,
    write_glb,
)
from vtk_reserves_spark.sources.mesh import TriMesh

BOX = TriMesh.box([(0.0, 0.0, 0.0), (2.0, 3.0, 4.0)], name="box")


def test_glb_roundtrip_box():
    blob = write_glb(BOX)
    assert blob[:4] == b"glTF"
    (meshes,) = (read_glb(blob),)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.name == "box"
    np.testing.assert_allclose(m.vertices, BOX.vertices)
    np.testing.assert_array_equal(m.faces, BOX.faces)


def test_glb_roundtrip_multi_mesh_with_texcoords_and_texture():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    tc = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    tri = GltfMesh(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 1, 2]],
        name="t", texcoords=tc, texture=img,
    )
    blob = write_glb([BOX, tri])
    meshes = read_glb(blob)
    assert [m.name for m in meshes] == ["box", "t"]
    assert meshes[0].texture is None and meshes[0].texcoords is None
    np.testing.assert_allclose(meshes[1].texcoords, tc)
    np.testing.assert_array_equal(meshes[1].texture, img)
    # spec: chunks 4-byte aligned
    (jlen,) = struct.unpack_from("<I", blob, 12)
    assert jlen % 4 == 0


def test_gltf_json_data_uri():
    """Plain .gltf JSON with a base64 data: URI buffer decodes the
    same as GLB."""
    glb = write_glb(BOX)
    # rebuild as .gltf: pull the chunks apart
    (jlen,) = struct.unpack_from("<I", glb, 12)
    doc = json.loads(glb[20 : 20 + jlen].decode())
    (blen,) = struct.unpack_from("<I", glb, 20 + jlen)
    bin_blob = glb[28 + jlen : 28 + jlen + blen]
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(bin_blob).decode()
    )
    meshes = read_glb(json.dumps(doc).encode())
    np.testing.assert_allclose(meshes[0].vertices, BOX.vertices)
    np.testing.assert_array_equal(meshes[0].faces, BOX.faces)


@pytest.mark.parametrize(
    "ctype,dtype",
    [(5121, np.uint8), (5123, np.uint16), (5125, np.uint32)],
)
def test_index_component_types(ctype, dtype):
    """Index accessors decode for every legal component width (the
    reference's dt2np table covers the same set)."""
    glb = bytearray(write_glb(BOX))
    (jlen,) = struct.unpack_from("<I", glb, 12)
    doc = json.loads(glb[20 : 20 + jlen].decode())
    (blen,) = struct.unpack_from("<I", glb, 20 + jlen)
    blob = bytearray(glb[28 + jlen : 28 + jlen + blen])
    iac = doc["meshes"][0]["primitives"][0]["indices"]
    ac = doc["accessors"][iac]
    bv = doc["bufferViews"][ac["bufferView"]]
    old = np.frombuffer(
        bytes(blob[bv["byteOffset"] : bv["byteOffset"] + bv["byteLength"]]),
        dtype=np.uint32,
    )
    new = old.astype(dtype).tobytes()
    # rewrite the view in place (shrink is fine: pad to old length)
    blob[bv["byteOffset"] : bv["byteOffset"] + bv["byteLength"]] = (
        new + b"\x00" * (bv["byteLength"] - len(new))
    )
    bv["byteLength"] = len(new)
    ac["componentType"] = ctype
    jb = bytearray(json.dumps(doc, separators=(",", ":")).encode())
    while len(jb) % 4:
        jb += b" "
    out = bytearray(struct.pack("<III", 0x46546C67, 2, 0))
    out += struct.pack("<II", len(jb), 0x4E4F534A) + jb
    out += struct.pack("<II", len(blob), 0x004E4942) + blob
    struct.pack_into("<I", out, 8, len(out))
    m = read_glb(bytes(out))[0]
    np.testing.assert_array_equal(m.faces, BOX.faces)


def test_interleaved_byte_stride():
    """Interleaved vertex buffers (bufferView.byteStride) decode
    correctly — position and texcoord share one strided view."""
    pts = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype="<f4")
    tc = np.array([[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]], dtype="<f4")
    inter = np.hstack([pts, tc]).astype("<f4")  # stride 20
    blob = bytearray(inter.tobytes())
    idx = np.array([0, 1, 2], dtype="<u4")
    ioff = len(blob)
    blob += idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2,
        }]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 3, "type": "VEC2"},
            {"bufferView": 1, "componentType": 5125, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": ioff,
             "byteStride": 20},
            {"buffer": 0, "byteOffset": ioff, "byteLength": 12},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(bytes(blob)).decode(),
        }],
    }
    m = read_glb(json.dumps(doc).encode())[0]
    np.testing.assert_allclose(m.vertices, pts.astype(np.float64))
    np.testing.assert_allclose(m.texcoords, tc.astype(np.float64))


def test_malformed_rejected():
    with pytest.raises(ValueError, match="version"):
        read_glb(struct.pack("<III", 0x46546C67, 1, 12))
    blob = bytearray(write_glb(BOX))
    struct.pack_into("<I", blob, 8, len(blob) + 100)
    with pytest.raises(ValueError, match="length"):
        read_glb(bytes(blob))
    # accessor overrun
    glb = bytearray(write_glb(BOX))
    (jlen,) = struct.unpack_from("<I", glb, 12)
    doc = json.loads(glb[20 : 20 + jlen].decode())
    doc["accessors"][0]["count"] = 10**6
    doc["buffers"][0]["uri"] = "data:application/octet-stream;base64,AAAA"
    with pytest.raises(ValueError, match="overruns"):
        read_glb(json.dumps(doc).encode())


def test_loader_dispatch(spark, tmp_path):
    from vtk_reserves_spark.sources.loaders import load_dataframe

    p = str(tmp_path / "box.glb")
    write_glb(BOX, p)
    df = load_dataframe(spark, p, keep_null=True)
    assert df.count() == 36  # 12 tris x 3 vertices
    assert set(df.columns) >= {"x", "y", "z", "n", "node", "face"}


def test_exploded_roundtrip(spark, tmp_path):
    """GLB -> exploded table -> GLB preserves geometry (the codec-
    oracle pattern every mesh format here follows)."""
    from vtk_reserves_spark.sources.gltf import read_glb_df, write_glb_df

    p1 = str(tmp_path / "a.glb")
    p2 = str(tmp_path / "b.glb")
    write_glb(BOX, p1)
    pdf = read_glb_df(spark, p1).toPandas()
    write_glb_df(pdf, p2)
    with open(p2, "rb") as fh:
        m = read_glb(fh.read())[0]
    np.testing.assert_allclose(
        np.sort(m.vertices, axis=0), np.sort(BOX.vertices, axis=0)
    )
    assert len(m.faces) == len(BOX.faces)
