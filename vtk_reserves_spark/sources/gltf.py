"""glTF 2.0 / GLB mesh reader + writer — pure-stdlib codec.

Closes the last in-reference binary *reader* gap: the reference loads
``.gltf``/``.glb`` scenes through ``pygltflib`` and converts each mesh
primitive to a PolyData (``pd_vtk.py:1058-1091`` ``gltf_to_vtk``) and
writes scenes back (``pd_vtk.py:965-1052`` ``vtk_to_gltf``).  This
module re-implements both directions from the public glTF 2.0
specification with nothing beyond ``json``/``struct``/``numpy``:

* GLB container: 12-byte header (magic ``glTF``, version 2, total
  length) + chunks — ``JSON`` (0x4E4F534A) then ``BIN`` (0x004E4942),
  each 4-byte aligned per spec;
* ``.gltf`` JSON files with base64 ``data:`` URI buffers;
* accessor decode: componentType 5120 BYTE / 5121 UNSIGNED_BYTE /
  5122 SHORT / 5123 UNSIGNED_SHORT / 5125 UNSIGNED_INT / 5126 FLOAT
  (the reference's ``dt2np`` table, ``pd_vtk.py:1053-1056``), element
  types SCALAR/VEC2/VEC3/VEC4, bufferView ``byteStride`` (interleaved
  vertex buffers) and per-accessor ``byteOffset``;
* primitives: POSITION (VEC3) + ``indices`` (SCALAR, triangulated)
  + optional TEXCOORD_0 (VEC2); materials with an embedded PNG
  ``baseColorTexture`` decode through the in-repo PNG codec
  (``sources/image.py``) exactly where the reference calls
  ``skimage.io.imread`` (``pd_vtk.py:1086``).

The writer mirrors the reference's byte layout: one buffer, POSITION
accessor carrying ``min``/``max`` (required by the spec for POSITION),
UNSIGNED_INT indices, PNG images padded to 4-byte boundaries
(``pd_vtk.py:1018-1019``).

Like every mesh codec here the parse is driver-side: scenes are
KB-to-MB artifacts that become the broadcast side of spatial joins
(`sources/mesh.py` module docstring); the 100 TB side is always the
block model / document table.
"""

from __future__ import annotations

import base64
import json
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from vtk_reserves_spark.sources.mesh import TriMesh

__all__ = [
    "read_glb", "write_glb", "read_glb_df", "write_glb_df",
    "GltfMesh",
]

_MAGIC = 0x46546C67  # "glTF"
_CHUNK_JSON = 0x4E4F534A
_CHUNK_BIN = 0x004E4942

#: componentType -> numpy dtype (glTF 2.0 §3.6.2.2; the reference's
#: ``dt2np`` table, pd_vtk.py:1053-1056)
_COMPONENT_DTYPES = {
    5120: np.dtype("<i1"),  # BYTE
    5121: np.dtype("<u1"),  # UNSIGNED_BYTE
    5122: np.dtype("<i2"),  # SHORT
    5123: np.dtype("<u2"),  # UNSIGNED_SHORT
    5125: np.dtype("<u4"),  # UNSIGNED_INT
    5126: np.dtype("<f4"),  # FLOAT
}

#: element type -> component count (glTF 2.0 §3.6.2.1)
_TYPE_WIDTH = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}


class GltfMesh(TriMesh):
    """A :class:`TriMesh` plus the optional glTF primitive extras the
    reference carries through (``pd_vtk.py:1073-1088``): per-vertex
    texture coordinates and a decoded base-color texture image."""

    def __init__(self, vertices, faces, name="", texcoords=None, texture=None):
        super().__init__(vertices, faces, name=name)
        self.texcoords = (
            None if texcoords is None
            else np.asarray(texcoords, np.float64).reshape(-1, 2)
        )
        self.texture = texture  # (h, w[, ch]) uint8 ndarray or None


# ---------------------------------------------------------------- read


def _parse_container(data: bytes) -> tuple[dict, bytes]:
    """GLB or JSON-with-data-URI -> (gltf json dict, buffer-0 bytes)."""
    if len(data) >= 12 and struct.unpack_from("<I", data, 0)[0] == _MAGIC:
        version, total = struct.unpack_from("<II", data, 4)
        if version != 2:
            raise ValueError(f"gltf: unsupported GLB version {version}")
        if total > len(data):
            raise ValueError("gltf: GLB length field exceeds data")
        pos = 12
        doc = None
        blob = b""
        while pos + 8 <= total:
            clen, ctype = struct.unpack_from("<II", data, pos)
            pos += 8
            if pos + clen > total:
                raise ValueError("gltf: GLB chunk overruns container")
            body = data[pos : pos + clen]
            pos += clen + (-clen % 4)
            if ctype == _CHUNK_JSON:
                doc = json.loads(body.decode("utf-8"))
            elif ctype == _CHUNK_BIN and not blob:
                blob = body
        if doc is None:
            raise ValueError("gltf: GLB missing JSON chunk")
        return doc, blob
    # plain .gltf JSON; buffer 0 may be an embedded data: URI
    doc = json.loads(data.decode("utf-8"))
    blob = b""
    bufs = doc.get("buffers") or []
    if bufs:
        uri = bufs[0].get("uri", "")
        if uri.startswith("data:"):
            blob = base64.b64decode(uri.split(",", 1)[1])
        elif uri:
            raise ValueError(
                "gltf: external buffer URIs not supported; pack as GLB"
            )
    return doc, blob


def _accessor_array(doc: dict, blob: bytes, idx: int) -> np.ndarray:
    """Decode accessor ``idx`` to an (count, width) ndarray, honoring
    bufferView byteStride and both byteOffsets."""
    ac = doc["accessors"][idx]
    if "sparse" in ac:
        raise ValueError("gltf: sparse accessors not supported")
    dt = _COMPONENT_DTYPES.get(ac["componentType"])
    if dt is None:
        raise ValueError(f"gltf: unknown componentType {ac['componentType']}")
    width = _TYPE_WIDTH.get(ac["type"])
    if width is None:
        raise ValueError(f"gltf: unknown accessor type {ac['type']!r}")
    count = int(ac["count"])
    bv = doc["bufferViews"][ac["bufferView"]]
    base = int(bv.get("byteOffset", 0)) + int(ac.get("byteOffset", 0))
    stride = int(bv.get("byteStride", 0)) or dt.itemsize * width
    need = (count - 1) * stride + dt.itemsize * width if count else 0
    if base + need > len(blob):
        raise ValueError("gltf: accessor overruns binary buffer")
    if stride == dt.itemsize * width:
        arr = np.frombuffer(blob, dtype=dt, count=count * width, offset=base)
        return arr.reshape(count, width)
    # interleaved: gather each element's bytes with a fancy index over
    # the raw byte view, then reinterpret — no per-row Python loop
    raw = np.frombuffer(blob, dtype=np.uint8, count=need, offset=base)
    idx = (
        np.arange(count)[:, None] * stride
        + np.arange(dt.itemsize * width)[None, :]
    )
    return np.ascontiguousarray(raw[idx]).view(dt).reshape(count, width)


def read_glb(data: bytes) -> list[GltfMesh]:
    """GLB / glTF bytes -> one :class:`GltfMesh` per mesh primitive
    (the reference's ``gltf_to_vtk`` loop, ``pd_vtk.py:1058-1091``)."""
    doc, blob = _parse_container(data)
    out: list[GltfMesh] = []
    for mi, mesh in enumerate(doc.get("meshes") or []):
        mname = mesh.get("name") or f"mesh{mi}"
        for p in mesh.get("primitives") or []:
            mode = p.get("mode", 4)
            if mode != 4:  # TRIANGLES; the reference assumes it too
                raise ValueError(f"gltf: primitive mode {mode} not supported")
            attrs = p.get("attributes") or {}
            if "POSITION" not in attrs:
                raise ValueError("gltf: primitive missing POSITION")
            pts = _accessor_array(doc, blob, attrs["POSITION"]).astype(
                np.float64
            )
            if "indices" in p:
                faces = _accessor_array(doc, blob, p["indices"])
                faces = faces.astype(np.int64).reshape(-1, 3)
            else:  # non-indexed triangles
                faces = np.arange(len(pts), dtype=np.int64).reshape(-1, 3)
            tc = None
            if attrs.get("TEXCOORD_0") is not None:
                tc = _accessor_array(doc, blob, attrs["TEXCOORD_0"]).astype(
                    np.float64
                )
            texture = None
            mat_i = p.get("material")
            if mat_i is not None:
                texture = _material_texture(doc, blob, mat_i)
            out.append(
                GltfMesh(pts, faces, name=mname, texcoords=tc, texture=texture)
            )
    return out


def _material_texture(doc: dict, blob: bytes, mat_i: int):
    """Decode a material's baseColorTexture PNG via the in-repo codec
    (the reference's skimage.io.imread call, pd_vtk.py:1083-1087)."""
    mat = (doc.get("materials") or [])[mat_i]
    pbr = mat.get("pbrMetallicRoughness") or {}
    tex_info = pbr.get("baseColorTexture")
    if not tex_info:
        return None
    tex = (doc.get("textures") or [])[tex_info["index"]]
    img = (doc.get("images") or [])[tex["source"]]
    if "bufferView" not in img:
        return None  # external image URI: metadata-only
    bv = doc["bufferViews"][img["bufferView"]]
    start = int(bv.get("byteOffset", 0))
    raw = blob[start : start + int(bv["byteLength"])]
    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None  # non-PNG (e.g. JPEG) textures: skip, like strict=False
    from vtk_reserves_spark.sources.image import decode_png

    return decode_png(raw)


# --------------------------------------------------------------- write


def _pad4(buf: bytearray, fill: bytes = b"\x00") -> None:
    while len(buf) % 4:
        buf += fill


def write_glb(meshes, path: str | None = None) -> bytes:
    """:class:`TriMesh`/``GltfMesh`` list -> GLB bytes (and optionally
    a file).  Byte layout per the reference writer
    (``pd_vtk.py:965-1052``): one buffer; per mesh POSITION (float32
    VEC3, with spec-required min/max), indices (uint32 SCALAR),
    optional TEXCOORD_0 (float32 VEC2); PNG images 4-byte padded."""
    if isinstance(meshes, TriMesh):
        meshes = [meshes]
    blob = bytearray()
    accessors: list[dict] = []
    views: list[dict] = []
    out_meshes: list[dict] = []
    materials: list[dict] = []
    textures: list[dict] = []
    images: list[dict] = []
    nodes: list[dict] = []
    for mi, mesh in enumerate(meshes):
        nodes.append({"mesh": mi})
        pts = np.ascontiguousarray(mesh.vertices, dtype="<f4")
        position = len(accessors)
        views.append({
            "buffer": 0, "byteOffset": len(blob),
            "byteLength": pts.nbytes, "target": 34962,  # ARRAY_BUFFER
        })
        accessors.append({
            "bufferView": len(views) - 1, "componentType": 5126,
            "count": len(pts), "type": "VEC3",
            "min": pts.min(axis=0).tolist() if len(pts) else [0, 0, 0],
            "max": pts.max(axis=0).tolist() if len(pts) else [0, 0, 0],
        })
        blob += pts.tobytes()
        faces = np.ascontiguousarray(mesh.faces, dtype="<u4")
        indices = len(accessors)
        views.append({
            "buffer": 0, "byteOffset": len(blob),
            "byteLength": faces.nbytes, "target": 34963,  # ELEMENT_ARRAY
        })
        accessors.append({
            "bufferView": len(views) - 1, "componentType": 5125,
            "count": int(faces.size), "type": "SCALAR",
        })
        blob += faces.tobytes()
        attrs = {"POSITION": position}
        tc = getattr(mesh, "texcoords", None)
        if tc is not None:
            tcf = np.ascontiguousarray(tc, dtype="<f4")
            attrs["TEXCOORD_0"] = len(accessors)
            views.append({
                "buffer": 0, "byteOffset": len(blob),
                "byteLength": tcf.nbytes, "target": 34962,
            })
            accessors.append({
                "bufferView": len(views) - 1, "componentType": 5126,
                "count": len(tcf), "type": "VEC2",
            })
            blob += tcf.tobytes()
        prim = {"attributes": attrs, "indices": indices,
                "material": len(materials)}
        tex_img = getattr(mesh, "texture", None)
        if tex_img is not None:
            from vtk_reserves_spark.sources.image import encode_png

            png = encode_png(np.asarray(tex_img))
            _pad4(blob)
            views.append({
                "buffer": 0, "byteOffset": len(blob), "byteLength": len(png),
            })
            images.append({"mimeType": "image/png",
                           "bufferView": len(views) - 1})
            textures.append({"source": len(images) - 1})
            materials.append({
                "doubleSided": True,
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": len(textures) - 1,
                                         "texCoord": 0}
                },
            })
            blob += png
        else:
            materials.append({"doubleSided": True})
        out_meshes.append({"name": mesh.name or f"mesh{mi}",
                           "primitives": [prim]})
    _pad4(blob)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": out_meshes,
        "accessors": accessors,
        "bufferViews": views,
        "buffers": [{"byteLength": len(blob)}],
        "materials": materials,
    }
    if textures:
        doc["textures"] = textures
        doc["images"] = images
    jbytes = bytearray(json.dumps(doc, separators=(",", ":")).encode())
    _pad4(jbytes, b" ")  # spec: JSON chunk padded with spaces
    total = 12 + 8 + len(jbytes) + 8 + len(blob)
    out = bytearray(struct.pack("<III", _MAGIC, 2, total))
    out += struct.pack("<II", len(jbytes), _CHUNK_JSON) + jbytes
    out += struct.pack("<II", len(blob), _CHUNK_BIN) + blob
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(out)
    return bytes(out)


# --------------------------------------------------------------- spark


def read_glb_df(spark: SparkSession, path: str) -> DataFrame:
    """GLB/glTF -> exploded mesh table (loader-dispatch target for
    ``.glb``/``.gltf``); one ``node`` namespace per primitive, like the
    multi-solid VTK loader."""
    from functools import reduce

    with open(path, "rb") as fh:
        meshes = read_glb(fh.read())
    if not meshes:
        raise ValueError(f"gltf: no mesh primitives in {path}")
    dfs = [m.to_exploded_df(spark) for m in meshes]
    return reduce(lambda a, b: a.unionByName(b), dfs)


def write_glb_df(pdf, path: str) -> None:
    """Exploded mesh table (pandas) -> GLB (writer-dispatch target)."""
    from vtk_reserves_spark.sources.mesh import mesh_from_exploded_df

    write_glb(mesh_from_exploded_df(pdf), path)
