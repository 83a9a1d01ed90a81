"""Binary legacy VTK reader — pure struct/numpy, no VTK/pyvista.

The reference loads grids and meshes through ``pv.read``
(``pd_vtk.py:50-87``, ``pd_vtk.py:533-547``); its shipped sample data
(``sample_data/std_voxel_vtk.zip``) is binary legacy VTK 5.1:

- ``std_voxel_schema0.vtk``: DATASET STRUCTURED_GRID, 31x21x21 points,
  CELL_DATA 12000 with a SCALARS array and a FIELD containing an int
  array and a string array;
- ``vox_region*.vtk`` / ``vox_mine_*.vtk``: DATASET POLYDATA with
  POINTS + POLYGONS in the 5.1 OFFSETS/CONNECTIVITY layout.

This module parses exactly that public file format (VTK legacy format
spec): ASCII section headers, big-endian binary payloads.  Driver-side
ingest only — geometry files are small next to the block model; the
parsed tables enter Spark via ``createDataFrame`` (same seam as the
OBJ/DXF/SHP codecs in this package).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_DTYPES = {
    b"double": ">f8",
    b"float": ">f4",
    b"int": ">i4",
    b"long": ">i8",
    b"vtktypeint64": ">i8",
    b"vtktypeint32": ">i4",
    b"unsigned_char": ">u1",
    b"short": ">i2",
    b"char": ">i1",
}


@dataclass
class VtkDataset:
    kind: str                       # STRUCTURED_GRID | POLYDATA | UNSTRUCTURED_GRID
    points: np.ndarray              # (n, 3) float64
    dimensions: tuple | None = None  # point dims (nx+1, ny+1, nz+1) for grids
    faces: np.ndarray | None = None  # (m, 3) int triangles (fans split)
    cell_data: dict = field(default_factory=dict)
    point_data: dict = field(default_factory=dict)
    field_data: dict = field(default_factory=dict)

    @property
    def n_cells(self) -> int:
        if self.dimensions is not None:
            nx, ny, nz = self.dimensions
            return max(nx - 1, 1) * max(ny - 1, 1) * max(nz - 1, 1)
        return 0 if self.faces is None else len(self.faces)


#: attribute sections carrying binary payloads this parser doesn't
#: decode — encountered mid-stream they must abort, not line-skip
_BINARY_ATTR_SECTIONS = frozenset(
    (b"VECTORS", b"NORMALS", b"TEXTURE_COORDINATES", b"TENSORS",
     b"COLOR_SCALARS", b"LOOKUP_TABLE",
     # SCALARS is normally consumed inside _read_attributes; one that
     # surfaces in the MAIN loop (e.g. after a METADATA block made
     # _read_attributes return early) still fronts a binary payload —
     # line-skipping it would misread payload bytes as section headers
     b"SCALARS")
)


class _Cursor:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def line(self) -> bytes:
        nl = self.data.find(b"\n", self.pos)
        if nl < 0:  # EOF without trailing newline: remainder is the line
            out = self.data[self.pos:]
            self.pos = len(self.data)
        else:
            out = self.data[self.pos:nl]
            self.pos = nl + 1
        return out.strip()

    def peek_line(self) -> bytes:
        save = self.pos
        try:
            out = self.line()
        except ValueError:
            return b""
        self.pos = save
        return out

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def array(self, dtype: str, count: int) -> np.ndarray:
        out = np.frombuffer(self.data, dtype=dtype, count=count, offset=self.pos)
        self.pos += out.nbytes
        # payloads are newline-terminated before the next section header
        if self.pos < len(self.data) and self.data[self.pos:self.pos + 1] == b"\n":
            self.pos += 1
        return out

    def strings(self, count: int) -> list[str]:
        """Binary vtkStringArray payload: each value is a length byte
        ``0xC0 | len`` followed by the bytes (observed encoding for
        strings < 64 chars — the sample data's ``lito`` array)."""
        out = []
        for _ in range(count):
            b = self.data[self.pos]
            if b < 0xC0:
                raise ValueError(
                    f"unsupported vtk string length prefix 0x{b:02x} at {self.pos}"
                )
            ln = b - 0xC0
            out.append(self.data[self.pos + 1:self.pos + 1 + ln].decode("latin-1"))
            self.pos += 1 + ln
        if self.data[self.pos:self.pos + 1] == b"\n":
            self.pos += 1
        return out


def _read_field(cur: _Cursor, n_arrays: int) -> dict:
    out = {}
    for _ in range(n_arrays):
        name, ncomp, ntup, typ = cur.line().split()
        ncomp, ntup = int(ncomp), int(ntup)
        if typ == b"string":
            out[name.decode()] = np.array(cur.strings(ncomp * ntup), dtype=object)
        else:
            arr = cur.array(_DTYPES[typ], ncomp * ntup)
            out[name.decode()] = arr if ncomp == 1 else arr.reshape(ntup, ncomp)
    return out


def _read_attributes(cur: _Cursor, n: int) -> dict:
    """SCALARS/FIELD blocks after a CELL_DATA/POINT_DATA count line."""
    out = {}
    while not cur.eof():
        head = cur.peek_line()
        if head.startswith(b"SCALARS"):
            cur.line()
            toks = head.split()
            _, name, typ = toks[:3]
            if len(toks) >= 4 and int(toks[3]) != 1:
                raise ValueError(
                    f"unsupported SCALARS with numComp={int(toks[3])}: "
                    f"{name.decode()!r} (line-skipping past a binary "
                    "payload would corrupt the parse)"
                )
            lut = cur.peek_line()
            if lut.startswith(b"LOOKUP_TABLE"):
                cur.line()
            out[name.decode()] = cur.array(_DTYPES[typ], n)
        elif head.startswith(b"FIELD"):
            cur.line()
            out.update(_read_field(cur, int(head.split()[2])))
        elif head.startswith(b"METADATA"):
            # VTK >= 8 interleaves text METADATA blocks between arrays
            # (terminated by a blank line): skip it INLINE and keep
            # reading attributes — returning early here would strand the
            # following SCALARS header in the main loop
            cur.line()
            while not cur.eof() and cur.peek_line():
                cur.line()
        elif head.split()[:1] and head.split()[0] in _BINARY_ATTR_SECTIONS:
            # these carry a binary payload this parser doesn't decode;
            # skipping them line-wise would misread payload bytes as
            # section headers, so fail loudly instead
            raise ValueError(
                f"unsupported legacy-VTK attribute section {head.split()[0].decode()!r}"
            )
        else:
            break
    return out


def _triangulate(offsets: np.ndarray, conn: np.ndarray) -> np.ndarray:
    """Polygon fans -> triangles (same normalization the reference gets
    from ``vtk_flat_quads_to_triangles``, ``pd_vtk.py:148-156``)."""
    tris = []
    for a, b in zip(offsets[:-1], offsets[1:]):
        poly = conn[a:b]
        for t in range(1, len(poly) - 1):
            tris.append((poly[0], poly[t], poly[t + 1]))
    return np.asarray(tris, dtype=np.int64)


def read_vtk(path: str) -> VtkDataset:
    """Parse a binary legacy-VTK file (STRUCTURED_GRID or POLYDATA)."""
    with open(path, "rb") as f:
        data = f.read()
    cur = _Cursor(data)
    magic = cur.line()
    if not magic.startswith(b"# vtk DataFile"):
        raise ValueError(f"not a legacy VTK file: {path}")
    cur.line()  # title
    fmt = cur.line()
    if fmt != b"BINARY":
        raise ValueError(f"only BINARY legacy VTK supported here ({fmt!r}); "
                         "ASCII POLYDATA is handled by sources.mesh")
    dataset = cur.line().split()[1].decode()

    dims = None
    points = None
    faces = None
    cell_data: dict = {}
    point_data: dict = {}
    field_data: dict = {}

    while not cur.eof():
        head = cur.peek_line()
        if not head:
            cur.line()
            continue
        key = head.split()[0]
        if key == b"DIMENSIONS":
            cur.line()
            dims = tuple(int(v) for v in head.split()[1:4])
        elif key == b"POINTS":
            cur.line()
            n = int(head.split()[1])
            typ = head.split()[2]
            points = (
                cur.array(_DTYPES[typ], n * 3).astype(np.float64).reshape(n, 3)
            )
        elif key in (b"POLYGONS", b"LINES"):
            cur.line()
            n_off, n_conn = int(head.split()[1]), int(head.split()[2])
            sub = cur.peek_line()
            if sub.startswith(b"OFFSETS"):
                cur.line()
                offs = cur.array(_DTYPES[sub.split()[1]], n_off).astype(np.int64)
                sub2 = cur.line()  # CONNECTIVITY <type>
                conn = cur.array(_DTYPES[sub2.split()[1]], n_conn).astype(np.int64)
            else:
                # pre-5.1 layout: count-prefixed flat cells
                flat = cur.array(">i4", n_conn).astype(np.int64)
                offs, conn, i = [0], [], 0
                while i < len(flat):
                    c = flat[i]
                    conn.extend(flat[i + 1:i + 1 + c])
                    offs.append(offs[-1] + c)
                    i += 1 + c
                offs, conn = np.asarray(offs), np.asarray(conn)
            if key == b"POLYGONS":
                faces = _triangulate(offs, conn)
        elif key == b"CELL_DATA":
            cur.line()
            cell_data = _read_attributes(cur, int(head.split()[1]))
        elif key == b"POINT_DATA":
            cur.line()
            point_data = _read_attributes(cur, int(head.split()[1]))
        elif key == b"FIELD":
            cur.line()
            field_data = _read_field(cur, int(head.split()[2]))
        elif key == b"METADATA":
            cur.line()
            while not cur.eof() and cur.peek_line():
                cur.line()  # skip metadata block until blank line
        elif key in _BINARY_ATTR_SECTIONS or key in (b"VERTICES", b"TRIANGLE_STRIPS"):
            # binary payload we don't decode — line-skipping would
            # misinterpret payload bytes as headers; fail loudly
            raise ValueError(f"unsupported legacy-VTK section {key.decode()!r} in {path}")
        else:
            cur.line()  # unknown TEXT header (no payload) — skip the line
    if points is None:
        raise ValueError(f"no POINTS section in {path}")
    return VtkDataset(
        kind=dataset,
        points=points,
        dimensions=dims,
        faces=faces,
        cell_data=cell_data,
        point_data=point_data,
        field_data=field_data,
    )


def grid_cell_table(ds: VtkDataset):
    """STRUCTURED_GRID -> pandas cell table: one row per cell with
    ``cell, i, j, k``, centroid ``x, y, z``, ``volume`` and every
    cell-level array (CELL_DATA plus per-cell FIELD arrays) — the
    ``vtk_mesh_to_df`` contract (``pd_vtk.py:375-433``).

    Two supported point layouts, both verified against the actual point
    stream before cell arrays are attached positionally (a mismatched
    layout would silently land arrays on the wrong ``(i,j,k)``):

    - **rectilinear** (axis-aligned, possibly non-uniform spacing): the
      tensor-product lattice of the per-axis unique coordinates;
    - **rotated regular** (``vtk_VoxelSG`` parity, ``pd_vtk.py:897-904``):
      ``P(i,j,k) = P0 + i·ex + j·ey + k·ez`` with the step vectors taken
      from the first point differences — covers z-rotated (bearing)
      models; volume is ``|det[ex ey ez]|``.
    """
    import pandas as pd

    if ds.kind != "STRUCTURED_GRID" or ds.dimensions is None:
        raise ValueError("grid_cell_table needs a STRUCTURED_GRID dataset")
    npx, npy, npz = ds.dimensions
    P = ds.points
    if len(P) != npx * npy * npz:
        raise ValueError("POINTS count does not match DIMENSIONS")
    nx, ny, nz = npx - 1, npy - 1, npz - 1
    cell = np.arange(nx * ny * nz)
    i = cell % nx
    j = (cell // nx) % ny
    k = cell // (nx * ny)

    px, py, pz = (np.unique(P[:, a]) for a in range(3))
    lattice_ok = False
    if (len(px), len(py), len(pz)) == (npx, npy, npz):
        lattice = np.stack(
            [m.ravel(order="F") for m in np.meshgrid(px, py, pz, indexing="ij")], 1
        )
        lattice_ok = lattice.shape == P.shape and np.allclose(
            lattice, P, atol=1e-9
        )
    if lattice_ok:
        cx, cy, cz = ((v[:-1] + v[1:]) / 2.0 for v in (px, py, pz))
        dx, dy, dz = (np.diff(v) for v in (px, py, pz))
        x, y, z = cx[i], cy[j], cz[k]
        volume = dx[i] * dy[j] * dz[k]
    else:
        # rotated-regular fallback: fit the affine from the step vectors
        p0 = P[0]
        ex = P[1] - p0 if npx > 1 else np.zeros(3)
        ey = P[npx] - p0 if npy > 1 else np.zeros(3)
        ez = P[npx * npy] - p0 if npz > 1 else np.zeros(3)
        pi, pj, pk = np.meshgrid(
            np.arange(npx), np.arange(npy), np.arange(npz), indexing="ij"
        )
        model = (
            p0
            + pi.ravel(order="F")[:, None] * ex
            + pj.ravel(order="F")[:, None] * ey
            + pk.ravel(order="F")[:, None] * ez
        )
        scale = max(float(np.abs(P).max()), 1.0)
        if not np.allclose(model, P, atol=1e-7 * scale):
            raise ValueError(
                "structured grid points are neither a rectilinear lattice "
                "nor a regular affine grid; cell-array order would be "
                "misattributed"
            )
        centroids = (
            p0
            + (i[:, None] + 0.5) * ex
            + (j[:, None] + 0.5) * ey
            + (k[:, None] + 0.5) * ez
        )
        x, y, z = centroids[:, 0], centroids[:, 1], centroids[:, 2]
        volume = np.full(len(cell), abs(float(np.linalg.det(np.stack([ex, ey, ez])))))
    out = pd.DataFrame(
        {
            "cell": cell,
            "i": i.astype(np.int32),
            "j": j.astype(np.int32),
            "k": k.astype(np.int32),
            "x": x,
            "y": y,
            "z": z,
            "volume": volume,
        }
    )
    n = len(cell)
    for src in (ds.cell_data, ds.field_data):
        for name, arr in src.items():
            if np.ndim(arr) == 1 and len(arr) == n:
                # legacy-VTK binary payloads are big-endian; convert to
                # native so Arrow createDataFrame stays zero-copy
                a = np.asarray(arr)
                if a.dtype.byteorder == ">":
                    a = a.astype(a.dtype.newbyteorder("="))
                out[name] = a
    return out
