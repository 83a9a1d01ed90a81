"""Virtual voxel-grid DataFrames.

The reference materializes block models as VTK grids
(``pd_vtk.py:523-904``, classes ``vtk_Voxel*``) and converts them to
tables with ``vtk_mesh_to_df`` (``pd_vtk.py:375-433``).  Here the grid is
*never materialized*: :func:`grid_df` generates the cell table lazily from
``spark.range`` — pure column arithmetic, partitioned for the target cell
count, so a 10^11-cell model is just a bigger range, not a bigger driver.

Geometry conventions preserved from the reference:

- cell order is x-fastest (VTK cell id): ``cell = i + j*nx + k*nx*ny``;
- cell centroid = origin + (idx + 0.5) * spacing  (``vtk_mesh_to_df`` uses
  ``cell_centers()``, ``pd_vtk.py:398``);
- volume = dx*dy*dz (``cells_volume``, ``pd_vtk.py:798-809``; for rotated
  grids the reference takes the *axis-aligned bounds* product which
  inflates volume — we keep the true cell volume, documented deviation);
- bearing: degrees clockwise from north; bearing 90 == axis-aligned
  (``rotate_z_origin`` only rotates when ``abs(bearing-90)>0.01``,
  ``pd_vtk.py:583-590``), rotation angle = (90-bearing)° CCW about a
  rotation origin (``mesh_rotate_0261``, ``pd_vtk.py:500-520``);
- packed ijk flag = i + j*1e3 + k*1e6 (``vtk_grid_flag_ijk``,
  ``pd_vtk.py:1151-1176``).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, replace

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: target cells per task when auto-partitioning a generated grid
_CELLS_PER_PARTITION = 4_000_000
#: fan-out floor: small grids still split across cores (heavy per-cell
#: kernels would otherwise run on ONE task), but never below this many
#: cells per task so trivial grids don't schedule empty tasks
_MIN_CELLS_PER_PARTITION = 1024


@dataclass(frozen=True)
class GridSchema:
    """Value object replacing the reference's VTK ``field_data`` metadata
    (``pd_vtk.py:574-579``): origin, spacing, cell dims, bearing."""

    origin: tuple[float, float, float]
    spacing: tuple[float, float, float]
    dims: tuple[int, int, int]  # cell counts (nx, ny, nz)
    bearing: float = 90.0  # 90 == axis-aligned (reference convention)
    rot_origin: tuple[float, float, float] | None = None  # rotation point

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz

    @property
    def rotated(self) -> bool:
        return abs(self.bearing - 90.0) > 0.01  # pd_vtk.py:584

    @property
    def theta(self) -> float:
        """CCW rotation angle in radians (``mesh_rotate_0261``:
        ``r = -(bearing - 90)`` degrees)."""
        return math.radians(90.0 - self.bearing)

    @classmethod
    def from_bb(cls, bb, cell_size=10.0, ndim: int = 3, bearing: float = 90.0):
        """Grid covering bounding box ``bb = [(x0,y0,z0), (x1,y1,z1)]``.

        Mirrors ``vtk_Voxel.from_bb`` (``pd_vtk.py:593-606``): point dims =
        ceil(extent/size)+5 (i.e. +4 buffer cells), origin shifted down by
        2 cells; ``ndim=2`` flattens z."""
        if not hasattr(cell_size, "__len__"):
            cell_size = (float(cell_size),) * 3
        (x0, y0, z0), (x1, y1, z1) = bb
        dims = [
            int(math.ceil((hi - lo) / s)) + 4
            for lo, hi, s in zip((x0, y0, z0), (x1, y1, z1), cell_size)
        ]
        origin = [lo - 2 * s for lo, s in zip((x0, y0, z0), cell_size)]
        if ndim == 2:
            dims[2] = 1
            origin[2] = 0.0
        return cls(
            origin=tuple(origin),
            spacing=tuple(float(s) for s in cell_size),
            dims=tuple(dims),
            bearing=bearing,
        )

    @classmethod
    def from_bb_schema(cls, bb, schema: str, ndim: int = 3):
        """Parse a ``"size;offset;bearing"`` schema string
        (``from_bb_schema``, ``pd_vtk.py:609-642``): fields split on
        ``;``/``~``, components on ``,``/``_``.  When the bearing is
        omitted we default to 90 (axis-aligned) — the reference defaults
        to 0 and then rotates the grid 90°, which misplaces it relative
        to the bounding box (upstream quirk, not reproduced)."""
        parts = re.split("[;~]", schema)
        cell_size = [float(v) for v in re.split("[,_]", parts[0])]
        while len(cell_size) < 3:
            cell_size.append(cell_size[-1])
        offset = [0.0, 0.0, 0.0]
        if len(parts) > 1 and parts[1]:
            offset = [float(v) for v in re.split("[,_]", parts[1])]
            while len(offset) < 3:
                offset.append(offset[-1])
        bearing = float(parts[2]) if len(parts) > 2 and parts[2] else 90.0

        (x0, y0, z0), (x1, y1, z1) = bb
        lo = [x0 + cell_size[0] * offset[0], y0 + cell_size[1] * offset[1], z0 + cell_size[2] * offset[2]]
        hi = [x1 + cell_size[0] * offset[0], y1 + cell_size[1] * offset[1], z1 + cell_size[2] * offset[2]]
        gs = cls.from_bb([lo, hi], cell_size, ndim, bearing)
        return replace(gs, rot_origin=(x0, y0, z0))

    def world_xy(self, lx: Column, ly: Column) -> tuple[Column, Column]:
        """Rotate local (axis-aligned) centroids into world coordinates:
        translate-rotate-translate about ``rot_origin``
        (``mesh_rotate_0261``, ``pd_vtk.py:500-520``)."""
        if not self.rotated:
            return lx, ly
        rx, ry = (self.rot_origin or self.origin)[:2]
        cos_t, sin_t = math.cos(self.theta), math.sin(self.theta)
        wx = F.lit(rx) + F.lit(cos_t) * (lx - rx) - F.lit(sin_t) * (ly - ry)
        wy = F.lit(ry) + F.lit(sin_t) * (lx - rx) + F.lit(cos_t) * (ly - ry)
        return wx, wy

    def inverse_xy(self, wx: Column, wy: Column) -> tuple[Column, Column]:
        """World -> local (for nearest-cell assignment on rotated grids)."""
        if not self.rotated:
            return wx, wy
        rx, ry = (self.rot_origin or self.origin)[:2]
        cos_t, sin_t = math.cos(self.theta), math.sin(self.theta)
        lx = F.lit(rx) + F.lit(cos_t) * (wx - rx) + F.lit(sin_t) * (wy - ry)
        ly = F.lit(ry) - F.lit(sin_t) * (wx - rx) + F.lit(cos_t) * (wy - ry)
        return lx, ly


def grid_df(
    spark: SparkSession,
    gs: GridSchema,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate the cell table ``(cell, i, j, k, x, y, z, dx, dy, dz,
    volume)`` for a grid schema — the Spark replacement for
    ``vtk_mesh_to_df(vtk_Voxel(...))`` (``pd_vtk.py:375-433``).

    Entirely lazy column arithmetic over ``spark.range``; partition count
    scales with the cell count so the same code covers a 12k-cell sample
    and a 10^11-cell model."""
    nx, ny, nz = gs.dims
    ox, oy, oz = gs.origin
    dx, dy, dz = gs.spacing
    n = gs.n_cells
    if num_partitions is None:
        # two-sided scaling: big grids split at _CELLS_PER_PARTITION so
        # partition count tracks cell count, but small grids must still
        # FAN OUT — n // 4M pins anything under 4M cells to ONE task, and
        # a heavy per-cell kernel downstream (supersampled clipping,
        # parity ray-casts) then runs serially however many cores the
        # cluster has.  Floor at defaultParallelism (capped so tiny grids
        # don't schedule empty tasks).
        par = spark.sparkContext.defaultParallelism
        by_size = n // _CELLS_PER_PARTITION
        by_cores = min(par, -(-n // _MIN_CELLS_PER_PARTITION))
        num_partitions = max(1, min(100_000, max(by_size, by_cores)))
    df = spark.range(0, n, 1, num_partitions)
    i = (F.col("id") % nx).cast("int")
    j = ((F.col("id") / nx).cast("long") % ny).cast("int")
    k = (F.col("id") / (nx * ny)).cast("int")
    lx = F.lit(ox) + (i + F.lit(0.5)) * dx
    ly = F.lit(oy) + (j + F.lit(0.5)) * dy
    lz = F.lit(oz) + (k + F.lit(0.5)) * dz
    wx, wy = gs.world_xy(lx, ly)
    return df.select(
        F.col("id").alias("cell"),
        i.alias("i"),
        j.alias("j"),
        k.alias("k"),
        wx.alias("x"),
        wy.alias("y"),
        lz.alias("z"),
        F.lit(dx).alias("dx"),
        F.lit(dy).alias("dy"),
        F.lit(dz).alias("dz"),
        F.lit(dx * dy * dz).alias("volume"),
    )


def flag_ijk(df: DataFrame, flag_var: str = "vtk_ijk") -> DataFrame:
    """Packed integer cell index ``i + j*1e3 + k*1e6``
    (``vtk_grid_flag_ijk``, ``pd_vtk.py:1151-1176``)."""
    return df.withColumn(
        flag_var,
        (F.col("i") + F.col("j") * 1_000 + F.col("k") * 1_000_000).cast("long"),
    )


def nearest_cell(
    points: DataFrame, gs: GridSchema, grid: DataFrame | None = None
) -> DataFrame:
    """Snap scattered points to their containing cell — the Spark
    replacement for the per-point ``find_closest_cell`` loop
    (``add_arrays_from_df``, ``pd_vtk.py:671-702``).

    For an axis-aligned (or inverse-rotated) grid the containing cell is
    the inverse affine ``i = floor((x-ox)/dx)`` — an exact O(1) expression
    per point, no KD-tree, no shuffle.  Points outside the grid get NULL
    indices (the reference marks unmatched cells -1).  If ``grid`` is
    given, equi-joins the points onto it by (i,j,k)."""
    ox, oy, oz = gs.origin
    dx, dy, dz = gs.spacing
    nx, ny, nz = gs.dims
    lx, ly = gs.inverse_xy(F.col("x"), F.col("y"))
    i = F.floor((lx - ox) / dx).cast("int")
    j = F.floor((ly - oy) / dy).cast("int")
    k = F.floor((F.col("z") - oz) / dz).cast("int")
    in_grid = (
        (i >= 0) & (i < nx) & (j >= 0) & (j < ny) & (k >= 0) & (k < nz)
    )
    pts = points.withColumns(
        {
            "i": F.when(in_grid, i),
            "j": F.when(in_grid, j),
            "k": F.when(in_grid, k),
        }
    )
    if grid is None:
        return pts
    return pts.join(grid, ["i", "j", "k"], "left")


def heatmap2d(
    grid: DataFrame, value: str, axis: int = 2, op: str | None = None
) -> DataFrame:
    """Reduce the grid along one axis — ``heatmap2d``
    (``pd_vtk.py:876-895``) as a groupBy over the remaining two indices.

    ``op='mean'`` divides by the axis span PRESENT in the input
    (max-min+1 of the group's plane indices — on a dense grid that IS
    the full axis length) and yields NULL if any present cell is null
    (parity with ``np.add.reduce`` NaN propagation).  On a filtered /
    sparse grid the mean therefore averages over the covered span, not
    the original axis — pre-fill dropped planes with NULL rows if
    whole-axis semantics are needed.  ``op='major'`` is the
    most-frequent value (deterministic smallest-value tie-break)."""
    names = ["i", "j", "k"]
    keep = [names[a] for a in range(3) if a != axis]
    axis_name = names[axis]
    if op is None:
        op = "major" if dict(grid.dtypes).get(value) == "string" else "mean"
    if op == "mean":
        from vtk_reserves_spark.functions.aggregates import nn

        c = nn(F.col(value))
        size = F.max(F.col(axis_name)) - F.min(F.col(axis_name)) + 1
        out = grid.groupBy(*keep).agg(
            F.when(F.count(c) == size, F.sum(c) / size).alias(value)
        )
        return out
    if op == "major":
        from pyspark.sql import Window

        cnt = (
            grid.where(F.col(value).isNotNull())
            .groupBy(*keep, F.col(value).alias("__val"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        w = Window.partitionBy(*keep).orderBy(
            F.col("__cnt").desc(), F.col("__val").asc()
        )
        return (
            cnt.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .select(*keep, F.col("__val").alias(value))
        )
    # any numpy reduction by name (reference eval('np.'+op), pd_vtk.py:893)
    fn = {"sum": F.sum, "min": F.min, "max": F.max}.get(op)
    if fn is None:
        raise ValueError(f"unsupported heatmap2d op: {op!r}")
    return grid.groupBy(*keep).agg(fn(F.col(value)).alias(value))


def detect_cell_size(df: DataFrame, xyz=("x", "y", "z")) -> tuple[float, ...]:
    """Auto-detect cell size from a block-model table
    (``pd_detect_cell_size``, ``pd_vtk.py:179-200``): prefer explicit
    ``xlength/ylength/zlength`` columns (min positive), else the minimum
    positive delta between consecutive sorted distinct coordinates."""
    cols = set(df.columns)
    if {"xlength", "ylength", "zlength"}.issubset(cols):
        row = df.select(
            F.min("xlength").alias("dx"),
            F.min("ylength").alias("dy"),
            F.min("zlength").alias("dz"),
        ).first()
        if row and all(v is not None and v > 0 for v in row):
            return (row["dx"], row["dy"], row["dz"])
    out = []
    for c in xyz:
        from pyspark.sql import Window

        dv = df.select(F.col(c).alias("v")).where(F.col(c).isNotNull()).distinct()
        # the lag() below uses a GLOBAL Window.orderBy — one task sorts
        # every distinct coordinate.  Fine for a block model (distinct
        # coords per axis = grid dims, thousands at most), but scattered
        # continuous data barely deduplicates and would funnel the whole
        # axis into one task; refuse with guidance instead of stalling
        n_distinct = dv.limit(1_000_001).count()
        if n_distinct > 1_000_000:
            raise ValueError(
                f"detect_cell_size: column {c!r} has over 1e6 distinct "
                "values — this is scattered/continuous data, not a "
                "regular block model; pass cell_size explicitly"
            )
        d = (
            dv
            .withColumn("pv", F.lag("v").over(Window.orderBy("v")))
            .select(F.min(F.when(F.col("v") != F.col("pv"), F.col("v") - F.col("pv"))).alias("d"))
            .first()
        )
        out.append(float(d["d"]) if d and d["d"] is not None else float("nan"))
    return tuple(out)


def detect_xyz(columns) -> list[str] | None:
    """Coordinate-triplet detection (``pd_detect_xyz``,
    ``_gui.py:310-328``): known triplets tried in lower/upper/capitalized
    forms; falls back to xy-only pairs."""
    cset = set(columns)
    triplets = [
        ["x", "y", "z"],
        ["midx", "midy", "midz"],
        ["mid_x", "mid_y", "mid_z"],
        ["xworld", "yworld", "zworld"],
        ["xcentre", "ycentre", "zcentre"],
        ["centroid_x", "centroid_y", "centroid_z"],
        ["xc", "yc", "zc"],
        ["leste", "norte", "cota"],
    ]
    for with_z in (True, False):
        for s in triplets:
            cand = s if with_z else s[:2]
            for conv in (str.lower, str.upper, str.capitalize):
                cs = [conv(v) for v in cand]
                if cset.issuperset(cs):
                    return cs
    return None


def concat_blocks(dfs: list[DataFrame], block_col: str = "block") -> DataFrame:
    """Multiblock concat (``vtk_mesh_to_df`` multiblock path,
    ``pd_vtk.py:405-418``): union the per-block tables with a block-id
    column; missing columns null-fill (``unionByName`` with
    allowMissingColumns, the Spark analogue of pandas concat)."""
    out = None
    for i, df in enumerate(dfs):
        tagged = df.withColumn(block_col, F.lit(i))
        out = tagged if out is None else out.unionByName(
            tagged, allowMissingColumns=True
        )
    if out is None:
        raise ValueError("concat_blocks: no inputs")
    return out


def grid_from_datamine(df: DataFrame) -> GridSchema:
    """Grid schema from a Datamine-style block model table
    (``vtk_dmbm_to_ug``, ``pd_vtk.py:287-315``): the first row's
    ``XMORIG/YMORIG/ZMORIG`` (grid corner), ``XINC/YINC/ZINC`` (cell
    size) and ``NX/NY/NZ`` (cell counts) describe the frame; cells are
    then loaded with :func:`nearest_cell`."""
    cols = {c.upper(): c for c in df.columns}
    need = ["XMORIG", "YMORIG", "ZMORIG", "XINC", "YINC", "ZINC", "NX", "NY", "NZ"]
    missing = [n for n in need if n not in cols]
    if missing:
        raise ValueError(f"not a Datamine block model: missing {missing}")
    row = df.select(*[F.first(cols[n]).alias(n) for n in need]).first()
    return GridSchema(
        origin=(float(row["XMORIG"]), float(row["YMORIG"]), float(row["ZMORIG"])),
        spacing=(float(row["XINC"]), float(row["YINC"]), float(row["ZINC"])),
        dims=(int(row["NX"]), int(row["NY"]), int(row["NZ"])),
    )


def _convex_hull_2d(pts):
    """Andrew monotone-chain convex hull (numpy, driver/partition-side).
    Returns hull vertices in CCW order."""
    import numpy as np

    pts = np.unique(np.asarray(pts, dtype=np.float64).reshape(-1, 2), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort (np.unique already sorts rows)
    def half(points):
        out: list = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    import numpy as np

    return np.array(lower[:-1] + upper[:-1])


def minimum_rotated_rectangle(xy):
    """Minimum-area rotated rectangle via rotating calipers over the
    convex hull: for each hull edge direction, rotate the hull into that
    frame and take the bbox; the smallest-area frame wins.

    Returns ``(corner, (w, h), theta)``: one rectangle corner, side
    lengths, and the CCW angle of the w-side — the pure-numpy stand-in
    for shapely's ``minimum_rotated_rectangle``
    (``_gui.py:1346-1362``)."""
    import numpy as np

    hull = _convex_hull_2d(xy)
    if len(hull) == 0:
        raise ValueError("minimum_rotated_rectangle: no points to fit")
    if len(hull) == 1:
        return hull[0], (0.0, 0.0), 0.0
    best = None
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    for ex, ey in edges:
        theta = math.atan2(ey, ex)
        c, s = math.cos(-theta), math.sin(-theta)
        rx = hull[:, 0] * c - hull[:, 1] * s
        ry = hull[:, 0] * s + hull[:, 1] * c
        w = rx.max() - rx.min()
        h = ry.max() - ry.min()
        if best is None or w * h < best[0]:
            lo = np.array([rx.min(), ry.min()])
            corner = np.array(
                [lo[0] * math.cos(theta) - lo[1] * math.sin(theta),
                 lo[0] * math.sin(theta) + lo[1] * math.cos(theta)]
            )
            best = (w * h, corner, (float(w), float(h)), theta)
    _, corner, wh, theta = best
    return corner, wh, theta


def grid_from_rr(
    df: DataFrame, cell_size, xy=("x", "y"), z_range=(0.0, 0.0), pad: int = 0
) -> GridSchema:
    """Fit a ROTATED grid over scattered xy data (``from_rr``,
    ``pd_vtk.py:705-724`` + ``getRectangleSchema``, ``_gui.py:1364-1401``)
    without shapely: per-partition convex hulls (mapInPandas) collapse
    the distributed point set to a few dozen hull candidates, the final
    hull + rotating calipers run on the driver.  Only hull points ever
    leave the executors, so this scales to any table size.

    Reference parity means ZERO margin: when an extent is an exact
    cell-size multiple, points lying ON the rectangle's far edges fall
    just outside the last cell (``nearest_cell`` maps them to NULL).
    Pass ``pad=1`` to add a one-cell margin on each rotated axis when
    the grid must cover every input point inclusively."""
    import pandas as pd

    def part_hull(it):
        for pdf in it:
            if len(pdf):
                h = _convex_hull_2d(pdf.to_numpy())
                yield pd.DataFrame(h, columns=list(xy))

    pts = (
        df.select(*xy)
        .dropna()
        .mapInPandas(part_hull, schema=f"{xy[0]} double, {xy[1]} double")
        .collect()
    )
    import numpy as np

    corner, (w, h), theta = minimum_rotated_rectangle(
        np.array([[r[0], r[1]] for r in pts])
    )
    if not hasattr(cell_size, "__len__"):
        cell_size = (float(cell_size),) * 3
    z0, z1 = z_range
    # epsilon-guarded ceil: hull arithmetic can inflate an exact multiple
    # by float noise, which would add a whole spurious cell layer
    dims = (
        max(1, int(math.ceil(w / cell_size[0] - 1e-9)) + 2 * pad),
        max(1, int(math.ceil(h / cell_size[1] - 1e-9)) + 2 * pad),
        max(1, int(math.ceil((z1 - z0) / cell_size[2] - 1e-9))) if z1 > z0 else 1,
    )
    bearing = 90.0 - math.degrees(theta)  # GridSchema.theta inverse
    if pad:
        # shift the origin back along BOTH rotated axes so the padded
        # cells wrap the rectangle symmetrically
        import numpy as _np

        shift = -pad * _np.array(
            [cell_size[0] * math.cos(theta) - cell_size[1] * math.sin(theta),
             cell_size[0] * math.sin(theta) + cell_size[1] * math.cos(theta)]
        )
        corner = corner + shift
    return GridSchema(
        origin=(float(corner[0]), float(corner[1]), float(z0)),
        spacing=tuple(float(s) for s in cell_size),
        dims=dims,
        bearing=bearing,
        rot_origin=(float(corner[0]), float(corner[1]), float(z0)),
    )


def grid_from_df_schema(df: DataFrame, cell_size=None, xyz=None) -> GridSchema:
    """Fit a grid over a scattered block table (``from_df``,
    ``pd_vtk.py:650-669``): dims = ceil(extent/size)+2 buffer cells,
    origin = min - size/2."""
    if xyz is None:
        xyz = detect_xyz(df.columns) or ["x", "y", "z"]
    if cell_size is None:
        cell_size = detect_cell_size(df, xyz)
        for axis, sz in zip(xyz, cell_size):
            if math.isnan(sz):
                raise ValueError(
                    f"cell size undetectable for axis {axis!r} (fewer than "
                    "two distinct coordinates) — pass cell_size explicitly"
                )
    row = df.select(
        *[F.min(c).alias(f"lo{i}") for i, c in enumerate(xyz)],
        *[F.max(c).alias(f"hi{i}") for i, c in enumerate(xyz)],
    ).first()
    lo = [row[f"lo{i}"] for i in range(len(xyz))]
    hi = [row[f"hi{i}"] for i in range(len(xyz))]
    dims = [
        max(1, int(math.ceil((h - l) / s)) + 2)
        for l, h, s in zip(lo, hi, cell_size)
    ]
    origin = [l - 0.5 * s for l, s in zip(lo, cell_size)]
    return GridSchema(origin=tuple(origin), spacing=tuple(cell_size), dims=tuple(dims))


def reblock(
    df: DataFrame,
    factors=(2, 2, 2),
    value_cols: list[str] | None = None,
    weight_col: str = "volume",
    sum_cols: list[str] | None = None,
    major_cols: list[str] | None = None,
    ijk=("i", "j", "k"),
) -> DataFrame:
    """Reblock a block model to coarser cells — the standard mining
    resample (the reference reblocks implicitly via ``from_df`` grid
    re-fitting + breakdown, ``pd_vtk.py:650-669`` + ``bm_breakdown``;
    this is the direct operator).

    Each output block aggregates the ``fx·fy·fz`` fine blocks sharing
    ``(i//fx, j//fy, k//fz)``:

    - ``value_cols`` (grades): weighted mean by ``weight_col`` (mass or
      volume weighting per standard resource practice);
    - ``sum_cols`` (volume, mass, tonnes): plain sums;
    - ``major_cols`` (lithology): majority vote by total weight, ties
      broken by the smaller value for determinism.

    ONE shuffle (the groupBy); the majority vote joins back keyed.  Scale
    note: output cardinality shrinks by the factor product, so the
    aggregation is map-side-combine friendly — reblocking 100 TB to 8x
    coarser writes ~12 TB."""
    fx, fy, fz = factors
    value_cols = value_cols or []
    sum_cols = sum_cols or []
    major_cols = major_cols or []
    ci, cj, ck = (F.col(c) for c in ijk)
    keyed = df.withColumns(
        {
            "ri": F.floor(ci / fx).cast("int"),
            "rj": F.floor(cj / fy).cast("int"),
            "rk": F.floor(ck / fz).cast("int"),
        }
    )
    w = F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
    aggs = [F.count(F.lit(1)).alias("n_fine")]
    for c in sum_cols:
        aggs.append(F.sum(F.col(c)).alias(c))
    for c in value_cols:
        num = F.sum(F.when(F.col(c).isNotNull(), w * F.col(c)))
        den = F.sum(F.when(F.col(c).isNotNull(), w))
        aggs.append(F.when(den != 0, num / den).alias(c))
    out = keyed.groupBy("ri", "rj", "rk").agg(*aggs)
    for c in major_cols:
        per_val = keyed.groupBy("ri", "rj", "rk", c).agg(F.sum(w).alias("_w"))
        from pyspark.sql import Window

        win = Window.partitionBy("ri", "rj", "rk").orderBy(
            F.col("_w").desc(), F.col(c).asc()
        )
        top = (
            per_val.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("ri", "rj", "rk", c)
        )
        out = out.join(top, ["ri", "rj", "rk"], "left")
    return out
