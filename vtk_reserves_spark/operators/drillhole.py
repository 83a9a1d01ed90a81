"""Drillhole operators: interval compositing and desurvey.

The reference's tabular layer is built for drillhole data — its synonym
LUT maps ``hid/hole/furo``, ``from/de``, ``to/ate``, ``depth/prof``,
``azimuth``, ``dip`` (``_gui.py:278-308``; mirrored in
`sources/loaders.SYNONYM_LUT`) and its LAS reader ingests well logs —
but the processing ops live in sibling tools.  These are the two every
resource workflow needs, Spark-native:

- :func:`composite_intervals` — regularize variable-length assay
  intervals to fixed composites with length-weighted grades (the
  "compositing" step before any block interpolation);
- :func:`desurvey_tangent` — hole trajectories from downhole survey
  stations (azimuth/dip per depth) by the tangent method: each segment
  extends in the direction measured at its top station.

Scale shape: both are ONE hash partitioning by hole id.  Compositing
explodes each interval only into the composite bins it overlaps
(bounded fan-out = interval_len/comp_len + 1, the `operators/asof.py`
range-join device); desurvey is a keyed window cumsum.  No global
windows, no crossJoins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def composite_intervals(
    df: DataFrame,
    hole_col: str = "hid",
    from_col: str = "from",
    to_col: str = "to",
    value_cols: list[str] | None = None,
    comp_len: float = 10.0,
) -> DataFrame:
    """Fixed-length downhole composites with length-weighted grades.

    Composite ``b`` of a hole covers ``[b·L, (b+1)·L)``.  Every source
    interval contributes its overlap length as weight; composites report
    ``length`` (total covered meters — < L at gaps and hole ends) and
    the weighted mean of each value column over its non-null intervals.
    """
    value_cols = value_cols or []
    lo = F.col(from_col).cast("double")
    hi = F.col(to_col).cast("double")
    b = F.explode(
        F.sequence(
            F.floor(lo / comp_len).cast("long"),
            F.ceil(hi / comp_len).cast("long") - 1,
        )
    ).alias("comp")
    seg = df.where(hi > lo).select(hole_col, lo.alias("_lo"), hi.alias("_hi"), b, *value_cols)
    ov = F.least(F.col("_hi"), (F.col("comp") + 1) * comp_len) - F.greatest(
        F.col("_lo"), F.col("comp") * comp_len
    )
    seg = seg.withColumn("_ov", ov).where(F.col("_ov") > 0)
    aggs = [F.sum("_ov").alias("length")]
    for c in value_cols:
        w = F.when(F.col(c).isNotNull(), F.col("_ov"))
        num = F.sum(w * F.col(c))
        den = F.sum(w)
        aggs.append(F.when(den != 0, num / den).alias(c))
    return (
        seg.groupBy(hole_col, "comp")
        .agg(*aggs)
        .withColumn("from", F.col("comp") * comp_len)
        .withColumn("to", (F.col("comp") + 1) * comp_len)
    )


def desurvey_tangent(
    df: DataFrame,
    hole_col: str = "hid",
    depth_col: str = "depth",
    azm_col: str = "azimuth",
    dip_col: str = "dip",
) -> DataFrame:
    """Station coordinates by the tangent method.

    Input: survey stations ``(hole, depth, azimuth, dip)`` — azimuth in
    degrees clockwise from north, dip in degrees POSITIVE DOWN (mining
    convention).  Each segment between consecutive stations extends in
    the direction measured at its TOP station; station 0 sits at the
    local origin (join collars afterwards to place holes in world
    coordinates).  Output adds ``x, y, z`` offsets (y = north,
    z negative down).

    One keyed window (lag + running sum over depth order per hole)."""
    w = Window.partitionBy(hole_col).orderBy(F.col(depth_col).asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = F.col(depth_col).cast("double")
    seg_len = d - F.coalesce(F.lag(d).over(w), F.lit(0.0))
    # direction at the TOP station of the segment = previous row's angles
    # (the first segment from the collar uses the first station's angles)
    azm = F.radians(F.coalesce(F.lag(azm_col).over(w), F.col(azm_col)).cast("double"))
    dip = F.radians(F.coalesce(F.lag(dip_col).over(w), F.col(dip_col)).cast("double"))
    dx = seg_len * F.cos(dip) * F.sin(azm)
    dy = seg_len * F.cos(dip) * F.cos(azm)
    dz = -seg_len * F.sin(dip)
    return (
        df.withColumn("_dx", dx)
        .withColumn("_dy", dy)
        .withColumn("_dz", dz)
        .withColumn("x", F.sum("_dx").over(cum))
        .withColumn("y", F.sum("_dy").over(cum))
        .withColumn("z", F.sum("_dz").over(cum))
        .drop("_dx", "_dy", "_dz")
    )


def desurvey_minimum_curvature(
    df: DataFrame,
    hole_col: str = "hid",
    depth_col: str = "depth",
    azm_col: str = "azimuth",
    dip_col: str = "dip",
    straight_tol: float = 1e-9,
) -> DataFrame:
    """Station coordinates by the minimum-curvature method (the industry
    standard the tangent method approximates; see ISCWSA/API wellbore
    survey references).

    Each segment between consecutive stations is modeled as a circular
    arc fitted to the direction vectors at BOTH ends: with dogleg angle
    ``DL = acos(t1 . t2)`` the chord displacement is the average of the
    two unit tangents scaled by the ratio factor
    ``RF = (2 / DL) * tan(DL / 2)`` (``RF -> 1`` as ``DL -> 0``; segments
    straighter than ``straight_tol`` radians use 1 exactly, which also
    makes the result collapse to the balanced-tangential answer on
    straight holes).  Conventions match :func:`desurvey_tangent`:
    azimuth degrees clockwise from north, dip degrees positive down,
    station 0 at the local origin, ``z`` negative down.

    Same scale shape as the tangent method: ONE keyed window (lag +
    running sum per hole) — entirely Catalyst expressions, no Python."""
    w = Window.partitionBy(hole_col).orderBy(F.col(depth_col).asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = F.col(depth_col).cast("double")
    seg_len = d - F.coalesce(F.lag(d).over(w), F.lit(0.0))
    a2 = F.radians(F.col(azm_col).cast("double"))
    p2 = F.radians(F.col(dip_col).cast("double"))
    # the first segment (from the collar) has no upper station: reuse the
    # first station's angles at both ends => DL = 0, a straight segment,
    # identical to the tangent method's first-segment convention
    a1 = F.coalesce(F.radians(F.lag(azm_col).over(w).cast("double")), a2)
    p1 = F.coalesce(F.radians(F.lag(dip_col).over(w).cast("double")), p2)
    # dot product of the two unit tangents, clamped for acos stability
    dot = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(-1.0),
            F.cos(p1) * F.cos(p2) * F.cos(a2 - a1) + F.sin(p1) * F.sin(p2),
        ),
    )
    dl = F.acos(dot)
    rf = F.when(dl > straight_tol, (2.0 / dl) * F.tan(dl / 2.0)).otherwise(F.lit(1.0))
    half = seg_len / 2.0 * rf
    dx = half * (F.cos(p1) * F.sin(a1) + F.cos(p2) * F.sin(a2))
    dy = half * (F.cos(p1) * F.cos(a1) + F.cos(p2) * F.cos(a2))
    dz = -half * (F.sin(p1) + F.sin(p2))
    return (
        df.withColumn("_dx", dx)
        .withColumn("_dy", dy)
        .withColumn("_dz", dz)
        .withColumn("dogleg", F.degrees(dl))
        .withColumn("x", F.sum("_dx").over(cum))
        .withColumn("y", F.sum("_dy").over(cum))
        .withColumn("z", F.sum("_dz").over(cum))
        .drop("_dx", "_dy", "_dz")
    )


def locate_composites(
    composites: DataFrame,
    surveys: DataFrame,
    collars: DataFrame | None = None,
    hole_col: str = "hid",
    depth_col: str = "depth",
    azm_col: str = "azimuth",
    dip_col: str = "dip",
    method: str = "tangent",
) -> DataFrame:
    """Place downhole composites in 3-D: desurvey the survey stations
    (``method``: ``"tangent"`` or ``"mincurve"`` for minimum curvature),
    as-of join each composite's midpoint depth to the last station at or
    above it, and extend from that station along its measured direction
    (the within-segment extension is tangential in both methods — the
    standard convention, since the next station's direction is unknown
    at the midpoint).  ``collars`` optionally supplies world coordinates
    ``(hole, x, y, z)``; without it holes hang from local origin.

    Composition of existing operators: the chosen desurvey (keyed
    window cumsum) + the as-of device from `operators/asof.py` (union +
    keyed window, ONE shuffle) — nothing new to scale."""
    if method not in ("tangent", "mincurve"):
        raise ValueError(f"unknown desurvey method {method!r}")
    desurvey = desurvey_tangent if method == "tangent" else desurvey_minimum_curvature
    st = desurvey(surveys, hole_col, depth_col, azm_col, dip_col)
    if method == "mincurve":
        st = st.drop("dogleg")
    mid = (F.col("from") + F.col("to")) / 2.0
    comp = composites.withColumn("_mid", mid)
    # as-of: last station with depth <= mid, via union + last() window.
    # (hole, comp) is the composites' natural key — no synthetic row ids
    # (monotonically_increasing_id across two plan branches would not be
    # stable).  Deliberately inline rather than delegating to
    # operators/asof.asof_join: this path also needs the collar
    # first-station fallback woven into the same window pass, and its
    # payload already travels as one struct (the atomic-carry device
    # asof_join now shares) — keep the two in sync if either changes.
    st_side = st.select(
        F.col(hole_col).alias("_h"),
        F.col(depth_col).alias("_at"),
        F.lit(None).cast("long").alias("_comp"),
        F.struct(
            F.col(depth_col).alias("d"), "x", "y", "z",
            F.col(azm_col).alias("az"), F.col(dip_col).alias("dp"),
        ).alias("_st"),
    )
    c_side = comp.select(
        F.col(hole_col).alias("_h"),
        F.col("_mid").alias("_at"),
        F.col("comp").cast("long").alias("_comp"),
        F.lit(None).cast(st_side.schema["_st"].dataType).alias("_st"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_h")
        # stations sort before composites at equal depth (_comp NULL first)
        .orderBy(F.col("_at").asc(), F.col("_comp").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("_h")
        .orderBy(F.col("_at").asc(), F.col("_comp").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    first_st = F.first("_st", ignorenulls=True).over(w_full)
    # composites shallower than the first station have no as-of match:
    # extend from the collar (local origin, depth 0) along the FIRST
    # station's direction — without this fallback struct the NULL
    # angles would null the whole coordinate and near-collar assays
    # silently vanish from downstream estimation joins
    collar_st = F.struct(
        F.lit(0.0).alias("d"),
        F.lit(0.0).alias("x"),
        F.lit(0.0).alias("y"),
        F.lit(0.0).alias("z"),
        first_st["az"].alias("az"),
        first_st["dp"].alias("dp"),
    )
    tagged = (
        st_side.unionByName(c_side)
        .withColumn(
            "_last",
            F.coalesce(F.last("_st", ignorenulls=True).over(w), collar_st),
        )
        .where(F.col("_comp").isNotNull())
    )
    joined = comp.join(
        tagged.select("_h", "_comp", "_last"),
        (F.col(hole_col) == F.col("_h")) & (F.col("comp") == F.col("_comp")),
    )
    # extend along the last station's direction; composites above the
    # first station (no _last) extend from the collar along the FIRST
    # station's direction -- approximate by clamping to depth 0 direction
    s = F.col("_last")
    seg = F.col("_mid") - F.coalesce(s["d"], F.lit(0.0))
    az = F.radians(s["az"])
    dp = F.radians(s["dp"])
    lx = F.coalesce(s["x"], F.lit(0.0)) + seg * F.cos(dp) * F.sin(az)
    ly = F.coalesce(s["y"], F.lit(0.0)) + seg * F.cos(dp) * F.cos(az)
    lz = F.coalesce(s["z"], F.lit(0.0)) - seg * F.sin(dp)
    out = joined.select(
        hole_col, "comp", "from", "to", "_mid",
        lx.alias("_lx"), ly.alias("_ly"), lz.alias("_lz"),
        *[c for c in composites.columns if c not in (hole_col, "comp", "from", "to")],
    )
    if collars is not None:
        col = collars.select(
            F.col(hole_col),
            F.col("x").alias("_cx"), F.col("y").alias("_cy"), F.col("z").alias("_cz"),
        )
        out = out.join(F.broadcast(col), hole_col, "left").select(
            *[c for c in out.columns if c not in ("_lx", "_ly", "_lz", "_cx", "_cy", "_cz")],
            (F.coalesce("_cx", F.lit(0.0)) + F.col("_lx")).alias("x"),
            (F.coalesce("_cy", F.lit(0.0)) + F.col("_ly")).alias("y"),
            (F.coalesce("_cz", F.lit(0.0)) + F.col("_lz")).alias("z"),
        )
    else:
        out = out.select(
            *[c for c in out.columns if c not in ("_lx", "_ly", "_lz")],
            F.col("_lx").alias("x"), F.col("_ly").alias("y"), F.col("_lz").alias("z"),
        )
    return out.drop("_mid")
