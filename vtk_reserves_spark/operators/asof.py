"""As-of (temporal) join — a custom operator Spark SQL lacks.

No reference counterpart (the reference has no time axis at all,
SURVEY.md §1.4/§2.7); this is a north-star addition for event-time
enrichment at pipeline scale.  Semantics match DuckDB/pandas
``merge_asof``: for every left row, attach the single most recent right
row whose time is <= the left time (``backward``; ``forward`` takes the
earliest right row >= left time), optionally per grouping key and
bounded by a tolerance.

Design for 100 TB — why not a range join: an inequality join
(`l.ts >= r.ts`) explodes to O(|L|·|R|) candidate pairs per key before
picking the max, and Spark plans it as BroadcastNestedLoop unless
heavily hinted.  Instead we UNION the two sides (right rows carry their
payload, left rows carry nulls), hash-partition by the join key, sort
each partition by event time, and let a running ``last(payload,
ignorenulls=True)`` window carry the latest right payload forward into
every left row.  Exactly ONE shuffle (the window's partitionBy) — the
same cost as a plain equi-join on the key — with per-partition sorted
streaming and no candidate-pair blowup.  Skewed keys degrade to one
sorted partition per hot key, the floor for any order-dependent
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_time_flavor(cols) -> None:
    """Reject mixed TimestampType/TimestampNTZType across the time
    columns of a temporal operator: union/comparison coercion would
    silently shift ONE side by the session timezone.  ``cols`` is an
    iterable of (DataFrame, column_name)."""
    from pyspark.sql import types as T

    flavors = {
        type(df.schema[c].dataType).__name__
        for df, c in cols
        if isinstance(df.schema[c].dataType, (T.TimestampType, T.TimestampNTZType))
    }
    if len(flavors) > 1:
        raise ValueError(
            f"mixed TimestampType/TimestampNTZType across time columns "
            f"{sorted(flavors)}; normalize both sides first "
            "(e.g. cast to timestamp or timestamp_ntz)"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Left as-of join.  ``right``'s non-key columns must not collide
    with ``left``'s (rename before calling).  ``tolerance`` is a Column
    or literal (e.g. ``F.expr("INTERVAL 1 HOUR")``) — matches farther
    than that from the left time are nulled out, like pandas
    ``merge_asof(tolerance=...)``."""
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c not in by and c != on]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    reserved = {"_t", "_side", "_rt", "_pay"} & (
        set(left.columns) | set(right.columns)
    )
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with asof_join's "
            "internal names; rename them first"
        )
    _check_time_flavor([(left, on), (right, on)])

    # a right row with a NULL event time can never be the "most recent"
    # match — without this filter it would sort NULLS-FIRST and its
    # payload would leak into left rows that have no real match
    right = right.where(F.col(on).isNotNull())

    # the payload travels as ONE struct so the match is atomic: carrying
    # each column independently with last(ignorenulls) would stitch
    # NULL fields of the matched row from OLDER rows (a chimera row
    # that merge_asof semantics forbid)
    pay_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
        + [T.StructField("_rt", right.schema[on].dataType)]
    )
    lcols = [c for c in left.columns if c not in by and c != on]
    l2 = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *lcols,
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    r2 = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            *[F.col(c) for c in payload], F.col(on).alias("_rt")
        ).alias("_pay"),
    )
    unioned = l2.unionByName(r2)

    # backward: ascending time, right (side 0) sorts before left at equal
    # timestamps so an exactly-simultaneous right row matches (<=);
    # forward: descending time, same tie rule gives the earliest >= row.
    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t_ord, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *by,
        "_t",
        "_side",
        *lcols,
        F.last("_pay", ignorenulls=True).over(w).alias("_pay"),
    )
    out = filled.filter(F.col("_side") == 1)
    # a left row with a NULL event time has no as-of position at all —
    # null its match rather than letting it absorb whatever carry its
    # NULLS-FIRST/LAST sort position happened to see
    pay = F.when(F.col("_t").isNotNull(), F.col("_pay"))
    if tolerance is not None:
        rt = pay["_rt"]
        gap = (
            F.col("_t") - rt if direction == "backward" else rt - F.col("_t")
        )
        pay = F.when(rt.isNotNull() & (gap <= tolerance), pay)
    out = out.select(
        *by,
        "_t",
        *lcols,
        *[pay[c].alias(c) for c in payload],
    )
    return out.withColumnRenamed("_t", on)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    lo: str,
    hi: str,
    by: list[str] | str | None = None,
    bucket: float = 3600.0,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them:
    ``lo <= point < hi`` (plus equality on ``by`` keys).

    Spark plans a raw inequality join as a (broadcast) nested loop —
    O(|P|·|I|) per key.  Instead both sides are mapped to time buckets
    of ``bucket`` width (seconds for timestamp columns, plain units for
    numerics): each interval explodes to the buckets it spans, each
    point to exactly one, and a bucket equi-join + exact range filter
    yields the pairs.  Cost: one shuffle per side, candidate pairs
    bounded by per-bucket co-location, and no duplicates by
    construction (a point lives in one bucket).  Pick ``bucket`` near
    the typical interval length: explode factor is
    ``(hi-lo)/bucket + 1`` per interval row.
    """
    from pyspark.sql import types as T

    by = [by] if isinstance(by, str) else list(by or [])
    clash = set(points.columns) & {c for c in intervals.columns if c not in by}
    if clash:
        raise ValueError(f"interval columns collide with point side: {sorted(clash)}")

    # Mixed timestamp flavors across the two sides would shift ONE side
    # by the session timezone during the NTZ->TZ cast (the comparison
    # stays consistent with Spark's implicit-cast semantics, but the
    # bucket interpretation becomes timezone-dependent) — reject early.
    # Shared guard with asof_join / asof_interpolate.
    _check_time_flavor([(points, on), (intervals, lo), (intervals, hi)])

    def to_num(df: DataFrame, col: str):
        if isinstance(df.schema[col].dataType, (T.TimestampType, T.TimestampNTZType)):
            # cast NTZ through session-tz timestamp: the shift is identical
            # on both sides (same-flavor enforced above) so bucket
            # co-location is unaffected
            return F.unix_micros(F.col(col).cast("timestamp")) / 1_000_000.0
        return F.col(col).cast("double")

    p2 = points.withColumn("_b", F.floor(to_num(points, on) / bucket))
    i2 = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(to_num(intervals, lo) / bucket),
                F.floor(to_num(intervals, hi) / bucket),
            )
        ),
    )
    joined = p2.join(i2, [*by, "_b"]).where(
        (F.col(lo) <= F.col(on)) & (F.col(on) < F.col(hi))
    )
    return joined.drop("_b")


def asof_interpolate(
    left: DataFrame,
    right: DataFrame,
    on: str,
    value_col: str,
    by: list[str] | str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Linear time interpolation: for each left row, estimate
    ``value_col`` at its ``on`` time from the NEAREST right observation
    on each side — ``v = v_prev + (t - t_prev)/(t_next - t_prev) *
    (v_next - v_prev)`` (sensor fusion / irregular-series alignment,
    the two-sided refinement of :func:`asof_join`'s last-value hold).

    Edge semantics: a left time before the first / after the last
    observation (within its ``by`` group) holds the single available
    end value; groups with no observations yield NULL.  An observation
    exactly at the left time reproduces it exactly.

    Same ONE-shuffle device as :func:`asof_join`: union both sides,
    one keyed window ordered by time computes the previous observation
    via ``last(ignorenulls)`` and the next via the mirrored
    ``first(ignorenulls)`` over the following frame — no range
    self-join, no per-row search."""
    from pyspark.sql import Window as W

    by = [by] if isinstance(by, str) else list(by or [])
    out_col = out_col or f"{value_col}_interp"
    reserved = {"_t", "_side", "_obs", "_pv", "_pt", "_nv", "_nt"} & (
        set(left.columns) | set(right.columns)
    )
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with asof_interpolate's "
            "internal names; rename them first"
        )
    _check_time_flavor([(left, on), (right, on)])

    lcols = [c for c in left.columns if c not in by and c != on]
    l2 = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *lcols,
        F.lit(None).cast("double").alias("_obs"),
    )
    # a NULL-valued observation is NO observation: letting it through
    # would contribute its TIME to _pt/_nt without a value, corrupting
    # the interpolation weight (or nulling a query that has valued
    # neighbors).  A NULL-TIME observation is equally meaningless — it
    # would sort NULLS-FIRST and donate its VALUE to _pv with no
    # matching _pt (a value/time mismatch)
    r2 = (
        right.where(
            F.col(value_col).isNotNull() & F.col(on).isNotNull()
        )
        .select(
            *by,
            F.col(on).alias("_t"),
            F.lit(0).alias("_side"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
            F.col(value_col).cast("double").alias("_obs"),
        )
    )
    u = l2.unionByName(r2)
    # observations sort BEFORE queries at the same time so an exact-time
    # observation is its own "previous" (reproduced exactly)
    w = W.partitionBy(*by).orderBy(F.col("_t").asc(), F.col("_side").asc())
    prev_frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    next_frame = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    obs_t = F.when(F.col("_side") == 0, F.col("_t").cast("double"))
    u = (
        u.withColumn("_pv", F.last("_obs", ignorenulls=True).over(prev_frame))
        .withColumn("_pt", F.last(obs_t, ignorenulls=True).over(prev_frame))
        .withColumn("_nv", F.first("_obs", ignorenulls=True).over(next_frame))
        .withColumn("_nt", F.first(obs_t, ignorenulls=True).over(next_frame))
    )
    t = F.col("_t").cast("double")
    interp = F.when(
        F.col("_pt").isNull(), F.col("_nv")  # before first obs: hold next
    ).when(
        F.col("_nt").isNull(), F.col("_pv")  # after last obs: hold prev
    ).when(
        F.col("_nt") == F.col("_pt"), F.col("_pv")  # exact hit / dup time
    ).otherwise(
        F.col("_pv")
        + (t - F.col("_pt")) / (F.col("_nt") - F.col("_pt"))
        * (F.col("_nv") - F.col("_pv"))
    )
    # a left row with NULL time has no position on the axis: NULL out
    # (it would otherwise sort NULLS-FIRST and "hold next" spuriously)
    return (
        u.where(F.col("_side") == 1)
        .withColumn(out_col, F.when(F.col("_t").isNotNull(), interp))
        .select(*by, F.col("_t").alias(on), *lcols, out_col)
    )
