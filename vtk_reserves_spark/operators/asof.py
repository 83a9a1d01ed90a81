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
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c not in by and c != on]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    lcols = [c for c in left.columns if c not in by and c != on]
    l2 = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.lit(None).cast(right.schema[on].dataType).alias("_rt"),
    )
    r2 = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *payload,
        F.col(on).alias("_rt"),
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
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
        F.last("_rt", ignorenulls=True).over(w).alias("_rt"),
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        gap = (
            F.col("_t") - F.col("_rt")
            if direction == "backward"
            else F.col("_rt") - F.col("_t")
        )
        within = F.col("_rt").isNotNull() & (gap <= tolerance)
        out = out.select(
            *by,
            "_t",
            *lcols,
            *[F.when(within, F.col(c)).alias(c) for c in payload],
        )
    else:
        out = out.select(*by, "_t", *lcols, *payload)
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
    flavors = {
        type(df.schema[c].dataType).__name__
        for df, c in ((points, on), (intervals, lo), (intervals, hi))
        if isinstance(df.schema[c].dataType, (T.TimestampType, T.TimestampNTZType))
    }
    if len(flavors) > 1:
        raise ValueError(
            "mixed TimestampType/TimestampNTZType across range-join "
            f"columns {sorted(flavors)}; normalize both sides first "
            "(e.g. cast to timestamp or timestamp_ntz)"
        )

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
