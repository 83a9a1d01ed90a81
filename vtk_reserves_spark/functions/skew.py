"""Skew-mitigation helpers.

Spark's hash aggregation already does map-side partial aggregation, and
AQE (enabled in this repo's sessions) splits skewed JOIN partitions at
runtime.  What neither covers is a *high-cardinality aggregation whose
shuffle key is dominated by a few hot groups* — every row of a hot key
still lands on one reducer.  ``salted_agg`` is the standard two-stage
rewrite: aggregate on (key, salt) first so each hot key spreads over
``salt`` reducers, then combine the partials.

Only decomposable aggregates are offered (sum/count/min/max and mean
via sum+count) — the combine step must be expressible over partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decomposable modes: (stage-1 partial, stage-2 combine)
_MODES = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys,
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name -> (column, mode) with mode in
    sum/count/min/max/mean.  Results are exactly equal to the direct
    ``groupBy(keys).agg(...)``; the salt only changes the shuffle
    layout (stage 1 keys are (keys, salt), stage 2 re-aggregates the
    ``salt``-way partials — a tiny second shuffle)."""
    if isinstance(keys, str):
        keys = [keys]
    stage1_exprs: list[Column] = []
    stage2_exprs: list[Column] = []
    for out, (col, mode) in aggs.items():
        if mode == "mean":
            stage1_exprs += [
                F.sum(col).alias(f"__s_{out}"),
                F.count(col).alias(f"__c_{out}"),
            ]
            stage2_exprs.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif mode in _MODES:
            part, comb = _MODES[mode]
            stage1_exprs.append(part(col).alias(f"__p_{out}"))
            stage2_exprs.append(comb(f"__p_{out}").alias(out))
        else:
            raise ValueError(
                f"mode {mode!r} is not decomposable; salted_agg supports "
                f"{sorted(_MODES) + ['mean']}"
            )
    # the salt must vary WITHIN an input partition: a hot key freshly
    # repartitioned/sorted by the group key sits entirely in one
    # partition, so the previous pmod(spark_partition_id(), salt) gave
    # all its rows ONE salt value — a single stage-1 partial and zero
    # skew mitigation (plus an extra shuffle).  xxhash64 of the
    # monotonic row id spreads each partition's rows across all `salt`
    # values deterministically within an execution; results are
    # unchanged either way because stage 2 re-aggregates the partials.
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)),
    )
    partials = salted.groupBy(*keys, "__salt").agg(*stage1_exprs)
    return partials.groupBy(*keys).agg(*stage2_exprs)
