"""Distinct-count sketching (KMV / k-minimum-values).

North-star addition (SURVEY.md §2.8; the reference has no sketches or
approximate aggregates).  KMV (Bar-Yossef et al. 2002) estimates the
number of distinct values per group from the k smallest hash values:
with hashes uniform on (0, 1], the k-th smallest order statistic m_k
gives the unbiased estimate ``(k - 1) / m_k``; groups with fewer than k
distinct hashes are counted exactly.

Unlike Spark's HyperLogLog-based ``approx_count_distinct`` the whole
computation is deterministic md5 arithmetic, so a SQL oracle reproduces
the estimate bit-for-bit — the sketch is testable, not just plausible.

Scale shape: a distinct on (group, hash) (one shuffle, map-side
partial), a keyed window to keep the k smallest per group (co-located
with the following aggregation), and a final per-group reduce.  State
per group is O(k); merging partial sketches = merging sorted k-lists,
which is exactly what the distinct + window pipeline does without any
custom UDAF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: hash domain size: md5-derived 32-bit base hash, normalized to (0, 1]
_HASH_DOMAIN = 4294967296.0  # 2^32


def _unit_hash(col) -> F.Column:
    """Deterministic uniform hash of a value into (0, 1]: first 8 hex
    digits of md5(value as string), +1, / 2^32 — reproducible in SQL."""
    base = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return (base + 1) / F.lit(_HASH_DOMAIN)


def kmv_distinct(
    df: DataFrame,
    key_cols: list[str] | str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_col``.

    Returns ``(<keys...>, n_kept, est_distinct)`` where ``n_kept`` is
    the number of retained hashes (≤ k) and ``est_distinct`` the KMV
    estimate — exact when the group holds fewer than k distinct hashes.
    NULL values are ignored (a NULL is not a distinct value; its NULL
    hash would otherwise sort NULLS-FIRST into a k-slot and skew the
    estimate).

    One code path with :func:`kmv_sketch` — this is just the sketch
    plus the estimator, so fixes apply in one place."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sk = kmv_sketch(df, keys, value_col, k)
    return sk.select(
        *keys,
        F.size("sketch").alias("n_kept"),
        _estimate_from_sketch(F.col("sketch"), k).alias("est_distinct"),
    )


def _estimate_from_sketch(sketch, k: int) -> F.Column:
    """KMV estimate from a sorted k-smallest-hash array column."""
    n = F.size(sketch)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(k - 1) / F.element_at(sketch, k)
    )


def kmv_sketch(
    df: DataFrame,
    key_cols: list[str] | str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group MERGEABLE sketch state: ``(<keys...>, sketch)`` where
    ``sketch`` is the sorted array of the ≤k smallest distinct hashes.

    This is the two-level-aggregation building block for 100 TB rollups:
    sketch once at the finest grain (e.g. per day × key), persist the
    few-KB state, and answer every coarser grouping by merging sketches
    — the raw data is never rescanned.  KMV merges losslessly: the k
    smallest of a union equal the k smallest of the per-part k-smallest
    sets, so :func:`kmv_merge` of partial sketches gives bit-identical
    estimates to sketching the raw data directly
    (``test_kmv_merge_equals_direct``).  NULL values are ignored: a
    NULL hash would sort NULLS-FIRST into a k-slot, then vanish in
    ``collect_list`` — leaving a (k-1)-element sketch the estimator
    misreads as an exact count."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, _unit_hash(F.col(value_col)).alias("_h"))
        .dropDuplicates([*keys, "_h"])
    )
    w = Window.partitionBy(*keys).orderBy(F.col("_h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return kept.groupBy(*keys).agg(
        F.array_sort(F.collect_list("_h")).alias("sketch")
    )


def kmv_merge(
    sketches: DataFrame,
    key_cols: list[str] | str,
    k: int = 64,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge partial sketches up to a coarser grouping.

    Input: output of :func:`kmv_sketch` (or a previous merge) with any
    superset of ``key_cols``.  Output: ``(<keys...>, sketch, n_kept,
    est_distinct)`` at the coarser grain.  Only sketch rows move —
    shuffle volume is O(groups × k), independent of raw data size."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ex = sketches.select(
        *keys, F.explode(F.col(sketch_col)).alias("_h")
    ).dropDuplicates([*keys, "_h"])
    w = Window.partitionBy(*keys).orderBy(F.col("_h").asc())
    kept = ex.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    merged = kept.groupBy(*keys).agg(
        F.array_sort(F.collect_list("_h")).alias(sketch_col)
    )
    return merged.select(
        *keys,
        sketch_col,
        F.size(sketch_col).alias("n_kept"),
        _estimate_from_sketch(F.col(sketch_col), k).alias("est_distinct"),
    )


def space_saving_update(counters: dict, values, capacity: int) -> None:
    """The space-saving (Metwally et al. 2005) counter update, shared
    by the batch sketch below and its streaming twin
    (`streaming/ops.stream_heavy_hitters`) so the two can never
    desynchronize: ``counters`` maps item -> [count, err]; new items
    evict the minimum counter (deterministic (count, lexicographic)
    tie-break), inheriting its count as the overestimate bound."""
    for v in values:
        if v is None:
            continue
        s = str(v)
        if s in counters:
            counters[s][0] += 1
        elif len(counters) < capacity:
            counters[s] = [1, 0]
        else:
            evict = min(counters, key=lambda x: (counters[x][0], x))
            mn = counters[evict][0]
            del counters[evict]
            counters[s] = [mn + 1, mn]


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    capacity: int | None = None,
) -> DataFrame:
    """Approximate top-k frequent items via the space-saving sketch
    (Metwally et al. 2005), two-stage:

    1. each partition maintains a bounded ``capacity``-counter summary
       in ``mapInPandas`` (:func:`space_saving_update`), recording
       alongside it the partition's FLOOR — its minimum counter value
       when full, 0 otherwise;
    2. the per-partition summaries — ``capacity`` rows each, NOT the
       raw data — union and merge in one tiny aggregation.

    The merge is the proper distributed space-saving combine: an item
    absent from a partition's summary may still have occurred up to
    that partition's floor times there, so
    ``count_max = sum(present cnt) + sum(floors of ABSENT partitions)``
    and ``count_min = sum(present cnt - err)``.  Guarantees: any item
    with true frequency > n/capacity is present, and
    ``count_min <= true <= count_max``.  When ``capacity`` is at least
    the column's distinct count no eviction happens, every floor is 0,
    and the sketch degenerates to EXACT counts (``count_min ==
    count_max`` — the oracle-checkable configuration).

    Returns the top ``k`` by ``count_max`` DESC with a deterministic
    item tie-break.  Scale shape: the full-cardinality groupBy this
    replaces shuffles every distinct key; here the shuffle is
    ``partitions × capacity`` rows regardless of cardinality."""
    import pandas as pd
    from pyspark.sql import types as T

    capacity = capacity or 8 * k

    summary_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("item", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("err", T.LongType()),
            T.StructField("floor", T.LongType()),
        ]
    )

    def summarize(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict = {}  # item -> [count, err]
        for pdf in batches:
            space_saving_update(counters, pdf[value_col], capacity)
        floor = (
            min(c for c, _ in counters.values())
            if len(counters) >= capacity
            else 0
        )
        yield pd.DataFrame(
            [(pid, i, c, e, floor) for i, (c, e) in counters.items()],
            columns=["pid", "item", "cnt", "err", "floor"],
        )

    # materialized because the plan below reads it twice (item merge +
    # total floor) and each read would otherwise rescan the CORPUS.
    # Eager localCheckpoint, not persist(): a persist() here was never
    # unpersisted, pinning one partitions-x-capacity table in executor
    # storage per call for the session's lifetime — checkpoint blocks
    # are released by the ContextCleaner when the frame is GC'd (same
    # device as dedup_clusters' iteration state)
    summaries = (
        df.select(F.col(value_col).cast("string").alias(value_col))
        .mapInPandas(summarize, summary_schema)
        .localCheckpoint(eager=True)
    )
    # total floor over ALL partitions (empty partitions emit no rows =
    # floor 0); an item's upper bound adds the floors of partitions it
    # is ABSENT from = total_floor - sum of floors where present
    total_floor = summaries.select("pid", "floor").dropDuplicates(["pid"]).agg(
        F.coalesce(F.sum("floor"), F.lit(0)).alias("_tf")
    )
    merged = (
        summaries.groupBy("item")
        .agg(
            F.sum("cnt").alias("_cnt"),
            (F.sum("cnt") - F.sum("err")).alias("count_min"),
            F.sum("floor").alias("_pf"),
        )
        .crossJoin(F.broadcast(total_floor))
        .withColumn("count_max", F.col("_cnt") + F.col("_tf") - F.col("_pf"))
    )
    from pyspark.sql import Window as W

    ranked = merged.withColumn(
        "_rn",
        F.row_number().over(
            W.orderBy(F.desc("count_max"), F.asc("item"))
        ),
    )
    out = (
        ranked.where(F.col("_rn") <= k)
        .select(
            F.col("_rn").alias("rank"), "item", "count_min", "count_max"
        )
    )
    return out
