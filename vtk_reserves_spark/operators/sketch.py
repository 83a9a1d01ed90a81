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
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    hashed = df.select(
        *keys, _unit_hash(F.col(value_col)).alias("_h")
    ).dropDuplicates([*keys, "_h"])
    w = Window.partitionBy(*keys).orderBy(F.col("_h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return kept.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise((F.lit(k - 1)) / F.max("_h"))
        .alias("est_distinct"),
    )
