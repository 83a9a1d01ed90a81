"""Batch sessionization — gap-based session assignment over an event
log (the batch twin of ``streaming.breakdown.session window``; no
reference counterpart, SURVEY.md §1.4).

Scale shape: everything happens inside ONE hash partitioning by the
entity key — the lag/new-session flag and the running session counter
are keyed windows over the same ordering, and the closing per-session
aggregation's group keys (key, session_seq) are clustered by the
existing key partitioning, so Catalyst inserts no second exchange.
Per-key data is streamed in timestamp order; skew is bounded by the
busiest single entity, the floor for any order-dependent operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str | Column = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Assign a per-key session sequence number: a new session starts
    when the gap since the previous event exceeds ``gap`` (a SQL
    interval string or Column).  Adds ``session_seq`` (1-based)."""
    gap_c = F.expr(gap) if isinstance(gap, str) else gap
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap_c), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(new_session).over(run))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str | None = None,
    gap: str | Column = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Per-session summary: start/end timestamps, event count, and the
    value sum if ``value_col`` is given."""
    s = sessionize(df, key_col, ts_col, gap)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return s.groupBy(key_col, "session_seq").agg(*aggs)
