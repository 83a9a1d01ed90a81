"""Streaming dedup and stream-stream joins.

Spark-native north-star additions (the reference is pure batch —
SURVEY.md §1.4).  Both operators are the streaming twins of batch ops
already in the engine (``operators.dedup.drop_exact_dups``,
``operators.asof.range_join``), so a pipeline can promote from batch to
continuous ingestion without changing semantics.

Scale design:

- **dedup** state is one marker row per key, sharded by the dedup key
  — ``dropDuplicatesWithinWatermark`` evicts markers once the
  watermark passes, so state is bounded by (arrival rate × watermark)
  regardless of stream age.  This is the streaming ingest guard for a
  training corpus: re-delivered events/documents (at-least-once
  sources re-deliver by design) collapse to one row.
- **stream-stream interval join**: both sides are watermarked and the
  join condition bounds event time (``right.ts ∈ [left.ts, left.ts +
  horizon]``), so each side buffers at most (watermark + horizon) of
  input — without the time bound the join state would grow forever.
  Partitioning is by the equi-key on both sides: one co-partitioned
  shuffle, same as a batch sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    sdf: DataFrame,
    keys: list[str] | str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: the first row
    for a key is emitted immediately (append mode), later arrivals are
    dropped while the key's marker is in state; markers older than the
    watermark are evicted.  Duplicates arriving later than the
    watermark horizon are NOT caught — size the watermark to the
    source's re-delivery window, not to worst-case lateness."""
    if isinstance(keys, str):
        keys = [keys]
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left row with
    every right row of the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + horizon]``.  The time bound is what makes the
    state finite (Spark derives each side's buffer retention from it);
    the equi-key is what keeps the shuffle linear.

    Right-side columns are suffixed; the right timestamp keeps its
    suffixed name so both event times survive into the output."""
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {horizon}"))
    )
    joined = lw.join(rw, cond, "inner")
    out_cols = [F.col(f"l.{c}").alias(c) for c in left.columns] + [
        F.col(f"r.{c}").alias(f"{c}{suffix}") for c in right.columns if c != key
    ]
    return joined.select(*out_cols)
