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


def stream_kmv_distinct(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Streaming distinct-count sketch: a per-key KMV (k smallest md5
    hashes — the mergeable device of `operators/sketch.py`) maintained
    in ``applyInPandasWithState``.

    State per key is a bounded sorted list (≤ k doubles) regardless of
    stream age — the streaming twin of ``kmv_distinct``: because the
    hash is the same deterministic md5 construction, draining a finite
    stream yields BIT-IDENTICAL estimates to the batch operator (the
    oracle check), which is exactly the property that lets a pipeline
    promote cardinality monitoring from batch to continuous without a
    parallel code path.  Emits ``(key, n_kept, est_distinct)`` for every
    key touched by the batch (update mode)."""
    import hashlib

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, n_kept int, est_distinct double"
    state_schema = "hashes array<double>"
    dom = 4294967296.0

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (hashes,) = state.get if state.exists else ([],)
        s = set(hashes)
        for pdf in pdfs:
            for v in pdf[value_col]:
                h = (
                    int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) + 1
                ) / dom
                s.add(h)
        kept = sorted(s)[:k]
        state.update((kept,))
        est = float(len(kept)) if len(kept) < k else (k - 1) / kept[-1]
        yield pd.DataFrame(
            {key_col: [key[0]], "n_kept": [len(kept)], "est_distinct": [est]}
        )

    return (
        sdf.select(F.col(key_col).cast("string").alias(key_col), value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
