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


def stream_topk(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Streaming per-key top-k: the ``k`` largest rows by ``value_col``
    per ``key_col`` maintained in ``applyInPandasWithState``, with a
    deterministic ``(value DESC, id ASC)`` tie-break.

    Top-k is a mergeable bounded sketch (merge two top-k lists, keep the
    k best), so state per key is EXACTLY k ``(value, id)`` pairs
    regardless of stream age — the streaming twin of the batch
    ``row_number() <= k`` window (the oracle).  Each batch that touches
    a key re-emits the key's full current top-k with ranks (update
    mode); the final emission after an availableNow drain equals the
    batch answer.  State shards by ``key_col`` with the shuffle
    partitioning — O(k) per key at any scale."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, rank int, {id_col} long, {value_col} double"
    state_schema = "ids array<long>, vals array<double>"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        ids, vals = state.get if state.exists else ([], [])
        pairs = list(zip(vals, ids))
        for pdf in pdfs:
            pairs.extend(
                zip(pdf[value_col].astype(float), pdf[id_col].astype("int64"))
            )
        # value DESC, id ASC — stable and engine-independent
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[:k]
        state.update(([int(i) for _, i in pairs], [float(v) for v, _ in pairs]))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(pairs),
                "rank": list(range(1, len(pairs) + 1)),
                id_col: [i for _, i in pairs],
                value_col: [v for v, _ in pairs],
            }
        )

    return (
        sdf.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(id_col).cast("long").alias(id_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        .where(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


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
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from vtk_reserves_spark.operators.sketch import _unit_hash

    out_schema = f"{key_col} string, n_kept int, est_distinct double"
    state_schema = "hashes array<double>"

    # hash JVM-SIDE with the batch operator's exact _unit_hash
    # expression — bit-parity with kmv_distinct by construction.  The
    # previous Python-side str(v) hashing broke it two ways: NULLs were
    # hashed (str(None)) and counted as distinct items, and a long
    # column containing ANY null arrives in pandas as float64, so
    # str(7.0) != CAST(7 AS STRING) and every hash differed.  NULL
    # values are not distinct values: filtered, as in batch.
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (hashes,) = state.get if state.exists else ([],)
        s = set(hashes)
        for pdf in pdfs:
            s.update(float(h) for h in pdf["_h"].dropna())
        kept = sorted(s)[:k]
        state.update((kept,))
        est = float(len(kept)) if len(kept) < k else (k - 1) / kept[-1]
        yield pd.DataFrame(
            {key_col: [key[0]], "n_kept": [len(kept)], "est_distinct": [est]}
        )

    return (
        sdf.where(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias(key_col),
            _unit_hash(F.col(value_col)).alias("_h"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_heavy_hitters(
    sdf: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Streaming space-saving heavy hitters: per ``key_col`` group, a
    bounded ``capacity``-counter summary of ``value_col`` maintained in
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``operators.sketch.heavy_hitters`` (same algorithm, same
    deterministic min-count/lexicographic eviction).

    State per key is at most ``capacity`` (item, count, err) triples
    forever.  Each batch re-emits the key's current top ``k`` with
    ranks (update mode).  With ``capacity`` at least the value
    cardinality no eviction ever happens, so the drained result is
    EXACT and order-independent — the oracle-checkable configuration;
    under eviction the space-saving presence/bound guarantees hold per
    arrival order."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} string, rank int, item string, "
        "count_min long, count_max long"
    )
    state_schema = "items array<string>, cnts array<long>, errs array<long>"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        from vtk_reserves_spark.operators.sketch import space_saving_update

        items, cnts, errs = state.get if state.exists else ([], [], [])
        counters = {i: [c, e] for i, c, e in zip(items, cnts, errs)}
        for pdf in pdfs:
            space_saving_update(counters, pdf[value_col], capacity)
        state.update(
            (
                list(counters.keys()),
                [c for c, _ in counters.values()],
                [e for _, e in counters.values()],
            )
        )
        top = sorted(counters.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "item": [i for i, _ in top],
                "count_min": [c - e for _, (c, e) in top],
                "count_max": [c for _, (c, e) in top],
            }
        )

    return (
        sdf.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(value_col).cast("string").alias(value_col),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
