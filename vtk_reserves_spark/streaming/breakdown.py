"""Streaming breakdown — the breakdown engine over event-time windows.

The reference is pure batch (SURVEY.md §1.4: no streams, no time
anywhere); this module is a Spark-native north-star addition.  It reuses
the SAME template compiler as the batch operator
(:mod:`vtk_reserves_spark.plans.template`), restricted to the modes that
are expressible as streaming aggregations (count/sum/mean/min/max/
var/std/sem/list and weighted sum/mean — single-pass hash aggregates).
Modes that need a second pass over the group (major, quantiles) raise:
at 100 TB of never-ending stream you'd use a sketch, not a re-scan.

Scale design:

- **event-time windows + watermark**: state is keyed by
  (window, keys) and evicted once the watermark passes the window end —
  bounded memory no matter how long the stream runs.
- **tumbling/sliding** via ``F.window`` (slide = window for tumbling);
  **session** via ``F.session_window`` (gap-merged, variable length).
- the aggregation itself is the standard partial/final hash aggregate —
  map-side combine before the shuffle, same as batch.
- ``run_available_now`` drains whatever is currently in the source and
  stops — the driver/test harness path.  A production deployment swaps
  the memory sink for kafka/delta and a continuous trigger; the query
  DataFrame is identical.
"""

from __future__ import annotations

import threading
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.aggregates import plain_agg
from vtk_reserves_spark.plans.template import compile_template

#: serializes run_available_now drains within one process (they mutate
#: the session-global shuffle-partition setting; see the function body)
_DRAIN_LOCK = threading.Lock()

#: breakdown modes that work as single-pass streaming aggregates
_STREAMABLE = {
    "count",
    "sum",
    "mean",
    "min",
    "max",
    "var",
    "std",
    "sem",
    "list",
    "text",
}


def read_stream(
    spark,
    path: str,
    schema=None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over ``path`` (a file, glob, or directory).

    Schema is mandatory for streaming file sources; when omitted it is
    probed with a one-off batch read of the same path (driver-side
    metadata only — no data scan).  ``max_files_per_trigger`` bounds
    each micro-batch — with availableNow this splits a backlog into
    several batches, letting the watermark advance BETWEEN batches
    (late-data policy is only observable across batch boundaries)."""
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    import os

    if os.path.isfile(path):
        # FileStreamSource derives basePath from the glob parent and
        # rejects a concrete file path ("basePath must be a directory"):
        # force glob resolution by bracketing the basename.  Every glob
        # metacharacter must be escaped, not just the first char — a
        # file literally named part[0].parquet would otherwise have its
        # '[0]' read as a character class and silently stream 0 rows.
        d, b = os.path.dirname(path), os.path.basename(path)
        # Hadoop's Globber accepts backslash escapes (its char-class
        # parser rejects []] for a literal ]), and a backslash counts
        # as a glob char for basePath purposes, so escaping alone
        # already forces glob resolution
        escaped = "".join(
            f"\\{ch}" if ch in "[]{}*?\\" else ch for ch in b
        )
        if escaped == b:  # no metachars: bracket the first char instead
            escaped = f"[{b[0]}]{b[1:]}"
        path = os.path.join(d, escaped)
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def _compile_streaming(sdf: DataFrame, template):
    plan = compile_template(template, sdf.columns)
    bad = [a.mode for a in plan.aggs if a.mode not in _STREAMABLE]
    if bad:
        raise ValueError(
            f"breakdown mode(s) {bad} need a second pass over the group "
            "(major/quantiles) and are not available in streaming; use a "
            "sketch-based approximation or a batch breakdown"
        )
    cols = []
    for a in plan.aggs:
        if a.mode == "text":
            cols.append(F.lit(a.text_value).alias(a.out))
        else:
            cols.append(plain_agg(a, F.col(a.var)).alias(a.out))
    return plan, cols


def windowed_breakdown(
    sdf: DataFrame,
    template,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling (``slide is None``) or sliding windowed breakdown.

    Output columns: ``win_start, win_end, <keys...>, <agg outs...>``."""
    plan, aggcols = _compile_streaming(sdf, template)
    sdf = sdf.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    keys = [F.col(k.var).alias(k.out) for k in plan.keys]
    out = sdf.groupBy(win.alias("_w"), *keys).agg(*aggcols)
    return out.select(
        F.col("_w.start").alias("win_start"),
        F.col("_w.end").alias("win_end"),
        *[F.col(k.out) for k in plan.keys],
        *[F.col(a.out) for a in plan.aggs],
    )


def session_breakdown(
    sdf: DataFrame,
    template,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-windowed breakdown: a session extends while consecutive
    events per key arrive within ``gap``; ``session_end`` is the last
    event + gap (Spark session_window semantics).

    Output: ``session_start, session_end, <keys...>, <agg outs...>``."""
    plan, aggcols = _compile_streaming(sdf, template)
    sdf = sdf.withWatermark(ts_col, watermark)
    keys = [F.col(k.var).alias(k.out) for k in plan.keys]
    out = sdf.groupBy(
        F.session_window(F.col(ts_col), gap).alias("_w"), *keys
    ).agg(*aggcols)
    return out.select(
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        *[F.col(k.out) for k in plan.keys],
        *[F.col(a.out) for a in plan.aggs],
    )


def stateful_user_stats(
    sdf: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (n_events, total_value, last_ts), re-emitted on every batch
    that touches the key.  Demonstrates the arbitrary-stateful plumbing
    (state schema, GroupStateTimeout, pandas batch iteration) that the
    built-in windowed aggregates can't express — e.g. custom eviction or
    decayed counters would slot in here.

    State is one tiny tuple per key, partitioned by ``key_col`` — at
    100 TB the state store shards with the shuffle partitioning and each
    key's state is O(1)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # derive the key's output type from the INPUT schema: hardcoding
    # 'long' crashed Arrow conversion mid-query for string/other keys
    key_ddl = sdf.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_ddl}, n_events long, total_value double, "
        "last_ts timestamp"
    )
    state_schema = "n long, total double, last_ts timestamp"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        # a fired processing-time timeout delivers an EMPTY batch with
        # hasTimedOut set: emit the final snapshot once and EVICT the
        # state — re-arming here would re-emit the same stale row every
        # interval forever and the state would never shrink
        if state.hasTimedOut:
            n, total, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts": [last],
                }
            )
            return
        n, total, last = (
            state.get if state.exists else (0, 0.0, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
            mx = pdf[ts_col].max()
            last = mx if last is None or mx > last else last
        state.update((n, total, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last],
            }
        )

    return (
        sdf.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            # state-expiry hook: pass timeout_ms + ProcessingTimeTimeout in
            # a continuous deployment.  With a finite availableNow drain a
            # processing-time timeout makes the trigger keep scheduling
            # expiry batches, so the default is no timeout.
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "complete",
    sink_name: str | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drain the stream with ``trigger(availableNow)`` into a memory sink
    and return the sink table as a normal batch DataFrame.

    ``complete`` mode emits every window each batch, so the final table
    equals the full aggregation regardless of watermark progress (append
    mode would hold back windows the watermark hasn't passed — correct
    for production sinks, wrong for a finite drain-and-compare).

    ``shuffle_partitions`` pins the STATE partition count for this query
    (a stateful stream's partitioning is fixed at its first start and
    carried in the checkpoint).  Size it to the key cardinality and
    executor count — each partition pays a state-store commit plus, for
    applyInPandasWithState, a Python worker round-trip per batch, so
    thousands of near-empty state partitions are pure overhead."""
    spark = sdf.sparkSession
    name = sink_name or f"stream_sink_{uuid.uuid4().hex[:12]}"
    # shuffle_partitions is a SESSION-GLOBAL setting: two concurrent
    # drains (or a batch query planned mid-drain) in one SparkSession
    # would race on it and could restore a stale value.  The lock
    # serializes drains within this process; cross-process sessions
    # are independent.  (No per-query override exists — a stateful
    # stream reads the session conf at first start.)
    with _DRAIN_LOCK:
        before = spark.conf.get("spark.sql.shuffle.partitions")
        if shuffle_partitions is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        try:
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            if shuffle_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(name)
