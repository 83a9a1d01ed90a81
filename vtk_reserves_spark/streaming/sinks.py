"""Streaming sinks — durable outputs for the streaming operators.

The reference writes batch reports to files (SURVEY.md §2.2); the
streaming counterpart is an incrementally-maintained table.  Two shapes:

- :func:`stream_to_parquet` — append-mode parquet with a checkpoint:
  exactly-once file output for append-able streams (enriched events,
  dedup output, interval joins).
- :func:`stream_upsert_parquet` — ``foreachBatch`` upsert for UPDATE-
  mode aggregations: each micro-batch's changed groups overwrite their
  key partitions, giving an incrementally-maintained rollup table that
  readers see as plain parquet.

At 100 TB/day the parquet sink is the handoff point between the
streaming layer and the batch engine: partition by event-time date so
batch consumers prune, and size ``trigger`` intervals so files land at
~100 MB-1 GB (small-files control belongs to the trigger cadence plus a
compaction pass, not to the sink)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_to_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Append-mode parquet sink with checkpointed exactly-once semantics.

    Returns the started ``StreamingQuery``; with ``available_now`` the
    caller can ``awaitTermination()`` for a finite drain (tests, batch
    backfills) — production streams pass ``available_now=False`` and a
    processing-time trigger instead."""
    w = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_upsert_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: list[str],
    available_now: bool = True,
):
    """UPDATE-mode aggregation -> incrementally-maintained parquet table.

    ``foreachBatch`` receives only the groups whose aggregates changed in
    the micro-batch; each batch overwrites just those groups' partitions
    (dynamic partition overwrite on ALL the key columns — overwriting by
    a key prefix would clobber sibling groups that share the prefix but
    did not change this batch), so the table converges to the full
    aggregation without ever rewriting unchanged groups.  The batch is
    tiny (changed groups only) — the write cost tracks the update rate,
    not the table size.  An empty batch writes nothing: with dynamic
    overwrite, zero input rows touch zero partitions."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.write.mode("overwrite")
                .partitionBy(*key_cols)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", before)

    w = (
        sdf.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_to_delta(
    sdf: DataFrame,
    table: str,
    checkpoint: str,
    app_id: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Streaming Delta sink with END-TO-END exactly-once: each
    micro-batch appends through ``delta.write_delta`` carrying a
    ``txn`` action of ``(app_id, batch_id)`` — the same idempotent-
    writer protocol delta-spark's own streaming sink uses
    (PROTOCOL.md Transaction Identifiers).  The checkpoint makes the
    source replay at-least-once after a crash; the txn ledger in the
    Delta log downgrades every replayed batch to a no-op, so the
    table sees each batch exactly once regardless of restarts.

    Returns the started ``StreamingQuery``.  Scale: the batch append
    is the ordinary distributed parquet write; the txn check is one
    driver-side log lookup per batch."""
    from vtk_reserves_spark.sources.delta import write_delta

    def append(batch_df: DataFrame, batch_id: int) -> None:
        write_delta(
            batch_df, table, mode="append",
            partition_by=partition_by, txn=(app_id, int(batch_id)),
        )

    w = (
        sdf.writeStream.foreachBatch(append)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_to_hudi(
    sdf: DataFrame,
    table: str,
    checkpoint: str,
    app_id: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Streaming Hudi sink with END-TO-END exactly-once — the third
    of the lakehouse sink triad (:func:`stream_to_delta`,
    :func:`stream_to_iceberg`): each micro-batch appends through
    ``hudi.write_hudi`` carrying ``txn=(app_id, batch_id)``.  The
    committed-batch ledger rides in each commit's extraMetadata
    (``txn.<app_id>`` — the surface real Hudi's streaming writers
    stamp their checkpoints into, e.g.
    ``deltastreamer.checkpoint.key``), so a source replay after a
    crash downgrades redelivered batches to no-ops and the table
    sees each batch exactly once.

    Returns the started ``StreamingQuery``.  Scale: the batch append
    is the ordinary distributed parquet write (fresh file groups);
    the ledger check is one timeline fold per batch — metadata
    only."""
    from vtk_reserves_spark.sources.hudi import write_hudi

    def append(batch_df: DataFrame, batch_id: int) -> None:
        write_hudi(
            batch_df, table, mode="append",
            partition_by=partition_by, txn=(app_id, int(batch_id)),
        )

    w = (
        sdf.writeStream.foreachBatch(append)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_to_iceberg(
    sdf: DataFrame,
    table: str,
    checkpoint: str,
    app_id: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Streaming Iceberg sink with END-TO-END exactly-once — the
    Iceberg twin of :func:`stream_to_delta`: each micro-batch appends
    through ``iceberg.write_iceberg`` carrying ``txn=(app_id,
    batch_id)``.  The committed-batch ledger lives in the table
    PROPERTIES (``txn.<app_id>`` — survives snapshot expiry) and each
    snapshot's summary records the producing app/batch, the same
    surfaces iceberg-spark's streaming sink uses (its query/epoch-id
    summary entries).  The checkpoint makes the source replay
    at-least-once after a crash; the ledger downgrades replayed
    batches to no-ops, so the table sees each batch exactly once.

    Returns the started ``StreamingQuery``.  Scale: the batch append
    is the ordinary distributed parquet write + driver-side manifest
    metadata; the ledger check is one metadata-JSON lookup per
    batch."""
    from vtk_reserves_spark.sources.iceberg import write_iceberg

    def append(batch_df: DataFrame, batch_id: int) -> None:
        write_iceberg(
            batch_df, table, mode="append",
            partition_by=partition_by, txn=(app_id, int(batch_id)),
        )

    w = (
        sdf.writeStream.foreachBatch(append)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
