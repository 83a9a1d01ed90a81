"""Streaming breakdown tests: drain the events stream with
trigger(availableNow) and compare against the equivalent BATCH Spark
aggregation on the same file — a finite stream must agree with batch.
(The reference has no streaming at all — SURVEY.md §1.4; these are
Spark-native north-star operators.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA
from vtk_reserves_spark.sources.loaders import normalize_event_ts
from vtk_reserves_spark.streaming import (
    read_stream,
    run_available_now,
    session_breakdown,
    stateful_user_stats,
    windowed_breakdown,
)

EVENTS = f"{TESTDATA}/events.parquet"


def _events_batch(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(EVENTS))


def _events_stream(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(read_stream(spark, EVENTS))


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_matches_batch(spark):
    agg = windowed_breakdown(
        _events_stream(spark),
        "event_type;value=n_events,count;value=sum_value,sum",
        window="1 hour",
    )
    got = run_available_now(agg)
    want = (
        _events_batch(spark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("value").alias("n_events"),
            F.coalesce(F.sum("value"), F.lit(0.0)).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_each_event_in_two_windows(spark):
    agg = windowed_breakdown(
        _events_stream(spark),
        "value=n_events,count",
        window="2 hours",
        slide="1 hour",
    )
    got = run_available_now(agg)
    n_events = _events_batch(spark).count()
    # every event lands in exactly window_len/slide = 2 windows
    assert got.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events


def test_session_windows_disjoint_and_gap_bounded(spark):
    agg = session_breakdown(
        _events_stream(spark),
        "user_id;value=n_events,count",
        gap="30 minutes",
    )
    got = run_available_now(agg).collect()
    n_events = _events_batch(spark).count()
    assert sum(r["n_events"] for r in got) == n_events
    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["session_start"])
        for a, b in zip(rows, rows[1:]):
            # sessions are disjoint and separated by >= gap (end includes it)
            assert a["session_end"] <= b["session_start"]


def test_stateful_user_stats_matches_batch(spark):
    got = run_available_now(
        stateful_user_stats(_events_stream(spark)), output_mode="update"
    )
    want = (
        _events_batch(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("total_value"),
        )
    )
    g = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in got.collect()}
    w = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in want.collect()}
    assert g == w


def test_non_streamable_mode_raises(spark):
    with pytest.raises(ValueError, match="not available in streaming"):
        windowed_breakdown(
            _events_stream(spark), "event_type;value=med,q2"
        )


def test_watermark_drops_late_data(spark, tmp_path):
    """Append mode + watermark across micro-batches: once the watermark
    passes a window's end the window is emitted, its state evicted, and
    later events for it are DROPPED (append's no-re-emission guarantee).
    maxFilesPerTrigger=1 forces one micro-batch per file so the
    watermark advances between them.  NB: a late-but-unreported window
    (state still open) may still absorb late rows — the hard drop
    guarantee starts at emission, hence the three-batch structure."""
    import os
    import time

    import pandas as pd

    d = str(tmp_path / "stream")
    os.makedirs(d)
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write_batch(name, minutes):
        pdf = pd.DataFrame(
            {
                "ts": [t0 + pd.Timedelta(minutes=m) for m in minutes],
                "v": [1.0] * len(minutes),
            }
        )
        pdf.to_parquet(
            f"{d}/{name}.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    # batch 1: windows [0,10) and [50,60); watermark after = 55-5 = 50
    write_batch("b1", [1, 2, 55])
    time.sleep(1.05)  # distinct mtimes -> deterministic batch order
    # batch 2: on-time event; batch runs with watermark 50 > 10, so
    # window [0,10) is emitted (n=2) and its state evicted
    write_batch("b2", [56])
    time.sleep(1.05)
    # batch 3: LATE event for the already-emitted window [0,10) -> drop
    write_batch("b3", [3, 57])

    sdf = read_stream(spark, d, max_files_per_trigger=1).withColumn(
        "ts", F.col("ts").cast("timestamp")  # NTZ parquet -> event-time LTZ
    )
    agg = windowed_breakdown(
        sdf, "v=n,count", ts_col="ts", window="10 minutes", watermark="5 minutes"
    )
    got = run_available_now(agg, output_mode="append")
    rows = {r["win_start"].minute: r["n"] for r in got.collect()}
    # the late minute-3 event did not resurrect the closed window
    assert rows[0] == 2
    # window [50,60) never closes (final watermark 52 < 60): not emitted
    assert 50 not in rows


def test_streaming_dedup_collapses_redelivery(spark):
    from vtk_reserves_spark.streaming.ops import streaming_dedup

    ev = _events_stream(spark).select("event_id", "ts", "value")
    doubled = ev.unionByName(_events_stream(spark).select("event_id", "ts", "value"))
    out = run_available_now(
        streaming_dedup(doubled, "event_id"), output_mode="append",
        shuffle_partitions=4,
    )
    n_batch = _events_batch(spark).count()
    assert out.count() == n_batch
    assert out.select("event_id").distinct().count() == n_batch


def test_stream_interval_join_matches_batch(spark):
    from vtk_reserves_spark.streaming.ops import stream_interval_join

    ev = _events_stream(spark)
    s = ev.where("event_type = 'signup'").select("event_id", "ts", "user_id")
    p = ev.where("event_type = 'purchase'").select("event_id", "ts", "user_id")
    out = run_available_now(
        stream_interval_join(s, p, key="user_id", horizon="1 hour"),
        output_mode="append",
        shuffle_partitions=4,
    )
    b = _events_batch(spark)
    bs = b.where("event_type = 'signup'").alias("s")
    bp = b.where("event_type = 'purchase'").alias("p")
    expect = bs.join(
        bp,
        (F.col("s.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("s.ts"))
        & (F.col("p.ts") <= F.col("s.ts") + F.expr("INTERVAL 1 hour")),
    )
    assert out.count() == expect.count()
    got = _rows(out, ["event_id", "event_id_r"])
    want = sorted(
        (r["event_id"], r[4]) for r in expect.select("s.event_id", "s.ts",
                                                     "s.user_id", "p.ts",
                                                     "p.event_id").collect()
    )
    assert got == want


def test_stream_to_parquet_sink(spark, tmp_path):
    """Append-mode parquet sink: drained rows land in files and match the
    batch read; the checkpoint makes a second run a no-op (exactly-once)."""
    from vtk_reserves_spark.streaming.sinks import stream_to_parquet

    ev = _events_stream(spark).select("event_id", "user_id", "value")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = stream_to_parquet(ev, out, ck)
    q.awaitTermination()
    got = spark.read.parquet(out)
    want = _events_batch(spark).select("event_id", "user_id", "value")
    assert got.count() == want.count()
    assert _rows(got, ["event_id", "value"]) == _rows(want, ["event_id", "value"])
    # replay with the same checkpoint: no new data -> no duplicate rows
    q2 = stream_to_parquet(
        _events_stream(spark).select("event_id", "user_id", "value"), out, ck
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == want.count()


def test_stream_upsert_parquet_converges_to_batch_agg(spark, tmp_path):
    """foreachBatch upsert: UPDATE-mode aggregation materializes as a
    parquet table equal to the batch aggregation."""
    from pyspark.sql import functions as F

    from vtk_reserves_spark.streaming.sinks import stream_upsert_parquet

    agg = (
        _events_stream(spark)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    out, ck = str(tmp_path / "tab"), str(tmp_path / "ck2")
    q = stream_upsert_parquet(agg, out, ck, key_cols=["event_type"])
    q.awaitTermination()
    got = {
        r["event_type"]: (r["n"], round(r["sv"], 2))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["sv"], 2))
        for r in _events_batch(spark)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    assert got == want


def test_stream_topk_merges_across_batches(spark, tmp_path):
    """Top-k state merges correctly across micro-batches: items seen in
    batch 1 survive into batch 2's emission when they still rank, and
    the final per-key emission equals the batch row_number() answer.
    maxFilesPerTrigger=1 forces one micro-batch per file."""
    import os
    import time

    import pandas as pd

    from vtk_reserves_spark.streaming.ops import stream_topk

    d = str(tmp_path / "stream")
    os.makedirs(d)
    t0 = pd.Timestamp("2024-01-01")

    def write_batch(name, rows):
        pd.DataFrame(
            {
                "k": [r[0] for r in rows],
                "event_id": [r[1] for r in rows],
                "value": [float(r[2]) for r in rows],
                "ts": [t0] * len(rows),
            }
        ).to_parquet(
            f"{d}/{name}.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    write_batch("b1", [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0)])
    time.sleep(1.05)
    # batch 2: one value beats the incumbent top-2, one doesn't
    write_batch("b2", [("a", 4, 25.0), ("a", 5, 1.0), ("b", 6, 7.0)])

    sdf = read_stream(spark, d, max_files_per_trigger=1)
    out = run_available_now(
        stream_topk(sdf, "k", "value", "event_id", k=2),
        output_mode="update",
        shuffle_partitions=2,
    ).toPandas()
    rows = {(r["k"], int(r["rank"]), int(r["event_id"]), r["value"])
            for _, r in out.iterrows()}
    # rank 1 for "a" is id 2 in BOTH generations (batch-1 item survives
    # the merge into batch 2's emission)
    assert {t for t in rows if t[0] == "a" and t[1] == 1} == {("a", 1, 2, 30.0)}
    # batch-1 generation emitted id 3 at rank 2; batch 2's merge
    # displaced it with id 4 — both emissions are in the update-mode sink
    assert ("a", 2, 3, 20.0) in rows
    assert ("a", 2, 4, 25.0) in rows
    # id 5 (value 1.0) never ranked
    assert not any(t[2] == 5 for t in rows)
    assert ("b", 1, 6, 7.0) in rows


def test_stream_kmv_matches_batch_sketch(spark):
    """The streaming KMV state drains to bit-identical estimates vs the
    batch kmv_distinct operator (same deterministic md5 hashes)."""
    from vtk_reserves_spark.operators.sketch import kmv_distinct
    from vtk_reserves_spark.streaming.ops import stream_kmv_distinct

    got = {
        r.event_type: (r.n_kept, r.est_distinct)
        for r in run_available_now(
            stream_kmv_distinct(_events_stream(spark), "event_type", "user_id", k=32),
            output_mode="update",
            shuffle_partitions=4,
        ).collect()
    }
    want = {
        r.event_type: (r.n_kept, r.est_distinct)
        for r in kmv_distinct(
            _events_batch(spark), "event_type", "user_id", k=32
        ).collect()
    }
    assert got == want


def test_stream_upsert_composite_key_preserves_siblings(spark, tmp_path):
    """Composite-key upsert across micro-batches: a later batch that
    updates only ONE (type, user) group must not clobber sibling groups
    sharing the same first key component (regression: partitioning by a
    key PREFIX made dynamic overwrite delete unchanged siblings)."""
    import os
    import time

    import pandas as pd

    from vtk_reserves_spark.streaming.sinks import stream_upsert_parquet

    d = str(tmp_path / "stream")
    os.makedirs(d)
    t0 = pd.Timestamp("2024-01-01")

    def write_batch(name, rows):
        pd.DataFrame(
            {
                "et": [r[0] for r in rows],
                "uid": [r[1] for r in rows],
                "value": [float(r[2]) for r in rows],
                "ts": [t0] * len(rows),
            }
        ).to_parquet(
            f"{d}/{name}.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    # batch 1 creates two groups under the same et; batch 2 touches one
    write_batch("b1", [("click", 1, 1.0), ("click", 2, 5.0)])
    time.sleep(1.05)
    write_batch("b2", [("click", 1, 2.0)])

    sdf = read_stream(spark, d, max_files_per_trigger=1)
    agg = sdf.groupBy("et", "uid").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
    )
    out, ck = str(tmp_path / "tab"), str(tmp_path / "ck")
    q = stream_upsert_parquet(agg, out, ck, key_cols=["et", "uid"])
    q.awaitTermination()
    got = {
        (r["et"], r["uid"]): (r["n"], r["sv"])
        for r in spark.read.parquet(out).collect()
    }
    assert got[("click", 1)] == (2, 3.0)
    # the untouched sibling survived batch 2's overwrite
    assert got[("click", 2)] == (1, 5.0)


def test_stream_kmv_null_values_and_parity(spark, tmp_path):
    """NULLs in a long value column must neither count as distinct nor
    break hash parity with the batch sketch (Arrow int->float64 under
    nulls used to change every hash)."""
    import pandas as pd

    from vtk_reserves_spark.operators.sketch import kmv_distinct
    from vtk_reserves_spark.streaming import run_available_now
    from vtk_reserves_spark.streaming.ops import stream_kmv_distinct

    rows = [("a", v) for v in range(100)] + [("a", None)]
    src = str(tmp_path / "kmv")
    spark.createDataFrame(rows, "k string, v long").write.parquet(src)
    batch = spark.read.parquet(src)
    want = kmv_distinct(batch, "k", "v", k=64).collect()[0]
    sdf = spark.readStream.schema("k string, v long").parquet(src)
    got = (
        run_available_now(
            stream_kmv_distinct(sdf, "k", "v", k=64),
            output_mode="update",
            shuffle_partitions=2,
        )
        .collect()[-1]
    )
    assert got.n_kept == want.n_kept == 64
    assert got.est_distinct == want.est_distinct  # bit-identical


def test_stateful_user_stats_string_key(spark, tmp_path):
    """The output key type follows the input schema (hardcoded 'long'
    used to crash Arrow conversion for string keys)."""
    import pandas as pd

    from vtk_reserves_spark.streaming import run_available_now
    from vtk_reserves_spark.streaming.breakdown import stateful_user_stats

    pdf = pd.DataFrame(
        {
            "user_name": ["ann", "ann", "bob"],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01"]),
            "value": [1.0, 2.0, 5.0],
        }
    )
    src = str(tmp_path / "ustats")
    spark.createDataFrame(pdf).write.parquet(src)
    sdf = spark.readStream.schema(
        "user_name string, ts timestamp, value double"
    ).parquet(src)
    out = (
        run_available_now(
            stateful_user_stats(sdf, key_col="user_name"),
            output_mode="update",
            shuffle_partitions=2,
        )
        .toPandas()
        .set_index("user_name")
    )
    assert out.loc["ann", "n_events"] == 2
    assert out.loc["bob", "total_value"] == 5.0


def test_read_stream_escapes_glob_metachars(spark, tmp_path):
    """A single file whose NAME contains glob metacharacters must
    stream its actual rows, not silently match nothing."""
    import os
    import shutil

    import pandas as pd

    from vtk_reserves_spark.streaming import run_available_now
    from vtk_reserves_spark.streaming.breakdown import read_stream

    tmp = str(tmp_path / "plain.parquet")
    spark.createDataFrame(
        pd.DataFrame({"x": [1, 2, 3]})
    ).coalesce(1).write.parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
    )
    weird = str(tmp_path / "part[0].parquet")
    shutil.copy(os.path.join(tmp, part), weird)
    sdf = read_stream(spark, weird, schema="x bigint")
    out = run_available_now(sdf, output_mode="append", shuffle_partitions=2)
    assert out.count() == 3


def test_streaming_warc_ingest(spark, tmp_path):
    """Continuous-drop WARC ingestion: shards landing between
    micro-batches are picked up exactly once (checkpointed file
    source -> parquet sink), records parse identically to the batch
    reader."""
    from vtk_reserves_spark.sources.warc import read_warc_stream, write_warc

    d = tmp_path / "drop"
    d.mkdir()
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def shard(name, ids):
        (d / name).write_bytes(write_warc(
            [{"warc_type": "response", "target_uri": f"http://x/{i}",
              "http_status": 200, "http_content_type": "text/plain",
              "payload": f"p{i}".encode()} for i in ids],
            gzip_members=True,
        ))

    def drain():
        recs = read_warc_stream(spark, str(d))
        assert recs.isStreaming
        q = (
            recs.select("target_uri", "payload")
            .writeStream.format("parquet")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .option("path", out)
            .start()
        )
        q.awaitTermination(120)

    shard("a.warc.gz", [0, 1])
    drain()
    got = {r.target_uri for r in spark.read.parquet(out).collect()}
    assert got == {"http://x/0", "http://x/1"}

    # second drop: only the NEW shard is processed (exactly-once per
    # shard — no duplicates of the first drop in the appended output)
    shard("b.warc.gz", [2])
    drain()
    rows = [r.target_uri for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == ["http://x/0", "http://x/1", "http://x/2"]


def test_media_stream_routes_and_dead_letters(spark, tmp_path):
    """Streaming media ingest: magic-byte routing per file plus the
    dead-letter path for corrupt payloads (stream must not die)."""
    from vtk_reserves_spark.sources.mp3 import build_mp3
    from vtk_reserves_spark.sources.ogg import build_ogg
    from vtk_reserves_spark.streaming.media import read_media_stream

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.bin").write_bytes(build_mp3({"title": "T"}, 10, 128, 44100))
    (drop / "b.bin").write_bytes(
        build_ogg("opus", {"title": "O"}, 1, 48000, 4800)
    )
    (drop / "c.bin").write_bytes(b"\x00garbage payload\x00")
    out = read_media_stream(spark, str(drop))
    q = (
        out.writeStream.format("memory")
        .queryName("t_media_stream_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    rows = {r.file: r for r in spark.table("t_media_stream_sink").collect()}
    assert rows["a.bin"].mime == "audio/mpeg"
    assert rows["a.bin"].duration_s == pytest.approx(10 * 1152 / 44100)
    assert rows["b.bin"].mime == "audio/ogg" and rows["b.bin"].detail == "O"
    assert rows["b.bin"].duration_s == pytest.approx(0.1)
    assert rows["c.bin"].error is not None and rows["c.bin"].mime is None
