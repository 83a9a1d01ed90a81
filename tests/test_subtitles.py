"""SRT / WebVTT cue extraction tests (functions/subtitles.py) — pure
Catalyst parsing: timing formats, header/NOTE dropping, cue ids,
settings, multi-line text, transcript reduction."""

from __future__ import annotations

from pyspark.sql import functions as F

from vtk_reserves_spark.functions.subtitles import (
    subtitle_cues,
    subtitle_transcripts,
)

SRT = """1
00:00:01,000 --> 00:00:04,200
Hello there.

2
00:00:05,500 --> 00:01:00,000
Line one
Line two

3
bad timing line
"""

VTT = """WEBVTT Kind: captions

NOTE this block must be dropped

intro
00:01.000 --> 00:04.500 align:start position:10%
<v Roger>Welcome.

01:02:03.250 --> 01:02:04.000
Second cue.
"""

CRLF = "1\r\n00:00:00,100 --> 00:00:00,900\r\nWindows line endings\r\n"


def _rows(spark, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload string"
    )
    return {
        (r["doc_id"], r["start_ms"]): r
        for r in subtitle_cues(df).collect()
    }


def test_srt_cues(spark):
    rows = _rows(spark, [SRT])
    assert set(rows) == {(0, 1000), (0, 5500)}
    r1 = rows[(0, 1000)]
    assert r1["kind"] == "srt"
    assert r1["cue_index"] == 1 and r1["cue_id"] == "1"
    assert r1["end_ms"] == 4200
    assert r1["settings"] is None
    assert r1["text"] == "Hello there."
    r2 = rows[(0, 5500)]
    assert r2["end_ms"] == 60000
    assert r2["text"] == "Line one\nLine two"


def test_vtt_header_note_and_settings(spark):
    rows = _rows(spark, [VTT])
    assert set(rows) == {(0, 1000), (0, 3723250)}
    r1 = rows[(0, 1000)]
    assert r1["kind"] == "vtt"
    assert r1["cue_index"] is None and r1["cue_id"] == "intro"
    assert r1["end_ms"] == 4500
    assert r1["settings"] == "align:start position:10%"
    assert r1["text"] == "<v Roger>Welcome."
    r2 = rows[(0, 3723250)]
    assert r2["cue_id"] is None and r2["end_ms"] == 3724000


def test_crlf_payload(spark):
    rows = _rows(spark, [CRLF])
    assert set(rows) == {(0, 100)}
    assert rows[(0, 100)]["text"] == "Windows line endings"


def test_passthrough_and_empty(spark):
    df = spark.createDataFrame(
        [(7, "u7", SRT), (8, "u8", "no cues here")],
        "doc_id long, url string, payload string",
    )
    out = subtitle_cues(df)
    assert set(out.columns) == {
        "doc_id", "url", "kind", "cue_index", "cue_id",
        "start_ms", "end_ms", "settings", "text",
    }
    got = out.select("doc_id", "url").distinct().collect()
    assert [(r["doc_id"], r["url"]) for r in got] == [(7, "u7")]


def test_transcripts(spark):
    df = spark.createDataFrame(
        [(1, SRT), (2, VTT)], "doc_id long, payload string"
    )
    out = {
        r["doc_id"]: r
        for r in subtitle_transcripts(df).orderBy("doc_id").collect()
    }
    assert out[1]["transcript"] == "Hello there. Line one\nLine two"
    assert out[1]["n_cues"] == 2
    assert out[1]["span_ms"] == 60000 - 1000
    assert out[2]["n_cues"] == 2
    assert out[2]["span_ms"] == 3724000 - 1000


def test_transcript_plan_one_shuffle(spark):
    df = spark.createDataFrame([(1, SRT)], "doc_id long, payload string")
    plan = subtitle_transcripts(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
