"""SRT / WebVTT subtitle parsing — pure Catalyst (JVM regex).

Subtitle files are the backbone of video-text training corpora
(speech-to-text alignment, video captioning): every crawl of a video
site yields `.srt` (SubRip) and `.vtt` (W3C WebVTT) payloads, and the
cue timings are what aligns transcript text to media frames.  These
extractors turn raw subtitle text into one row per cue with integer
millisecond bounds, ready for range/as-of joins against frame tables
(`operators/asof.py`).  Reference parity note: the reference repo has
no subtitle surface; this exists for the 100 TB multimodal brief.

Scale shape: pure `pyspark.sql.functions` — blocks split on blank
lines, per-block fields via regexp_extract — the whole parse runs
inside whole-stage codegen at scan speed with zero Python, the same
design as `functions/feeds.py`.  Non-cue blocks (the WEBVTT header,
NOTE / STYLE / REGION blocks) are dropped by the one structural
invariant both formats share: a cue block contains a ``-->`` timing
line.  Malformed cues yield NULL fields, not errors — the crawl
posture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["subtitle_cues", "subtitle_transcripts"]

# SRT uses comma decimals (00:00:01,500), WebVTT uses dots
# (00:00:01.500) and makes the hours field optional (01:02.500).
_TS = r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})"


def _ts_ms(line: Column, which: int) -> Column:
    """Millisecond value of the first (``which=0``) or second
    (``which=1``) timestamp on a timing line; NULL when absent."""
    pat = _TS + r"\s*-->\s*" + _TS
    g = which * 4
    h = F.regexp_extract(line, pat, g + 1)
    m = F.regexp_extract(line, pat, g + 2)
    s = F.regexp_extract(line, pat, g + 3)
    ms = F.regexp_extract(line, pat, g + 4)
    total = (
        (
            F.coalesce(F.nullif(h, F.lit("")), F.lit("0")).try_cast("long")
            * 3600
            + m.try_cast("long") * 60
            + s.try_cast("long")
        )
        * 1000
        + ms.try_cast("long")
    )
    return F.when(F.nullif(m, F.lit("")).isNotNull(), total)


def subtitle_cues(df: DataFrame, text_col: str = "payload") -> DataFrame:
    """Explode SRT / WebVTT payloads into one row per cue.

    Output columns (input columns other than ``text_col`` pass
    through for provenance):

    - ``kind`` — 'vtt' if the payload opens with the WEBVTT magic
      (after an optional BOM), else 'srt';
    - ``cue_index`` — the SRT numeric counter line (int, NULL when
      the cue has no numeric id — the WebVTT norm);
    - ``cue_id`` — the raw identifier line preceding the timing line
      (WebVTT cue ids are arbitrary text; for SRT this is the counter
      as a string);
    - ``start_ms`` / ``end_ms`` — cue bounds in integer milliseconds
      (hours optional per WebVTT; comma and dot decimals both
      accepted in either format, the de-facto tolerance);
    - ``settings`` — text after the end timestamp on the timing line
      (WebVTT cue settings like ``align:start``), NULL when empty;
    - ``text`` — the cue payload lines joined by ``\\n``, trimmed.

    Blocks without a ``-->`` line (the ``WEBVTT`` header block,
    ``NOTE``/``STYLE``/``REGION`` blocks) are dropped, as are cues
    whose timing line fails to parse (start_ms NULL).
    """
    def strip(c: Column) -> Column:
        # F.trim strips only 0x20 — cue bodies end in \n, so strip all
        # leading/trailing whitespace by regex.
        return F.regexp_replace(c, r"(?s)^\s+|\s+$", "")

    src = F.col(text_col)
    kind = F.when(
        F.regexp_like(src, F.lit(r"(?s)^﻿?WEBVTT(?:[ \t\n].*)?$")),
        F.lit("vtt"),
    ).otherwise(F.lit("srt"))
    block = F.explode(
        F.split(F.regexp_replace(src, r"\r\n?", "\n"), r"\n[ \t]*\n+")
    ).alias("__block")
    out = df.select("*", kind.alias("kind"), block)
    b = F.col("__block")
    timing = F.regexp_extract(b, r"(?m)^([^\n]*-->[^\n]*)$", 1)
    cue_id = F.nullif(
        strip(F.regexp_extract(b, r"^([^\n]*?)[ \t]*\n[^\n]*-->", 1)),
        F.lit(""),
    )
    body = F.nullif(
        strip(F.regexp_extract(b, r"(?s)-->[^\n]*\n(.*)", 1)), F.lit("")
    )
    settings = F.nullif(
        strip(F.regexp_extract(timing, _TS + r"\s*-->\s*" + _TS + r"(.*)", 9)),
        F.lit(""),
    )
    out = out.select(
        *[c for c in df.columns if c != text_col],
        F.col("kind"),
        cue_id.try_cast("int").alias("cue_index"),
        cue_id.alias("cue_id"),
        _ts_ms(timing, 0).alias("start_ms"),
        _ts_ms(timing, 1).alias("end_ms"),
        settings.alias("settings"),
        body.alias("text"),
    )
    return out.where(F.col("start_ms").isNotNull())


def subtitle_transcripts(
    df: DataFrame, text_col: str = "payload", id_cols: list[str] | None = None
) -> DataFrame:
    """Reduce subtitle payloads to one transcript row per document:
    cues ordered by ``start_ms``, texts joined by single spaces, plus
    ``n_cues`` and the total ``span_ms`` (last end minus first start)
    — the text side of a video-caption training pair.  One shuffle on
    the id columns; cue ordering rides the aggregation via
    array_sort on (start_ms, text) structs, not a global sort."""
    id_cols = id_cols or ["doc_id"]
    cues = subtitle_cues(df, text_col)
    pair = F.struct(F.col("start_ms"), F.col("end_ms"), F.col("text"))
    return (
        cues.groupBy(*id_cols)
        .agg(F.array_sort(F.collect_list(pair)).alias("__c"))
        .select(
            *id_cols,
            F.array_join(
                F.transform(F.col("__c"), lambda c: c["text"]), " "
            ).alias("transcript"),
            F.size(F.col("__c")).cast("int").alias("n_cues"),
            (
                F.element_at(F.col("__c"), -1)["end_ms"]
                - F.element_at(F.col("__c"), 1)["start_ms"]
            ).alias("span_ms"),
        )
    )
