"""iCalendar (RFC 5545) event extraction — pure Catalyst.

.ics payloads are a steady crawl surface (event sites, university
schedules, venue calendars) and a structured-text source for
temporal-grounding data.  The format is line-oriented
``NAME;PARAMS:VALUE`` with one genuinely tricky rule — long lines
FOLD with a CRLF + single space/tab continuation (RFC 5545 §3.1) —
so extraction unfolds first, then pulls ``BEGIN:VEVENT`` blocks and
their properties with anchored regexps.  All inside whole-stage
codegen, the `functions/svg.py` posture.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["ics_events"]


def _c(s: Column | str) -> Column:
    return F.col(s) if isinstance(s, str) else s


def _prop(block: Column, name: str) -> Column:
    # NAME or NAME;PARAM=...: value runs to end of line
    v = F.regexp_extract(
        block, r"(?im)^" + name + r"(?:;[^:\r\n]*)?:([^\r\n]*)", 1
    )
    return F.when(v != "", F.trim(v))


def ics_events(ics: Column | str) -> Column:
    """Array of (summary, dtstart, dtend, location, uid) structs
    over the payload's VEVENT blocks, line folding unfolded first;
    escaped text (``\\,`` ``\\;`` ``\\n``) is unescaped in
    SUMMARY/LOCATION."""
    unfolded = F.regexp_replace(_c(ics), r"\r?\n[ \t]", "")
    blocks = F.regexp_extract_all(
        unfolded,
        F.lit(r"(?is)BEGIN:VEVENT(.*?)END:VEVENT"),
        F.lit(1),
    )

    def unescape(c: Column) -> Column:
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, r"\\n", "\n"), r"\\([,;])", "$1"
            ),
            r"\\\\", r"\\",
        )

    def build(b: Column) -> Column:
        text = lambda n: unescape(_prop(b, n))  # noqa: E731
        return F.struct(
            text("SUMMARY").alias("summary"),
            _prop(b, "DTSTART").alias("dtstart"),
            _prop(b, "DTEND").alias("dtend"),
            text("LOCATION").alias("location"),
            _prop(b, "UID").alias("uid"),
        )

    return F.transform(blocks, build)
