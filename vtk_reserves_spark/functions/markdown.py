"""Markdown structure mining — pure Catalyst.

Markdown is the native format of the code/docs half of a training
corpus (READMEs, documentation sites, notebooks-as-md, chat
exports).  Curation wants its STRUCTURE, not just flat text: YAML
frontmatter keys (title/language/tags drive routing), heading
outline, fenced-code language census (the code-vs-prose mix signal),
link density, and prose word counts that EXCLUDE code blocks.

Everything here is Catalyst expressions over Java regex — scan
speed over a 100 TB corpus, zero Python — mirroring the approach of
`functions/html_meta.py`.  The frontmatter parser handles the
simple ``key: value`` scalar subset (quoted or bare) that covers
real-world static-site frontmatter; nested YAML is out of scope by
design (documented, returns only the scalar keys).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "md_frontmatter", "md_headings", "md_code_blocks", "md_links",
    "md_stats",
]

_FM_BLOCK = r"(?s)\A---\r?\n(.*?)\r?\n---(?:\r?\n|\Z)"
_FENCE = r"(?sm)^```([^\r\n`]*)\r?\n(.*?)^```[ \t]*$"


def _fm_text(md: Column) -> Column:
    return F.regexp_extract(md, _FM_BLOCK, 1)


def md_frontmatter(md: Column) -> Column:
    """Leading ``---`` YAML frontmatter -> map of the scalar
    ``key: value`` pairs (values unquoted; nested structures are
    skipped).  Empty map when there is no frontmatter block."""
    lines = F.regexp_extract_all(
        _fm_text(md),
        F.lit(r"(?m)^([A-Za-z_][\w.-]*):[ \t]*([^\r\n]*)$"),
        F.lit(0),
    )
    pairs = F.transform(
        lines,
        lambda kv: F.struct(
            F.regexp_extract(kv, r"^([A-Za-z_][\w.-]*):", 1).alias("k"),
            F.regexp_replace(
                F.trim(F.regexp_extract(kv, r":[ \t]*(.*)$", 1)),
                "^[\"']|[\"']$",
                "",
            ).alias("v"),
        ),
    )
    scalars = F.filter(pairs, lambda p: p.getField("v") != "")
    return F.map_from_arrays(
        F.transform(scalars, lambda p: p.getField("k")),
        F.transform(scalars, lambda p: p.getField("v")),
    )


def _body(md: Column) -> Column:
    """Markdown minus the frontmatter block."""
    return F.regexp_replace(md, _FM_BLOCK, "")


def _without_code(md: Column) -> Column:
    return F.regexp_replace(_body(md), _FENCE, " ")


def md_headings(md: Column) -> Column:
    """ATX headings -> array of ``(level, text)`` structs in
    document order (fenced code is removed first, so a ``# comment``
    inside a shell block is not a heading)."""
    lines = F.regexp_extract_all(
        _without_code(md),
        F.lit(r"(?m)^(#{1,6})[ \t]+(\S[^\r\n]*)$"),
        F.lit(0),
    )
    return F.transform(
        lines,
        lambda h: F.struct(
            F.length(F.regexp_extract(h, r"^(#{1,6})", 1)).alias("level"),
            F.trim(F.regexp_extract(h, r"^#{1,6}[ \t]+(.*)$", 1))
            .alias("text"),
        ),
    )


def md_code_blocks(md: Column) -> Column:
    """Fenced code blocks -> array of ``(lang, n_lines)`` structs
    (``lang`` is the info string, '' when bare)."""
    blocks = F.regexp_extract_all(_body(md), F.lit(_FENCE), F.lit(0))
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(
                F.regexp_extract(b, r"(?s)^```([^\r\n`]*)", 1)
            ).alias("lang"),
            (
                F.size(
                    F.split(
                        F.regexp_extract(b, _FENCE, 2), r"\r?\n"
                    )
                )
                - 1
            ).alias("n_lines"),
        ),
    )


def md_links(md: Column) -> Column:
    """Inline links/images -> array of ``(text, url)`` structs
    (images carry their alt text; code blocks excluded)."""
    raw = F.regexp_extract_all(
        _without_code(md),
        F.lit(r"!?\[([^\]]*)\]\(([^)\s]+)[^)]*\)"),
        F.lit(0),
    )
    return F.transform(
        raw,
        lambda l: F.struct(
            F.regexp_extract(l, r"\[([^\]]*)\]", 1).alias("text"),
            F.regexp_extract(l, r"\(([^)\s]+)", 1).alias("url"),
        ),
    )


def md_stats(md: Column) -> Column:
    """One-pass structure summary: struct ``(n_headings,
    n_code_blocks, code_lines, n_links, prose_words)`` —
    ``prose_words`` counts whitespace-separated tokens of the
    document with frontmatter and fenced code removed, the
    code-vs-prose mix signal."""
    headings = md_headings(md)
    code = md_code_blocks(md)
    links = md_links(md)
    prose = F.trim(F.regexp_replace(_without_code(md), r"\s+", " "))
    words = F.when(prose == "", F.lit(0)).otherwise(
        F.size(F.split(prose, " "))
    )
    return F.struct(
        F.size(headings).alias("n_headings"),
        F.size(code).alias("n_code_blocks"),
        F.aggregate(
            code, F.lit(0), lambda acc, c: acc + c.getField("n_lines")
        ).alias("code_lines"),
        F.size(links).alias("n_links"),
        words.alias("prose_words"),
    )
