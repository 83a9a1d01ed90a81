"""Sitemap / RSS / Atom parsing — pure Catalyst (JVM regex).

Crawl frontier construction starts from the publisher-declared URL
surface: `robots.txt` (already covered in `functions/robots.py`)
points at sitemaps (sitemaps.org protocol), and site feeds (RSS 2.0 /
Atom RFC 4287) announce fresh content.  These extractors turn raw
sitemap/feed XML payloads into URL rows for frontier joins, per-domain
quota seeding and freshness scoring.  Reference parity note: the
reference repo has no web surface at all; this exists for the 100 TB
curation brief.

Scale shape: every function here is pure `pyspark.sql.functions`
(regexp_extract_all + explode + per-block regexp_extract) — the parse
runs inside whole-stage codegen at scan speed with zero Python, the
same design as `html_to_text` (`functions/text.py`).  Block-level
regex extraction is deliberately tolerant of the XML long tail
(namespace prefixes, attribute order, CDATA) where a strict XML parser
would need a Python UDF; fields that don't appear come back NULL, not
errors — the crawl posture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.text import HTML_ENTITIES

__all__ = [
    "xml_text_value",
    "sitemap_urls",
    "sitemap_index",
    "feed_entries",
]


def xml_text_value(raw: Column) -> Column:
    """Normalize an extracted XML text node: unwrap ``<![CDATA[...]]>``,
    decode the common named entities (``&amp;`` last, same table as
    ``html_to_text``), trim, and turn empty strings into NULL (a regex
    miss extracts '' — NULL is the honest value)."""
    out = F.regexp_replace(raw, r"(?s)<!\[CDATA\[(.*?)\]\]>", r"$1")
    for ent, rep in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.nullif(F.trim(out), F.lit(""))


def _tag(block: Column, name: str) -> Column:
    """Text content of the first ``<name>``/``<ns:name>`` element in a
    block (namespace-prefix tolerant, case-insensitive, attributes
    allowed on the open tag)."""
    pat = rf"(?is)<(?:\w+:)?{name}(?:\s[^>]*)?>(.*?)</(?:\w+:)?{name}\s*>"
    return xml_text_value(F.regexp_extract(block, pat, 1))


def sitemap_urls(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode sitemaps.org ``<urlset>`` payloads into one row per
    ``<url>`` entry: ``loc`` (required by the protocol; entries without
    one are dropped), ``lastmod``, ``changefreq``, ``priority``
    (double).  Other input columns pass through for provenance."""
    block = F.explode(
        F.regexp_extract_all(
            F.col(xml_col), F.lit(r"(?is)<(?:\w+:)?url(?:\s[^>]*)?>(.*?)</(?:\w+:)?url\s*>"), F.lit(1)
        )
    ).alias("__block")
    out = df.select("*", block)
    out = out.select(
        *[c for c in df.columns if c != xml_col],
        _tag(F.col("__block"), "loc").alias("loc"),
        _tag(F.col("__block"), "lastmod").alias("lastmod"),
        _tag(F.col("__block"), "changefreq").alias("changefreq"),
        _tag(F.col("__block"), "priority").cast("double").alias("priority"),
    )
    return out.where(F.col("loc").isNotNull())


def sitemap_index(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode ``<sitemapindex>`` payloads into one row per child
    ``<sitemap>``: ``loc`` + ``lastmod`` — the recursion frontier a
    crawler fetches next (sitemaps.org caps an index at 50k children /
    50 MB, so the explode fan-out is bounded by protocol)."""
    block = F.explode(
        F.regexp_extract_all(
            F.col(xml_col),
            F.lit(r"(?is)<(?:\w+:)?sitemap(?:\s[^>]*)?>(.*?)</(?:\w+:)?sitemap\s*>"),
            F.lit(1),
        )
    ).alias("__block")
    out = df.select("*", block)
    out = out.select(
        *[c for c in df.columns if c != xml_col],
        _tag(F.col("__block"), "loc").alias("loc"),
        _tag(F.col("__block"), "lastmod").alias("lastmod"),
    )
    return out.where(F.col("loc").isNotNull())


def feed_entries(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode RSS 2.0 ``<item>`` AND Atom ``<entry>`` payloads into
    one row per entry: ``kind`` ('rss'|'atom'), ``title``, ``link``
    (RSS text link, or the Atom ``<link href=...>`` attribute —
    alternate-rel preferred via first match), ``published`` (RSS
    pubDate / Atom published|updated), ``entry_id`` (RSS guid / Atom
    id), ``summary`` (RSS description / Atom summary).  Entries
    missing every field are dropped; other input columns pass
    through."""
    xml = F.col(xml_col)
    items = F.transform(
        F.regexp_extract_all(
            xml, F.lit(r"(?is)<item(?:\s[^>]*)?>(.*?)</item\s*>"), F.lit(1)
        ),
        lambda b: F.struct(F.lit("rss").alias("kind"), b.alias("block")),
    )
    entries = F.transform(
        F.regexp_extract_all(
            xml, F.lit(r"(?is)<entry(?:\s[^>]*)?>(.*?)</entry\s*>"), F.lit(1)
        ),
        lambda b: F.struct(F.lit("atom").alias("kind"), b.alias("block")),
    )
    ex = F.explode(F.concat(items, entries)).alias("__e")
    out = df.select("*", ex)
    b = F.col("__e.block")
    kind = F.col("__e.kind")
    rss = kind == "rss"
    atom_href = xml_text_value(
        F.regexp_extract(
            b, r'(?is)<(?:\w+:)?link\b[^>]*\bhref\s*=\s*"([^"]*)"', 1
        )
    )
    out = out.select(
        *[c for c in df.columns if c != xml_col],
        kind.alias("kind"),
        _tag(b, "title").alias("title"),
        F.when(rss, _tag(b, "link")).otherwise(atom_href).alias("link"),
        F.when(rss, _tag(b, "pubDate"))
        .otherwise(F.coalesce(_tag(b, "published"), _tag(b, "updated")))
        .alias("published"),
        F.when(rss, _tag(b, "guid")).otherwise(_tag(b, "id")).alias("entry_id"),
        F.when(rss, _tag(b, "description"))
        .otherwise(_tag(b, "summary"))
        .alias("summary"),
    )
    return out.where(
        F.col("title").isNotNull()
        | F.col("link").isNotNull()
        | F.col("entry_id").isNotNull()
    )
