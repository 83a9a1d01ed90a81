"""HTML structured-metadata extraction — pure Catalyst (JVM regex,
zero Python).

Beyond visible text (`functions/text.html_to_text`), crawl curation
mines the page's MACHINE-readable metadata: OpenGraph tags drive
title/image/description dedup keys, ``rel=canonical`` collapses URL
aliases before per-domain quotas, ``hreflang`` alternates feed
language routing, and schema.org JSON-LD blocks carry typed entities
(Article, Product, Recipe...) that dataset builders filter on.  All
of it is regexp-reachable without a DOM — these run inside
whole-stage codegen at scan speed over 100 TB, the same posture as
`functions/svg.py`.

Extraction notes (the parts a naive regex gets wrong, handled here):
* meta tags order ``property``/``name`` and ``content`` attributes
  BOTH ways in the wild — both orders are matched;
* ``rel=canonical`` likewise precedes or follows ``href``;
* JSON-LD script blocks are extracted verbatim (bodies are JSON, so
  downstream ``get_json_object`` / ``from_json`` parse them
  JVM-side); ``@type`` is surfaced directly for the common
  filter-by-entity-type case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "meta_content", "og_tags", "canonical_url", "hreflang_map",
    "jsonld_blocks", "jsonld_types", "html_tables",
]


def _c(s: Column | str) -> Column:
    return F.col(s) if isinstance(s, str) else s


def meta_content(html: Column | str, key: str) -> Column:
    """Content of ``<meta property=key content=...>`` (or
    ``name=key``), tolerating either attribute order; empty string
    when absent."""
    h = _c(html)
    fwd = F.regexp_extract(
        h,
        r'(?is)<meta\b[^>]*(?:property|name)\s*=\s*["\']'
        + key + r'["\'][^>]*\bcontent\s*=\s*["\']([^"\']*)["\']',
        1,
    )
    rev = F.regexp_extract(
        h,
        r'(?is)<meta\b[^>]*\bcontent\s*=\s*["\']([^"\']*)["\']'
        r'[^>]*(?:property|name)\s*=\s*["\']' + key + r'["\']',
        1,
    )
    return F.when(fwd != "", fwd).otherwise(rev)


def og_tags(html: Column | str) -> Column:
    """Struct of the core OpenGraph surface: og:title, og:image,
    og:description, og:type, og:url (NULL-when-absent strings)."""
    h = _c(html)

    def tag(name: str) -> Column:
        v = meta_content(h, "og:" + name)
        return F.when(v != "", v).alias(name)

    return F.struct(
        tag("title"), tag("image"), tag("description"),
        tag("type"), tag("url"),
    )


def canonical_url(html: Column | str) -> Column:
    """``<link rel=canonical href=...>`` with either attribute
    order; NULL when absent.  The URL-alias collapse key that runs
    BEFORE per-domain quotas."""
    h = _c(html)
    fwd = F.regexp_extract(
        h,
        r'(?is)<link\b[^>]*rel\s*=\s*["\']canonical["\']'
        r'[^>]*\bhref\s*=\s*["\']([^"\']*)["\']',
        1,
    )
    rev = F.regexp_extract(
        h,
        r'(?is)<link\b[^>]*\bhref\s*=\s*["\']([^"\']*)["\']'
        r'[^>]*rel\s*=\s*["\']canonical["\']',
        1,
    )
    out = F.when(fwd != "", fwd).otherwise(rev)
    return F.when(out != "", out)


def hreflang_map(html: Column | str) -> Column:
    """Map of hreflang -> href over ``<link rel=alternate>`` tags —
    the language-alternate graph for multilingual corpus routing."""
    h = _c(html)
    links = F.regexp_extract_all(
        h,
        F.lit(
            r'(?is)(<link\b[^>]*rel\s*=\s*["\']alternate["\'][^>]*>)'
        ),
        F.lit(1),
    )
    lang = lambda l: F.regexp_extract(  # noqa: E731
        l, r'(?is)hreflang\s*=\s*["\']([^"\']*)["\']', 1
    )
    href = lambda l: F.regexp_extract(  # noqa: E731
        l, r'(?is)\bhref\s*=\s*["\']([^"\']*)["\']', 1
    )
    pairs = F.filter(
        F.transform(links, lambda l: F.struct(
            lang(l).alias("lang"), href(l).alias("href")
        )),
        lambda p: (p["lang"] != "") & (p["href"] != ""),
    )
    return F.map_from_arrays(
        F.transform(pairs, lambda p: p["lang"]),
        F.transform(pairs, lambda p: p["href"]),
    )


def jsonld_blocks(html: Column | str) -> Column:
    """Array of raw JSON-LD block bodies
    (``<script type=application/ld+json>``), verbatim — parse with
    ``get_json_object``/``from_json`` downstream, still JVM-side."""
    return F.regexp_extract_all(
        _c(html),
        F.lit(
            r'(?is)<script\b[^>]*type\s*=\s*["\']application/ld\+json["\']'
            r"[^>]*>(.*?)</script>"
        ),
        F.lit(1),
    )


def jsonld_types(html: Column | str) -> Column:
    """Array of schema.org ``@type`` values across the page's
    JSON-LD blocks — the filter-by-entity-type shortcut (Article /
    Product / Recipe corpora)."""
    return F.filter(
        F.transform(
            jsonld_blocks(html),
            lambda b: F.get_json_object(b, "$['@type']"),
        ),
        lambda t: t.isNotNull(),
    )


def html_tables(html: Column | str) -> Column:
    """Array over the page's ``<table>`` elements: each table is an
    array of rows, each row an array of cell strings (``<th>`` and
    ``<td>`` both count; nested markup stripped, entities decoded,
    whitespace collapsed).  Table-to-text extraction is its own LLM
    data family — tabular facts survive as text only if cell
    boundaries do; a global tag strip destroys them."""
    h = _c(html)
    tables = F.regexp_extract_all(
        h, F.lit(r"(?is)<table\b[^>]*>(.*?)</table>"), F.lit(1)
    )

    def cells(row: Column) -> Column:
        frags = F.regexp_extract_all(
            row, F.lit(r"(?is)<t[dh]\b[^>]*>(.*?)</t[dh]>"), F.lit(1)
        )
        return F.transform(
            frags,
            lambda c: F.trim(F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(c, r"(?s)<[^>]+>", " "),
                    "&amp;", "&",
                ),
                r"\s+", " ",
            )),
        )

    return F.transform(
        tables,
        lambda t: F.transform(
            F.regexp_extract_all(
                t, F.lit(r"(?is)<tr\b[^>]*>(.*?)</tr>"), F.lit(1)
            ),
            cells,
        ),
    )
