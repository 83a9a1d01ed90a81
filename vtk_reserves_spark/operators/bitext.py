"""Bitext candidate mining — language-variant URL pairing.

Parallel-corpus (MT training) pipelines bootstrap from the web's
own translation structure: most multilingual sites expose the same
page under language-tagged URL variants (``/en/about`` vs
``/de/about``, ``en.site.com`` vs ``de.site.com``).  Pairing those
URLs yields bitext CANDIDATES — the cheap, high-precision first
stage before any content alignment model runs (the
ParaCrawl/CCMatrix shape).  Reference parity note: no counterpart;
LLM-pipeline addition.

Pure Catalyst: the language segment is regexp-extracted and
replaced with a placeholder to form the pairing key, then one
self-equi-join on (key) emits cross-language pairs — the shuffle is
keyed on the normalized URL, never all-pairs.  Path-segment and
subdomain conventions are both handled; the two-letter segment set
is restricted to real ISO 639-1 codes to avoid ``/tv/``-style false
positives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_lang_key", "bitext_candidates"]

# ISO 639-1 codes that actually appear as web URL language tags —
# restricting the match set keeps /tv/, /go/, /id/<number> paths out
# (id IS a language code; the trailing-slash anchor disambiguates).
_LANGS = (
    "en|de|fr|es|it|pt|nl|ru|ja|zh|ko|ar|tr|pl|sv|da|no|fi|cs|el|he"
    "|hi|th|vi|uk|ro|hu|bg|id|ms|fa"
)

_PATH_RE = r"^(https?://[^/]+/)(" + _LANGS + r")(?:-[a-z]{2})?/"
_HOST_RE = r"^(https?://)(" + _LANGS + r")\.((?:[\w-]+\.)+[a-z]{2,})"


def url_lang_key(url: Column | str) -> Column:
    """Struct of (lang, key): the language tag found in the URL's
    first path segment (``/en/``, ``/pt-br/``) or subdomain
    (``en.example.org``), and the URL with that tag replaced by
    ``{L}`` — equal keys identify translation variants.  lang/key
    are NULL for URLs with no language structure."""
    u = F.col(url) if isinstance(url, str) else url
    path_lang = F.regexp_extract(u, _PATH_RE, 2)
    host_lang = F.regexp_extract(u, _HOST_RE, 2)
    lang = F.when(path_lang != "", path_lang).otherwise(
        F.when(host_lang != "", host_lang)
    )
    key = F.when(
        path_lang != "",
        F.regexp_replace(u, _PATH_RE, r"$1{L}/"),
    ).otherwise(
        F.when(
            host_lang != "",
            F.regexp_replace(u, _HOST_RE, r"$1{L}.$3"),
        )
    )
    return F.struct(lang.alias("lang"), key.alias("key"))


def bitext_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    pivot_lang: str | None = None,
) -> DataFrame:
    """Cross-language candidate pairs from a (id, url) table: one
    self-equi-join on the language-normalized URL key.  Returns
    (key, lang_a, id_a, lang_b, id_b) with lang_a < lang_b (each
    unordered pair once).  ``pivot_lang`` restricts side A to one
    language (the usual English-pivot mining), halving the join
    output without changing recall against the pivot."""
    tagged = df.select(
        F.col(id_col).alias("id"),
        url_lang_key(F.col(url_col)).alias("lk"),
    ).select("id", "lk.lang", "lk.key").where(F.col("lang").isNotNull())
    a = tagged.select(
        F.col("key"), F.col("lang").alias("lang_a"), F.col("id").alias("id_a")
    )
    if pivot_lang is not None:
        a = a.where(F.col("lang_a") == pivot_lang)
    b = tagged.select(
        F.col("key"), F.col("lang").alias("lang_b"), F.col("id").alias("id_b")
    )
    return a.join(b, "key").where(F.col("lang_a") < F.col("lang_b"))
