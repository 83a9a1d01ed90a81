"""URL analysis expressions for crawl curation — pure Catalyst.

Web-scale corpus pipelines partition, deduplicate and quota BY DOMAIN
(per-domain caps are how CC-derived datasets control site dominance),
so these run as JVM expressions at scan speed: no Python, no UDFs.
Every function has an exact SQL closed form for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: multi-part public suffixes the registered-domain heuristic knows.
#: A full public-suffix list is a data file, not an algorithm; this
#: documented subset covers the dominant ccTLD second-levels.  Rows
#: whose suffix is missing from the list degrade to last-two-labels.
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za", "com.sg", "com.tw",
)

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*):\/\/([^\/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"


def url_scheme(url: Column) -> Column:
    return F.nullif(F.lower(F.regexp_extract(url, _URL_RE, 1)), F.lit(""))


def url_host(url: Column) -> Column:
    """Host (authority minus userinfo/port), lower-cased; NULL when the
    value does not parse as an absolute URL."""
    auth = F.regexp_extract(url, _URL_RE, 2)
    host = F.regexp_replace(auth, r"^[^@]*@", "")  # strip userinfo
    host = F.regexp_replace(host, r":\d*$", "")  # strip port
    return F.nullif(F.lower(host), F.lit(""))


def url_port(url: Column) -> Column:
    auth = F.regexp_extract(url, _URL_RE, 2)
    return F.nullif(F.regexp_extract(auth, r":(\d+)$", 1), F.lit("")).cast("int")


def url_path(url: Column) -> Column:
    """Path component ('' when absent — distinct from NULL no-parse)."""
    parsed = F.regexp_extract(url, _URL_RE, 3)
    return F.when(url_host(url).isNotNull(), parsed)


def url_query(url: Column) -> Column:
    return F.nullif(F.regexp_extract(url, _URL_RE, 4), F.lit(""))


def registered_domain(host: Column) -> Column:
    """Heuristic eTLD+1: the last two labels, or three when the last
    two form a known multi-part suffix (co.uk, com.au, ...).  NULL for
    NULL/label-free hosts.  Documented approximation of the
    public-suffix list — sufficient for per-domain quotas/stats."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    multi = last2.isin(*MULTI_PART_SUFFIXES)
    take3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(host.isNull() | (n < 2), host)
        .when(multi & (n >= 3), take3)
        .otherwise(last2)
    )


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments — the standard cheap
    page-depth signal (nav/landing pages sit shallow)."""
    p = url_path(url)
    segs = F.filter(F.split(p, "/"), lambda s: s != "")
    return F.when(p.isNotNull(), F.size(segs))
