"""URL analysis expressions for crawl curation — pure Catalyst.

Web-scale corpus pipelines partition, deduplicate and quota BY DOMAIN
(per-domain caps are how CC-derived datasets control site dominance),
so these run as JVM expressions at scan speed: no Python, no UDFs.
Every function has an exact SQL closed form for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.psl_data import (
    EXACT_2,
    EXACT_3,
    EXCEPTIONS_2,
    EXCEPTIONS_3,
    WILDCARD_PARENTS_1,
    WILDCARD_PARENTS_2,
    WILDCARD_PARENTS_3,
)

#: kept name for back-compat: the exact 2-label public suffixes known
#: to the snapshot (see psl_data.py for the full rule set).
MULTI_PART_SUFFIXES = EXACT_2

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


def public_suffix_len(host: Column) -> Column:
    """Label count of the host's public suffix under the PSL snapshot
    (psl_data.py), evaluated entirely in Catalyst: the candidate tails
    (last 1–4 labels) are probed against the rule sets with `isin`
    (InSet hash lookups — O(1) per row, no join, no UDF), longest
    match wins, exception rules override wildcards per the PSL
    algorithm, and the implicit `*` rule yields 1 for unknown TLDs."""
    parts = F.split(host, r"\.")
    n = F.size(parts)

    def lastk(k: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(parts, -i) for i in range(k, 0, -1)]
        )

    l1, l2, l3, l4 = (
        F.element_at(parts, -1), lastk(2), lastk(3), lastk(4),
    )
    return (
        F.when((n >= 3) & l3.isin(*EXCEPTIONS_3), F.lit(2))
        .when((n >= 2) & l2.isin(*EXCEPTIONS_2), F.lit(1))
        .when((n >= 4) & l3.isin(*WILDCARD_PARENTS_3), F.lit(4))
        .when((n >= 3) & (l3.isin(*EXACT_3) | l2.isin(*WILDCARD_PARENTS_2)), F.lit(3))
        .when((n >= 2) & (l2.isin(*EXACT_2) | l1.isin(*WILDCARD_PARENTS_1)), F.lit(2))
        .otherwise(F.lit(1))
    )


def registered_domain(host: Column) -> Column:
    """eTLD+1 under the public-suffix-list snapshot (psl_data.py):
    public suffix + one label, with wildcard (`*.ck`, `*.kobe.jp`,
    `*.compute.amazonaws.com`) and exception (`!www.ck`,
    `!city.kobe.jp`) rules applied per the PSL algorithm.  Unlisted
    suffixes fall back to the implicit `*` rule (last two labels).
    Hosts that ARE a bare public suffix (or a single label) pass
    through unchanged — a stable quota bucket rather than a NULL.
    Pure Catalyst; the per-domain quota/dedup primitive for crawl
    curation at 100 TB (the reference has no URL surface)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    ps = public_suffix_len(host)
    take = F.least(ps + F.lit(1), n)
    return F.when(
        host.isNull(), host
    ).otherwise(F.array_join(F.slice(parts, n - take + 1, take), "."))


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments — the standard cheap
    page-depth signal (nav/landing pages sit shallow)."""
    p = url_path(url)
    segs = F.filter(F.split(p, "/"), lambda s: s != "")
    return F.when(p.isNotNull(), F.size(segs))
