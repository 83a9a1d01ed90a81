"""robots.txt parsing + URL allow/deny evaluation for crawl curation.

Retroactive robots filtering is a standard step in CC-derived corpus
builds (sites opt out after the crawl; pipelines re-apply the rules).
This implements the de-facto REP semantics standardized in RFC 9309:

* group selection — the group whose ``User-agent`` token is the
  LONGEST match for the requesting agent (case-insensitive); ``*``
  groups apply when no named group matches; multiple groups for the
  same agent merge;
* rule matching — ``Allow`` / ``Disallow`` patterns are
  percent-style path prefixes with ``*`` wildcards and a ``$``
  end-anchor; the rule with the LONGEST pattern wins, Allow winning
  ties; an empty ``Disallow:`` means allow-all; no matching rule
  means allowed.

Scale shape: robots rule sets are per-DOMAIN and tiny (KBs), while
URLs number in the billions — so `robots_allowed` BROADCASTS the
compiled {domain: rules} dict to executors and evaluates each URL
with an Arrow-batched pandas UDF (compiled regexes cached per
domain).  No shuffle, no join: the classic broadcast-dimension
pattern.  The reference has no URL surface (crawl curation addition,
SURVEY.md §2.8).
"""

from __future__ import annotations

import re

import pandas as pd


def parse_robots(text: str, user_agent: str = "*") -> list:
    """robots.txt content -> ordered rule list ``[(allow, pattern)]``
    for the given agent, per RFC 9309 group selection (longest
    user-agent token match; ``*`` fallback; same-agent groups
    merge)."""
    agent = user_agent.lower()
    groups: dict[str, list] = {}
    current_tokens: list[str] = []
    rules_open = False  # a rule line closes the user-agent run
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules_open:
                current_tokens = []
                rules_open = False
            tok = val.lower()
            current_tokens.append(tok)
            groups.setdefault(tok, [])
        elif key in ("allow", "disallow"):
            rules_open = True
            if not current_tokens:
                continue  # rule before any user-agent line: ignored
            if key == "disallow" and val == "":
                continue  # empty Disallow == allow all (no-op rule)
            for tok in current_tokens:
                groups[tok].append((key == "allow", val))
        # other keys (crawl-delay, sitemap) don't affect matching
    # group selection: longest token that prefixes the product token;
    # '*' is the fallback when no named group matches
    named = [
        tok for tok in groups
        if tok != "*" and (agent == tok or agent.startswith(tok))
    ]
    if named:
        best = max(named, key=len)
        return groups[best]
    return groups.get("*", [])


import functools


@functools.lru_cache(maxsize=4096)
def _compile(pattern: str):
    """Rule pattern -> compiled regex implementing * and $ semantics."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = ".*".join(parts)
    return re.compile("^" + rx + ("$" if anchored else ""))


def robots_match(rules: list, path: str) -> bool:
    """True when ``path`` is ALLOWED under the rule list (RFC 9309:
    longest matching pattern wins, Allow wins length ties, unmatched
    paths are allowed)."""
    if not path.startswith("/"):
        path = "/" + path
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if _compile(pattern).match(path):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len = ln
                best_allow = allow
    return best_allow


def robots_allowed(
    df,
    robots_by_domain: dict,
    url_col: str = "url",
    user_agent: str = "*",
    out_col: str = "robots_allowed",
):
    """Annotate a URL DataFrame with robots permission: the compiled
    per-domain rule lists are BROADCAST (robots corpora are KB-scale
    per domain; URLs are the big side) and each Arrow batch is
    evaluated executor-side with per-domain regex caching.  Domains
    without a robots.txt default to allowed (the REP convention).

    SCALE BOUND: the dict is serialized to every executor, so this
    path is right up to roughly 10^5-10^6 domains (tens of MB of
    rules) — a curated allow/deny corpus.  A full-crawl rule set
    (10^7-10^8 domains, GBs) is no longer broadcast-sized: use
    :func:`robots_allowed_join`, which ships the rules as a
    DataFrame and reaches URLs through an equi-join instead."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from vtk_reserves_spark.functions.urls import (  # noqa: F401
        registered_domain, url_host, url_path,
    )

    spark = df.sparkSession
    parsed = {
        dom: parse_robots(txt, user_agent)
        for dom, txt in robots_by_domain.items()
    }
    b_rules = spark.sparkContext.broadcast(parsed)

    @F.pandas_udf(T.BooleanType())
    def allowed(host: pd.Series, path: pd.Series) -> pd.Series:
        rules = b_rules.value
        out = []
        for h, p in zip(host, path):
            if h is None:
                out.append(None)
                continue
            # registered-domain lookup falls back to exact host
            rl = rules.get(h)
            if rl is None:
                parts = h.split(".")
                for k in range(len(parts) - 1):
                    rl = rules.get(".".join(parts[k:]))
                    if rl is not None:
                        break
            out.append(True if rl is None else robots_match(rl, p or "/"))
        return pd.Series(out, dtype="object")

    host = url_host(F.col(url_col))
    path = url_path(F.col(url_col))
    return df.withColumn(out_col, allowed(host, path))


def robots_allowed_join(
    df,
    robots_df,
    url_col: str = "url",
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
    user_agent: str = "*",
    out_col: str = "robots_allowed",
):
    """Distributed twin of :func:`robots_allowed` for rule corpora
    BEYOND broadcast size (a full-crawl robots snapshot: 10^7-10^8
    domains, GBs of text).  ``robots_df`` carries ``(domain_col,
    robots_col)`` rows keyed by REGISTERED domain; URLs reach their
    rules through a left equi-join on the registered domain of the
    URL host (`functions/urls.registered_domain`), then an
    Arrow-batched pandas UDF parses and evaluates the joined rules
    with a per-batch parse cache (one parse per distinct robots.txt
    per batch — hot domains amortize).

    Scale shape: one shuffle on the registered domain.  Catalyst
    picks broadcast-hash automatically when ``robots_df`` IS small,
    so this is safe to use at any size; mega-domain key skew is the
    standard AQE skew-join case (spark.sql.adaptive.enabled).
    Domains without a row default to allowed (the REP convention);
    URLs whose host cannot be parsed yield NULL, matching the
    broadcast path."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from vtk_reserves_spark.functions.urls import (
        registered_domain, url_host, url_path,
    )

    host = url_host(F.col(url_col))
    keyed = df.withColumn("_rb_host", host).withColumn(
        "_rb_dom", registered_domain(F.col("_rb_host"))
    ).withColumn("_rb_path", url_path(F.col(url_col)))
    rules = robots_df.select(
        F.col(domain_col).alias("_rb_dom"),
        F.col(robots_col).alias("_rb_txt"),
    )
    joined = keyed.join(rules, on="_rb_dom", how="left")

    @F.pandas_udf(T.BooleanType())
    def allowed(txt: pd.Series, path: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t, p in zip(txt, path):
            if t is None:
                out.append(True)
                continue
            rl = cache.get(t)
            if rl is None:
                rl = cache[t] = parse_robots(t, user_agent)
            out.append(robots_match(rl, p or "/"))
        return pd.Series(out, dtype="object")

    return joined.withColumn(
        out_col,
        F.when(F.col("_rb_host").isNull(), F.lit(None).cast("boolean"))
        .otherwise(allowed(F.col("_rb_txt"), F.col("_rb_path"))),
    ).drop("_rb_host", "_rb_dom", "_rb_path", "_rb_txt")
