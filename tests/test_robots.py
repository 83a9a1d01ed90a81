"""robots.txt engine tests (functions/robots.py, RFC 9309 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vtk_reserves_spark.functions.robots import (
    parse_robots,
    robots_allowed,
    robots_match,
)

SAMPLE = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp$
Disallow: /*.json

User-agent: goodbot
Disallow:

User-agent: badbot
Disallow: /
"""


def test_group_selection():
    star = parse_robots(SAMPLE, "somebot")
    assert (False, "/private/") in star and (True, "/private/ok") in star
    # named group: longest prefixing token wins; empty Disallow = no rules
    assert parse_robots(SAMPLE, "goodbot") == []
    assert parse_robots(SAMPLE, "badbot/1.2") == [(False, "/")]


def test_rule_matching_longest_wins():
    rules = parse_robots(SAMPLE, "*")
    assert robots_match(rules, "/") is True
    assert robots_match(rules, "/public/x") is True
    assert robots_match(rules, "/private/secret") is False
    # longer Allow overrides the shorter Disallow
    assert robots_match(rules, "/private/ok/page") is True
    # $ anchor: /tmp blocked exactly, /tmpfile is not
    assert robots_match(rules, "/tmp") is False
    assert robots_match(rules, "/tmpfile") is True
    # * wildcard
    assert robots_match(rules, "/api/data.json") is False
    assert robots_match(rules, "/api/data.jsonl") is False  # prefix match
    assert robots_match(rules, "/api/data.js") is True


def test_allow_wins_length_ties():
    rules = [(False, "/a/"), (True, "/a/")]
    assert robots_match(rules, "/a/x") is True


def test_merged_groups_and_rule_before_agent():
    txt = "Disallow: /ignored\nUser-agent: a\nUser-agent: b\nDisallow: /x"
    assert parse_robots(txt, "a") == [(False, "/x")]
    assert parse_robots(txt, "b") == [(False, "/x")]


def test_robots_allowed_dataframe(spark):
    robots = {
        "example.com": "User-agent: *\nDisallow: /private/\nAllow: /private/ok",
        "blocked.org": "User-agent: *\nDisallow: /",
    }
    rows = [
        (0, "https://example.com/"),
        (1, "https://www.example.com/private/x"),  # domain fallback via suffix
        (2, "https://example.com/private/ok/x"),
        (3, "https://blocked.org/anything"),
        (4, "https://unknown.net/whatever"),  # no robots -> allowed
        (5, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = robots_allowed(df, robots).orderBy("doc_id").collect()
    got = [r.robots_allowed for r in out]
    assert got == [True, False, True, False, True, None]
    # scale shape: no shuffle — the rules ride a broadcast variable
    plan = robots_allowed(df, robots)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_robots_allowed_join_matches_broadcast(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from vtk_reserves_spark.functions.robots import (
        robots_allowed, robots_allowed_join,
    )

    robots = {
        "example.com": "User-agent: *\nDisallow: /private/\nAllow: /private/ok",
        "blocked.org": "User-agent: *\nDisallow: /",
    }
    urls = [
        "https://www.example.com/private/x",
        "https://www.example.com/private/ok/page",
        "https://example.com/public",
        "https://blocked.org/anything",
        "https://norules.net/a",
        "not a url at all",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"url": urls}),
        T.StructType([T.StructField("url", T.StringType())]),
    )
    rdf = spark.createDataFrame(
        pd.DataFrame({
            "domain": list(robots),
            "robots_txt": [robots[d] for d in robots],
        }),
    )
    via_join = robots_allowed_join(df, rdf)
    a = {r.url: r.robots_allowed for r in via_join.collect()}
    b = {r.url: r.robots_allowed
         for r in robots_allowed(df, robots).collect()}
    assert a == b
    assert a["https://www.example.com/private/x"] is False
    assert a["https://www.example.com/private/ok/page"] is True
    assert a["https://norules.net/a"] is True
    assert a["not a url at all"] is None
    # plan shape: an equi-join on the registered-domain key, never a
    # cartesian product — the 10^8-domain-safe shape
    plan = via_join._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan and "_rb_dom" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
