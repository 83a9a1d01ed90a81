"""URL expression tests (functions/urls.py) — pure-Catalyst parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from vtk_reserves_spark.functions import urls as U


def _one(spark, url, fn):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(fn(F.col("u")).alias("v")).collect()[0].v


def test_url_components(spark):
    u = "https://user:pw@Sub.Example.CO.UK:8443/a/b/c.html?q=1&r=2#frag"
    assert _one(spark, u, U.url_scheme) == "https"
    assert _one(spark, u, U.url_host) == "sub.example.co.uk"
    assert _one(spark, u, U.url_port) == 8443
    assert _one(spark, u, U.url_path) == "/a/b/c.html"
    assert _one(spark, u, U.url_query) == "q=1&r=2"
    assert _one(spark, u, U.url_depth) == 3


def test_url_no_parse_and_edges(spark):
    for bad in ("not a url", "relative/path", ""):
        assert _one(spark, bad, U.url_host) is None
        assert _one(spark, bad, U.url_path) is None
    assert _one(spark, "http://example.com", U.url_path) == ""
    assert _one(spark, "http://example.com", U.url_depth) == 0
    assert _one(spark, "http://example.com/", U.url_depth) == 0
    assert _one(spark, "ftp://example.com/x", U.url_scheme) == "ftp"
    assert _one(spark, "http://example.com:notaport/x", U.url_port) is None


def test_registered_domain(spark):
    cases = [
        ("www.example.com", "example.com"),
        ("a.b.c.example.org", "example.org"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("co.uk", "co.uk"),  # bare suffix: only two labels exist
        ("shop.foo.com.au", "foo.com.au"),
        ("localhost", "localhost"),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [
        r.v
        for r in df.select(U.registered_domain(F.col("h")).alias("v")).collect()
    ]
    assert got == [w for _, w in cases]
