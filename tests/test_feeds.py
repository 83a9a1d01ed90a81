"""Sitemap / RSS / Atom extraction tests (functions/feeds.py) — pure
Catalyst parsing, namespace / CDATA / entity tolerance."""

from __future__ import annotations

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://example.com/a</loc>
    <lastmod>2024-01-02</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://example.com/b?x=1&amp;y=2 </loc></url>
  <url><lastmod>2024-03-04</lastmod></url>
</urlset>"""

SITEMAP_NS = """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sm:url><sm:loc><![CDATA[https://ns.example.com/p]]></sm:loc>
  <sm:priority>1.0</sm:priority></sm:url>
</sm:urlset>"""

SITEMAP_INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://example.com/s1.xml</loc><lastmod>2024-05-06</lastmod></sitemap>
  <sitemap><loc>https://example.com/s2.xml.gz</loc></sitemap>
</sitemapindex>"""

RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
  <title>Feed</title><link>https://example.com/</link>
  <item>
    <title>First &amp; foremost</title>
    <link>https://example.com/posts/1</link>
    <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
    <guid isPermaLink="true">https://example.com/posts/1</guid>
    <description><![CDATA[Summary <b>one</b>]]></description>
  </item>
  <item><title>Second</title><link>https://example.com/posts/2</link></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Site</title>
  <entry>
    <title>Atom post</title>
    <link rel="alternate" href="https://example.com/atom/1"/>
    <updated>2024-02-03T04:05:06Z</updated>
    <id>urn:uuid:abc</id>
    <summary>short text</summary>
  </entry>
</feed>"""


def _df(spark, xml):
    return spark.createDataFrame([(1, xml)], "doc_id long, xml string")


def test_sitemap_urls_basic(spark):
    from vtk_reserves_spark.functions.feeds import sitemap_urls

    rows = sitemap_urls(_df(spark, SITEMAP)).orderBy("loc").collect()
    # the loc-less third <url> is dropped (loc is required by protocol)
    assert len(rows) == 2
    a, b = rows
    assert a["loc"] == "https://example.com/a"
    assert a["lastmod"] == "2024-01-02"
    assert a["changefreq"] == "daily"
    assert abs(a["priority"] - 0.8) < 1e-12
    # entity decode + trim on the second entry
    assert b["loc"] == "https://example.com/b?x=1&y=2"
    assert b["lastmod"] is None and b["priority"] is None
    assert a["doc_id"] == 1  # provenance column passes through


def test_sitemap_namespace_prefix_and_cdata(spark):
    from vtk_reserves_spark.functions.feeds import sitemap_urls

    rows = sitemap_urls(_df(spark, SITEMAP_NS)).collect()
    assert len(rows) == 1
    assert rows[0]["loc"] == "https://ns.example.com/p"
    assert rows[0]["priority"] == 1.0


def test_sitemap_index(spark):
    from vtk_reserves_spark.functions.feeds import sitemap_index

    rows = sitemap_index(_df(spark, SITEMAP_INDEX)).orderBy("loc").collect()
    assert [r["loc"] for r in rows] == [
        "https://example.com/s1.xml",
        "https://example.com/s2.xml.gz",
    ]
    assert rows[0]["lastmod"] == "2024-05-06"
    assert rows[1]["lastmod"] is None


def test_rss_items(spark):
    from vtk_reserves_spark.functions.feeds import feed_entries

    rows = feed_entries(_df(spark, RSS)).orderBy("title").collect()
    assert len(rows) == 2
    first, second = rows
    assert first["kind"] == "rss"
    assert first["title"] == "First & foremost"
    assert first["link"] == "https://example.com/posts/1"
    assert first["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert first["entry_id"] == "https://example.com/posts/1"
    assert first["summary"] == "Summary <b>one</b>"
    assert second["published"] is None and second["summary"] is None


def test_atom_entries(spark):
    from vtk_reserves_spark.functions.feeds import feed_entries

    rows = feed_entries(_df(spark, ATOM)).collect()
    assert len(rows) == 1
    e = rows[0]
    assert e["kind"] == "atom"
    assert e["title"] == "Atom post"
    assert e["link"] == "https://example.com/atom/1"  # from href attr
    assert e["published"] == "2024-02-03T04:05:06Z"
    assert e["entry_id"] == "urn:uuid:abc"
    assert e["summary"] == "short text"


def test_mixed_corpus_one_pass(spark):
    """RSS and Atom payloads in one frame parse in a single pass with
    per-row kind labels."""
    from vtk_reserves_spark.functions.feeds import feed_entries

    df = spark.createDataFrame(
        [(1, RSS), (2, ATOM), (3, "<html>not a feed</html>")],
        "doc_id long, xml string",
    )
    rows = feed_entries(df).collect()
    kinds = sorted((r["doc_id"], r["kind"]) for r in rows)
    assert kinds == [(1, "rss"), (1, "rss"), (2, "atom")]


def test_feed_parse_is_pure_catalyst(spark):
    """No Python in the plan: the extraction must stay JVM-side."""
    from vtk_reserves_spark.functions.feeds import feed_entries, sitemap_urls

    for fn in (feed_entries, sitemap_urls):
        plan = fn(_df(spark, RSS))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan
