"""HTML metadata extraction edges: attribute order, quoting styles,
absent tags, multiple JSON-LD blocks, hreflang maps."""
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.html_meta import (
    canonical_url, hreflang_map, jsonld_blocks, jsonld_types,
    meta_content, og_tags,
)


def _one(spark, html):
    return (
        spark.createDataFrame([(html,)], "s string")
        .select(
            og_tags("s").alias("og"),
            canonical_url("s").alias("canon"),
            hreflang_map("s").alias("hl"),
            jsonld_blocks("s").alias("blocks"),
            jsonld_types("s").alias("types"),
        )
        .first()
    )


def test_both_attribute_orders(spark):
    fwd = _one(spark, '<meta property="og:title" content="A"/>')
    rev = _one(spark, '<meta content="A" property="og:title"/>')
    assert fwd.og.title == "A" and rev.og.title == "A"


def test_name_attribute_and_single_quotes(spark):
    r = _one(spark, "<meta name='og:description' content='D'/>")
    assert r.og.description == "D"


def test_absent_tags_null(spark):
    r = _one(spark, "<html><head></head></html>")
    assert r.og.title is None and r.canon is None
    assert r.hl == {} and r.blocks == [] and r.types == []


def test_canonical_both_orders(spark):
    a = _one(spark, '<link rel="canonical" href="http://x/1">')
    b = _one(spark, '<link href="http://x/1" rel="canonical">')
    assert a.canon == b.canon == "http://x/1"


def test_hreflang_multi(spark):
    r = _one(
        spark,
        '<link rel="alternate" hreflang="de" href="http://x/de">'
        '<link rel="alternate" hreflang="ja" href="http://x/ja">'
        '<link rel="alternate" type="application/rss+xml" href="http://x/rss">',
    )
    assert r.hl == {"de": "http://x/de", "ja": "http://x/ja"}


def test_jsonld_multiple_blocks(spark):
    r = _one(
        spark,
        '<script type="application/ld+json">{"@type": "Article"}</script>'
        "<script>var x;</script>"
        '<script type="application/ld+json">{"@type": "Recipe",'
        ' "name": "Soup"}</script>',
    )
    assert len(r.blocks) == 2
    assert r.types == ["Article", "Recipe"]


def test_get_json_object_composes(spark):
    df = spark.createDataFrame(
        [('<script type="application/ld+json">'
          '{"@type": "Article", "author": {"name": "Ada"}}</script>',)],
        "s string",
    )
    got = df.select(
        F.get_json_object(
            F.element_at(jsonld_blocks("s"), 1), "$.author.name"
        ).alias("author")
    ).first()
    assert got.author == "Ada"


def test_meta_content_generic(spark):
    df = spark.createDataFrame(
        [('<meta name="twitter:card" content="summary">',)], "s string"
    )
    got = df.select(meta_content("s", "twitter:card").alias("v")).first()
    assert got.v == "summary"
