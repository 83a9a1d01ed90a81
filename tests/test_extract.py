"""Main-content extraction edges: block segmentation, link-density
and min-words classification, head/script/comment removal, entity
decoding, pure-Catalyst plan shape."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.extract import content_blocks, main_content

PAGE = """
<html><head><title>Ignored Head Title</title><script>nav()</script></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<h1>The Article Title Goes Right Here</h1>
<p>This is the first real paragraph with plenty of honest prose words.</p>
<p>Short.</p>
<!-- ad slot -->
<p>The second paragraph also has enough words, with one
<a href="/x">inline link</a> that stays under the density cap.</p>
<footer><a href="/p">Privacy</a> &amp; <a href="/t">Terms</a></footer>
</body></html>
"""


def _one(spark, html, **kw):
    df = spark.createDataFrame(pd.DataFrame({"html": [html]}))
    return df.select(
        main_content(F.col("html"), **kw).alias("m")
    ).select("m.*").collect()[0]


def test_content_vs_boilerplate(spark):
    r = _one(spark, PAGE)
    lines = r.text.split("\n")
    assert lines[0] == "The Article Title Goes Right Here"
    assert len(lines) == 3 and r.n_content == 3
    assert "Home" not in r.text and "Privacy" not in r.text
    assert "Ignored Head Title" not in r.text
    assert "Short." not in r.text
    assert "inline link" in r.text  # entity-decoded inline content kept
    assert r.n_blocks == r.n_content + r.n_boilerplate
    assert r.content_chars == len(r.text)


def test_link_density_cutoff(spark):
    linky = "<p>word " * 1 + "word word word word word " + \
        '<a href="x">' + "link " * 30 + "</a></p>"
    r = _one(spark, linky)
    assert r.n_content == 0  # mostly anchor text -> boilerplate
    r = _one(spark, linky, max_link_density=0.99)
    assert r.n_content == 1


def test_min_words_threshold(spark):
    html = "<p>one two three four five</p><p>one two three four five six</p>"
    r = _one(spark, html)
    assert r.n_content == 1
    r = _one(spark, html, min_words=5)
    assert r.n_content == 2


def test_blocks_struct(spark):
    df = spark.createDataFrame(pd.DataFrame({"html": [
        '<p>plain words here</p><div><a href="x">all link</a></div>'
    ]}))
    rows = df.select(
        F.explode(content_blocks(F.col("html"))).alias("b")
    ).select("b.*").collect()
    assert rows[0].text == "plain words here"
    assert rows[0].link_chars == 0 and rows[0].words == 3
    assert rows[1].text == "all link"
    assert rows[1].link_chars == rows[1].chars


def test_pure_catalyst_no_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"html": [PAGE]}))
    plan = df.select(
        main_content(F.col("html")).alias("m")
    )._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_empty_and_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"html": ["", None, "no tags just words in a row"]})
    )
    rows = df.select(
        main_content(F.col("html")).alias("m")
    ).select("m.*").collect()
    assert rows[0].n_blocks == 0 and rows[0].text == ""
    assert rows[1].text is None
    assert rows[2].n_content == 1  # tagless text is one block
