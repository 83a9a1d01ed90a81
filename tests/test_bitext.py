"""Bitext URL pairing edges: path vs subdomain conventions,
regional tags, false-positive guards, pivot restriction."""
from pyspark.sql import functions as F

from vtk_reserves_spark.operators.bitext import (
    bitext_candidates, url_lang_key,
)


def _keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        (r.lk.lang, r.lk.key)
        for r in df.select(url_lang_key("url").alias("lk")).collect()
    ]


def test_path_style(spark):
    got = _keys(spark, [
        "https://ex.com/en/about", "https://ex.com/de/about",
    ])
    assert got[0] == ("en", "https://ex.com/{L}/about")
    assert got[1] == ("de", "https://ex.com/{L}/about")
    assert got[0][1] == got[1][1]


def test_regional_tag_and_subdomain(spark):
    got = _keys(spark, [
        "https://ex.com/pt-br/x", "https://fr.shop.example.org/x",
    ])
    assert got[0] == ("pt", "https://ex.com/{L}/x")
    assert got[1] == ("fr", "https://{L}.shop.example.org/x")


def test_false_positives_null(spark):
    got = _keys(spark, [
        "https://ex.com/tv/show",        # not a language code
        "https://ex.com/enlarged/x",     # 'en' must be a full segment
        "https://www.ex.com/about",      # www is not a language
        "https://ex.com/",               # no segment at all
    ])
    assert all(lang is None for lang, _ in got)


def test_pairs_and_pivot(spark):
    rows = [
        (1, "https://s.com/en/p1"), (2, "https://s.com/de/p1"),
        (3, "https://s.com/fr/p1"), (4, "https://s.com/en/p2"),
        (5, "https://other.com/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    pairs = bitext_candidates(df).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    # lang ordering: de < en < fr
    assert got == {(2, 1), (2, 3), (1, 3)}
    pivot = bitext_candidates(df, pivot_lang="en").collect()
    assert {(p.id_a, p.id_b) for p in pivot} == {(1, 3)}


def test_join_is_equi_not_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"https://s.com/en/p{i}") for i in range(10)],
        "doc_id long, url string",
    )
    plan_df = bitext_candidates(df)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = plan_df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
