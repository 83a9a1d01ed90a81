"""Link-graph operator tests (operators/graph.py)."""

from __future__ import annotations

import numpy as np
import pytest

from vtk_reserves_spark.operators.graph import (
    anchor_texts,
    extract_links,
    host_edges,
    pagerank,
)

_HTML = """<html><body>
<a href="https://other.com/x">Other <b>site</b></a>
<a href='/local/page'>local</a>
<A HREF="//cdn.com/asset">cdn</A>
<a class="z" href="sub.html">rel
two lines</a>
<a href="#frag">skip me</a>
</body></html>"""


@pytest.fixture()
def page(spark):
    return spark.createDataFrame(
        [("https://example.com/dir/page.html", _HTML)],
        "url string, html string",
    )


def test_extract_links_resolution(page):
    hrefs = [
        r["href"]
        for r in extract_links(page, "html", base_col="url")
        .select("href")
        .collect()
    ]
    assert hrefs == [
        "https://other.com/x",
        "https://example.com/local/page",
        "https://cdn.com/asset",
        "https://example.com/dir/sub.html",
    ]


def test_extract_links_stays_jvm_side(page):
    plan = (
        extract_links(page, "html", base_col="url")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_anchor_texts(page):
    rows = {
        r["href"]: r["anchor"]
        for r in anchor_texts(page, "html").collect()
    }
    assert rows["https://other.com/x"] == "Other site"
    assert rows["sub.html"] == "rel two lines"
    assert "#frag" not in rows


def test_host_edges_distinct_no_self(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://b.com/y"),  # same host pair
            ("https://a.com/3", "https://a.com/other"),  # self loop
            ("https://b.com/1", "https://a.com/z"),
        ],
        "url string, href string",
    )
    edges = {
        (r["src"], r["dst"]) for r in host_edges(links).collect()
    }
    assert edges == {("a.com", "b.com"), ("b.com", "a.com")}


def _np_pagerank(edge_list, iters=10, damping=0.85):
    nodes = sorted({x for e in edge_list for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {m: 0 for m in nodes}
    for s, _ in edge_list:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = sum(r[idx[m]] for m in nodes if out[m] == 0)
        new = np.full(n, (1 - damping) / n)
        for s, d in edge_list:
            new[idx[d]] += damping * r[idx[s]] / out[s]
        new += damping * dang / n
        r = new
    return {m: r[idx[m]] for m in nodes}


def test_pagerank_matches_power_iteration(spark):
    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
        ("e", "a"), ("e", "b"),
    ]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, 10).collect()}
    want = _np_pagerank(edge_list, 10)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_only_graph(spark):
    # b and c have no out-edges: all their mass redistributes
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, 5).collect()}
    want = _np_pagerank([("a", "b"), ("a", "c")], 5)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, 3).count() == 0
