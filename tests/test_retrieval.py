"""BM25 retrieval: hand-checked scoring on a toy corpus, idf
monotonicity, top-k determinism, broadcast plan shape."""
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vtk_reserves_spark.operators.retrieval import (
    bm25_postings,
    bm25_score,
    bm25_topk,
)

DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4],
    "text": [
        "apple banana apple",
        "banana cherry",
        "apple apple apple apple",
        "durian elderberry fig",
    ],
})


def _score(spark, qtext, **kw):
    docs = spark.createDataFrame(DOCS)
    queries = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "qtext": [qtext]})
    )
    return {
        r.doc_id: r
        for r in bm25_score(docs, queries, "doc_id", "text", **kw).collect()
    }


def test_hand_computed_score(spark):
    # 'cherry': df=1, N=4 -> idf = ln(1 + 3.5/1.5); doc 2: tf=1, dl=2,
    # avgdl = (3+2+4+3)/4 = 3
    got = _score(spark, "cherry")
    idf = math.log(1 + 3.5 / 1.5)
    denom = 1 + 1.2 * (0.25 + 0.75 * 2 / 3)
    assert got[2].score == pytest.approx(idf * 2.2 / denom)
    assert set(got) == {2}


def test_tf_saturation_and_length_norm(spark):
    got = _score(spark, "apple")
    # doc 3 (tf=4) outranks doc 1 (tf=2) but sublinearly
    assert got[3].score > got[1].score
    assert got[3].score < 2 * got[1].score
    assert 4 not in got  # no shared term, no row


def test_multi_term_and_topk(spark):
    docs = spark.createDataFrame(DOCS)
    queries = spark.createDataFrame(pd.DataFrame({
        "qid": [0, 1], "qtext": ["apple banana", "fig"]}))
    scored = bm25_score(docs, queries, "doc_id", "text")
    top = bm25_topk(scored, "doc_id", k=2)
    rows = {(r.qid, r.rank): r for r in top.collect()}
    assert rows[(0, 1)].n_terms_hit == 2  # doc 1 matches both terms
    assert rows[(0, 1)].doc_id == 1
    assert rows[(1, 1)].doc_id == 4
    assert all(r.rank <= 2 for r in top.collect())


def test_postings_stats_exact(spark):
    docs = spark.createDataFrame(DOCS)
    postings, stats = bm25_postings(docs, "doc_id", "text")
    st = stats.collect()[0]
    assert st.n_docs == 4 and st.avgdl == 3.0
    p = {(r.term, r._id): r.tf for r in postings.collect()}
    assert p[("apple", 3)] == 4 and p[("banana", 1)] == 1


def test_broadcast_no_python(spark):
    docs = spark.createDataFrame(DOCS)
    queries = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "qtext": ["apple"]})
    )
    plan = bm25_score(
        docs, queries, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan and "CartesianProduct" not in plan


def test_rrf_fuse_formula_and_rank(spark):
    """RRF = sum 1/(k0+rank) over lists; docs in both lists beat
    docs in one; rounded-score rank with id tie-break."""
    from vtk_reserves_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "qid int, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "qid int, doc_id long, rank int",
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k0=60, k=10).collect()}
    # doc 11 appears in both: 1/62 + 1/61
    assert out[11]["n_lists"] == 2
    assert abs(out[11]["rrf"] - round(1 / 62 + 1 / 61, 6)) < 1e-12
    assert out[11]["rank"] == 1
    # singles ordered by their reciprocal rank, ties by id
    assert out[10]["rrf"] == round(1 / 61, 6)
    assert out[13]["rrf"] == round(1 / 62, 6)
    assert out[10]["rank"] == 2 and out[13]["rank"] == 3
    assert out[12]["rank"] == 4


def test_rrf_fuse_k_cap_and_empty(spark):
    from vtk_reserves_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, i, i + 1) for i in range(20)],
        "qid int, doc_id long, rank int",
    )
    assert rrf_fuse([a], k=5).count() == 5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
