"""Kneser-Ney bigram LM: hand-computed probabilities on a toy
corpus, all four interpolation branches, degenerate documents,
distributed plan shape."""
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vtk_reserves_spark.operators.ngram_lm import (
    kn_perplexity,
    score_kneser_ney,
    train_kneser_ney,
)

# corpus: c(a,b)=2 c(b,a)=1 c(a,c)=1; c(a)=3 c(b)=1; N1+(a,*)=2
# N1+(b,*)=1; N1+(*,{a,b,c})=1 each; N1+(*,*)=3; d=0.75
CORPUS = ["a b a c", "a b"]


def _train(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS})
    )
    return df, train_kneser_ney(df, "doc_id", "text")


def test_pair_probabilities(spark):
    _, model = _train(spark)
    p = {(r.v, r.w): r.p for r in model["pairs"].collect()}
    assert p[("a", "b")] == pytest.approx(1.25 / 3 + 0.5 / 3)
    assert p[("b", "a")] == pytest.approx(0.25 + 0.25)
    assert p[("a", "c")] == pytest.approx(0.25 / 3 + 0.5 / 3)
    # a proper probability: sum over seen+unseen continuations of 'a'
    bow = {r.v: r.bow for r in model["backoff"].collect()}
    assert bow["a"] == pytest.approx(0.5)
    assert sum(p[("a", w)] for w in "bc") + bow["a"] * (1 / 3) == (
        pytest.approx(1.0)
    )


def test_interpolation_ladder(spark):
    df, model = _train(spark)
    score = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [
            "a b",    # seen pair: P = 0.58333...
            "b c",    # unseen pair, seen v and w: bow(b)*pcont = 0.25
            "c a",    # unseen history: pcont(a) = 1/3
            "a zzz",  # OOV continuation: floor = 0.25
        ],
    }))
    out = {r.doc_id: r for r in
           score_kneser_ney(score, model, "doc_id", "text").collect()}
    assert out[10].avg_logp == pytest.approx(math.log(1.25 / 3 + 0.5 / 3))
    assert out[11].avg_logp == pytest.approx(math.log(0.25))
    assert out[12].avg_logp == pytest.approx(math.log(1 / 3))
    assert out[13].avg_logp == pytest.approx(math.log(0.25))
    assert out[10].ppl == pytest.approx(1 / (1.25 / 3 + 0.5 / 3))


def test_short_and_null_docs(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["one", "", "two words here ok"],
    }))
    out = {r.doc_id: r for r in
           kn_perplexity(df, "doc_id", "text").collect()}
    assert out[1].n_bigrams == 0 and out[1].avg_logp is None
    assert out[2].n_bigrams == 0
    assert out[3].n_bigrams == 3 and out[3].ppl is not None


def test_no_python_in_plan(spark):
    df, model = _train(spark)
    plan = score_kneser_ney(
        df, model, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "EvalPython" not in plan
    assert "Cartesian" not in plan  # the consts cross join broadcasts
