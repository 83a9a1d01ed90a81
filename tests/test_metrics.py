"""Metric operator edges: AUC against sklearn-style hand results,
tie handling, perfect/inverted separation, quantized path, PR
curve, plan shape (no global sort of the rows)."""
import pytest
from pyspark.sql import functions as F

from vtk_reserves_spark.operators.metrics import binary_auc, pr_curve


def _auc(spark, rows, **kw):
    df = spark.createDataFrame(rows, "score double, label boolean")
    return binary_auc(df, "score", "label", **kw).first()


def test_perfect_and_inverted(spark):
    perfect = [(float(s), s >= 5) for s in range(10)]
    assert _auc(spark, perfect).auc == 1.0
    inverted = [(float(s), s < 5) for s in range(10)]
    assert _auc(spark, inverted).auc == 0.0


def test_random_is_half(spark):
    # equal scores for everything: AUC must be exactly 0.5 (ties)
    rows = [(1.0, i % 2 == 0) for i in range(20)]
    assert _auc(spark, rows).auc == 0.5


def test_hand_computed(spark):
    # scores: pos {3, 1}, neg {2, 0}; pairs: (3>2),(3>0),(1<2),(1>0)
    rows = [(3.0, True), (1.0, True), (2.0, False), (0.0, False)]
    r = _auc(spark, rows)
    assert r.auc == pytest.approx(3 / 4)
    assert (r.n_pos, r.n_neg) == (2, 2)


def test_tie_half_credit(spark):
    # one pos and one neg share a score: 0.5 of that pair
    rows = [(1.0, True), (1.0, False), (0.0, False)]
    assert _auc(spark, rows).auc == pytest.approx((1 + 0.5) / 2)


def test_quantized_buckets(spark):
    import random

    rng = random.Random(7)
    rows = [
        (rng.random() * 0.5 + (0.5 if i % 2 else 0.0), bool(i % 2))
        for i in range(400)
    ]
    exact = _auc(spark, rows).auc
    approx = _auc(spark, rows, buckets=256).auc
    assert approx == pytest.approx(exact, abs=0.01)


def test_pr_curve_threshold_semantics(spark):
    rows = [(3.0, True), (2.0, False), (1.0, True), (0.0, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    pts = {r.threshold: r for r in pr_curve(df, "score", "label").collect()}
    assert pts[3.0].precision == 1.0 and pts[3.0].recall == 0.5
    assert pts[1.0].recall == 1.0
    assert pts[0.0].precision == 0.5


def test_no_row_level_global_sort(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).cast("int").alias("score"),
        (F.col("id") % 3 == 0).alias("label"),
    )
    out = binary_auc(df, "score", "label")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    # the only aggregation over raw rows is the bucket groupBy;
    # sorting happens on the tiny bucket table after it
    agg_pos = plan.find("HashAggregate")
    sort_pos = plan.find("Sort")
    assert agg_pos != -1 and sort_pos != -1
