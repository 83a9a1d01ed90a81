"""Classifier evaluation metrics over DataFrames — distributed
ROC-AUC (and the precision/recall curve it falls out of).

Curation pipelines gate on model scores (quality classifiers,
fastText-style language filters, toxicity models); the pipeline
itself must measure those models on labeled holdouts AT SCALE —
and the textbook AUC implementation (global sort + ranks) is a
single-reducer anti-pattern on a 100 TB table.

This implements the histogram form of the Mann-Whitney statistic:
bucket scores, count positives/negatives per bucket (ONE groupBy
with map-side combine), then accumulate
``AUC = Σ_b pos_b x (cum_neg_below + neg_b/2) / (P x N)``
over the BUCKETS (window over B rows, not N) — ties-within-bucket
get the standard half credit, so the result is EXACT when buckets
are the distinct score values (integer/quantized scores — the usual
classifier-logit-after-rounding case) and an approximation bounded
by bucket width otherwise.  The same bucket table yields the
precision/recall curve for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["binary_auc", "pr_curve"]


def _bucketed(
    df: DataFrame, score_col: str, label_col: str, buckets: int | None
):
    s = F.col(score_col)
    b = s if buckets is None else F.floor(
        s * F.lit(buckets)
    )  # caller-normalized scores for the quantized path
    return (
        df.select(
            b.alias("bucket"),
            F.col(label_col).cast("int").alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            (F.count("*") - F.sum("y")).cast("long").alias("neg"),
        )
    )


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int | None = None,
) -> DataFrame:
    """One-row DataFrame (auc, n_pos, n_neg) for a binary
    ``label_col`` against ``score_col``.  ``buckets=None`` buckets
    by the raw score value (EXACT for discrete scores);
    ``buckets=B`` quantizes caller-normalized [0,1) scores into B
    bins (error <= bin width).  Plan: ONE groupBy over rows + a
    window over the B bucket rows — no global sort of the data."""
    hist = _bucketed(df, score_col, label_col, buckets)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    scored = hist.select(
        "pos", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("cum_neg"),
    )
    return scored.agg(
        (
            F.sum(
                F.col("pos")
                * (F.col("cum_neg") + F.col("neg") / F.lit(2.0))
            )
            / (F.sum("pos") * F.sum("neg"))
        ).alias("auc"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int | None = None,
) -> DataFrame:
    """Precision/recall at every bucket threshold (predict positive
    when score >= threshold): (threshold, precision, recall) rows —
    the same single-shuffle bucket table as :func:`binary_auc`."""
    hist = _bucketed(df, score_col, label_col, buckets)
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    totals = hist.select(
        F.col("bucket").alias("threshold"),
        F.sum("pos").over(w).alias("tp"),
        F.sum("neg").over(w).alias("fp"),
    )
    all_pos = hist.agg(F.sum("pos")).first()[0]
    return totals.select(
        "threshold",
        (F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision"),
        (F.col("tp") / F.lit(float(all_pos))).alias("recall"),
    )
