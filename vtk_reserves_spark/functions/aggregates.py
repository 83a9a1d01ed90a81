"""Aggregate expression builders for the breakdown engine.

Each builder lowers one reference aggregation mode
(``bm_breakdown.py:179-245``) to a pure Catalyst expression so the hot
path stays inside whole-stage codegen — no Python UDFs anywhere in the
aggregation layer.  Null semantics follow the reference's NaN handling
(numpy ``nansum`` / masked ``np.average``), with Spark NULL standing in
for NaN; real float NaNs are normalized to NULL first via ``nanvl`` so
both sentinel-masked nulls and arithmetic NaNs behave identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nn(c: Column) -> Column:
    """Cast to double and turn float NaN into NULL (so Spark aggregates
    skip it exactly like numpy's nan-aware reductions).  ``try_cast``,
    not ``cast``: under Spark 4's default ANSI mode a plain cast of one
    stray non-numeric string ABORTS the whole job (CAST_INVALID_INPUT),
    where the engine's convention everywhere else is to degrade the
    offending value to NULL and keep the report going."""
    c = c.try_cast("double")
    return F.nanvl(c, F.lit(None).cast("double"))


def weight_product(weights) -> Column:
    """Product of weight columns — reference multiplies all weight arrays
    element-wise (``bm_breakdown.py:219,224,230``). NULL/NaN in any factor
    nulls the product (numpy: NaN propagates through ``np.prod``)."""
    prod = nn(F.col(weights[0]))
    for w in weights[1:]:
        prod = prod * nn(F.col(w))
    return prod


def weighted_sum(c: Column, wprod: Column) -> Column:
    """``nansum(var * w1 * w2 ...)`` (``bm_breakdown.py:217-219``): rows
    where the var or any weight is NULL/NaN drop out; an all-null group
    yields 0.0 (numpy nansum of empty/all-NaN is 0.0)."""
    return F.coalesce(F.sum(c * wprod), F.lit(0.0))


def weighted_mean(c: Column, wprod: Column) -> Column:
    """``np.average(var[nonnull], weights=nan_to_num(w[nonnull]))`` guarded
    by a non-zero weight total (``bm_breakdown.py:220-227``): NULL/NaN
    weights count as 0, rows with NULL var drop out entirely, and a group
    whose weights sum to 0 yields NULL (reference keeps NaN)."""
    w0 = F.when(c.isNotNull(), F.coalesce(wprod, F.lit(0.0)))
    num = F.sum(w0 * c)
    den = F.sum(w0)
    return F.when(den != 0, num / den)


def sem(c: Column) -> Column:
    """Standard error of the mean = stddev_samp / sqrt(count), pandas
    ``Series.sem`` default ddof=1 (``bm_breakdown.py:231-233``)."""
    return F.stddev_samp(c) / F.sqrt(F.count(c))


def list_agg(raw: Column) -> Column:
    """``','.join(unique(values))`` (``bm_breakdown.py:215-216``).

    The reference preserves first-seen order, which is undefined under
    distributed execution; we define the order as sorted-ascending so the
    result is deterministic (documented deviation — SURVEY.md §7)."""
    return F.array_join(F.array_sort(F.collect_set(raw.cast("string"))), ",")


def plain_agg(spec, raw: Column) -> Column | None:
    """Lower a non-weighted, non-subplan mode to one aggregate Column.

    ``raw`` is the untouched source column (needed for list/text modes);
    numeric modes cast through :func:`nn` first, mirroring the reference's
    ``astype(np.float)`` before ``pd.Series.<mode>``
    (``bm_breakdown.py:231-233``). Returns None for modes that need a
    sub-plan (major, weighted quantiles) — the operator handles those."""
    c = nn(raw)
    mode = spec.mode
    if mode == "count":
        return F.count(c)
    if mode == "sum":
        if spec.weights:
            return weighted_sum(c, weight_product(spec.weights))
        # pandas Series.sum skips NaN and returns 0.0 for all-NaN
        return F.coalesce(F.sum(c), F.lit(0.0))
    if mode == "mean":
        if spec.weights:
            return weighted_mean(c, weight_product(spec.weights))
        return F.avg(c)
    if mode == "min":
        return F.min(c)
    if mode == "max":
        return F.max(c)
    if mode == "var":
        return F.var_samp(c)
    if mode == "std":
        return F.stddev_samp(c)
    if mode == "sem":
        return sem(c)
    if mode == "list":
        return list_agg(raw)
    q = spec.percentile()
    if q is not None and not spec.is_weighted_quantile:
        # linear-interpolated percentile == pandas quantile / np.percentile
        # (bm_breakdown.py:238-242); NULLs are skipped (deviation: the
        # reference's np.percentile poisons the result on any NaN)
        return F.percentile(c, F.lit(q))
    return None
