"""Scale-technique tests: bucketed co-located joins (no shuffle) and
salted two-stage aggregation (same results, skew-spread shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA
from vtk_reserves_spark.functions.skew import salted_agg
from vtk_reserves_spark.sources.writers import save_bucketed


def _plan(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = spark.read.parquet(f"{TESTDATA}/orders.parquet")
    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
    save_bucketed(
        orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo")
    )
    save_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        path=str(tmp_path / "bl"),
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").count()
        plan = _plan(joined)
        # co-located: the join itself needs NO Exchange on either side
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section.split("SortMergeJoin")[0]
        n = joined.agg(F.sum("count")).collect()[0][0]
        direct = (
            orders.join(
                li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            ).count()
        )
        assert n == direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_equals_direct(spark):
    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
    got = salted_agg(
        li,
        "l_returnflag",
        {
            "s": ("l_quantity", "sum"),
            "c": ("l_quantity", "count"),
            "mn": ("l_quantity", "min"),
            "mx": ("l_quantity", "max"),
            "avg": ("l_extendedprice", "mean"),
        },
        salt=8,
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"),
        F.count("l_quantity").alias("c"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
        F.avg("l_extendedprice").alias("avg"),
    )
    g = {r["l_returnflag"]: (r["s"], r["c"], r["mn"], r["mx"], round(r["avg"], 6)) for r in got.collect()}
    w = {r["l_returnflag"]: (r["s"], r["c"], r["mn"], r["mx"], round(r["avg"], 6)) for r in want.collect()}
    assert g == w


def test_salted_agg_rejects_non_decomposable(spark):
    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
    with pytest.raises(ValueError, match="not decomposable"):
        salted_agg(li, "l_returnflag", {"m": ("l_quantity", "median")})


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob

    from vtk_reserves_spark.sources.writers import compact_parquet

    path = str(tmp_path / "many")
    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
    li.repartition(24).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 24
    n_rows = li.count()
    compact_parquet(spark, path, target_mb=512)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after < before
    assert spark.read.parquet(path).count() == n_rows


def test_zorder_write_tightens_rowgroup_stats(spark, tmp_path):
    """Z-order clustering: after save_zordered on two independent keys,
    every parquet row group covers a small slice of BOTH key ranges
    (footer min/max stats tighten), so selective filters on either
    column can skip most row groups.  A plain write leaves each row
    group spanning nearly the full range of at least one key."""
    import os

    import pyarrow.parquet as pq

    from vtk_reserves_spark.sources.writers import save_zordered

    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    def mean_span(path, col):
        spans, lo, hi = [], None, None
        for root, _, files in os.walk(path):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                j = names.index(col)
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(j).statistics
                    spans.append(st.max - st.min)
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        return sum(spans) / len(spans), (hi - lo)

    plain = str(tmp_path / "plain")
    li.repartition(4).write.parquet(plain)
    zed = str(tmp_path / "zed")
    save_zordered(li, zed, ["l_partkey", "l_suppkey"], n_files=16)

    for col in ("l_partkey", "l_suppkey"):
        span_p, full_p = mean_span(plain, col)
        span_z, full_z = mean_span(zed, col)
        # hash-repartitioned row groups span ~the whole range
        assert span_p > 0.8 * full_p
        # z-ordered row groups cover a fraction of BOTH ranges
        assert span_z < 0.6 * full_z, (col, span_z, full_z)
    # same data round-trips
    assert spark.read.parquet(zed).count() == li.count()
