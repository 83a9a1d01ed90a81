"""asof_join semantics: backward/forward, ties, tolerance, grouping —
cross-checked against DuckDB's native ASOF JOIN and hand oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_frames_match
from vtk_reserves_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, 10, 100.0),
            (1, 20, 101.0),
            (1, 30, 102.0),
            (2, 15, 50.0),
        ],
        "sym long, t long, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, 5, "a"),   # before any quote
            (1, 20, "b"),  # exactly at a quote -> inclusive match
            (1, 25, "c"),
            (1, 99, "d"),
            (2, 16, "e"),
            (3, 10, "f"),  # sym with no quotes at all
        ],
        "sym long, t long, tag string",
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_backward_basic(trades, quotes):
    out = asof_join(trades, quotes, on="t", by="sym")
    got = {(r.sym, r.t, r.tag): r.px for r in out.collect()}
    assert got == {
        (1, 5, "a"): None,
        (1, 20, "b"): 101.0,
        (1, 25, "c"): 101.0,
        (1, 99, "d"): 102.0,
        (2, 16, "e"): 50.0,
        (3, 10, "f"): None,
    }


def test_forward_basic(trades, quotes):
    out = asof_join(trades, quotes, on="t", by="sym", direction="forward")
    got = {(r.sym, r.t, r.tag): r.px for r in out.collect()}
    assert got == {
        (1, 5, "a"): 100.0,
        (1, 20, "b"): 101.0,  # inclusive at equal time
        (1, 25, "c"): 102.0,
        (1, 99, "d"): None,
        (2, 16, "e"): None,
        (3, 10, "f"): None,
    }


def test_tolerance(trades, quotes):
    out = asof_join(trades, quotes, on="t", by="sym", tolerance=F.lit(5))
    got = {(r.sym, r.t, r.tag): r.px for r in out.collect()}
    # match kept only when left.t - right.t <= 5
    assert got == {
        (1, 5, "a"): None,
        (1, 20, "b"): 101.0,
        (1, 25, "c"): 101.0,
        (1, 99, "d"): None,
        (2, 16, "e"): 50.0,
        (3, 10, "f"): None,
    }


def test_duckdb_asof_parity(trades, quotes, duck):
    tp = trades.toPandas()
    qp = quotes.toPandas()
    duck.register("t_trades", tp)
    duck.register("t_quotes", qp)
    oracle = duck.sql(
        "SELECT l.sym, l.t, l.tag, r.px FROM t_trades l "
        "ASOF LEFT JOIN t_quotes r ON l.sym = r.sym AND l.t >= r.t"
    )
    out = asof_join(trades, quotes, on="t", by="sym")
    assert_frames_match(out.select("sym", "t", "tag", "px"), oracle)


def test_payload_collision_rejected(trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("px", "tag"), on="t", by="sym")


def test_single_shuffle_plan(trades, quotes):
    out = asof_join(trades, quotes, on="t", by="sym")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange (the window's partitionBy) and no
    # nested-loop/cartesian fallback
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

def test_range_join_overlapping_intervals(spark):
    from vtk_reserves_spark.operators.asof import range_join

    pts = spark.createDataFrame(
        [(1, 5.0, "p1"), (1, 10.0, "p2"), (1, 25.0, "p3"), (2, 5.0, "p4")],
        "k long, t double, tag string",
    )
    iv = spark.createDataFrame(
        [
            (1, 0.0, 10.0, "A"),    # p1 in; p2 out (hi exclusive)
            (1, 4.0, 26.0, "B"),    # p1, p2, p3 (overlaps A)
            (1, 30.0, 40.0, "C"),   # empty
            (2, 0.0, 10.0, "D"),    # p4
        ],
        "k long, lo double, hi double, name string",
    )
    out = range_join(pts, iv, on="t", lo="lo", hi="hi", by="k", bucket=7.0)
    got = {(r.tag, r.name) for r in out.collect()}
    assert got == {("p1", "A"), ("p1", "B"), ("p2", "B"), ("p3", "B"), ("p4", "D")}


def test_range_join_duckdb_parity(spark, duck):
    from vtk_reserves_spark.operators.asof import range_join

    pts = spark.range(0, 200).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 1.37 % 50).alias("t")
    )
    iv = spark.range(0, 40).select(
        (F.col("id") % 3).alias("k"),
        (F.col("id") * 2.11 % 45).alias("lo"),
        ((F.col("id") * 2.11 % 45) + 4.0).alias("hi"),
    )
    duck.register("rj_pts", pts.toPandas())
    duck.register("rj_iv", iv.toPandas())
    oracle = duck.sql(
        "SELECT p.k, p.t, i.lo, i.hi FROM rj_pts p JOIN rj_iv i "
        "ON p.k = i.k AND i.lo <= p.t AND p.t < i.hi"
    )
    out = range_join(pts, iv, on="t", lo="lo", hi="hi", by="k", bucket=5.0)
    assert_frames_match(out.select("k", "t", "lo", "hi"), oracle)


def test_range_join_no_nested_loop(spark):
    from vtk_reserves_spark.operators.asof import range_join

    pts = spark.createDataFrame([(1, 5.0)], "k long, t double")
    iv = spark.createDataFrame([(1, 0.0, 10.0)], "k long, lo double, hi double")
    plan = range_join(pts, iv, on="t", lo="lo", hi="hi", by="k")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------

def test_sessionize_gap_semantics(spark):
    from vtk_reserves_spark.operators.sessions import session_stats

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),   # same session (10m gap)
            (1, "2024-01-01 01:00:00", 3.0),   # 50m gap -> new session
            (2, "2024-01-01 00:00:00", 4.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.user_id, r.session_seq): (r.n_events, r.sum_value)
        for r in session_stats(ev, "user_id", "ts", "value").collect()
    }
    assert out == {(1, 1): (2, 3.0), (1, 2): (1, 3.0), (2, 1): (1, 4.0)}


def test_sessionize_single_exchange(spark):
    from vtk_reserves_spark.operators.sessions import session_stats

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    plan = session_stats(ev, "user_id", "ts", "value")._jdf.queryExecution().executedPlan().toString()
    # windows and the (user, session) aggregation share ONE hash
    # partitioning by user_id — no second exchange for the group-by
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_mixed_timestamp_flavors_rejected(spark):
    import pytest

    from vtk_reserves_spark.operators.asof import range_join

    pts = spark.sql("SELECT TIMESTAMP'2024-01-01 00:00:00' AS ts, 1 AS k")
    iv = spark.sql(
        "SELECT TIMESTAMP_NTZ'2024-01-01 00:00:00' AS lo, "
        "TIMESTAMP_NTZ'2024-01-02 00:00:00' AS hi, 1 AS k"
    )
    with pytest.raises(ValueError, match="mixed Timestamp"):
        range_join(pts, iv, on="ts", lo="lo", hi="hi", by="k", bucket=3600.0)


def test_asof_interpolate_hand_checked(spark):
    """Linear interpolation between surrounding observations; exact-time
    hit reproduces the observation; ends hold the nearest value; empty
    groups yield NULL."""
    from pyspark.sql import functions as F  # noqa: F401

    from vtk_reserves_spark.operators.asof import asof_interpolate

    right = spark.createDataFrame(
        # the NULL-valued observation at t=15 must be IGNORED entirely —
        # letting it through would contribute its time to the previous-
        # observation tracking and skew the t=15..20 interpolation
        [("a", 10.0, 100.0), ("a", 15.0, None), ("a", 20.0, 200.0),
         ("a", 40.0, 100.0)],
        "grp string, t double, v double",
    )
    left = spark.createDataFrame(
        [("a", 15.0), ("a", 20.0), ("a", 35.0), ("a", 5.0), ("a", 99.0),
         ("b", 10.0)],
        "grp string, t double",
    )
    out = {
        (r.grp, r.t): r.v_interp
        for r in asof_interpolate(left, right, "t", "v", by="grp").collect()
    }
    assert out[("a", 15.0)] == pytest.approx(150.0)   # midway 100->200
    assert out[("a", 20.0)] == pytest.approx(200.0)   # exact hit
    assert out[("a", 35.0)] == pytest.approx(125.0)   # 3/4 along 200->100
    assert out[("a", 5.0)] == pytest.approx(100.0)    # before first: hold
    assert out[("a", 99.0)] == pytest.approx(100.0)   # after last: hold
    assert out[("b", 10.0)] is None                   # no observations


def test_asof_join_matched_row_is_atomic(spark):
    """The match must be ONE right row: a NULL field in the matched row
    stays NULL instead of being stitched from an older row (the
    per-column last(ignorenulls) chimera)."""
    from vtk_reserves_spark.operators.asof import asof_join

    left = spark.createDataFrame([(10.0,)], "t double")
    right = spark.createDataFrame(
        [(1.0, 1.0, 2.0), (5.0, 3.0, None)], "t double, a double, b double"
    )
    out = asof_join(left, right, on="t").collect()[0]
    assert out.a == 3.0
    assert out.b is None  # from the t=5 row, NOT b=2 from t=1


def test_asof_join_null_times_never_match(spark):
    """NULL-time right rows are not candidates; NULL-time left rows
    have no as-of position and get a NULL match."""
    from vtk_reserves_spark.operators.asof import asof_join

    left = spark.createDataFrame([(5.0,), (None,)], "t double")
    right = spark.createDataFrame(
        [(None, "x"), (10.0, "y")], "t double, v string"
    )
    got = {r.t: r.v for r in asof_join(left, right, on="t").collect()}
    assert got[5.0] is None  # no right row <= 5; 'x' must not leak
    assert got[None] is None


def test_asof_join_guards(spark):
    from pyspark.sql import functions as SF

    from vtk_reserves_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1.0, 2.0)], "t double, _pay double")
    right = spark.createDataFrame([(1.0, 3.0)], "t double, v double")
    with pytest.raises(ValueError, match="internal names"):
        asof_join(left, right, on="t")
    lt = spark.createDataFrame([(1,)], "i long").select(
        SF.timestamp_seconds("i").alias("t")
    )
    rt = spark.createDataFrame([(1, 2.0)], "i long, v double").select(
        SF.timestamp_seconds("i").cast("timestamp_ntz").alias("t"), "v"
    )
    with pytest.raises(ValueError, match="mixed Timestamp"):
        asof_join(lt, rt, on="t")


def test_asof_interpolate_null_times_ignored(spark):
    from vtk_reserves_spark.operators.asof import asof_interpolate

    left = spark.createDataFrame([(5.0,), (None,)], "t double")
    right = spark.createDataFrame(
        [(None, 99.0), (0.0, 0.0), (10.0, 10.0)], "t double, v double"
    )
    out = {
        r.t: r.v_interp
        for r in asof_interpolate(left, right, "t", "v").collect()
    }
    assert out[5.0] == pytest.approx(5.0)  # 99 @ NULL time ignored
    assert out[None] is None
