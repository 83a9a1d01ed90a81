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
