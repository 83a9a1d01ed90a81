"""Shared fixtures: a local SparkSession and a DuckDB oracle connection
with the driver's testdata registered as views — tests cross-check Spark
results against ANSI-SQL oracles exactly like the driver's t2 gate."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import SparkSession

TESTDATA = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vtk_reserves_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{TESTDATA}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def assert_frames_match(spark_df, duck_rel, approx=1e-9):
    """Order-insensitive, column-name-sorted comparison — the same
    contract as the driver's t2 hash check."""
    scols = sorted(spark_df.columns)
    srows = [
        tuple(_norm(r[c]) for c in scols) for r in spark_df.collect()
    ]
    dcols = [d[0] for d in duck_rel.description]
    assert sorted(dcols) == scols, f"schema mismatch: {sorted(dcols)} != {scols}"
    order = [dcols.index(c) for c in scols]
    drows = [tuple(_norm(row[i]) for i in order) for row in duck_rel.fetchall()]
    assert len(srows) == len(drows), f"row count {len(srows)} != {len(drows)}"
    srows.sort(key=repr)
    drows.sort(key=repr)
    mismatches = []
    for a, b in zip(srows, drows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if not math.isclose(x, y, rel_tol=approx, abs_tol=1e-9):
                    mismatches.append((a, b))
                    break
            elif x != y:
                mismatches.append((a, b))
                break
    assert not mismatches, f"value mismatches (first 5): {mismatches[:5]}"
