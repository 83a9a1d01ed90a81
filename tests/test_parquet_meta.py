"""Parquet footer introspection: row-group grain, null counts,
numeric min/max surfacing, string/timestamp exclusion, multi-file
globs, column filters, and footer-vs-data agreement."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vtk_reserves_spark.sources.parquet_meta import (
    parquet_column_stats,
    parquet_rowgroup_stats,
)


def _write(tmp_path, name, pdf, row_group_size=None):
    p = str(tmp_path / name)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p,
                   row_group_size=row_group_size)
    return p


def test_rowgroup_grain_and_stats(spark, tmp_path):
    pdf = pd.DataFrame({
        "a": np.arange(100, dtype=np.int64),
        "b": np.where(np.arange(100) % 10 == 0, np.nan,
                      np.arange(100) * 0.5),
        "s": [f"x{i}" for i in range(100)],
    })
    p = _write(tmp_path, "t.parquet", pdf, row_group_size=30)
    rg = parquet_rowgroup_stats(spark, p).toPandas()
    # 4 row groups x 3 columns
    assert len(rg) == 12
    assert rg["row_group"].nunique() == 4
    a0 = rg[(rg.path_in_schema == "a") & (rg.row_group == 0)].iloc[0]
    assert a0["num_values"] == 30
    assert a0["null_count"] == 0
    assert a0["min_value"] == 0.0 and a0["max_value"] == 29.0
    # doubles with nulls: footer counts them
    b = rg[rg.path_in_schema == "b"]
    assert b["null_count"].sum() == 10
    # strings: sizes surface, min/max do not
    s = rg[rg.path_in_schema == "s"]
    assert s["min_value"].isna().all()
    assert (s["total_compressed_size"] > 0).all()


def test_column_stats_aggregation_matches_data(spark, tmp_path):
    pdf = pd.DataFrame({
        "a": np.arange(50, dtype=np.int64) - 25,
        "b": np.linspace(-1.5, 2.5, 50),
    })
    p = _write(tmp_path, "t.parquet", pdf, row_group_size=7)
    out = parquet_column_stats(spark, p).toPandas().set_index(
        "path_in_schema"
    )
    assert out.loc["a", "n_values"] == 50
    assert out.loc["a", "min_value"] == -25.0
    assert out.loc["a", "max_value"] == 24.0
    assert out.loc["b", "min_value"] == pytest.approx(-1.5)
    assert out.loc["b", "max_value"] == pytest.approx(2.5)


def test_glob_and_column_filter(spark, tmp_path):
    for i in range(3):
        _write(tmp_path, f"p{i}.parquet",
               pd.DataFrame({"a": [i], "b": [0.0]}))
    rg = parquet_rowgroup_stats(
        spark, str(tmp_path / "p*.parquet"), columns=["a"]
    )
    pdf = rg.toPandas()
    assert set(pdf["path_in_schema"]) == {"a"}
    assert len(pdf) == 3  # one row group per file
    assert pdf["file"].nunique() == 3
    # one task per file
    assert rg.rdd.getNumPartitions() == 3


def test_missing_path_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no files match"):
        parquet_rowgroup_stats(spark, str(tmp_path / "nope*.parquet"))
