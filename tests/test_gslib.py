"""GSLIB/GeoEAS edges: count-line grid dims, sentinel mapping,
ragged rows, blank tails, schema-drift detection."""
import pytest

from vtk_reserves_spark.sources.gslib import (
    parse_gslib, write_gslib_text,
)


def test_roundtrip_with_sentinel():
    rows = [[1.0, 2.5, None], [4.0, None, 6.25]]
    text = write_gslib_text("t", ["a", "b", "c"], rows)
    title, names, got = parse_gslib(text)
    assert (title, names) == ("t", ["a", "b", "c"])
    assert got == rows


def test_count_line_with_grid_dims():
    text = "grid props\n2  50 50 1\nporo\nperm\n0.1 100\n0.2 -999\n"
    title, names, rows = parse_gslib(text)
    assert names == ["poro", "perm"]
    assert rows == [[0.1, 100.0], [0.2, None]]


def test_blank_tail_and_whitespace_runs():
    text = "t\n1\nx\n  1.5  \n\n 2.5\n\n\n"
    assert parse_gslib(text)[2] == [[1.5], [2.5]]


def test_errors():
    with pytest.raises(ValueError):
        parse_gslib("only title")
    with pytest.raises(ValueError, match="variable-count"):
        parse_gslib("t\nnot_a_number\nx\n1\n")
    with pytest.raises(ValueError, match="row has"):
        parse_gslib("t\n2\na\nb\n1 2 3\n")
    with pytest.raises(ValueError):
        parse_gslib("t\n5\na\nb\n")  # count exceeds header lines


def test_custom_sentinel_disabled():
    text = "t\n1\nx\n-999\n"
    assert parse_gslib(text, na_sentinel=None)[2] == [[-999.0]]


def test_spark_read_and_drift(spark, tmp_path):
    from vtk_reserves_spark.sources.gslib import read_gslib

    (tmp_path / "a.dat").write_text(
        write_gslib_text("A", ["x", "y"], [[1.0, 2.0]])
    )
    (tmp_path / "b.dat").write_text(
        write_gslib_text("B", ["x", "y"], [[3.0, None]])
    )
    df = read_gslib(spark, str(tmp_path / "*.dat"))
    rows = sorted(df.collect(), key=lambda r: r.x)
    assert rows[0]._title == "A" and rows[1].y is None
    assert df.schema["x"].dataType.typeName() == "double"
    (tmp_path / "c.dat").write_text(
        write_gslib_text("C", ["other"], [[1.0]])
    )
    with pytest.raises(Exception, match="differ"):
        read_gslib(spark, str(tmp_path / "*.dat")).collect()
