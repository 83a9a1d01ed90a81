"""SVG analysis edges: viewBox fallback, unit suffixes, invisible
titles/defs, entity decoding, non-SVG rejection."""
import pytest
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.svg import (
    is_svg, svg_dims, svg_shape_counts, svg_text,
)


def _one(spark, svg):
    return (
        spark.createDataFrame([(svg,)], "s string")
        .select(
            is_svg("s").alias("ok"),
            svg_dims("s").alias("d"),
            svg_text("s").alias("t"),
            svg_shape_counts("s").alias("c"),
        )
        .first()
    )


def test_explicit_dims_with_units(spark):
    r = _one(spark, '<svg width="300px" height="150" viewBox="0 0 600 300"><path/></svg>')
    assert r.ok
    assert r.d.width == 300.0 and r.d.height == 150.0
    assert r.d.viewbox_w == 600.0 and r.d.viewbox_h == 300.0


def test_viewbox_intrinsic_fallback(spark):
    r = _one(spark, '<svg viewBox="0 0 24.5 24"><rect/></svg>')
    assert r.d.width == 24.5 and r.d.height == 24.0


def test_title_and_defs_invisible(spark):
    r = _one(
        spark,
        '<svg viewBox="0 0 1 1"><title>meta</title><defs><path/></defs>'
        '<text>A <tspan>B&amp;C</tspan></text><text>D</text></svg>',
    )
    assert r.t == "A B&C D"
    assert r.c.n_paths == 1  # defs path still counts in the census


def test_prolog_doctype_comment_prefix(spark):
    r = _one(
        spark,
        '<?xml version="1.0"?><!DOCTYPE svg><!-- hi -->\n<svg viewBox="0 0 2 2"/>',
    )
    assert r.ok


def test_non_svg(spark):
    r = _one(spark, "<html><body>svg inside text</body></html>")
    assert not r.ok
    assert r.d.width is None and r.t == ""


def test_shape_census(spark):
    r = _one(
        spark,
        '<svg viewBox="0 0 9 9"><path/><path d="m"/><rect/><circle/>'
        '<ellipse/><line/><polygon/><image href="x"/><use href="#a"/></svg>',
    )
    c = r.c
    assert (c.n_paths, c.n_rects, c.n_circles, c.n_ellipses,
            c.n_lines, c.n_polygons, c.n_images, c.n_uses) \
        == (2, 1, 1, 1, 1, 1, 1, 1)


def test_case_insensitive(spark):
    r = _one(spark, '<SVG WIDTH="10" HEIGHT="20" viewbox="0 0 5 5"><RECT/></SVG>')
    assert r.ok and r.d.width == 10.0 and r.c.n_rects == 1


def test_whole_stage_codegen(spark):
    # the entire SVG analysis must stay inside codegen (no Python)
    df = spark.createDataFrame([("<svg/>",)], "s string").select(
        svg_dims("s").alias("d"), svg_text("s").alias("t")
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
