"""KML/GPX extraction edges: coordinate order, optional altitude,
unnamed placemarks, attribute order, self-closed trkpts, codegen
purity."""
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.geoxml import (
    gpx_trackpoints, kml_placemarks,
)


def _kml(spark, xml):
    return (
        spark.createDataFrame([(xml,)], "s string")
        .select(F.explode(kml_placemarks("s")).alias("p"))
        .select("p.*")
        .collect()
    )


def _gpx(spark, xml):
    return (
        spark.createDataFrame([(xml,)], "s string")
        .select(F.explode(gpx_trackpoints("s")).alias("p"))
        .select("p.*")
        .collect()
    )


def test_kml_lon_lat_order(spark):
    # KML coordinates are LON,LAT[,ALT] — the classic misread
    rows = _kml(
        spark,
        "<Placemark><name>A</name>"
        "<Point><coordinates>-70.5,-33.25,812.5</coordinates></Point>"
        "</Placemark>",
    )
    assert rows[0].lon == -70.5 and rows[0].lat == -33.25
    assert rows[0].alt == 812.5 and rows[0].name == "A"


def test_kml_optional_fields(spark):
    rows = _kml(
        spark,
        "<Placemark><Point><coordinates> 151.2,-33.8 </coordinates>"
        "</Point></Placemark>",
    )
    assert rows[0].name is None and rows[0].alt is None
    assert rows[0].lon == 151.2


def test_gpx_attr_order_and_selfclosed(spark):
    rows = _gpx(
        spark,
        '<trkpt lat="47.5" lon="8.25"><ele>402.0</ele>'
        "<time>T0</time></trkpt>"
        '<trkpt lon="8.5" lat="47.25"/>',
    )
    assert (rows[0].lat, rows[0].lon, rows[0].ele, rows[0].time) == (
        47.5, 8.25, 402.0, "T0",
    )
    assert (rows[1].lat, rows[1].lon, rows[1].ele, rows[1].time) == (
        47.25, 8.5, None, None,
    )


def test_non_geo_xml_empty(spark):
    assert _kml(spark, "<html><body>x</body></html>") == []
    assert _gpx(spark, "<rss><channel/></rss>") == []


def test_geoxml_query_pure_catalyst(spark):
    import __spark_entry__ as entry
    from tests.conftest import TESTDATA

    df = entry.q_geoxml(spark, TESTDATA)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "EvalPython" not in plan
