"""ICS + HTML-table extraction edges: line folding, escapes,
TZID params, th/td mixing, nested markup, codegen purity."""
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.html_meta import html_tables
from vtk_reserves_spark.functions.ics import ics_events


def _events(spark, text):
    df = spark.createDataFrame([(text,)], "s string")
    return (
        df.select(F.explode(ics_events("s")).alias("e"))
        .select("e.*")
        .collect()
    )


def test_ics_folding_and_escapes(spark):
    ics = (
        "BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\n"
        "SUMMARY:A very long\r\n  title\\, with comma\r\n"
        "DTSTART;TZID=UTC:20240101T000000\r\n"
        "LOCATION:Room\\; B\r\nUID:u1\r\n"
        "END:VEVENT\r\nEND:VCALENDAR\r\n"
    )
    (e,) = _events(spark, ics)
    assert e.summary == "A very long title, with comma"
    assert e.dtstart == "20240101T000000"
    assert e.location == "Room; B"


def test_ics_tab_fold_and_missing_fields(spark):
    ics = (
        "BEGIN:VEVENT\nSUMMARY:tab\n\tfolded\nEND:VEVENT\n"
    )
    (e,) = _events(spark, ics)
    assert e.summary == "tabfolded"
    assert e.dtstart is None and e.uid is None


def test_ics_multiple_events(spark):
    ics = "".join(
        f"BEGIN:VEVENT\nSUMMARY:E{i}\nEND:VEVENT\n" for i in range(3)
    )
    evs = _events(spark, ics)
    assert [e.summary for e in evs] == ["E0", "E1", "E2"]


def test_ics_non_calendar_empty(spark):
    df = spark.createDataFrame([("<html>no events</html>",)], "s string")
    assert df.select(F.size(ics_events("s")).alias("n")).first().n == 0


def _tables(spark, html):
    df = spark.createDataFrame([(html,)], "s string")
    return df.select(html_tables("s").alias("t")).first().t


def test_table_th_td_and_nested_markup(spark):
    t = _tables(
        spark,
        "<table><tr><th>H&amp;M</th></tr>"
        "<tr><td>a <b>bold</b> cell</td></tr></table>",
    )
    assert t == [[["H&M"], ["a bold cell"]]][0:1] or t == [
        [["H&M"], ["a bold cell"]]
    ]


def test_multiple_tables_and_none(spark):
    t = _tables(
        spark,
        "<table><tr><td>1</td><td>2</td></tr></table>"
        "<p>x</p><table><tr><td>3</td></tr></table>",
    )
    assert t == [[["1", "2"]], [["3"]]]
    assert _tables(spark, "<p>plain</p>") == []


def test_extractors_stay_in_codegen(spark):
    df = spark.createDataFrame([("x",)], "s string").select(
        ics_events("s").alias("e"), html_tables("s").alias("t")
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "EvalPython" not in plan
