"""Surpac .str edges: Y-before-X order, segment separators,
END terminator, descriptions with commas, corruption."""
import pytest

from vtk_reserves_spark.sources.surpac import parse_str, write_str_text


def test_y_before_x_order():
    text = (
        "f,1-Jan-24,0.000,0.000\n"
        "0, 0.000, 0.000, 0.000, 0.000, 0.000, 0.000\n"
        "7, 1000.5, 2000.25, 30.0, crest\n"
        "0, 0.000, 0.000, 0.000, END\n"
    )
    (p,) = parse_str(text)
    assert (p["y"], p["x"], p["z"]) == (1000.5, 2000.25, 30.0)
    assert p["string_id"] == 7 and p["desc"] == "crest"


def test_segments_and_terminator():
    pts = [
        {"string_id": 1, "segment": 0, "y": 1.0, "x": 2.0, "z": 3.0,
         "desc": "a"},
        {"string_id": 1, "segment": 1, "y": 4.0, "x": 5.0, "z": 6.0,
         "desc": "b"},
    ]
    text = write_str_text(pts) + "9, 9.0, 9.0, 9.0, after-end\n"
    got = parse_str(text)
    assert [p["segment"] for p in got] == [0, 1]
    assert len(got) == 2  # records after END ignored


def test_desc_with_commas():
    got = parse_str(write_str_text([
        {"string_id": 2, "segment": 0, "y": 1.0, "x": 2.0, "z": 3.0,
         "desc": "pit,phase 2,final"},
    ]))
    assert got[0]["desc"] == "pit,phase 2,final"


def test_empty_desc():
    got = parse_str(write_str_text([
        {"string_id": 1, "segment": 0, "y": 1.0, "x": 2.0, "z": 3.0,
         "desc": ""},
    ]))
    assert got[0]["desc"] == ""


def test_errors():
    with pytest.raises(ValueError):
        parse_str("just one line")
    bad = "h\naxis\n1, 2.0\n"
    with pytest.raises(ValueError, match="malformed"):
        parse_str(bad)
    with pytest.raises(ValueError, match="bad coordinates"):
        parse_str("h\naxis\n1, x, 2.0, 3.0,\n")
