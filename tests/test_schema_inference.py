"""Schema-inference helpers — driver-side ports of the reference's
column-name heuristics (pd_synonyms _gui.py:278-308, pd_detect_xyz
_gui.py:310-328, pd_detect_cell_size pd_vtk.py:179-200).  Pure Python
over column lists; no SparkSession needed except the cell-size probe.
"""

from __future__ import annotations

from vtk_reserves_spark.sources.grid import detect_xyz
from vtk_reserves_spark.sources.loaders import SYNONYM_LUT, column_synonyms


class TestColumnSynonyms:
    def test_exact_match_wins(self):
        assert column_synonyms(["easting", "x", "lat"], "x") == "x"

    def test_lut_key_expands(self):
        assert column_synonyms(["furo", "val"], "hid") == "furo"

    def test_priority_order_not_column_order(self):
        # 'x' is earlier in the synonym list than 'east', so it wins even
        # though 'east' appears first among the columns
        assert column_synonyms(["east", "x"], "x") == "x"

    def test_case_insensitive_prefix_second_pass(self):
        # no exact 'y' column; 'Northing' matches synonym 'north' as a
        # case-insensitive prefix
        assert column_synonyms(["hole", "Northing"], "y") == "Northing"

    def test_failsafe_default_index(self):
        assert column_synonyms(["a", "b"], "dip") == "a"
        assert column_synonyms(["a", "b"], "dip", default=1) == "b"

    def test_default_none_returns_none(self):
        assert column_synonyms(["a", "b"], "dip", default=None) is None

    def test_explicit_list(self):
        assert column_synonyms(["grade_pct", "au"], ["au", "gold"]) == "au"

    def test_lut_covers_reference_keys(self):
        assert set(SYNONYM_LUT) == {
            "hid", "x", "y", "z", "depth", "brg", "dip", "from", "to", "length",
        }


class TestDetectXyz:
    def test_plain_triplet(self):
        assert detect_xyz(["x", "y", "z", "grade"]) == ["x", "y", "z"]

    def test_capitalized_triplet(self):
        assert detect_xyz(["Leste", "Norte", "Cota"]) == ["Leste", "Norte", "Cota"]

    def test_priority_earlier_triplet_wins(self):
        cols = ["xc", "yc", "zc", "midx", "midy", "midz"]
        assert detect_xyz(cols) == ["midx", "midy", "midz"]

    def test_xy_fallback_when_no_z(self):
        assert detect_xyz(["x", "y", "grade"]) == ["x", "y"]

    def test_none_when_absent(self):
        assert detect_xyz(["a", "b", "c"]) is None
