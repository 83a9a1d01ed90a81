"""AV1 sequence-header edges: OBU framing, leb128 sizes, both
header layouts, tier gating, still-picture flags, corruption."""
import pytest

from vtk_reserves_spark.sources.av1 import (
    build_av1_sequence_header, parse_av1_sequence_header,
)


@pytest.mark.parametrize("profile", [0, 1, 2])
@pytest.mark.parametrize("reduced", [False, True])
def test_profiles_and_layouts(profile, reduced):
    m = parse_av1_sequence_header(
        build_av1_sequence_header(1280, 720, profile, 5, reduced=reduced)
    )
    assert m["profile"] == profile and m["reduced_header"] == reduced
    assert (m["width"], m["height"]) == (1280, 720)


def test_tier_only_above_level_7():
    hi = parse_av1_sequence_header(
        build_av1_sequence_header(64, 64, 0, 12, tier=1)
    )
    assert hi["level"] == 12 and hi["tier"] == 1
    lo = parse_av1_sequence_header(
        build_av1_sequence_header(64, 64, 0, 3, tier=1)
    )
    assert lo["level"] == 3 and lo["tier"] == 0  # tier bit absent


def test_variable_width_dims():
    for w, h in ((1, 1), (17, 9), (65536, 2)):
        m = parse_av1_sequence_header(build_av1_sequence_header(w, h))
        assert (m["width"], m["height"]) == (w, h)


def test_still_picture():
    m = parse_av1_sequence_header(
        build_av1_sequence_header(512, 512, still_picture=True)
    )
    assert m["still_picture"]


def test_corruption():
    with pytest.raises(ValueError, match="forbidden"):
        parse_av1_sequence_header(b"\x80\x00")
    with pytest.raises(ValueError, match="no sequence header"):
        parse_av1_sequence_header(b"\x12\x00")  # temporal delimiter only
    blob = build_av1_sequence_header(640, 480)
    with pytest.raises(ValueError):
        parse_av1_sequence_header(blob[:4])
