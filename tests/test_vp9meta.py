"""VP9 uncompressed-header edges: all profiles, bit depths, RGB
constraint, non-keyframe rejection, truncation."""
import pytest

from vtk_reserves_spark.sources.vp9 import (
    build_vp9_keyframe_header, parse_vp9_keyframe,
)


@pytest.mark.parametrize("profile,depth", [
    (0, 8), (1, 8), (2, 10), (2, 12), (3, 10), (3, 12),
])
def test_profiles_and_depths(profile, depth):
    hdr = build_vp9_keyframe_header(640, 360, profile, depth, "bt709")
    m = parse_vp9_keyframe(hdr)
    assert m["profile"] == profile and m["bit_depth"] == depth
    assert (m["width"], m["height"]) == (640, 360)


def test_rgb_profile_constraint():
    hdr = build_vp9_keyframe_header(64, 64, 1, 8, "rgb")
    m = parse_vp9_keyframe(hdr)
    assert m["color_space"] == "rgb" and m["subsampling"] == "4:4:4"


def test_rejections():
    with pytest.raises(ValueError, match="frame marker"):
        parse_vp9_keyframe(b"\x00" * 8)
    hdr = bytearray(build_vp9_keyframe_header(64, 64))
    hdr[0] ^= 0x08  # flip show_existing/frame-type region bits
    with pytest.raises(ValueError):
        parse_vp9_keyframe(bytes(hdr))
    with pytest.raises(ValueError, match="truncated"):
        parse_vp9_keyframe(build_vp9_keyframe_header(64, 64)[:4])


def test_extreme_dims():
    m = parse_vp9_keyframe(build_vp9_keyframe_header(1, 1))
    assert (m["width"], m["height"]) == (1, 1)
    m = parse_vp9_keyframe(build_vp9_keyframe_header(65536, 65536))
    assert (m["width"], m["height"]) == (65536, 65536)
