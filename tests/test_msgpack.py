"""MessagePack edges: width-ladder boundaries, every container
form, ext passthrough, reserved-byte rejection, truncation."""
import pytest

from vtk_reserves_spark.sources.msgpack import (
    pack, unpack_one, unpack_stream,
)


def test_int_width_boundaries():
    for v in (0, 127, 128, 255, 256, 65535, 65536, 2**32 - 1, 2**32,
              2**63 - 1, -1, -32, -33, -128, -129, -32768, -32769,
              -(2**31), -(2**31) - 1, -(2**63)):
        got, _ = unpack_one(pack(v))
        assert got == v, v


def test_str_and_bin_widths():
    for n in (0, 31, 32, 255, 256, 70000):
        s = "s" * n
        assert unpack_one(pack(s))[0] == s
        raw = b"\x01" * n
        assert unpack_one(pack(raw))[0] == raw


def test_containers_and_nesting():
    v = {"a": [1, {"b": None}], "c": (True, False)}
    got, _ = unpack_one(pack(v))
    assert got == {"a": [1, {"b": None}], "c": [True, False]}
    big_list = list(range(20))  # array16 form
    assert unpack_one(pack(big_list))[0] == big_list
    big_map = {f"k{i}": i for i in range(20)}  # map16 form
    assert unpack_one(pack(big_map))[0] == big_map


def test_float_and_float32():
    assert unpack_one(pack(1.25))[0] == 1.25
    import struct as _s

    f32 = b"\xca" + _s.pack(">f", 0.5)
    assert unpack_one(f32)[0] == 0.5


def test_ext_types_surfaced():
    # fixext4 timestamp (type -1) and ext8
    v, _ = unpack_one(b"\xd6\xff\x00\x00\x00\x2a")
    assert v == ("__ext__", -1, b"\x00\x00\x00\x2a")
    v, _ = unpack_one(b"\xc7\x02\x05ab")
    assert v == ("__ext__", 5, b"ab")


def test_stream_and_errors():
    blob = pack(1) + pack("two") + pack([3])
    assert unpack_stream(blob) == [1, "two", [3]]
    with pytest.raises(ValueError, match="reserved"):
        unpack_one(b"\xc1")
    with pytest.raises(ValueError, match="truncated"):
        unpack_one(b"\xdc\x00")
    with pytest.raises(ValueError, match="truncated"):
        unpack_stream(pack("hello")[:-2])
