"""CBOR edges: RFC 8949 appendix-A vectors, indefinite lengths,
half floats, tags, reserved encodings."""
import binascii
import math

import pytest

from vtk_reserves_spark.sources.cbor import decode_one, decode_stream, encode


RFC_VECTORS = [
    ("00", 0), ("01", 1), ("17", 23), ("1818", 24), ("18ff", 255),
    ("190100", 256), ("1a000f4240", 1000000),
    ("1b000000e8d4a51000", 1000000000000),
    ("20", -1), ("29", -10), ("3863", -100), ("3903e7", -1000),
    ("f4", False), ("f5", True), ("f6", None),
    ("f90000", 0.0), ("f93c00", 1.0), ("f9c400", -4.0),
    ("f90001", 5.960464477539063e-8), ("f97bff", 65504.0),
    ("fa47c35000", 100000.0), ("fb3ff199999999999a", 1.1),
    ("6161", "a"), ("6449455446", "IETF"), ("63e6b8ad", "渭"),
    ("80", []), ("83010203", [1, 2, 3]),
    ("a201020304", {1: 2, 3: 4}),
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    ("5f42010243030405ff", b"\x01\x02\x03\x04\x05"),
    ("7f657374726561646d696e67ff", "streaming"),
    ("c11a514b67b0", ("__tag__", 1, 1363896240)),
]


@pytest.mark.parametrize("hx,want", RFC_VECTORS)
def test_rfc8949_appendix_a(hx, want):
    v, pos = decode_one(binascii.unhexlify(hx))
    assert v == want
    assert pos == len(binascii.unhexlify(hx))


def test_half_float_specials():
    assert decode_one(binascii.unhexlify("f97c00"))[0] == math.inf
    assert decode_one(binascii.unhexlify("f9fc00"))[0] == -math.inf
    assert math.isnan(decode_one(binascii.unhexlify("f97e00"))[0])


def test_encode_roundtrip():
    objs = [
        {"k": [1, -2, "s", b"\x00", None, True, 2.5]},
        ("__tag__", 32, "https://x"),
        -(2**40), 2**40,
    ]
    blob = b"".join(encode(o) for o in objs)
    assert decode_stream(blob) == objs


def test_malformed():
    with pytest.raises(ValueError, match="reserved"):
        decode_one(b"\x1c")
    with pytest.raises(ValueError, match="truncated"):
        decode_one(b"\x19\x01")
    with pytest.raises(ValueError, match="break"):
        decode_one(b"\xff")
    with pytest.raises(ValueError, match="unterminated"):
        decode_one(b"\x5f\x41\x01")


def test_truncated_floats_raise_valueerror():
    for blob in (b"\xf9\x01", b"\xfa\x00\x00", b"\xfb\x00\x00\x00\x00"):
        with pytest.raises(ValueError, match="truncated"):
            decode_one(blob)


def test_two_byte_simple_values():
    # RFC 8949 section 3.3: simple values 0-31 must use the one-byte
    # form; the two-byte encoding of them is invalid
    with pytest.raises(ValueError, match="simple"):
        decode_one(b"\xf8\x1f")
    assert decode_one(b"\xf8\xff")[0] == ("__simple__", 255)
