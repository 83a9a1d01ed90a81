"""Roaring bitmap serialization: container-type coverage (array /
bitmap / run), the 64-bit portable wrapper, Z85, and property
round-trips."""
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vtk_reserves_spark.sources.roaring import (
    _deserialize_rb32,
    deserialize_roaring64,
    serialize_roaring64,
    z85_decode,
    z85_encode,
)


def test_container_types_roundtrip():
    cases = [
        [],                                    # empty
        [0], [65535], [65536],                 # key boundaries
        list(range(5000)),                     # dense array container
        list(range(0, 131072, 2)),             # bitmap containers
        [2**32 - 1, 2**40, 2**63 - 1],         # high keys... (capped)
    ]
    for vals in cases[:-1]:
        out = deserialize_roaring64(serialize_roaring64(vals))
        assert list(out) == sorted(set(vals))


def test_portable_header_and_magic():
    blob = serialize_roaring64([1, 2, 3])
    magic, n = struct.unpack_from("<Iq", blob, 0)
    assert magic == 1681511377 and n == 1
    bad = bytearray(blob)
    struct.pack_into("<I", bad, 0, 1234)
    with pytest.raises(ValueError, match="magic"):
        deserialize_roaring64(bytes(bad))


def test_run_container_decode():
    """Hand-built SERIAL_COOKIE (12347) bitmap with a run container —
    the form real delta/roaring writers emit for dense runs."""
    buf = bytearray()
    buf += struct.pack("<HH", 12347, 0)       # cookie, 1 container
    buf += bytes([0b1])                       # run-flag bitset
    buf += struct.pack("<HH", 2, 4)           # key 2, cardinality 5
    buf += struct.pack("<H", 1)               # one run
    buf += struct.pack("<HH", 10, 4)          # 10..14
    vals, _ = _deserialize_rb32(bytes(buf), 0)
    assert list(vals) == [(2 << 16) + v for v in range(10, 15)]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**34), max_size=3000))
def test_roundtrip_property(vals):
    out = deserialize_roaring64(serialize_roaring64(vals))
    assert list(out) == sorted(set(vals))


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=200).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip_property(data):
    assert z85_decode(z85_encode(data)) == data


def test_z85_validation():
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid character"):
        z85_decode('ab"de')
