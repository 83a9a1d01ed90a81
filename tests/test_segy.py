"""SEG-Y edges: IBM hex-float known vectors, all four sample
formats, EBCDIC vs ASCII headers, trace header fields, corruption."""
import numpy as np
import pytest

from vtk_reserves_spark.sources.segy import (
    build_segy, float_to_ibm32, ibm32_to_float, parse_segy,
)

TRACES = [
    ({"trace_seq": t + 1, "cdp": 100 + t, "inline": 9, "crossline": t},
     np.arange(16, dtype=float) - 8 + t)
    for t in range(3)
]


def test_ibm_known_vectors():
    # the canonical example from the IBM hex-float literature
    assert ibm32_to_float(np.array([0xC276A000]))[0] == -118.625
    assert float_to_ibm32(np.array([-118.625]))[0] == 0xC276A000
    assert ibm32_to_float(np.array([0x42760000]))[0] == 118.0
    assert ibm32_to_float(np.array([0]))[0] == 0.0


def test_ibm_roundtrip_range():
    vals = np.array(
        [0.0, 1.0, -1.0, 0.5, -0.0625, 3.1414794921875, 2**20, -(2**23)]
    )
    rt = ibm32_to_float(float_to_ibm32(vals))
    assert np.allclose(rt, vals, rtol=2e-7)
    ints = np.arange(-1000, 1000, dtype=float)
    assert np.array_equal(ibm32_to_float(float_to_ibm32(ints)), ints)


@pytest.mark.parametrize("fmt", ["ieee", "ibm", "i16", "i8"])
@pytest.mark.parametrize("ebcdic", [True, False])
def test_roundtrip_formats(fmt, ebcdic):
    traces = TRACES if fmt != "i8" else [
        (h, np.clip(s, -128, 127)) for h, s in TRACES
    ]
    m = parse_segy(build_segy("C 1 CLIENT X", traces, fmt, 4000, ebcdic))
    assert m["fmt"] == fmt
    assert m["sample_interval_us"] == 4000
    assert m["text_header"].startswith("C 1 CLIENT X")
    assert len(m["traces"]) == 3
    hdr, s = m["traces"][1]
    assert hdr["cdp"] == 101 and hdr["inline"] == 9
    assert np.array_equal(s, traces[1][1])


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_segy(b"\x00" * 100)
    blob = build_segy("C 1", TRACES, "ieee")
    with pytest.raises(ValueError, match="truncated trace"):
        parse_segy(blob[:-10])
    bad = bytearray(blob)
    import struct
    struct.pack_into(">H", bad, 3224, 99)  # unknown format code
    with pytest.raises(ValueError, match="format code"):
        parse_segy(bytes(bad))
    with pytest.raises(ValueError, match="ragged"):
        build_segy("C 1", [({}, np.arange(4)), ({}, np.arange(5))])


def test_spark_query(spark):
    import __spark_entry__ as entry
    from tests.conftest import TESTDATA

    rows = entry.q_segy_traces(spark, TESTDATA).where(
        "doc_id IN (1, 2, 7)"
    ).collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(r)
    assert len(by[1]) == 2 and len(by[7]) == 4  # doc_id%4+1 traces
    r = sorted(by[2], key=lambda r: r.crossline)[1]
    assert r.fmt == "i16" and r.cdp == 21 and r.text_ok
    samples = (2 + 7 * 1 + np.arange(16)) % 32 - 16
    assert r.smin == samples.min() and r.smean == samples.mean()


def test_rev2_roundtrip():
    import numpy as np

    traces = [({"trace_seq": 1, "cdp": 7, "inline": 3, "crossline": 0},
               np.arange(8) - 4)]
    blob = build_segy(
        "C 1 REV2", traces, "f64", revision=(2, 0),
        ext_text_lines=["C 2 FIRST EXT", "C 2 SECOND EXT"],
        n_add_trace_headers=2,
    )
    m = parse_segy(blob)
    assert (m["rev_major"], m["rev_minor"]) == (2, 0)
    assert m["ext_text_headers"] == ["C 2 FIRST EXT", "C 2 SECOND EXT"]
    assert m["n_add_trace_headers"] == 2 and m["fmt"] == "f64"
    assert len(m["traces"]) == 1
    hdr, s = m["traces"][0]
    assert hdr["cdp"] == 7 and list(s) == list(range(-4, 4))


def test_rev2_formats_exact():
    import numpy as np

    vals = np.array([-32000, -1, 0, 1, 32000], float)
    for fmt in ("i32", "f64", "i64"):
        m = parse_segy(build_segy("C", [({}, vals)], fmt, revision=(2, 0)))
        assert list(m["traces"][0][1]) == list(vals), fmt


def test_rev1_ext_text_headers():
    import numpy as np

    blob = build_segy("C 1", [({}, np.zeros(4))], "i16",
                      ext_text_lines=["C 2 EXT"], ebcdic=False)
    m = parse_segy(blob)
    assert m["rev_major"] == 1 and m["ext_text_headers"] == ["C 2 EXT"]


def test_rev2_declared_count_mismatch_raises():
    import struct

    import numpy as np

    blob = bytearray(build_segy("C", [({}, np.zeros(4)), ({}, np.zeros(4))],
                                "i16", revision=(2, 0)))
    struct.pack_into(">Q", blob, 3200 + 312, 5)  # claim 5 traces
    with pytest.raises(ValueError, match="declared"):
        parse_segy(bytes(blob))


def test_variable_ext_headers_rejected():
    import struct

    import numpy as np

    blob = bytearray(build_segy("C", [({}, np.zeros(4))], "i16"))
    struct.pack_into(">h", blob, 3200 + 304, -1)
    with pytest.raises(ValueError, match="variable"):
        parse_segy(bytes(blob))
