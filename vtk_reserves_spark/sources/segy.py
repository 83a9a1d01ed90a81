"""SEG-Y seismic data — pure-stdlib reader/writer (rev 1 subset).

SEG-Y is the exchange format of reflection seismology — squarely in
the reference repo's geoscience domain (its mining workflows sit on
drillholes/meshes; seismic surveys are the sibling dataset every
exploration shop also holds).  The reference has no SEG-Y surface;
this adds it Spark-first for the same table-oriented consumption as
the LAS well-log reader (`sources/las.py`).

Implements the SEG-Y rev 1 layout: 3200-byte textual header
(EBCDIC cp500 auto-detected vs ASCII), 400-byte binary file header
(big-endian: sample interval, samples/trace, format code), then
240-byte trace headers + sample payloads.  Sample formats covered:
1 = IBM System/360 hex float (the classic — implemented exactly:
sign / base-16 exponent / 24-bit fraction), 5 = IEEE float32,
3 = int16, 8 = int8.

Scale posture: a SEG-Y FILE is the task grain (binaryFile); traces
decode in-task with numpy-vectorized sample conversion; a 100 TB
survey library parallelizes across files/shards like WARC.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_segy", "build_segy", "ibm32_to_float", "float_to_ibm32"]


def ibm32_to_float(raw: np.ndarray) -> np.ndarray:
    """Vectorized IBM System/360 32-bit hex float -> float64.
    Value = (-1)^sign x 0.fraction x 16^(exponent-64)."""
    raw = raw.astype(np.uint32)
    sign = np.where(raw >> 31, -1.0, 1.0)
    exponent = ((raw >> 24) & 0x7F).astype(np.int64) - 64
    fraction = (raw & 0x00FFFFFF).astype(np.float64) / float(1 << 24)
    return sign * fraction * np.power(16.0, exponent)


def float_to_ibm32(vals: np.ndarray) -> np.ndarray:
    """float64 -> IBM hex float bits (exact for values whose
    mantissa fits 24 bits — integers < 2^24 round-trip exactly)."""
    vals = np.asarray(vals, np.float64)
    out = np.zeros(vals.shape, np.uint32)
    nz = vals != 0
    v = vals[nz]
    sign = (v < 0).astype(np.uint32) << 31
    mag = np.abs(v)
    # choose e so that fraction = mag / 16^e is in [1/16, 1)
    e = np.ceil(np.log2(mag) / 4 + 1e-12).astype(np.int64)
    frac = mag / np.power(16.0, e)
    # fix boundary rounding
    hi = frac >= 1.0
    e = e + hi
    frac = np.where(hi, frac / 16.0, frac)
    lo = frac < 1.0 / 16
    e = e - lo
    frac = np.where(lo, frac * 16.0, frac)
    bits = sign | ((e + 64).astype(np.uint32) << 24) | (
        np.round(frac * (1 << 24)).astype(np.uint32) & 0x00FFFFFF
    )
    out[nz] = bits
    return out


_FORMATS = {1: ("ibm", 4), 5: ("ieee", 4), 3: ("i16", 2), 8: ("i8", 1)}
_CODES = {v[0]: k for k, v in _FORMATS.items()}


def parse_segy(data: bytes) -> dict:
    """Parse a SEG-Y byte string into ``text_header`` (decoded,
    first line), ``sample_interval_us``, ``samples_per_trace``,
    ``fmt`` ('ibm'|'ieee'|'i16'|'i8') and ``traces`` — a list of
    (header dict, numpy samples).  Trace header fields surfaced:
    ``trace_seq`` (bytes 1-4), ``cdp`` (21-24), ``inline`` (189-192),
    ``crossline`` (193-196).  Raises ValueError on structural
    corruption."""
    if len(data) < 3600:
        raise ValueError("segy: shorter than the two file headers")
    text_raw = data[:3200]
    # EBCDIC 'C' is 0xC3; ASCII files start with 'C' = 0x43
    if text_raw[0] == 0xC3:
        text = text_raw.decode("cp500", "replace")
    else:
        text = text_raw.decode("ascii", "replace")
    hdt, hns = struct.unpack_from(">HH", data, 3216)
    (fmt_code,) = struct.unpack_from(">H", data, 3224)
    if fmt_code not in _FORMATS:
        raise ValueError(f"segy: unsupported format code {fmt_code}")
    fmt, width = _FORMATS[fmt_code]
    traces = []
    pos = 3600
    trace_bytes = 240 + hns * width
    while pos < len(data):
        if pos + trace_bytes > len(data):
            raise ValueError("segy: truncated trace")
        th = data[pos : pos + 240]
        hdr = {
            "trace_seq": struct.unpack_from(">i", th, 0)[0],
            "cdp": struct.unpack_from(">i", th, 20)[0],
            "inline": struct.unpack_from(">i", th, 188)[0],
            "crossline": struct.unpack_from(">i", th, 192)[0],
        }
        raw = data[pos + 240 : pos + trace_bytes]
        if fmt == "ibm":
            samples = ibm32_to_float(
                np.frombuffer(raw, ">u4").astype(np.uint32)
            )
        elif fmt == "ieee":
            samples = np.frombuffer(raw, ">f4").astype(np.float64)
        elif fmt == "i16":
            samples = np.frombuffer(raw, ">i2").astype(np.float64)
        else:
            samples = np.frombuffer(raw, "i1").astype(np.float64)
        traces.append((hdr, samples))
        pos += trace_bytes
    return {
        "text_header": text.split("\n")[0][:80].rstrip(),
        "sample_interval_us": hdt,
        "samples_per_trace": hns,
        "fmt": fmt,
        "traces": traces,
    }


def build_segy(
    text_line: str,
    traces: list[tuple[dict, "np.ndarray"]],
    fmt: str = "ieee",
    sample_interval_us: int = 2000,
    ebcdic: bool = True,
) -> bytes:
    """Build a valid SEG-Y byte string (inverse of
    :func:`parse_segy`).  All traces must share one sample count;
    ``fmt`` picks the sample encoding; ``ebcdic`` writes the textual
    header in cp500 (the classic) vs ASCII."""
    hns = len(traces[0][1]) if traces else 0
    text = (text_line[:80].ljust(80) + " " * 3120)[:3200]
    thead = text.encode("cp500" if ebcdic else "ascii")
    bhead = bytearray(400)
    struct.pack_into(">HH", bhead, 16, sample_interval_us, hns)
    struct.pack_into(">H", bhead, 24, _CODES[fmt])
    out = bytearray(thead + bhead)
    for hdr, samples in traces:
        samples = np.asarray(samples, np.float64)
        if len(samples) != hns:
            raise ValueError("segy builder: ragged trace lengths")
        th = bytearray(240)
        struct.pack_into(">i", th, 0, hdr.get("trace_seq", 0))
        struct.pack_into(">i", th, 20, hdr.get("cdp", 0))
        struct.pack_into(">i", th, 188, hdr.get("inline", 0))
        struct.pack_into(">i", th, 192, hdr.get("crossline", 0))
        out += th
        if fmt == "ibm":
            out += float_to_ibm32(samples).astype(">u4").tobytes()
        elif fmt == "ieee":
            out += samples.astype(">f4").tobytes()
        elif fmt == "i16":
            out += samples.astype(">i2").tobytes()
        elif fmt == "i8":
            out += samples.astype("i1").tobytes()
        else:
            raise ValueError(f"segy builder: format {fmt!r}")
    return bytes(out)
