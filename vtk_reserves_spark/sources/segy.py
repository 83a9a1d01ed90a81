"""SEG-Y seismic data — pure-stdlib reader/writer (rev 1 + rev 2).

SEG-Y is the exchange format of reflection seismology — squarely in
the reference repo's geoscience domain (its mining workflows sit on
drillholes/meshes; seismic surveys are the sibling dataset every
exploration shop also holds).  The reference has no SEG-Y surface;
this adds it Spark-first for the same table-oriented consumption as
the LAS well-log reader (`sources/las.py`).

Implements the SEG-Y rev 1 layout: 3200-byte textual header
(EBCDIC cp500 auto-detected vs ASCII), 400-byte binary file header
(big-endian: sample interval, samples/trace, format code), then
240-byte trace headers + sample payloads — plus the rev-2.0
extensions real modern surveys ship with:

* major/minor revision bytes (3501/3502; the rev-1 two-byte 0x0100
  reads identically as major=1 minor=0);
* N x 3200-byte Extended Textual File Header records (count at
  3505-3506; traces then start at 3600 + 3200N);
* additional 240-byte trace header blocks per trace (count at
  3507-3510), skipped per the spec's fixed-extension rule;
* the 64-bit trace count (3513-3520) and explicit first-trace byte
  offset (3521-3528), honored when nonzero;
* the rev-2 sample formats 2 = int32, 6 = IEEE float64 and
  9 = int64 alongside the classics (1 = IBM System/360 hex float —
  implemented exactly: sign / base-16 exponent / 24-bit fraction —
  5 = IEEE float32, 3 = int16, 8 = int8).

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


_FORMATS = {
    1: ("ibm", 4), 2: ("i32", 4), 3: ("i16", 2), 5: ("ieee", 4),
    6: ("f64", 8), 8: ("i8", 1), 9: ("i64", 8),
}
_CODES = {v[0]: k for k, v in _FORMATS.items()}
_NP_DTYPES = {
    "i32": ">i4", "i16": ">i2", "ieee": ">f4", "f64": ">f8",
    "i8": "i1", "i64": ">i8",
}


def _decode_text_record(raw: bytes) -> str:
    # EBCDIC 'C' is 0xC3; ASCII records start with 'C' = 0x43
    if raw[0] == 0xC3:
        return raw.decode("cp500", "replace")
    return raw.decode("ascii", "replace")


def parse_segy(data: bytes) -> dict:
    """Parse a SEG-Y byte string into ``text_header`` (decoded,
    first line), ``sample_interval_us``, ``samples_per_trace``,
    ``fmt`` ('ibm'|'i32'|'i16'|'ieee'|'f64'|'i8'|'i64'),
    ``rev_major``/``rev_minor``, ``ext_text_headers`` (list of
    decoded first lines of the rev-1/2 extended textual records),
    ``n_add_trace_headers`` and ``traces`` — a list of (header dict,
    numpy samples).  Trace header fields surfaced: ``trace_seq``
    (bytes 1-4), ``cdp`` (21-24), ``inline`` (189-192),
    ``crossline`` (193-196); rev-2 additional 240-byte trace header
    blocks are skipped per the fixed-extension rule.  Raises
    ValueError on structural corruption."""
    if len(data) < 3600:
        raise ValueError("segy: shorter than the two file headers")
    text = _decode_text_record(data[:3200])
    hdt, hns = struct.unpack_from(">HH", data, 3216)
    (fmt_code,) = struct.unpack_from(">H", data, 3224)
    if fmt_code not in _FORMATS:
        raise ValueError(f"segy: unsupported format code {fmt_code}")
    fmt, width = _FORMATS[fmt_code]
    # rev-2 header extension block (reads back-compatibly on rev-1
    # files: two-byte 0x0100 at 3501-3502 is major=1, minor=0)
    rev_major = data[3200 + 300]
    rev_minor = data[3200 + 301]
    (n_ext_text,) = struct.unpack_from(">h", data, 3200 + 304)
    if n_ext_text < 0:
        raise ValueError(
            "segy: variable extended textual headers (-1) not supported"
        )
    n_add = 0
    n_traces_decl = 0
    first_trace_off = 0
    if rev_major >= 2:
        (n_add,) = struct.unpack_from(">I", data, 3200 + 306)
        (n_traces_decl,) = struct.unpack_from(">Q", data, 3200 + 312)
        (first_trace_off,) = struct.unpack_from(">Q", data, 3200 + 320)
    ext_headers = []
    pos = 3600
    for _ in range(n_ext_text):
        if pos + 3200 > len(data):
            raise ValueError("segy: truncated extended textual header")
        ext_headers.append(
            _decode_text_record(data[pos : pos + 3200])
            .split("\n")[0][:80].rstrip()
        )
        pos += 3200
    if first_trace_off:
        if first_trace_off < pos or first_trace_off > len(data):
            raise ValueError("segy: bad first-trace byte offset")
        pos = first_trace_off
    traces = []
    trace_bytes = 240 * (1 + n_add) + hns * width
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
        raw = data[pos + 240 * (1 + n_add) : pos + trace_bytes]
        if fmt == "ibm":
            samples = ibm32_to_float(
                np.frombuffer(raw, ">u4").astype(np.uint32)
            )
        else:
            samples = np.frombuffer(raw, _NP_DTYPES[fmt]).astype(np.float64)
        traces.append((hdr, samples))
        pos += trace_bytes
        if n_traces_decl and len(traces) == n_traces_decl:
            break
    if n_traces_decl and len(traces) != n_traces_decl:
        raise ValueError(
            f"segy: declared {n_traces_decl} traces, found {len(traces)}"
        )
    return {
        "text_header": text.split("\n")[0][:80].rstrip(),
        "sample_interval_us": hdt,
        "samples_per_trace": hns,
        "fmt": fmt,
        "rev_major": int(rev_major),
        "rev_minor": int(rev_minor),
        "ext_text_headers": ext_headers,
        "n_add_trace_headers": int(n_add),
        "traces": traces,
    }


def build_segy(
    text_line: str,
    traces: list[tuple[dict, "np.ndarray"]],
    fmt: str = "ieee",
    sample_interval_us: int = 2000,
    ebcdic: bool = True,
    revision: tuple[int, int] = (1, 0),
    ext_text_lines: list[str] | None = None,
    n_add_trace_headers: int = 0,
) -> bytes:
    """Build a valid SEG-Y byte string (inverse of
    :func:`parse_segy`).  All traces must share one sample count;
    ``fmt`` picks the sample encoding; ``ebcdic`` writes the textual
    header in cp500 (the classic) vs ASCII.  ``revision=(2, 0)``
    emits the rev-2 binary-header fields (declared trace count and
    explicit first-trace offset); ``ext_text_lines`` become
    3200-byte Extended Textual File Header records and
    ``n_add_trace_headers`` zeroed additional 240-byte trace header
    blocks follow each primary trace header."""
    if fmt not in _CODES:
        raise ValueError(f"segy builder: format {fmt!r}")
    ext_text_lines = ext_text_lines or []
    if (ext_text_lines or n_add_trace_headers) and revision < (1, 0):
        raise ValueError("segy builder: extensions need rev >= 1")
    if n_add_trace_headers and revision < (2, 0):
        raise ValueError("segy builder: additional trace headers are rev 2")
    hns = len(traces[0][1]) if traces else 0

    def record(line: str) -> bytes:
        txt = (line[:80].ljust(80) + " " * 3120)[:3200]
        return txt.encode("cp500" if ebcdic else "ascii")

    bhead = bytearray(400)
    struct.pack_into(">HH", bhead, 16, sample_interval_us, hns)
    struct.pack_into(">H", bhead, 24, _CODES[fmt])
    bhead[300] = revision[0]
    bhead[301] = revision[1]
    struct.pack_into(">h", bhead, 304, len(ext_text_lines))
    first_trace = 3600 + 3200 * len(ext_text_lines)
    if revision >= (2, 0):
        struct.pack_into(">I", bhead, 306, n_add_trace_headers)
        struct.pack_into(">Q", bhead, 312, len(traces))
        struct.pack_into(">Q", bhead, 320, first_trace)
    out = bytearray(record(text_line) + bhead)
    for line in ext_text_lines:
        out += record(line)
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
        out += bytes(240 * n_add_trace_headers)
        if fmt == "ibm":
            out += float_to_ibm32(samples).astype(">u4").tobytes()
        else:
            out += samples.astype(_NP_DTYPES[fmt]).tobytes()
    return bytes(out)
