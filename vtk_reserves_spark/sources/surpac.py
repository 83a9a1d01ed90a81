"""Surpac string files (.str) — the mining-survey polyline format.

Surpac "strings" are the pit-design / survey / geology polylines
every mine-planning shop exchanges; the text layout is publicly
documented and stable for decades: a two-line header (file name +
date, then an axis record), then point records
``id, Y, X, Z, d1, d2, ...`` (Y-before-X — the classic trap),
``0, 0.000, 0.000, 0.000,`` segment separators, and a
``0, 0.000, 0.000, 0.000, END`` terminator.  Reference parity note:
the reference reads Surpac-adjacent data only through its
proprietary-format seam; the open text format gets a real reader
here (same posture as `sources/gslib.py`).

Scale posture: one .str file is one task (binaryFile) — these are
KB–MB design files; the exploded point table then joins the spatial
operators (region flags, nearest-cell) like any other geometry.
"""

from __future__ import annotations

__all__ = ["parse_str", "write_str_text"]


def parse_str(text: str) -> list[dict]:
    """Parse Surpac .str text -> point dicts (string_id, segment,
    y, x, z, desc).  ``segment`` counts separator-delimited runs
    within each string id.  Raises ValueError on structural
    corruption (missing header, malformed records)."""
    lines = text.splitlines()
    if len(lines) < 2:
        raise ValueError("surpac: missing header lines")
    points = []
    segment: dict[int, int] = {}
    open_run: set[int] = set()
    for ln in lines[2:]:
        ln = ln.strip()
        if not ln:
            continue
        parts = [p.strip() for p in ln.split(",")]
        if len(parts) < 4:
            raise ValueError(f"surpac: malformed record {ln!r}")
        try:
            sid = int(float(parts[0]))
        except ValueError:
            raise ValueError(f"surpac: bad string id in {ln!r}") from None
        if sid == 0:
            if len(parts) >= 5 and parts[4].upper() == "END":
                break
            open_run.clear()  # segment separator
            continue
        try:
            y, x, z = (float(parts[i]) for i in (1, 2, 3))
        except ValueError:
            raise ValueError(f"surpac: bad coordinates in {ln!r}") from None
        if sid not in open_run:
            segment[sid] = segment.get(sid, -1) + 1
            open_run.add(sid)
        points.append({
            "string_id": sid,
            "segment": segment[sid],
            "y": y, "x": x, "z": z,
            "desc": ",".join(parts[4:]) if len(parts) > 4 else "",
        })
    return points


def write_str_text(points: list[dict], name: str = "strings") -> str:
    """Serialize point dicts to .str text (inverse of
    :func:`parse_str`); a separator record is emitted at every
    segment change within a string id."""
    out = [f"{name},19-Mar-24,0.000,0.000",
           "0, 0.000, 0.000, 0.000, 0.000, 0.000, 0.000"]
    prev: dict[int, int] = {}
    for p in points:
        sid = p["string_id"]
        if sid in prev and prev[sid] != p["segment"]:
            out.append("0, 0.000, 0.000, 0.000,")
        prev[sid] = p["segment"]
        desc = p.get("desc", "")
        out.append(
            f"{sid}, {p['y']!r}, {p['x']!r}, {p['z']!r}"
            + (f", {desc}" if desc else ", ")
        )
    out.append("0, 0.000, 0.000, 0.000, END")
    return "\n".join(out) + "\n"
