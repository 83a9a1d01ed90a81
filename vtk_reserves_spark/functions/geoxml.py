"""KML / GPX extraction — pure Catalyst (JVM regex, zero Python).

The geo-XML pair every mapping crawl carries: KML placemarks
(Google-Earth exports, the interchange format mining/exploration
teams actually mail around — reference-domain adjacent to the
shapefile/DXF/GeoTIFF readers in `sources/`) and GPX tracks (GPS
loggers).  Both are regexp-reachable without a DOM: coordinates are
text triples inside well-known elements, so extraction rides
whole-stage codegen at scan speed, the `functions/svg.py` posture.

Outputs are arrays of typed structs — ``explode`` them into the
spatial operators (`operators/spatial.py` point-in-solid flags,
`sources/grid.py` nearest-cell joins) to put crawl geodata through
the same pipeline as mine-model tables.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["kml_placemarks", "gpx_trackpoints"]


def _c(s: Column | str) -> Column:
    return F.col(s) if isinstance(s, str) else s


_F = r"(-?[0-9]+(?:\.[0-9]+)?)"


def kml_placemarks(xml: Column | str) -> Column:
    """Array of (name, lon, lat, alt) structs from KML
    ``<Placemark>`` elements.  KML coordinate order is
    LON,LAT[,ALT] (the spec's most-misread rule — kept verbatim
    here and documented); missing altitude yields NULL; unnamed
    placemarks yield NULL names."""
    x = _c(xml)
    marks = F.regexp_extract_all(
        x, F.lit(r"(?is)<Placemark\b[^>]*>(.*?)</Placemark>"), F.lit(1)
    )

    def field(m: Column, pat: str, idx: int) -> Column:
        v = F.regexp_extract(m, pat, idx)
        return F.when(v != "", v)

    def build(m: Column) -> Column:
        coords = F.regexp_extract(
            m,
            r"(?is)<coordinates>\s*" + _F + "," + _F
            + r"(?:," + _F + r")?",
            0,
        )
        lon = field(coords, r">\s*" + _F, 1)
        lat = F.when(
            F.regexp_extract(m, r"(?is)<coordinates>\s*" + _F + ","
                             + _F, 2) != "",
            F.regexp_extract(m, r"(?is)<coordinates>\s*" + _F + ","
                             + _F, 2),
        )
        alt = F.when(
            F.regexp_extract(
                m, r"(?is)<coordinates>\s*" + _F + "," + _F + ","
                + _F, 3,
            ) != "",
            F.regexp_extract(
                m, r"(?is)<coordinates>\s*" + _F + "," + _F + ","
                + _F, 3,
            ),
        )
        return F.struct(
            field(m, r"(?is)<name>\s*(.*?)\s*</name>", 1).alias("name"),
            lon.cast("double").alias("lon"),
            lat.cast("double").alias("lat"),
            alt.cast("double").alias("alt"),
        )

    return F.transform(marks, build)


def gpx_trackpoints(xml: Column | str) -> Column:
    """Array of (lat, lon, ele, time) structs from GPX ``<trkpt>``
    elements (attribute order tolerant; ele/time children
    optional)."""
    x = _c(xml)
    pts = F.regexp_extract_all(
        x,
        F.lit(r"(?is)(<trkpt\b[^>]*>.*?</trkpt>|<trkpt\b[^>]*/>)"),
        F.lit(1),
    )

    def attr(p: Column, name: str) -> Column:
        v = F.regexp_extract(
            p, r'(?is)\b' + name + r'\s*=\s*["\']' + _F + r'["\']', 1
        )
        return F.when(v != "", v).cast("double")

    def child(p: Column, tag: str) -> Column:
        v = F.regexp_extract(
            p, r"(?is)<" + tag + r">\s*(.*?)\s*</" + tag + ">", 1
        )
        return F.when(v != "", v)

    return F.transform(
        pts,
        lambda p: F.struct(
            attr(p, "lat").alias("lat"),
            attr(p, "lon").alias("lon"),
            child(p, "ele").cast("double").alias("ele"),
            child(p, "time").alias("time"),
        ),
    )
