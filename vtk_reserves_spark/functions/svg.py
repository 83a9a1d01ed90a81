"""SVG analysis — pure Catalyst (JVM regex, zero Python).

SVG is the one image format that is TEXT, so at crawl scale it rides
the same whole-stage-codegen path as HTML extraction instead of the
binary-codec mapInPandas path: declared dimensions, viewBox
geometry, visible text and shape census all come out of regexps that
run at scan speed over 100 TB.  Reference parity note: the reference
repo has no vector-image surface; this complements the raster
decoders (`sources/image.py` etc.) for the multimodal brief.

Semantics notes (the parts a naive tag-stripper gets wrong):
* only text inside ``<text>``/``<tspan>`` elements is VISIBLE —
  titles/descs/defs are metadata, so :func:`svg_text` extracts
  ``<text>`` subtrees and then strips nested markup, rather than
  stripping all tags globally;
* ``width``/``height`` attributes may carry units (``px`` assumed,
  others surfaced as-is numerically) or be absent entirely, in which
  case the ``viewBox`` third/fourth numbers are the intrinsic size —
  :func:`svg_dims` resolves that fallback in one expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["svg_dims", "svg_text", "svg_shape_counts", "is_svg"]

_NUM = r"([0-9]+(?:\.[0-9]+)?)"


def is_svg(s: Column | str) -> Column:
    """True when the string payload is an SVG document (root
    ``<svg`` element, optionally after XML prolog / DOCTYPE /
    comments)."""
    s = F.col(s) if isinstance(s, str) else s
    return s.rlike(r"(?is)^\s*(?:<\?xml[^>]*\?>\s*|<!DOCTYPE[^>]*>\s*|<!--.*?-->\s*)*<svg[\s>]")


def svg_dims(s: Column | str) -> Column:
    """Struct of (width, height, viewbox_w, viewbox_h) as doubles.
    ``width``/``height`` come from the root element's attributes
    (numeric part; NULL when absent), falling back to the viewBox
    extent — the SVG intrinsic-size rule."""
    s = F.col(s) if isinstance(s, str) else s
    root = F.regexp_extract(s, r"(?is)<svg\b([^>]*)>", 1)
    w_attr = F.regexp_extract(root, r'(?i)\bwidth\s*=\s*"\s*' + _NUM, 1)
    h_attr = F.regexp_extract(root, r'(?i)\bheight\s*=\s*"\s*' + _NUM, 1)
    vb = F.regexp_extract(
        root,
        r'(?i)\bviewBox\s*=\s*"\s*' + _NUM + r"[,\s]+" + _NUM
        + r"[,\s]+" + _NUM + r"[,\s]+" + _NUM,
        0,
    )
    vb_w = F.regexp_extract(vb, r'"\s*' + _NUM + r"[,\s]+" + _NUM
                            + r"[,\s]+" + _NUM, 3)
    vb_h = F.regexp_extract(
        vb, r'"\s*' + _NUM + r"[,\s]+" + _NUM + r"[,\s]+" + _NUM
        + r"[,\s]+" + _NUM, 4,
    )
    to_d = lambda c: F.when(c != "", c.cast("double"))  # noqa: E731
    return F.struct(
        F.coalesce(to_d(w_attr), to_d(vb_w)).alias("width"),
        F.coalesce(to_d(h_attr), to_d(vb_h)).alias("height"),
        to_d(vb_w).alias("viewbox_w"),
        to_d(vb_h).alias("viewbox_h"),
    )


def svg_text(s: Column | str) -> Column:
    """Visible text: the concatenation of ``<text>`` element
    contents (nested markup like ``<tspan>`` stripped, entities
    decoded, whitespace collapsed).  Titles, descs and defs do not
    render, so they are excluded — contrast a global tag strip."""
    s = F.col(s) if isinstance(s, str) else s
    frags = F.regexp_extract_all(
        s, F.lit(r"(?is)<text\b[^>]*>(.*?)</text>"), F.lit(1)
    )
    joined = F.array_join(frags, " ")
    no_tags = F.regexp_replace(joined, r"(?s)<[^>]+>", " ")
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&lt;", "<"), "&gt;", ">"
        ),
        "&amp;", "&",
    )
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))


def svg_shape_counts(s: Column | str) -> Column:
    """Struct of shape-census counts (paths, rects, circles,
    ellipses, lines, polygons, images, uses) — the cheap
    complexity signal for vector-image curation (icon vs
    illustration vs chart)."""

    s = F.col(s) if isinstance(s, str) else s

    def count(tag: str) -> Column:
        return (
            F.size(F.split(s, r"(?i)<" + tag + r"[\s/>]")) - 1
        ).cast("int")

    return F.struct(
        count("path").alias("n_paths"),
        count("rect").alias("n_rects"),
        count("circle").alias("n_circles"),
        count("ellipse").alias("n_ellipses"),
        count("line").alias("n_lines"),
        count("polygon").alias("n_polygons"),
        count("image").alias("n_images"),
        count("use").alias("n_uses"),
    )
