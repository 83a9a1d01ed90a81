"""Office container tests (sources/office.py): DOCX/PPTX/ODT/EPUB
round-trips, kind sniffing, error surfaces, and the Spark operator."""

from __future__ import annotations

import zipfile

import pytest

from vtk_reserves_spark.sources.office import (
    OfficeError,
    parse_office,
    write_docx,
    write_epub,
    write_odt,
    write_pptx,
)

WRITERS = {
    "docx": write_docx,
    "pptx": write_pptx,
    "odt": write_odt,
    "epub": write_epub,
}

PARTS = [
    "Hello office world",
    "specials & <entities> 'quotes' \"double\"",
    "tab\there and\nnewline there",
    "unicode: naïve café — über résumé",
    "",
]


@pytest.mark.parametrize("kind", sorted(WRITERS))
@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_all_kinds(kind, compress):
    data = WRITERS[kind](PARTS, title="My Title", compress=compress)
    out = parse_office(data)
    assert out["kind"] == kind
    assert out["title"] == "My Title"
    assert out["parts"] == PARTS


@pytest.mark.parametrize("kind", sorted(WRITERS))
def test_kind_sniffed_without_extension(kind):
    """Kind comes from the member list, not a filename."""
    assert parse_office(WRITERS[kind](["x"]))["kind"] == kind


def test_title_optional():
    assert parse_office(write_docx(["x"]))["title"] is None or isinstance(
        parse_office(write_docx(["x"]))["title"], str
    )
    # explicit: our writers emit an empty dc:title when none given
    assert parse_office(write_epub(["x"]))["title"] in (None, "")


def test_ocf_mimetype_member_is_first_and_stored():
    """ODF/OCF packaging rule: the mimetype member must be the first
    entry and STORED so magic-sniffers can read it at a fixed offset."""
    for writer in (write_odt, write_epub):
        data = writer(["x"], compress=True)
        import io

        zf = zipfile.ZipFile(io.BytesIO(data))
        first = zf.infolist()[0]
        assert first.filename == "mimetype"
        assert first.compress_type == zipfile.ZIP_STORED


def test_not_a_zip_raises():
    with pytest.raises(OfficeError, match="not a zip"):
        parse_office(b"plain text payload")


def test_cfb_legacy_doc_raises_clear_error():
    with pytest.raises(OfficeError, match="CFB container"):
        parse_office(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)


def test_truncated_zip_raises():
    with pytest.raises(OfficeError):
        parse_office(write_docx(["hello"])[:50])


def test_unrecognized_zip_raises():
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "nope")
    with pytest.raises(OfficeError, match="not a recognized office"):
        parse_office(buf.getvalue())


def test_epub_malformed_chapter_falls_back_to_regex():
    """A chapter that is HTML-but-not-XML (unclosed tag) still mines
    via the regex fallback path."""
    data = write_epub(["good chapter"], title="T")
    import io

    src = zipfile.ZipFile(io.BytesIO(data))
    members = {n: src.read(n) for n in src.namelist()}
    members["OEBPS/chap1.xhtml"] = (
        b"<html><head><style>p{}</style></head>"
        b"<body><p>messy <b>html text</body></html>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, d in members.items():
            zf.writestr(n, d)
    out = parse_office(buf.getvalue())
    assert out["parts"] == ["messy html text"]


def test_pptx_multi_slide_order():
    """Slides come back in numeric order even when the zip lists
    slide10 before slide2 lexically."""
    data = write_pptx([f"slide {i}" for i in range(1, 12)])
    out = parse_office(data)
    assert out["parts"] == [f"slide {i}" for i in range(1, 12)]


def test_docx_tabs_and_breaks_expand():
    out = parse_office(write_docx(["a\tb\nc"]))
    assert out["parts"] == ["a\tb\nc"]


def test_office_text_operator(spark):
    """attach_office_payload -> office_text over a small frame: all
    four kinds round-trip, and on_error='null' quarantines garbage
    payloads instead of killing the task."""
    from pyspark.sql import functions as F

    from vtk_reserves_spark.operators.multimodal import (
        attach_office_payload,
        office_text,
    )

    df = spark.createDataFrame(
        [(i, f"body {i} & <tag>") for i in range(8)],
        "doc_id long, text string",
    )
    out = office_text(attach_office_payload(df)).orderBy("doc_id").collect()
    assert len(out) == 8
    kinds = ["docx", "epub", "pptx", "odt"]
    for r in out:
        assert r["text"] == f"Doc {r['doc_id']}\n\nbody {r['doc_id']} & <tag>"
        assert r["nparts"] == 2
        assert r["title"] == f"Doc {r['doc_id']}"
        assert r["kind"] == kinds[r["doc_id"] % 4]
        assert r["error"] is None

    good = attach_office_payload(df.limit(2))
    bad = spark.createDataFrame([(99,)], "doc_id long").select(
        "doc_id", F.lit(b"not an office file").alias("payload")
    )
    mixed = good.unionByName(bad)
    rows = {
        r["doc_id"]: r
        for r in office_text(mixed, on_error="null").collect()
    }
    assert rows[99]["text"] is None
    assert "OfficeError" in rows[99]["error"]
    assert rows[0]["error"] is None and rows[0]["nparts"] == 2

    with pytest.raises(Exception):
        office_text(bad, on_error="raise").collect()

    with pytest.raises(ValueError, match="on_error"):
        office_text(bad, on_error="bogus")
