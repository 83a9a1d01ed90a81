"""PDF parser/writer tests (sources/pdf.py): both xref layouts,
filters, encodings, damaged-file recovery."""

from __future__ import annotations

import re
import zlib

import pytest

from vtk_reserves_spark.sources.pdf import (
    PdfError,
    extract_pdf_text,
    parse_pdf,
    write_pdf,
)


@pytest.mark.parametrize("modern", [False, True])
@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_layouts(modern, compress):
    pages = [
        "Hello PDF world\nSecond line with (parens) and \\ backslash",
        "Page two: naïve café — über résumé",
        "",
    ]
    data = write_pdf(
        pages, title="Test Doc", author="A. Writer",
        compress=compress, modern=modern,
    )
    out = parse_pdf(data)
    assert out["npages"] == 3
    assert out["title"] == "Test Doc"
    assert out["author"] == "A. Writer"
    assert out["pages"] == pages


def test_extract_joins_pages():
    assert extract_pdf_text(write_pdf(["a", "b"])) == "a\n\nb"


def test_incremental_update_wins():
    """An appended update section (new page object + xref with /Prev)
    must shadow the original object — later xref sections win."""
    base = write_pdf(["original text"])
    # find the content stream object number and the old startxref
    m = re.search(rb"/Contents (\d+) 0 R", base)
    cnum = int(m.group(1))
    old_xref = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    new_stream = b"BT /F1 12 Tf 72 720 Td (updated text) Tj ET"
    upd = bytearray(base)
    obj_off = len(upd)
    upd += b"%d 0 obj\n<< /Length %d >>\nstream\n" % (cnum, len(new_stream))
    upd += new_stream + b"\nendstream\nendobj\n"
    xref_off = len(upd)
    upd += b"xref\n0 1\n0000000000 65535 f \n"
    upd += b"%d 1\n%010d 00000 n \n" % (cnum, obj_off)
    upd += b"trailer\n<< /Size %d /Prev %d /Root 2 0 R >>\n" % (
        cnum + 1, old_xref,
    )
    upd += b"startxref\n%d\n%%%%EOF\n" % xref_off
    out = parse_pdf(bytes(upd))
    assert out["pages"] == ["updated text"]


def _minimal_pdf(content: bytes, extra_objs: bytes = b"",
                 font_extra: bytes = b"") -> bytes:
    """Single-page PDF with a hand-supplied content stream (already
    including any /Filter in ``extra_objs``-declared dict)."""
    out = bytearray(b"%PDF-1.4\n")
    offs = {}

    def add(num, body):
        offs[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    offs[4] = len(out)
    out.extend(b"4 0 obj\n" + content + b"\nendobj\n")
    add(
        5,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        + font_extra
        + b" >>",
    )
    if extra_objs:
        # caller-supplied objects 6+ with their own headers; record
        # offsets by scanning
        for m in re.finditer(rb"(\d+) 0 obj", extra_objs):
            offs[int(m.group(1))] = len(out) + m.start()
        out.extend(extra_objs)
    xref_off = len(out)
    maxnum = max(offs)
    out.extend(b"xref\n0 %d\n0000000000 65535 f \n" % (maxnum + 1))
    for n in range(1, maxnum + 1):
        out.extend(b"%010d 00000 n \n" % offs.get(n, 0))
    out.extend(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (maxnum + 1, xref_off)
    )
    return bytes(out)


def test_filter_chain_asciihex_and_ascii85_and_rle():
    text = b"BT /F1 12 Tf 72 720 Td (filtered) Tj ET"
    hx = text.hex().encode() + b">"
    data = _minimal_pdf(
        b"<< /Length %d /Filter /ASCIIHexDecode >>\nstream\n" % len(hx)
        + hx + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["filtered"]

    import base64

    a85 = base64.a85encode(text) + b"~>"
    data = _minimal_pdf(
        b"<< /Length %d /Filter /ASCII85Decode >>\nstream\n" % len(a85)
        + a85 + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["filtered"]

    # RunLength: literal run then a repeat run inside the text
    rle = bytes([len(text) - 1]) + text + b"\x80"
    data = _minimal_pdf(
        b"<< /Length %d /Filter /RunLengthDecode >>\nstream\n" % len(rle)
        + rle + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["filtered"]


def test_filter_lzw():
    from vtk_reserves_spark.sources.geotiff import _tiff_lzw_encode

    text = b"BT /F1 12 Tf 72 720 Td (lzw text) Tj ET"
    lz = _tiff_lzw_encode(text)
    data = _minimal_pdf(
        b"<< /Length %d /Filter /LZWDecode >>\nstream\n" % len(lz)
        + lz + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["lzw text"]


def test_filter_chain_flate_then_asciihex():
    text = b"BT /F1 12 Tf 72 720 Td (chained) Tj ET"
    body = zlib.compress(text).hex().encode() + b">"
    data = _minimal_pdf(
        b"<< /Length %d /Filter [/ASCIIHexDecode /FlateDecode] >>\n"
        b"stream\n" % len(body) + body + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["chained"]


def test_tj_kerning_becomes_space():
    content = (
        b"BT /F1 12 Tf 72 720 Td [(Hel) -50 (lo) -250 (world)] TJ ET"
    )
    data = _minimal_pdf(
        b"<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream"
    )
    # -50 is glyph kerning (joined); -250 is an omitted space
    assert parse_pdf(data)["pages"] == ["Hello world"]


def test_tounicode_cmap_two_byte():
    """Type0 font whose 2-byte codes map through a ToUnicode CMap
    (bfchar + bfrange) — the composite-font path real PDFs use for
    anything beyond Latin-1."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0001> <0048>\n<0002> <0069>\nendbfchar\n"
        b"1 beginbfrange\n<0010> <0012> <4E2D>\nendbfrange\n"
        b"endcmap\nend\n"
    )
    extra = (
        b"6 0 obj\n<< /Length %d >>\nstream\n" % len(cmap)
        + cmap + b"\nendstream\nendobj\n"
    )
    # codes: 0001 0002 -> "Hi"; 0010 0011 0012 -> U+4E2D..4E2F
    content = b"BT /F1 12 Tf 72 720 Td <00010002> Tj <001000110012> Tj ET"
    data = _minimal_pdf(
        b"<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream",
        extra_objs=extra,
        font_extra=b" /Subtype /Type0 /ToUnicode 6 0 R",
    )
    # _minimal_pdf writes /Subtype twice (Type1 then Type0); the
    # parser's dict keeps the LAST occurrence per PDF dict semantics
    assert parse_pdf(data)["pages"] == ["Hi中丮丯"]


def test_encoding_differences():
    content = b"BT /F1 12 Tf 72 720 Td (\x41\x80\x42) Tj ET"
    data = _minimal_pdf(
        b"<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream",
        font_extra=(
            b" /Encoding << /BaseEncoding /WinAnsiEncoding"
            b" /Differences [128 /bullet] >>"
        ),
    )
    assert parse_pdf(data)["pages"] == ["A•B"]


def test_winansi_encoding_name():
    # 0x93/0x94 are curly quotes in cp1252
    content = b"BT /F1 12 Tf 72 720 Td (\x93hi\x94) Tj ET"
    data = _minimal_pdf(
        b"<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream",
        font_extra=b" /Encoding /WinAnsiEncoding",
    )
    assert parse_pdf(data)["pages"] == ["“hi”"]


def test_broken_startxref_brute_scan():
    data = bytearray(write_pdf(["recovered text"]))
    # corrupt the startxref offset
    data = bytes(data).replace(
        b"startxref\n", b"startxref\n999999999 ", 1
    )
    out = parse_pdf(data)
    assert out["pages"] == ["recovered text"]


def test_bad_length_falls_back_to_endstream_scan():
    text = b"BT /F1 12 Tf 72 720 Td (scan me) Tj ET"
    data = _minimal_pdf(
        b"<< /Length 999999 >>\nstream\n" + text + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["scan me"]


def test_literal_string_escapes():
    content = (
        b"BT /F1 12 Tf 72 720 Td (oct \\101 nl\\n nested (p) done) Tj ET"
    )
    data = _minimal_pdf(
        b"<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["oct A nl\n nested (p) done"]


def test_rejects_non_pdf_and_encrypted():
    with pytest.raises(PdfError, match="%PDF-"):
        parse_pdf(b"GIF89a not a pdf")
    enc = write_pdf(["secret"]).replace(
        b"/Root", b"/Encrypt 9 0 R /Root", 1
    )
    with pytest.raises(PdfError, match="encrypted"):
        parse_pdf(enc)


def test_modern_layout_is_really_modern():
    data = write_pdf(["x"], modern=True)
    assert b"/Type /ObjStm" in data
    assert b"/Type /XRef" in data
    assert b"\ntrailer" not in data
    data_classic = write_pdf(["x"], modern=False)
    assert b"trailer" in data_classic
    assert b"/ObjStm" not in data_classic


def test_pdf_text_operator(spark):
    """attach_pdf_payload -> pdf_text over a small frame: all four
    layout mixes round-trip, and on_error='null' quarantines garbage
    payloads instead of killing the task."""
    from pyspark.sql import functions as F

    from vtk_reserves_spark.operators.multimodal import (
        attach_pdf_payload,
        pdf_text,
    )

    df = spark.createDataFrame(
        [(i, f"body {i}\nline two") for i in range(6)],
        "doc_id long, text string",
    )
    out = pdf_text(attach_pdf_payload(df)).orderBy("doc_id").collect()
    assert len(out) == 6
    for r in out:
        assert r["text"] == f"Doc {r['doc_id']}\n\nbody {r['doc_id']}\nline two"
        assert r["npages"] == 2
        assert r["title"] == f"Doc {r['doc_id']}"
        assert r["error"] is None

    # quarantine: one corrupt payload among good ones
    good = attach_pdf_payload(df.limit(2))
    bad = spark.createDataFrame(
        [(99,)], "doc_id long"
    ).select("doc_id", F.lit(b"not a pdf at all").alias("payload"))
    mixed = good.unionByName(bad)
    rows = {r["doc_id"]: r for r in pdf_text(mixed, on_error="null").collect()}
    assert rows[99]["text"] is None
    assert "PdfError" in rows[99]["error"]
    assert rows[0]["error"] is None and rows[0]["npages"] == 2

    import pytest as _pytest

    with _pytest.raises(Exception):
        pdf_text(bad, on_error="raise").collect()


def test_multiline_text_layout_ops():
    # ' operator and Td-driven newlines
    content = (
        b"BT /F1 12 Tf 14 TL 72 720 Td (line one) Tj"
        b" (line two) ' 0 -14 Td (line three) Tj ET"
    )
    data = _minimal_pdf(
        b"<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream"
    )
    assert parse_pdf(data)["pages"] == ["line one\nline two\nline three"]
