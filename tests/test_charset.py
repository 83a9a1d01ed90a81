"""Charset detection edges: BOM precedence (UTF-32 before UTF-16),
strict-UTF-8 authority, meta declaration aliases, latin-1 fallback,
replace-mode resilience."""
import codecs

import pytest

from vtk_reserves_spark.functions.charset import (
    decode_payload, detect_charset,
)


def test_boms_win():
    assert detect_charset(codecs.BOM_UTF8 + b"abc") == ("utf-8-sig", True)
    assert detect_charset(codecs.BOM_UTF16_LE + b"a\x00") == (
        "utf-16-le", True,
    )
    assert detect_charset(codecs.BOM_UTF16_BE + b"\x00a") == (
        "utf-16-be", True,
    )


def test_utf32_before_utf16():
    # UTF-32LE BOM starts with the UTF-16LE BOM bytes — order matters
    assert codecs.BOM_UTF32_LE[:2] == codecs.BOM_UTF16_LE
    payload = codecs.BOM_UTF32_LE + "x".encode("utf-32-le")
    assert detect_charset(payload) == ("utf-32-le", True)
    charset, bom, text = decode_payload(payload)
    assert (charset, bom, text) == ("utf-32-le", True, "x")


def test_strict_utf8_authoritative():
    assert detect_charset("größer ✓".encode()) == ("utf-8", False)
    # pure ASCII is valid UTF-8
    assert detect_charset(b"plain ascii") == ("utf-8", False)


def test_meta_declaration():
    for decl, codec in [
        ("windows-1252", "cp1252"), ("ISO-8859-1", "latin-1"),
        ("Shift_JIS", "shift_jis"), ("gb2312", "gbk"),
    ]:
        payload = f'<meta charset="{decl}">'.encode() + b"\xfe\xfe\xfe"
        assert detect_charset(payload) == (codec, False), decl


def test_http_equiv_form():
    payload = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1251">' + b"\xfe\xff"
    )
    assert detect_charset(payload) == ("cp1251", False)


def test_latin1_fallback():
    assert detect_charset(b"caf\xe9 au lait \xff") == ("latin-1", False)


def test_decode_round_trips():
    for text, enc in [
        ("Träger ✓", "utf-8"),
        ("Träger ✓", "utf-16-le"),
        ("Preis €", "cp1252"),
    ]:
        if enc == "utf-16-le":
            payload = codecs.BOM_UTF16_LE + text.encode(enc)
        elif enc == "cp1252":
            payload = f'<meta charset="windows-1252">{text}'.encode(enc)
            text = f'<meta charset="windows-1252">{text}'
        else:
            payload = text.encode(enc)
        charset, _bom, decoded = decode_payload(payload)
        assert decoded == text, (enc, charset, decoded)


def test_declared_charset_with_garbage_survives():
    # declaration says shift_jis but the tail is invalid: replace mode
    payload = b'<meta charset="shift_jis">ok \x81'
    charset, _b, text = decode_payload(payload)
    assert charset == "shift_jis" and text.startswith("<meta")


def test_spark_transcode(spark):
    from vtk_reserves_spark.functions.charset import (
        attach_charset_payload, transcode_to_utf8,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    rows = {
        r.doc_id: r
        for r in transcode_to_utf8(attach_charset_payload(docs)).collect()
    }
    assert rows[0].charset == "utf-8" and not rows[0].had_bom
    assert rows[1].charset == "utf-8-sig" and rows[1].had_bom
    assert rows[2].charset == "utf-16-le" and rows[2].text.startswith("Seite 2")
    assert rows[4].charset == "cp1252" and "€" in rows[4].text
    assert rows[5].charset == "latin-1" and rows[5].text == "Seite 5 äöüß"


def test_readability_floors_and_formula(spark):
    from vtk_reserves_spark.functions.text import readability

    df = spark.createDataFrame(
        [("Hello world. It works! Yes?",), ("",), ("no sentence marks",)],
        "text string",
    )
    rows = df.select(readability("text").alias("r")).collect()
    r0 = rows[0].r
    assert r0.n_sentences == 3 and r0.n_words == 5
    assert r0.n_syllables == 6  # he-llo(2) world(1) it(1) works(1) yes("ye" run = 1)
    expect = 206.835 - 1.015 * (5 / 3) - 84.6 * (6 / 5)
    assert abs(r0.flesch - expect) < 1e-9
    assert rows[1].r.n_sentences == 1 and rows[1].r.n_words == 1  # floors
    assert rows[2].r.n_sentences == 1
