"""Email/MIME edges: folded headers, RFC 2047 encoded-words (Q and
B, adjacent joining), transfer decodings, multipart part selection,
mbox framing."""
import pytest

from vtk_reserves_spark.sources.email import (
    build_email, parse_email, split_mbox,
)


def test_transfer_encodings():
    for enc, body in [
        ("7bit", "plain ascii"),
        ("quoted-printable", "Grüße = equals\nzwei"),
        ("base64", "Bäse64 body\nwith lines"),
    ]:
        m = parse_email(build_email("S", "a@x", "b@x", body, encoding=enc))
        assert m["text"] == body, enc


def test_rfc2047_subject_q_and_b():
    import base64

    raw = (
        b"Subject: =?utf-8?B?" + base64.b64encode("Grüße".encode())
        + b"?=\r\nFrom: =?utf-8?Q?J=C3=BCrgen?= <j@x>\r\n\r\nbody"
    )
    m = parse_email(raw)
    assert m["subject"] == "Grüße"
    assert m["from_"].startswith("Jürgen")


def test_adjacent_encoded_words_join():
    raw = (
        b"Subject: =?utf-8?Q?one?=\r\n =?utf-8?Q?two?=\r\n\r\nbody"
    )
    assert parse_email(raw)["subject"] == "onetwo"


def test_folded_headers():
    raw = (
        b"Subject: a long\r\n\tfolded value\r\nFrom: f@x\r\n\r\nbody"
    )
    m = parse_email(raw)
    assert m["subject"] == "a long folded value"


def test_multipart_prefers_text_plain():
    msg = build_email("S", "a@x", "b@x", "the plain text", multipart=True)
    m = parse_email(msg)
    assert m["content_type"] == "multipart/alternative"
    assert m["text"] == "the plain text"  # not the HTML twin


def test_multipart_html_fallback():
    b = "BB"
    raw = (
        f'Content-Type: multipart/alternative; boundary="{b}"\r\n'
        f"\r\n--{b}\r\nContent-Type: text/html\r\n\r\n<p>only html</p>\r\n"
        f"--{b}--\r\n"
    ).encode()
    assert parse_email(raw)["text"] == "<p>only html</p>"


def test_latin1_charset_body():
    raw = (
        b"Subject: s\r\nContent-Type: text/plain; charset=latin-1\r\n"
        b"\r\ncaf\xe9"
    )
    assert parse_email(raw)["text"] == "café"


def test_errors():
    with pytest.raises(ValueError):
        parse_email(b"no header block here")
    with pytest.raises(ValueError):
        split_mbox(b"not an mbox")
    raw = b'Content-Type: multipart/mixed\r\n\r\nbody'
    with pytest.raises(ValueError, match="boundary"):
        parse_email(raw)


def test_mbox_split_preserves_messages():
    msgs = [
        build_email(f"S{i}", "a@x", "b@x", f"body {i}") for i in range(3)
    ]
    mbox = b"".join(
        b"From a@x Mon Jan  1 00:00:00 2024\n" + m + b"\n" for m in msgs
    )
    got = [parse_email(m)["subject"] for m in split_mbox(mbox)]
    assert got == ["S0", "S1", "S2"]


def test_nested_multipart_descends():
    """multipart/alternative inside multipart/mixed: the nested
    text/plain wins over html and sibling attachments."""
    raw = (
        'Content-Type: multipart/mixed; boundary="OUT"\r\n\r\n'
        "--OUT\r\n"
        'Content-Type: multipart/alternative; boundary="IN"\r\n\r\n'
        "--IN\r\nContent-Type: text/html\r\n\r\n<p>html</p>\r\n"
        "--IN\r\nContent-Type: text/plain\r\n\r\nnested plain\r\n"
        "--IN--\r\n"
        "--OUT\r\nContent-Type: application/pdf\r\n\r\nPDF\r\n"
        "--OUT--\r\n"
    ).encode()
    assert parse_email(raw)["text"] == "nested plain"


def test_multipart_depth_bomb_rejected():
    # genuinely nested distinct boundaries, 12 levels deep
    inner = b"leaf"
    for i in range(12):
        b = f"B{i}".encode()
        inner = (
            b'Content-Type: multipart/mixed; boundary="' + b
            + b'"\r\n\r\n--' + b + b"\r\n" + inner
            + b"\r\n--" + b + b"--\r\n"
        )
    with pytest.raises(ValueError, match="nesting"):
        parse_email(inner)


def test_duplicate_header_continuation_not_folded():
    # a folded continuation of a DROPPED duplicate header must not
    # append to the first-seen value of that name
    raw = (
        b"Subject: first\r\n"
        b"Received: from a\r\n by b\r\n"
        b"Subject: second\r\n spill\r\n"
        b"From: f@x\r\n\r\nbody"
    )
    m = parse_email(raw)
    assert m["subject"] == "first"
    assert m["from_"] == "f@x"
