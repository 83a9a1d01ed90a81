"""Email / MIME parsing — RFC 5322 headers, MIME multipart walking,
quoted-printable + base64 transfer decoding, mbox splitting.
Pure stdlib (no ``email`` package — the byte-level control matters
for crawl-grade resilience, and the subset is small).

Mail archives (mailing lists, support dumps, Enron-style corpora)
are a first-class LLM text source; extraction needs the same
header/payload discipline as WARC: headers parsed with folding
(continuation lines), the body routed by Content-Transfer-Encoding
(7bit/8bit, quoted-printable, base64) and Content-Type (text/plain
preferred out of multipart/alternative), charset-decoded through
the same alias table as `functions/charset.py`.  RFC 2047
encoded-words (``=?utf-8?Q?...?=``) in Subject/From are decoded —
the part naive extractors skip.

Scale posture: an mbox FILE is the task grain (binaryFile);
messages split on the ``From_`` envelope lines inside the task and
parse per-message — same shape as WARC records in a shard.
"""

from __future__ import annotations

import base64
import binascii
import quopri
import re

__all__ = ["parse_email", "build_email", "split_mbox"]

_ENCODED_WORD = re.compile(
    r"=\?([^?]+)\?([QqBb])\?([^?]*)\?="
)


def _decode_word(m: re.Match) -> str:
    charset, enc, payload = m.group(1).lower(), m.group(2), m.group(3)
    try:
        if enc in "Qq":
            raw = quopri.decodestring(
                payload.replace("_", " ").encode(), header=False
            )
        else:
            raw = base64.b64decode(payload + "=" * (-len(payload) % 4))
        return raw.decode(charset, "replace")
    except (binascii.Error, LookupError, ValueError):
        return m.group(0)


def _decode_header(value: str) -> str:
    # adjacent encoded words join without the whitespace between them
    value = re.sub(
        r"(\?=)\s+(=\?)", r"\1\2", value
    )
    return _ENCODED_WORD.sub(_decode_word, value)


def _parse_headers(data: bytes) -> tuple[dict, int]:
    """Parse folded headers; returns ({lower-name: decoded}, body_off)."""
    headers: dict[str, str] = {}
    pos = 0
    name = None
    while pos < len(data):
        eol = data.find(b"\n", pos)
        if eol < 0:
            eol = len(data)
        line = data[pos:eol].rstrip(b"\r")
        nxt = eol + 1
        if not line:
            return headers, nxt
        if line[:1] in (b" ", b"\t"):
            # a continuation of a dropped duplicate header (name is
            # None) is skipped, not folded into the first-seen value
            if name:
                headers[name] += " " + line.strip().decode("latin-1")
        elif b":" in line:
            raw_name, _, val = line.partition(b":")
            lname = raw_name.strip().decode("latin-1").lower()
            if lname not in headers:
                headers[lname] = val.strip().decode("latin-1")
                name = lname
            else:
                name = None  # duplicate: first-seen wins
        pos = nxt
    return headers, pos


def _decode_body(body: bytes, cte: str, charset: str) -> str:
    cte = cte.lower().strip()
    if cte == "base64":
        body = base64.b64decode(
            re.sub(rb"\s+", b"", body) + b"=" * 3, validate=False
        )
    elif cte == "quoted-printable":
        body = quopri.decodestring(body)
    return body.decode(charset or "utf-8", "replace")


_CT_RE = re.compile(r"([\w/.+-]+)")
_PARAM_RE = re.compile(r'(\w+)\s*=\s*"?([^";]+)"?')


def _walk_multipart(
    params: dict, body: bytes, depth: int
) -> tuple[str | None, str | None]:
    """Recursive multipart walk -> (first text/plain, first other
    decoded part).  Nested multiparts (mixed inside alternative and
    vice versa) descend to a bounded depth — the structure real
    mailers emit."""
    if depth > 8:
        raise ValueError("email: multipart nesting too deep")
    boundary = params.get("boundary")
    if not boundary:
        raise ValueError("email: multipart without boundary")
    delim = b"--" + boundary.encode()
    parts = body.split(delim)[1:-1] if delim in body else []
    text = None
    fallback = None
    for part in parts:
        part = part.lstrip(b"\r\n")
        ph, poff = _parse_headers(part)
        pct = ph.get("content-type", "text/plain")
        pm = _CT_RE.match(pct)
        ptype = pm.group(1).lower() if pm else "text/plain"
        pparams = dict(_PARAM_RE.findall(pct))
        if ptype.startswith("multipart/"):
            t, f = _walk_multipart(pparams, part[poff:], depth + 1)
            if t is not None and text is None:
                text = t
            elif f is not None and fallback is None:
                fallback = f
            continue
        decoded = _decode_body(
            part[poff:].rstrip(b"\r\n"),
            ph.get("content-transfer-encoding", "7bit"),
            pparams.get("charset", "utf-8").lower(),
        )
        if ptype == "text/plain" and text is None:
            text = decoded
        elif fallback is None:
            fallback = decoded
    return text, fallback


def parse_email(data: bytes) -> dict:
    """Parse one RFC 5322 message: decoded ``subject`` / ``from_``
    / ``to`` / ``date`` headers, ``content_type``, and ``text`` —
    the transfer-decoded, charset-decoded body (first ``text/plain``
    part of a multipart; the whole body otherwise).  Raises
    ValueError when no header block exists."""
    headers, body_off = _parse_headers(data)
    if not headers:
        raise ValueError("email: no headers")
    ct_raw = headers.get("content-type", "text/plain")
    m = _CT_RE.match(ct_raw)
    ctype = m.group(1).lower() if m else "text/plain"
    params = dict(_PARAM_RE.findall(ct_raw))
    charset = params.get("charset", "utf-8").lower()
    body = data[body_off:]
    if ctype.startswith("multipart/"):
        text, fallback = _walk_multipart(params, body, depth=0)
        out_text = text if text is not None else (fallback or "")
    else:
        out_text = _decode_body(
            body.rstrip(b"\r\n"),
            headers.get("content-transfer-encoding", "7bit"),
            charset,
        )
    return {
        "subject": _decode_header(headers.get("subject", "")),
        "from_": _decode_header(headers.get("from", "")),
        "to": _decode_header(headers.get("to", "")),
        "date": headers.get("date", ""),
        "content_type": ctype,
        "text": out_text,
    }


def build_email(
    subject: str,
    from_: str,
    to: str,
    text: str,
    date: str = "Mon, 1 Jan 2024 00:00:00 +0000",
    encoding: str = "7bit",
    multipart: bool = False,
    encode_subject: bool = False,
) -> bytes:
    """Build a valid message (inverse of :func:`parse_email`):
    ``encoding`` picks the body transfer coding (7bit /
    quoted-printable / base64), ``multipart`` wraps the text in a
    multipart/alternative with an HTML sibling, ``encode_subject``
    RFC-2047-encodes the subject as UTF-8 quoted-printable."""
    if encode_subject:
        # RFC 2047 caps encoded words at 75 chars: long subjects
        # split into MULTIPLE words on folded continuation lines
        # (decoders join adjacent words without the whitespace) —
        # one long word would force quopri's =\n soft breaks inside
        # the word, which is invalid
        words = []
        for i in range(0, max(len(subject), 1), 16):
            chunk = subject[i : i + 16]
            payload = (
                quopri.encodestring(chunk.encode(), header=True)
                .decode()
                .replace("=\n", "")
                # '?' must be escaped inside a Q encoded word
                # (quopri's header mode leaves it literal)
                .replace("?", "=3F")
            )
            words.append(f"=?utf-8?Q?{payload}?=")
        subject = "\r\n ".join(words)
    if encoding == "base64":
        body = base64.encodebytes(text.encode()).decode()
        cte = "base64"
    elif encoding == "quoted-printable":
        body = quopri.encodestring(text.encode()).decode()
        cte = "quoted-printable"
    else:
        body = text
        cte = "7bit"
    if multipart:
        b = "BOUNDARY42"
        full = (
            f"Subject: {subject}\r\nFrom: {from_}\r\nTo: {to}\r\n"
            f"Date: {date}\r\nMIME-Version: 1.0\r\n"
            f'Content-Type: multipart/alternative; boundary="{b}"\r\n'
            f"\r\n--{b}\r\n"
            f"Content-Type: text/plain; charset=utf-8\r\n"
            f"Content-Transfer-Encoding: {cte}\r\n\r\n{body}\r\n"
            f"--{b}\r\n"
            f"Content-Type: text/html; charset=utf-8\r\n\r\n"
            f"<p>html twin</p>\r\n"
            f"--{b}--\r\n"
        )
    else:
        full = (
            f"Subject: {subject}\r\nFrom: {from_}\r\nTo: {to}\r\n"
            f"Date: {date}\r\n"
            f"Content-Type: text/plain; charset=utf-8\r\n"
            f"Content-Transfer-Encoding: {cte}\r\n\r\n{body}"
        )
    return full.encode("utf-8" if cte != "7bit" else "ascii", "replace")


def split_mbox(data: bytes):
    """Split an mbox file into message byte strings (``From_``
    envelope framing; the envelope line itself is dropped)."""
    if not data.startswith(b"From "):
        raise ValueError("mbox: missing From_ envelope")
    chunks = re.split(rb"(?:^|\n)From [^\n]*\n", data)
    return [c for c in chunks if c.strip()]
