"""Charset detection + UTF-8 transcoding for crawl payloads.

Web bytes lie about their encoding: HTTP headers are wrong or
absent, and a text pipeline that assumes UTF-8 silently mangles the
~15% of pages in legacy encodings.  Real crawl ingestion (WET
generation) therefore sniffs BYTES first and transcodes everything
to UTF-8 before any text operator runs — this module is that step,
sitting between `sources/warc.py` payloads and
`functions/text.html_to_text`.

Detection order (deterministic, the WHATWG-encoding-style
precedence):
1. **BOMs** — UTF-8 / UTF-16LE / UTF-16BE / UTF-32LE / UTF-32BE
   byte-order marks win outright (UTF-32 checked before UTF-16,
   whose BOM it contains as a prefix).
2. **Strict UTF-8 validation** — valid UTF-8 is (by construction of
   the encoding) overwhelmingly unlikely from legacy bytes, so a
   clean strict decode is authoritative.
3. **Declared charset** — ``<meta charset=...>`` /
   ``http-equiv`` ``content=...charset=...`` scanned over the ASCII
   skeleton of the prefix (legacy encodings are ASCII-compatible in
   the range the declaration occupies).
4. **Latin-1 fallback** — decodes anything; the conventional
   last resort (cp1252 is honored when declared, not guessed).

Scale shape: one Arrow-batched ``mapInPandas`` over payload bytes
(never on the driver) emitting (charset, had_bom, text).
"""

from __future__ import annotations

import codecs
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "detect_charset", "decode_payload", "transcode_to_utf8",
    "attach_charset_payload",
]

_BOMS = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]

_META_RE = re.compile(
    rb"""(?is)<meta\b[^>]*?charset\s*=\s*["']?([a-z0-9_\-]+)"""
)

# declared names normalized to python codecs (the common web set)
_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "iso-8859-1": "latin-1", "latin1": "latin-1", "latin-1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "euc-jp": "euc_jp", "gbk": "gbk", "gb2312": "gbk",
    "big5": "big5", "euc-kr": "euc_kr", "iso-8859-2": "iso8859-2",
    "iso-8859-15": "iso8859-15", "us-ascii": "ascii",
}


def detect_charset(payload: bytes) -> tuple[str, bool]:
    """Detect the charset of raw page bytes; returns
    (codec_name, had_bom) following the precedence in the module
    docstring."""
    for bom, name in _BOMS:
        if payload[: len(bom)] == bom:
            return name, True
    try:
        payload.decode("utf-8", "strict")
        return "utf-8", False
    except UnicodeDecodeError:
        pass
    m = _META_RE.search(payload[:4096])
    if m:
        declared = m.group(1).decode("ascii", "replace").lower()
        codec = _ALIASES.get(declared)
        if codec:
            try:
                codecs.lookup(codec)
                return codec, False
            except LookupError:  # pragma: no cover - alias table is valid
                pass
    return "latin-1", False


def decode_payload(payload: bytes) -> tuple[str, bool, str]:
    """Detect + decode to a str; returns (charset, had_bom, text).
    BOM codecs strip their mark (utf-8-sig natively; UTF-16/32
    variants by slicing before decode)."""
    charset, had_bom = detect_charset(payload)
    data = payload
    if had_bom and charset != "utf-8-sig":
        for bom, name in _BOMS:
            if name == charset:
                data = payload[len(bom):]
                break
    return charset, had_bom, data.decode(charset, "replace")


def attach_charset_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize raw page bytes per row in a rotating encoding
    (``id % 6``): plain UTF-8, UTF-8 BOM, UTF-16LE/BE BOMs,
    meta-declared windows-1252 (its € byte 0x80 proves the cp1252
    table ran), and undeclared latin-1 whose bytes are invalid UTF-8
    — one fixture per detection-precedence branch, each with a
    closed-form decoded text the SQL oracle replays."""
    import codecs as _codecs

    from pyspark.sql import functions as F

    @F.pandas_udf(T.BinaryType())
    def to_bytes(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id.astype("int64"):
            did = int(did)
            k = did % 6
            if k < 4:
                text = f"Seite {did} — größer & Café ✓"
                enc = ["utf-8", "utf-8-sig", "utf-16-le", "utf-16-be"][k]
                payload = text.encode(enc)
                if enc == "utf-16-le":
                    payload = _codecs.BOM_UTF16_LE + payload
                elif enc == "utf-16-be":
                    payload = _codecs.BOM_UTF16_BE + payload
            elif k == 4:
                text = f'<meta charset="windows-1252"><p>Preis {did} €</p>'
                payload = text.encode("cp1252")
            else:
                text = f"Seite {did} äöüß"
                payload = text.encode("latin-1")
            out.append(payload)
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc_id"),
        to_bytes(F.col(id_col)).alias("payload"),
    )


TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("charset", T.StringType()),
        T.StructField("had_bom", T.BooleanType()),
        T.StructField("text", T.StringType()),
    ]
)


def transcode_to_utf8(df: DataFrame) -> DataFrame:
    """Normalize (doc_id, payload) raw page bytes to UTF-8 text with
    the detected charset surfaced — the ingestion step every text
    operator downstream assumes has happened.  Arrow-batched
    mapInPandas; detection is a bounded-prefix scan plus one decode
    pass, so throughput is scan-bound."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for did, p in zip(b["doc_id"].astype("int64"), b["payload"]):
                charset, had_bom, text = decode_payload(bytes(p))
                rows.append([int(did), charset, had_bom, text])
            yield pd.DataFrame(
                rows, columns=["doc_id", "charset", "had_bom", "text"]
            )

    return df.mapInPandas(run, TRANSCODE_SCHEMA)
