"""PDF text extraction (ISO 32000 subset) — pure stdlib.

PDF is the second most common document payload in web crawls (after
HTML), so a crawl-to-corpus pipeline that only extracts HTML leaves a
large slice of the text on the floor.  This module parses the PDF
object graph and extracts page text for curation: not a renderer, a
text miner.  Reference parity note: the reference repo has no PDF
surface at all; this exists for the 100 TB curation brief.

Supported surface (the format's long tail is explicit-error, never
silent garbage):

* classic cross-reference tables (incl. /Prev chains and update
  sections) AND cross-reference STREAMS (/Type /XRef, /W, /Index,
  PNG-predictor-filtered), plus hybrid /XRefStm bridges — i.e. both
  pre-1.5 and modern writers;
* compressed object streams (/Type /ObjStm);
* stream filters: FlateDecode (+ PNG predictors 10-15 and TIFF
  predictor 2 via /DecodeParms), LZWDecode (reusing the TIFF
  early-change decoder), ASCIIHexDecode, ASCII85Decode,
  RunLengthDecode; filter chains in order;
* page-tree walk with /Resources inheritance and cycle guard;
* text operators BT/ET, Tf, Tj, TJ (kerning gaps -> spaces), ', ",
  Td/TD/T*/Tm line breaks;
* byte->unicode via /ToUnicode CMaps (bfchar + bfrange, 1- and
  2-byte codes — covers Type0/CID fonts), /Encoding names
  (WinAnsi -> cp1252, MacRoman), /Differences arrays over a small
  Adobe-glyph-list subset, PDFDocEncoding fallback;
* a fixture writer (`write_pdf`) that emits BOTH layouts (classic
  xref and xref-stream + object-stream) with optional Flate
  compression, so round-trip tests cover each reader path.

Out of scope (raise or degrade explicitly): encrypted PDFs
(/Encrypt -> ValueError), JBIG2/JPX/DCT *image* payloads (text
extraction never needs them), Type3 glyph procedures, and
right-to-left reordering.

Scale shape: one PDF = one payload cell decoded executor-side inside
an Arrow batch (operators/multimodal.extract_features routes
application/pdf payloads here via `pdf_text_features`); bytes never
hit the driver, mirroring the image codecs.
"""

from __future__ import annotations

import re
import zlib

__all__ = [
    "PdfError",
    "parse_pdf",
    "extract_pdf_text",
    "write_pdf",
]


class PdfError(ValueError):
    pass


class Name(str):
    """A PDF name object (/Foo) — distinct from string values."""

    __slots__ = ()


class Ref(tuple):
    """Indirect reference (objnum, gen)."""

    __slots__ = ()

    def __new__(cls, num, gen):
        return super().__new__(cls, (num, gen))


class Op(str):
    """A bare keyword token (content-stream operator, obj, R, ...)."""

    __slots__ = ()


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _is_ws(b: int) -> bool:
    return b in _WS


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to EOL
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_KEYWORD_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9'\"*]*|'|\"")


def _parse_name(data: bytes, pos: int) -> tuple[Name, int]:
    pos += 1  # '/'
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # #xx hex escape
            try:
                out.append(int(data[pos + 1 : pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return Name(out.decode("latin-1")), pos


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    pos += 1  # '('
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_digits = bytearray([e])
                pos += 1
                while (
                    len(oct_digits) < 3
                    and pos < n
                    and 0x30 <= data[pos] <= 0x37
                ):
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.find(b">", pos + 1)
    if end < 0:
        raise PdfError("unterminated hex string")
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), end + 1


def parse_object(data: bytes, pos: int):
    """One PDF object starting at (whitespace before) ``pos`` ->
    (python value, next pos).  Indirect references come back as
    ``Ref``; bare keywords as ``Op`` (the content-stream tokenizer
    reuses this)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("unexpected end of data")
    c = data[pos]
    if c == 0x2F:  # /Name
        return _parse_name(data, pos)
    if c == 0x28:  # (string)
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # << dict >> or <hex>
        if data[pos : pos + 2] == b"<<":
            d = {}
            pos += 2
            while True:
                pos = _skip_ws(data, pos)
                if data[pos : pos + 2] == b">>":
                    return d, pos + 2
                key, pos = parse_object(data, pos)
                if not isinstance(key, Name):
                    raise PdfError(f"dict key is not a name: {key!r}")
                val, pos = parse_object(data, pos)
                d[str(key)] = val
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # [ array ]
        arr = []
        pos += 1
        while True:
            pos = _skip_ws(data, pos)
            if data[pos] == 0x5D:
                return arr, pos + 1
            val, pos = parse_object(data, pos)
            arr.append(val)
    m = _NUM_RE.match(data, pos)
    if m:
        txt = m.group()
        pos2 = m.end()
        # lookahead for "<int> <int> R" (indirect reference)
        if b"." not in txt:
            save = pos2
            p = _skip_ws(data, pos2)
            m2 = _NUM_RE.match(data, p)
            if m2 and b"." not in m2.group():
                p2 = _skip_ws(data, m2.end())
                if data[p2 : p2 + 1] == b"R" and (
                    p2 + 1 >= len(data)
                    or data[p2 + 1] in _WS
                    or data[p2 + 1] in _DELIM
                ):
                    return Ref(int(txt), int(m2.group())), p2 + 1
            pos2 = save
            return int(txt), pos2
        return float(txt), pos2
    m = _KEYWORD_RE.match(data, pos)
    if m:
        kw = m.group()
        if kw == b"true":
            return True, m.end()
        if kw == b"false":
            return False, m.end()
        if kw == b"null":
            return None, m.end()
        return Op(kw.decode("latin-1")), m.end()
    raise PdfError(f"cannot parse object at byte {pos}: {data[pos:pos+16]!r}")


# ------------------------------------------------------------------ filters


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """PNG predictors (types 10-15 share the per-row filter-byte
    format) over the decoded bytes — exactly the xref-stream layout
    every modern writer uses."""
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    n = len(data)
    while pos < n:
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos : pos + rowlen])
        if len(row) < rowlen:
            row += bytes(rowlen - len(row))
        pos += rowlen
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                row[i] = (row[i] + pr) & 0xFF
        elif ft != 0:
            raise PdfError(f"bad PNG predictor row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    pred = parms.get("Predictor", 1)
    if pred in (None, 1):
        return data
    columns = parms.get("Columns", 1) or 1
    colors = parms.get("Colors", 1) or 1
    bpc = parms.get("BitsPerComponent", 8) or 8
    if pred == 2:  # TIFF horizontal differencing (8-bit only here)
        if bpc != 8:
            raise PdfError("TIFF predictor supported for 8-bit only")
        row = columns * colors
        out = bytearray(data)
        for r0 in range(0, len(out), row):
            for i in range(r0 + colors, min(r0 + row, len(out))):
                out[i] = (out[i] + out[i - colors]) & 0xFF
        return bytes(out)
    if pred >= 10:
        return _png_unpredict(data, columns, colors, bpc)
    raise PdfError(f"unsupported /Predictor {pred}")


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = re.sub(rb"\s", b"", data)
    if body.endswith(b"~>"):
        body = body[:-2]
    return base64.a85decode(body)


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        ln = data[pos]
        pos += 1
        if ln == 128:
            break
        if ln < 128:
            out += data[pos : pos + ln + 1]
            pos += ln + 1
        else:
            out += bytes([data[pos]]) * (257 - ln)
            pos += 1
    return bytes(out)


def _decode_stream(sdict: dict, raw: bytes, resolve) -> bytes:
    filters = resolve(sdict.get("Filter"))
    if filters is None:
        filters = []
    elif isinstance(filters, (Name, str)):
        filters = [filters]
    parms = resolve(sdict.get("DecodeParms")) or resolve(sdict.get("DP"))
    if parms is None:
        parms_list = [None] * len(filters)
    elif isinstance(parms, dict):
        parms_list = [parms] + [None] * (len(filters) - 1)
    else:
        parms_list = list(parms) + [None] * (len(filters) - len(parms))
    data = raw
    for f, p in zip(filters, parms_list):
        p = resolve(p) or {}
        f = str(f)
        if f in ("FlateDecode", "Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                # tolerate trailing garbage / missing EOD (common in
                # the wild): inflate what is there
                d = zlib.decompressobj()
                data = d.decompress(data)
            data = _apply_predictor(data, p)
        elif f in ("LZWDecode", "LZW"):
            if p.get("EarlyChange", 1) == 0:
                raise PdfError("LZW EarlyChange=0 is not supported")
            from vtk_reserves_spark.sources.geotiff import _tiff_lzw_decode

            data = _apply_predictor(_tiff_lzw_decode(data), p)
        elif f in ("ASCIIHexDecode", "AHx"):
            body = data.split(b">", 1)[0]
            hx = re.sub(rb"\s", b"", body)
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        elif f in ("ASCII85Decode", "A85"):
            data = _ascii85_decode(data)
        elif f in ("RunLengthDecode", "RL"):
            data = _runlength_decode(data)
        elif f in ("DCTDecode", "JPXDecode", "JBIG2Decode", "CCITTFaxDecode"):
            # image filters: the payload is an image, not text — pass
            # raw bytes through (text extraction never reads them)
            return data
        else:
            raise PdfError(f"unsupported stream filter /{f}")
    return data


# ------------------------------------------------------------------- lexing
# the document


class PdfDocument:
    """Parsed PDF object store: xref chain (classic tables, xref
    streams, hybrids), object streams, lazy object loading."""

    def __init__(self, data: bytes) -> None:
        if not data.startswith(b"%PDF-"):
            raise PdfError("not a PDF (missing %PDF- header)")
        self.data = data
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self.xref: dict[int, tuple] = {}
        self.trailer: dict = {}
        try:
            self._load_xref_chain()
        except PdfError:
            self.xref = {}
            self.trailer = {}
        if not self.xref or "Root" not in self.trailer:
            self._brute_scan()
        if "Encrypt" in self.trailer:
            raise PdfError("encrypted PDF: text extraction unsupported")
        if "Root" not in self.trailer:
            raise PdfError("no document catalog (/Root) found")

    # -- xref ----------------------------------------------------------

    def _load_xref_chain(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("startxref not found")
        offset = int(m.group(1))
        seen = set()
        while offset and offset not in seen:
            seen.add(offset)
            offset = self._load_xref_section(offset)

    def _load_xref_section(self, offset: int) -> int:
        pos = _skip_ws(self.data, offset)
        if self.data[pos : pos + 4] == b"xref":
            return self._load_classic_xref(pos + 4)
        # xref stream: "<n> <g> obj <<...>> stream"
        obj, sdict, raw = self._parse_indirect_at(pos)
        if raw is None:
            raise PdfError("xref offset points at a non-stream object")
        content = _decode_stream(sdict, raw, self._resolve)
        self._load_xref_stream(sdict, content)
        for k, v in sdict.items():
            self.trailer.setdefault(k, v)
        nxt = sdict.get("Prev")
        return int(nxt) if nxt is not None else 0

    def _load_classic_xref(self, pos: int) -> int:
        data = self.data
        while True:
            pos = _skip_ws(data, pos)
            if data[pos : pos + 7] == b"trailer":
                tdict, pos = parse_object(data, pos + 7)
                for k, v in tdict.items():
                    self.trailer.setdefault(k, v)
                # hybrid: classic table + parallel xref stream
                if "XRefStm" in tdict:
                    try:
                        self._load_xref_section(int(tdict["XRefStm"]))
                    except PdfError:
                        pass
                nxt = tdict.get("Prev")
                return int(nxt) if nxt is not None else 0
            m = re.match(rb"(\d+)\s+(\d+)", data[pos : pos + 40])
            if not m:
                raise PdfError(f"bad xref subsection header at {pos}")
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            for i in range(count):
                pos = _skip_ws(data, pos)
                em = re.match(
                    rb"(\d{10})\s+(\d{5})\s+([nf])", data[pos : pos + 20]
                )
                if not em:
                    raise PdfError(f"bad xref entry at {pos}")
                if em.group(3) == b"n":
                    self.xref.setdefault(
                        start + i, ("n", int(em.group(1)))
                    )
                pos += em.end()

    def _load_xref_stream(self, sdict: dict, content: bytes) -> None:
        w = [int(x) for x in self._resolve(sdict.get("W", []))]
        if len(w) < 3:
            raise PdfError("xref stream missing /W")
        size = int(self._resolve(sdict.get("Size", 0)))
        index = self._resolve(sdict.get("Index")) or [0, size]
        rowlen = sum(w)
        pos = 0

        def field(width):
            nonlocal pos
            if width == 0:
                return None
            v = int.from_bytes(content[pos : pos + width], "big")
            pos += width
            return v

        pairs = [
            (int(index[i]), int(index[i + 1]))
            for i in range(0, len(index), 2)
        ]
        for start, count in pairs:
            for i in range(count):
                if pos + rowlen > len(content):
                    raise PdfError("truncated xref stream")
                t = field(w[0])
                f2 = field(w[1]) or 0
                f3 = field(w[2]) or 0
                if t is None:
                    t = 1  # default type
                num = start + i
                if t == 1:
                    self.xref.setdefault(num, ("n", f2))
                elif t == 2:
                    self.xref.setdefault(num, ("objstm", f2, f3))
                # t == 0: free — skip

    def _brute_scan(self) -> None:
        """Recovery path for damaged xrefs: scan for `N G obj` and use
        the LAST definition of each object number (incremental updates
        append, so later wins)."""
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            self.xref[int(m.group(1))] = ("n", m.start())
        if "Root" not in self.trailer:
            for m in re.finditer(rb"trailer", self.data):
                try:
                    tdict, _ = parse_object(self.data, m.end())
                except PdfError:
                    continue
                if isinstance(tdict, dict):
                    for k, v in tdict.items():
                        self.trailer.setdefault(k, v)
        if "Root" not in self.trailer:
            # xref-stream file with a broken startxref: any dict
            # object carrying /Root (an XRef stream dict) restores the
            # trailer
            for num, ent in list(self.xref.items()):
                try:
                    val, sdict, _raw = self._parse_indirect_at(ent[1])
                except PdfError:
                    continue
                d = sdict or (val if isinstance(val, dict) else None)
                if isinstance(d, dict) and "Root" in d:
                    for k, v in d.items():
                        self.trailer.setdefault(k, v)
                    break

    # -- objects -------------------------------------------------------

    def _parse_indirect_at(self, pos: int):
        """`N G obj ... endobj` at ``pos`` -> (value, stream dict or
        None, raw stream bytes or None)."""
        data = self.data
        pos = _skip_ws(data, pos)
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", data[pos : pos + 40])
        if not m:
            raise PdfError(f"no indirect object at byte {pos}")
        val, p = parse_object(data, pos + m.end())
        p = _skip_ws(data, p)
        if data[p : p + 6] == b"stream":
            if not isinstance(val, dict):
                raise PdfError("stream keyword without a dict")
            p += 6
            if data[p : p + 2] == b"\r\n":
                p += 2
            elif data[p : p + 1] in (b"\n", b"\r"):
                p += 1
            length = self._resolve(val.get("Length"))
            if isinstance(length, int) and length >= 0:
                raw = data[p : p + length]
                endcheck = _skip_ws(data, p + length)
                if data[endcheck : endcheck + 9] != b"endstream":
                    raw = None  # bad /Length: fall back to scanning
            else:
                raw = None
            if raw is None:
                end = data.find(b"endstream", p)
                if end < 0:
                    raise PdfError("unterminated stream")
                raw = data[p:end].rstrip(b"\r\n")
            return val, val, raw
        return val, None, None

    def _resolve(self, obj, depth: int = 0):
        while isinstance(obj, Ref):
            if depth > 32:
                raise PdfError("reference chain too deep")
            obj = self.get(obj[0])
            depth += 1
        return obj

    def get(self, num: int):
        """Object by number (already-resolved value, streams as
        (dict, decoded bytes) tuples)."""
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            self._cache[num] = None
            return None
        if ent[0] == "n":
            try:
                val, sdict, raw = self._parse_indirect_at(ent[1])
            except PdfError:
                self._cache[num] = None
                return None
            if sdict is not None:
                val = PdfStream(sdict, raw, self)
        else:
            _, stm_num, idx = ent
            val = self._objstm_object(stm_num, idx)
        self._cache[num] = val
        return val

    def _objstm_object(self, stm_num: int, idx: int):
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            stm = self.get(stm_num)
            if not isinstance(stm, PdfStream):
                raise PdfError(f"object stream {stm_num} missing")
            content = stm.decoded()
            n = int(self._resolve(stm.dict.get("N", 0)))
            first = int(self._resolve(stm.dict.get("First", 0)))
            objs = {}
            pos = 0
            header = []
            for _ in range(2 * n):
                m = _NUM_RE.match(content, _skip_ws(content, pos))
                if not m:
                    raise PdfError("bad object-stream header")
                header.append(int(m.group()))
                pos = m.end()
            for i in range(n):
                onum, ooff = header[2 * i], header[2 * i + 1]
                val, _ = parse_object(content, first + ooff)
                objs[i] = val
                # also cache by object number for direct hits
                self._cache.setdefault(onum, val)
            self._objstm_cache[stm_num] = objs
        if idx not in objs:
            raise PdfError(f"object stream index {idx} out of range")
        return objs[idx]


class PdfStream:
    __slots__ = ("dict", "raw", "_doc", "_decoded")

    def __init__(self, sdict: dict, raw: bytes, doc: PdfDocument) -> None:
        self.dict = sdict
        self.raw = raw
        self._doc = doc
        self._decoded = None

    def decoded(self) -> bytes:
        if self._decoded is None:
            self._decoded = _decode_stream(
                self.dict, self.raw, self._doc._resolve
            )
        return self._decoded


# -------------------------------------------------------------- font codecs

#: Adobe glyph list subset: enough for /Differences arrays over Latin
#: text (full AGL is 4000+ entries; crawls hitting exotic glyph names
#: fall back to U+FFFD-free skips rather than mojibake)
_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "fi": "ﬁ",
    "fl": "ﬂ", "adieresis": "ä", "odieresis": "ö",
    "udieresis": "ü", "eacute": "é", "egrave": "è",
    "agrave": "à", "ccedilla": "ç", "ntilde": "ñ",
    "Euro": "€", "degree": "°",
}
for _c in range(0x30, 0x3A):
    _GLYPHS[
        ("zero one two three four five six seven eight nine".split())[
            _c - 0x30
        ]
    ] = chr(_c)
for _c in range(0x41, 0x5B):
    _GLYPHS[chr(_c)] = chr(_c)
for _c in range(0x61, 0x7B):
    _GLYPHS[chr(_c)] = chr(_c)


def _glyph_to_char(gname: str) -> str:
    if gname in _GLYPHS:
        return _GLYPHS[gname]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", gname)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", gname)
    if m:
        return chr(int(m.group(1), 16))
    return ""


class _FontMap:
    """Byte-string -> text decoder for one font resource."""

    def __init__(self, two_byte: bool, cmap: dict | None, codec: str,
                 diffs: dict | None) -> None:
        self.two_byte = two_byte
        self.cmap = cmap
        self.codec = codec
        self.diffs = diffs

    def decode(self, raw: bytes) -> str:
        if self.cmap is not None:
            step = 2 if self.two_byte else 1
            out = []
            for i in range(0, len(raw) - step + 1, step):
                code = int.from_bytes(raw[i : i + step], "big")
                ch = self.cmap.get(code)
                if ch is None:
                    ch = chr(code) if not self.two_byte and code < 256 else ""
                out.append(ch)
            return "".join(out)
        if self.diffs:
            out = []
            for b in raw:
                if b in self.diffs:
                    out.append(self.diffs[b])
                else:
                    out.append(bytes([b]).decode(self.codec, "replace"))
            return "".join(out)
        return raw.decode(self.codec, "replace")


def _parse_tounicode(content: bytes) -> tuple[dict, bool]:
    """CMap stream -> (code -> text map, two_byte flag)."""
    cmap: dict[int, str] = {}
    two_byte = False
    for m in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", content, re.S
    ):
        for h in re.finditer(rb"<([0-9A-Fa-f]+)>", m.group(1)):
            if len(h.group(1)) > 2:
                two_byte = True

    def hex2text(hx: bytes) -> str:
        if len(hx) % 2:
            hx = b"0" + hx
        b = bytes.fromhex(hx.decode("ascii"))
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return b.decode("latin-1", "replace")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", content, re.S):
        for pm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            code = int(pm.group(1), 16)
            cmap[code] = hex2text(pm.group(2))
            if len(pm.group(1)) > 2:
                two_byte = True
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", content, re.S):
        body = m.group(1)
        for rm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
            body,
            re.S,
        ):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            if len(rm.group(1)) > 2:
                two_byte = True
            if rm.group(3) is not None:
                base = int(rm.group(3), 16)
                width = len(rm.group(3))
                for c in range(lo, hi + 1):
                    cmap[c] = hex2text(
                        (b"%0*x" % (width, base + c - lo))
                    )
            else:
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", rm.group(4))
                for c, dst in zip(range(lo, hi + 1), dsts):
                    cmap[c] = hex2text(dst)
    return cmap, two_byte


def _build_font_map(doc: PdfDocument, font_obj) -> _FontMap:
    font = doc._resolve(font_obj)
    if isinstance(font, PdfStream):
        font = font.dict
    if not isinstance(font, dict):
        return _FontMap(False, None, "latin-1", None)
    subtype = str(doc._resolve(font.get("Subtype", "")) or "")
    two_byte = subtype == "Type0"
    tu = doc._resolve(font.get("ToUnicode"))
    if isinstance(tu, PdfStream):
        cmap, tb = _parse_tounicode(tu.decoded())
        return _FontMap(two_byte or tb, cmap, "latin-1", None)
    enc = doc._resolve(font.get("Encoding"))
    codec = "latin-1"
    diffs = None
    if isinstance(enc, (Name, str)):
        codec = {
            "WinAnsiEncoding": "cp1252",
            "MacRomanEncoding": "mac_roman",
        }.get(str(enc), "latin-1")
    elif isinstance(enc, dict) or isinstance(enc, PdfStream):
        ed = enc.dict if isinstance(enc, PdfStream) else enc
        base = str(doc._resolve(ed.get("BaseEncoding", "")) or "")
        codec = {
            "WinAnsiEncoding": "cp1252",
            "MacRomanEncoding": "mac_roman",
        }.get(base, "latin-1")
        darr = doc._resolve(ed.get("Differences"))
        if isinstance(darr, list):
            diffs = {}
            code = 0
            for item in darr:
                item = doc._resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, Name):
                    diffs[code] = _glyph_to_char(str(item))
                    code += 1
    if two_byte:
        # Type0 without ToUnicode: Identity encodings carry raw CIDs;
        # best effort is UTF-16BE-ish passthrough
        return _FontMap(True, {}, codec, None)
    return _FontMap(False, None, codec, diffs)


# -------------------------------------------------------------- text engine


def _page_text(doc: PdfDocument, page: dict, fonts: dict) -> str:
    contents = doc._resolve(page.get("Contents"))
    if contents is None:
        return ""
    if isinstance(contents, list):
        parts = []
        for c in contents:
            c = doc._resolve(c)
            if isinstance(c, PdfStream):
                parts.append(c.decoded())
        stream = b"\n".join(parts)
    elif isinstance(contents, PdfStream):
        stream = contents.decoded()
    else:
        return ""

    out: list[str] = []
    cur_font: _FontMap | None = None
    font_stack: list[_FontMap | None] = []
    pending: list[object] = []  # operand accumulator
    last_tm_y: float | None = None
    pos = 0
    n = len(stream)

    def show(raw: bytes) -> None:
        fm = cur_font or _FontMap(False, None, "latin-1", None)
        out.append(fm.decode(raw))

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    while pos < n:
        pos = _skip_ws(stream, pos)
        if pos >= n:
            break
        try:
            obj, pos = parse_object(stream, pos)
        except PdfError:
            pos += 1
            continue
        if not isinstance(obj, Op):
            pending.append(obj)
            continue
        op = str(obj)
        if op == "Tf" and len(pending) >= 2:
            fname = pending[-2]
            if isinstance(fname, Name):
                cur_font = fonts.get(str(fname), cur_font)
        elif op == "Tj" and pending and isinstance(pending[-1], bytes):
            show(pending[-1])
        elif op == "'" and pending and isinstance(pending[-1], bytes):
            newline()
            show(pending[-1])
        elif op == '"' and pending and isinstance(pending[-1], bytes):
            newline()
            show(pending[-1])
        elif op == "TJ" and pending and isinstance(pending[-1], list):
            for el in pending[-1]:
                if isinstance(el, bytes):
                    show(el)
                elif isinstance(el, (int, float)) and el < -100:
                    # big negative kerning = an omitted space
                    if out and not out[-1].endswith((" ", "\n")):
                        out.append(" ")
        elif op in ("Td", "TD") and len(pending) >= 2:
            ty = pending[-1]
            if isinstance(ty, (int, float)) and ty != 0:
                newline()
        elif op == "T*":
            newline()
        elif op == "Tm" and len(pending) >= 6:
            ty = pending[-1]
            if isinstance(ty, (int, float)):
                if last_tm_y is not None and ty != last_tm_y:
                    newline()
                last_tm_y = float(ty)
        elif op == "ET":
            newline()
        elif op == "q":
            font_stack.append(cur_font)
        elif op == "Q":
            if font_stack:
                cur_font = font_stack.pop()
        elif op == "BI":
            # inline image: skip to EI
            m = re.search(rb"\bEI\b", stream[pos:])
            pos = pos + m.end() if m else n
        pending.clear()
    return "".join(out).strip("\n")


def _walk_pages(doc: PdfDocument, node, inherited_res, depth=0):
    node = doc._resolve(node)
    if not isinstance(node, dict) or depth > 64:
        return []
    ntype = str(doc._resolve(node.get("Type", "")) or "")
    res = doc._resolve(node.get("Resources")) or inherited_res
    if ntype == "Page" or ("Kids" not in node and "Contents" in node):
        page = dict(node)
        if "Resources" not in page and res is not None:
            page["Resources"] = res
        return [page]
    out = []
    kids = doc._resolve(node.get("Kids")) or []
    for kid in kids:
        out.extend(_walk_pages(doc, kid, res, depth + 1))
    return out


def _pdf_string_to_text(doc, val) -> str | None:
    val = doc._resolve(val)
    if isinstance(val, bytes):
        if val[:2] == b"\xfe\xff":
            return val[2:].decode("utf-16-be", "replace")
        return val.decode("latin-1", "replace")
    return None


def parse_pdf(data: bytes) -> dict:
    """PDF bytes -> ``{npages, pages: [text,...], title, author}``."""
    doc = PdfDocument(bytes(data))
    root = doc._resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise PdfError("document catalog is not a dict")
    pages = _walk_pages(doc, root.get("Pages"), None)
    texts = []
    for page in pages:
        res = doc._resolve(page.get("Resources")) or {}
        fdict = doc._resolve(res.get("Font")) or {}
        fonts = {
            name: _build_font_map(doc, fobj)
            for name, fobj in fdict.items()
        }
        texts.append(_page_text(doc, page, fonts))
    info = doc._resolve(doc.trailer.get("Info")) or {}
    return {
        "npages": len(pages),
        "pages": texts,
        "title": _pdf_string_to_text(doc, info.get("Title")),
        "author": _pdf_string_to_text(doc, info.get("Author")),
    }


def extract_pdf_text(data: bytes) -> str:
    """Whole-document text: pages joined by blank lines."""
    return "\n\n".join(parse_pdf(data)["pages"])


# ----------------------------------------------------------------- writer


def _esc_str(s: str) -> bytes:
    b = s.encode("cp1252", "replace")
    return (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def write_pdf(
    pages: list[str],
    title: str | None = None,
    author: str | None = None,
    compress: bool = False,
    modern: bool = False,
) -> bytes:
    """Fixture/re-export writer: page texts -> valid PDF bytes.

    ``compress`` Flate-compresses content streams; ``modern`` emits
    the 1.5+ layout — catalog/pages/font/page dicts packed into a
    compressed object stream and a cross-reference STREAM with PNG
    Up-predictor — so tests exercise both reader paths end-to-end.
    Text is Helvetica (WinAnsiEncoding), one Tj per line with T*
    leading."""
    objs: dict[int, bytes] = {}  # objnum -> serialized body (no header)
    font_num, cat_num, pages_num, info_num = 1, 2, 3, 4
    first_page = 5
    page_nums = []
    content_nums = []
    nxt = first_page
    for _ in pages:
        page_nums.append(nxt)
        content_nums.append(nxt + 1)
        nxt += 2
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_nums) + b"]"
    objs[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    objs[cat_num] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num
    objs[pages_num] = (
        b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % len(pages)
    )
    info = b"<<"
    if title is not None:
        info += b" /Title (" + _esc_str(title) + b")"
    if author is not None:
        info += b" /Author (" + _esc_str(author) + b")"
    info += b" >>"
    objs[info_num] = info

    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict body, data)
    for pn, cn, text in zip(page_nums, content_nums, pages):
        objs[pn] = (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (pages_num, font_num, cn)
        )
        lines = text.split("\n")
        body = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                body.append(b"T*")
            body.append(b"(" + _esc_str(line) + b") Tj")
        body.append(b"ET")
        content = b"\n".join(body)
        extra = b""
        if compress:
            content = zlib.compress(content)
            extra = b" /Filter /FlateDecode"
        streams[cn] = (
            b"<< /Length %d%s >>" % (len(content), extra),
            content,
        )

    if not modern:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = {}
        for num in sorted(set(objs) | set(streams)):
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num
            if num in streams:
                d, s = streams[num]
                out += d + b"\nstream\n" + s + b"\nendstream"
            else:
                out += objs[num]
            out += b"\nendobj\n"
        maxnum = max(offsets)
        xref_off = len(out)
        out += b"xref\n0 %d\n" % (maxnum + 1)
        out += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            out += b"%010d 00000 n \n" % offsets.get(num, 0)
        out += (
            b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (maxnum + 1, cat_num, info_num, xref_off)
        )
        return bytes(out)

    # modern layout: dict objects into one ObjStm, xref as a stream
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    objstm_num = nxt
    xref_num = nxt + 1
    packed = sorted(objs)  # all non-stream objects go into the ObjStm
    header = []
    bodies = []
    off = 0
    for num in packed:
        body = objs[num]
        header.append(b"%d %d" % (num, off))
        bodies.append(body)
        off += len(body) + 1
    hdr = b" ".join(header) + b"\n"
    stm_content = hdr + b"\n".join(bodies) + b"\n"
    stm_z = zlib.compress(stm_content)
    offsets = {}
    for num in sorted(streams):
        offsets[num] = len(out)
        d, s = streams[num]
        out += b"%d 0 obj\n" % num + d + b"\nstream\n" + s
        out += b"\nendstream\nendobj\n"
    offsets[objstm_num] = len(out)
    out += (
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d"
        b" /Filter /FlateDecode >>\nstream\n"
        % (objstm_num, len(packed), len(hdr), len(stm_z))
    )
    out += stm_z + b"\nendstream\nendobj\n"

    # xref stream: W = [1 4 2], PNG Up predictor (the common layout)
    xref_off = len(out)
    maxnum = xref_num
    rows = []
    for num in range(maxnum + 1):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        elif num in packed:
            rows.append((2, objstm_num, packed.index(num)))
        else:
            rows.append((0, 0, 0))
    raw_rows = b"".join(
        bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in rows
    )
    rowlen = 7
    pred = bytearray()
    prev = bytes(rowlen)
    for i in range(0, len(raw_rows), rowlen):
        row = raw_rows[i : i + rowlen]
        pred.append(2)  # Up
        pred += bytes((row[j] - prev[j]) & 0xFF for j in range(rowlen))
        prev = row
    xz = zlib.compress(bytes(pred))
    xdict = (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R /Info %d 0 R"
        b" /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 12 /Columns 7 >> /Length %d >>"
        % (maxnum + 1, cat_num, info_num, len(xz))
    )
    out += b"%d 0 obj\n" % xref_num + xdict + b"\nstream\n" + xz
    out += b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)
