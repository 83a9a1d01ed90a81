"""Pure-python Zstandard decoder (RFC 8878) with dictionary support.

Why this exists: pyarrow bundles libzstd (the fast path used by
`sources/zstd.py`), but its buffer API exposes no dictionary
parameter — and the announced CommonCrawl `.warc.zst` layout leads
each shard with a shared dictionary that every frame references.
This module decodes those frames: FSE (tANS) tables, Huffman
literals (direct and FSE-compressed weights, 1- and 4-stream),
sequence decode/execution with repeat offsets, raw-content AND
structured (0xEC30A437) dictionaries.

Parity: golden-vector tests pin this decoder against pyarrow's real
libzstd output across corpora/levels (`tests/test_zstd.py`) — unlike
the VP8/VP8L probability tables, zstd's reference implementation is
IN the container, so bit-parity is machine-checked, not transcribed.

Scope: decoding only (plus a tiny fixture encoder that emits valid
frames using RLE sequence modes — enough to construct
dict-referencing streams for tests; real compression stays on
libzstd).  Content checksums are skipped, not verified (xxhash64 is
out of scope; frame integrity is covered by the entropy structure
itself).  Per-frame python loops: this is the *dictionary* path and
test oracle, not the hot path — `sources/zstd.py` routes dict-less
frames to libzstd.
"""
from __future__ import annotations

DICT_MAGIC = 0xEC30A437

#: literals-length code -> (baseline, extra bits) — RFC 8878 tbl. 10
_LL_BASE = [
    (0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0),
    (8, 0), (9, 0), (10, 0), (11, 0), (12, 0), (13, 0), (14, 0),
    (15, 0), (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2),
    (32, 3), (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16),
]

#: match-length code -> (baseline, extra bits) — RFC 8878 tbl. 12
_ML_BASE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

#: predefined FSE distributions — RFC 8878 §3.1.1.3.2.2
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2,
     2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, -1, -1, -1, -1, -1],
    5,
)

_MAX_LOG = {"ll": 9, "ml": 9, "of": 8, "huf_weights": 6}


class ZstdDecodeError(ValueError):
    pass


# ---------------------------------------------------------------- bitstreams


class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        if n == 0:
            return 0
        b0, b1 = p >> 3, (p + n - 1) >> 3
        chunk = int.from_bytes(self.data[b0 : b1 + 1], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def byte_len(self) -> int:
        return (self.pos + 7) >> 3


class _BackwardBits:
    """zstd backward bitstream: a sentinel '1' tops the final byte;
    reads proceed downward.  Reading past the start zero-pads the LOW
    bits (matching libzstd's overflow semantics) and flags
    ``overflowed`` — the Huffman-weight interleave loop keys off it."""

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ZstdDecodeError("backward bitstream lacks sentinel bit")
        self.data = data
        self.bitpos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    @property
    def overflowed(self) -> bool:
        return self.bitpos < 0

    def read(self, n: int) -> int:
        self.bitpos -= n
        p = self.bitpos
        if n == 0:
            return 0
        if p >= 0:
            b0, b1 = p >> 3, (p + n - 1) >> 3
            chunk = int.from_bytes(self.data[b0 : b1 + 1], "little")
            return (chunk >> (p & 7)) & ((1 << n) - 1)
        avail = n + p
        if avail <= 0:
            return 0
        chunk = int.from_bytes(self.data[0 : (avail + 7) >> 3], "little")
        return (chunk & ((1 << avail) - 1)) << (-p)


# ----------------------------------------------------------------------- FSE


def _fse_read_distribution(data: bytes) -> tuple[list[int], int, int]:
    """FSE table description (FSE_readNCount): -> (probabilities —
    may include -1 'less-than-one' entries, accuracy_log, bytes
    consumed)."""
    bits = _ForwardBits(data)
    accuracy_log = bits.read(4) + 5
    table_size = 1 << accuracy_log
    remaining = table_size + 1
    threshold = table_size
    nb_bits = accuracy_log + 1
    probs: list[int] = []
    prev_zero = False
    while remaining > 1:
        if prev_zero:
            while True:
                rep = bits.read(2)
                probs.extend([0] * rep)
                if rep < 3:
                    break
            prev_zero = False
            continue
        cap = (2 * threshold - 1) - remaining
        count = bits.read(nb_bits - 1)
        if count < cap:
            # small value: nb_bits - 1 bits suffice
            pass
        else:
            extra = bits.read(1)
            count |= extra << (nb_bits - 1)
            if count >= threshold:
                count -= cap
        count -= 1  # -> probability in [-1, remaining)
        remaining -= -count if count < 0 else count
        probs.append(count)
        prev_zero = count == 0
        while remaining < threshold and remaining > 1:
            nb_bits -= 1
            threshold >>= 1
    return probs, accuracy_log, bits.byte_len()


def _fse_build_table(probs: list[int], accuracy_log: int):
    """FSE decoding table: list of (symbol, nb_bits, baseline)."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high = size - 1
    counts = list(probs)
    for s, p in enumerate(counts):
        if p == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, p in enumerate(counts):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ZstdDecodeError("corrupt FSE distribution (spread)")
    nxt = [1 if p == -1 else p for p in counts]
    table = []
    for state in range(size):
        s = symbols[state]
        x = nxt[s]
        nxt[s] = x + 1
        nb = accuracy_log - (x.bit_length() - 1)
        table.append((s, nb, (x << nb) - size))
    return table


def _fse_parse_table(data: bytes, max_log: int):
    probs, log, consumed = _fse_read_distribution(data)
    if log > max_log:
        raise ZstdDecodeError(f"FSE accuracy log {log} > max {max_log}")
    return _fse_build_table(probs, log), log, consumed


# ------------------------------------------------------------------- Huffman


def _huf_build_table(weights: list[int]):
    """huff0 canonical table from explicit weights (last one implied
    by the caller already): -> (max_bits, flat table of (symbol,
    nb_bits) of size 1 << max_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = total.bit_length()  # total+last pow2 -> next power of two
    last = (1 << max_bits) - total
    if last & (last - 1):
        raise ZstdDecodeError("Huffman weights do not complete a power of 2")
    weights = weights + [last.bit_length()]
    table = [(0, 0)] * (1 << max_bits)
    # longer codes (lower weight) occupy lower table indices
    rank_pos = [0] * (max_bits + 2)
    count = [0] * (max_bits + 2)
    nbits = [0] * len(weights)
    for s, w in enumerate(weights):
        if w > 0:
            nbits[s] = max_bits + 1 - w
            count[nbits[s]] += 1
    pos = 0
    for nb in range(max_bits, 0, -1):
        rank_pos[nb] = pos
        pos += count[nb] * (1 << (max_bits - nb))
    for s, w in enumerate(weights):
        if w == 0:
            continue
        nb = nbits[s]
        span = 1 << (max_bits - nb)
        start = rank_pos[nb]
        for i in range(start, start + span):
            table[i] = (s, nb)
        rank_pos[nb] = start + span
    return max_bits, table


def _huf_read_weights(data: bytes) -> tuple[list[int], int]:
    """Huffman tree description -> (weights, bytes consumed)."""
    if not data:
        raise ZstdDecodeError("empty Huffman description")
    h = data[0]
    if h >= 128:  # direct: 4-bit weights, high nibble first
        n = h - 127
        nbytes = (n + 1) // 2
        blob = data[1 : 1 + nbytes]
        if len(blob) < nbytes:
            raise ZstdDecodeError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = blob[i >> 1]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + nbytes
    # FSE-compressed weights: h = compressed size
    blob = data[1 : 1 + h]
    if len(blob) < h:
        raise ZstdDecodeError("truncated FSE Huffman weights")
    table, log, consumed = _fse_parse_table(blob, _MAX_LOG["huf_weights"])
    bits = _BackwardBits(blob[consumed:])
    s1 = bits.read(log)
    s2 = bits.read(log)
    weights = []
    while True:
        sym, nb, base = table[s1]
        weights.append(sym)
        s1 = base + bits.read(nb)
        if bits.overflowed:
            weights.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        weights.append(sym)
        s2 = base + bits.read(nb)
        if bits.overflowed:
            weights.append(table[s1][0])
            break
    return weights, 1 + h


def _huf_decode_stream(data: bytes, max_bits: int, table, out_len: int) -> bytes:
    bits = _BackwardBits(data)
    out = bytearray()
    mask = (1 << max_bits) - 1
    # peek max_bits, consume entry bits: emulate with read/putback
    pos = bits.bitpos
    data_int_cache = None
    while len(out) < out_len:
        p = pos - max_bits
        if p >= 0:
            b0, b1 = p >> 3, (p + max_bits - 1) >> 3
            chunk = int.from_bytes(bits.data[b0 : b1 + 1], "little")
            idx = (chunk >> (p & 7)) & mask
        else:
            avail = max_bits + p
            if avail <= 0:
                idx = 0
            else:
                chunk = int.from_bytes(bits.data[0 : (avail + 7) >> 3], "little")
                idx = (chunk & ((1 << avail) - 1)) << (-p)
        sym, nb = table[idx]
        if nb == 0:
            raise ZstdDecodeError("corrupt Huffman stream (0-bit code)")
        out.append(sym)
        pos -= nb
        if pos < -max_bits:
            raise ZstdDecodeError("Huffman stream overrun")
    return bytes(out)


# ------------------------------------------------------------------ literals


def _decode_literals(block: bytes, prev_huf, pos: int = 0):
    """Literals section -> (literals bytes, bytes consumed, huf table
    to carry forward)."""
    b0 = block[pos]
    ltype = b0 & 3
    size_format = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif size_format == 1:
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            hdr = 2
        else:
            regen = (
                (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            )
            hdr = 3
        if ltype == 0:
            lit = block[pos + hdr : pos + hdr + regen]
            if len(lit) < regen:
                raise ZstdDecodeError("truncated raw literals")
            return bytes(lit), hdr + regen, prev_huf
        return bytes([block[pos + hdr]]) * regen, hdr + 1, prev_huf
    # compressed (2) / treeless (3)
    if size_format == 0:
        streams, hdr = 1, 3
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
    elif size_format == 1:
        streams, hdr = 4, 3
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
    elif size_format == 2:
        streams, hdr = 4, 4
        regen = (
            (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 3) << 12)
        )
        comp = (block[pos + 2] >> 2) | (block[pos + 3] << 6)
    else:
        streams, hdr = 4, 5
        regen = (
            (b0 >> 4)
            | (block[pos + 1] << 4)
            | ((block[pos + 2] & 0x3F) << 12)
        )
        comp = (
            (block[pos + 2] >> 6)
            | (block[pos + 3] << 2)
            | (block[pos + 4] << 10)
        )
    body = block[pos + hdr : pos + hdr + comp]
    if len(body) < comp:
        raise ZstdDecodeError("truncated compressed literals")
    off = 0
    if ltype == 2:
        weights, consumed = _huf_read_weights(body)
        huf = _huf_build_table(weights)
        off = consumed
    else:
        if prev_huf is None:
            raise ZstdDecodeError(
                "treeless literals with no previous Huffman table "
                "(block history or dictionary)"
            )
        huf = prev_huf
    max_bits, table = huf
    if streams == 1:
        lit = _huf_decode_stream(body[off:], max_bits, table, regen)
    else:
        if comp - off < 6:
            raise ZstdDecodeError("4-stream literals too short")
        s1 = int.from_bytes(body[off : off + 2], "little")
        s2 = int.from_bytes(body[off + 2 : off + 4], "little")
        s3 = int.from_bytes(body[off + 4 : off + 6], "little")
        starts = [off + 6, off + 6 + s1, off + 6 + s1 + s2,
                  off + 6 + s1 + s2 + s3]
        ends = starts[1:] + [comp]
        per = (regen + 3) // 4
        lens = [per, per, per, regen - 3 * per]
        parts = []
        for (a, b), ln in zip(zip(starts, ends), lens):
            parts.append(_huf_decode_stream(body[a:b], max_bits, table, ln))
        lit = b"".join(parts)
    return lit, hdr + comp, huf


# ----------------------------------------------------------------- sequences


def _parse_seq_table(block, pos, mode, kind, prev_tables, dict_tables):
    """One of the three sequence FSE tables by mode -> ((table, log) |
    ('rle', symbol), new pos)."""
    defaults = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}
    if mode == 0:
        probs, log = defaults[kind]
        return (_fse_build_table(probs, log), log), pos
    if mode == 1:
        return ("rle", block[pos]), pos + 1
    if mode == 2:
        table, log, consumed = _fse_parse_table(
            block[pos:], _MAX_LOG[kind]
        )
        return (table, log), pos + consumed
    prev = prev_tables.get(kind) or (dict_tables or {}).get(kind)
    if prev is None:
        raise ZstdDecodeError(
            f"repeat mode for {kind} with no previous table"
        )
    return prev, pos


def _seq_init_state(bits, spec):
    if spec[0] == "rle":
        return None
    table, log = spec
    return bits.read(log)


def _seq_symbol(spec, state):
    if spec[0] == "rle":
        return spec[1]
    return spec[0][state][0]


def _seq_update(bits, spec, state):
    if spec[0] == "rle":
        return None
    _, nb, base = spec[0][state]
    return base + bits.read(nb)


def _decode_sequences(block, pos, nseq, prev_tables, dict_tables):
    """Sequences section -> (list of (ll, offset_value, ml), tables to
    carry forward)."""
    modes = block[pos]
    if modes & 3:
        raise ZstdDecodeError("reserved sequence-mode bits set")
    pos += 1
    ll_spec, pos = _parse_seq_table(
        block, pos, (modes >> 6) & 3, "ll", prev_tables, dict_tables
    )
    of_spec, pos = _parse_seq_table(
        block, pos, (modes >> 4) & 3, "of", prev_tables, dict_tables
    )
    ml_spec, pos = _parse_seq_table(
        block, pos, (modes >> 2) & 3, "ml", prev_tables, dict_tables
    )
    bits = _BackwardBits(block[pos:])
    ll_state = _seq_init_state(bits, ll_spec)
    of_state = _seq_init_state(bits, of_spec)
    ml_state = _seq_init_state(bits, ml_spec)
    out = []
    for i in range(nseq):
        of_code = _seq_symbol(of_spec, of_state)
        if of_code > 31:
            raise ZstdDecodeError("offset code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = _seq_symbol(ml_spec, ml_state)
        ml_base, ml_bits = _ML_BASE[ml_code]
        ml = ml_base + bits.read(ml_bits)
        ll_code = _seq_symbol(ll_spec, ll_state)
        ll_base, ll_bits = _LL_BASE[ll_code]
        ll = ll_base + bits.read(ll_bits)
        out.append((ll, offset_value, ml))
        if i + 1 < nseq:
            ll_state = _seq_update(bits, ll_spec, ll_state)
            ml_state = _seq_update(bits, ml_spec, ml_state)
            of_state = _seq_update(bits, of_spec, of_state)
    tables = {"ll": ll_spec, "of": of_spec, "ml": ml_spec}
    return out, tables


def _execute_sequences(out, window_start, seqs, literals, reps):
    """Append literals/matches to ``out`` (which may hold dictionary
    content before ``window_start``); returns updated repeat
    offsets."""
    lit_pos = 0
    for ll, offset_value, ml in seqs:
        if ll:
            out += literals[lit_pos : lit_pos + ll]
            lit_pos += ll
        if offset_value > 3:
            offset = offset_value - 3
            reps = [offset, reps[0], reps[1]]
        else:
            idx = offset_value - 1
            if ll == 0:
                idx += 1
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps = [reps[1], reps[0], reps[2]]
            elif idx == 2:
                offset = reps[2]
                reps = [reps[2], reps[0], reps[1]]
            else:  # rep1 - 1
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdDecodeError("offset 0 from rep1-1")
                reps = [offset, reps[0], reps[1]]
        if offset > len(out):
            raise ZstdDecodeError(
                f"match offset {offset} beyond window ({len(out)} bytes "
                "incl. dictionary)"
            )
        if ml:
            start = len(out) - offset
            if offset >= ml:
                out += out[start : start + ml]
            else:  # overlapping copy replicates
                for i in range(ml):
                    out.append(out[start + i])
    out += literals[lit_pos:]
    return reps


# ------------------------------------------------------------- dictionaries


def parse_dictionary(data: bytes) -> dict:
    """Raw-content or structured (0xEC30A437) dictionary ->
    ``{content, dict_id, huf, tables, reps}`` (entropy fields None
    for raw-content dicts)."""
    if len(data) < 8 or int.from_bytes(data[:4], "little") != DICT_MAGIC:
        return {
            "content": data, "dict_id": 0, "huf": None,
            "tables": None, "reps": [1, 4, 8],
        }
    dict_id = int.from_bytes(data[4:8], "little")
    pos = 8
    weights, consumed = _huf_read_weights(data[pos:])
    huf = _huf_build_table(weights)
    pos += consumed
    tables = {}
    for kind in ("of", "ml", "ll"):
        table, log, consumed = _fse_parse_table(data[pos:], _MAX_LOG[kind])
        tables[kind] = (table, log)
        pos += consumed
    reps = [
        int.from_bytes(data[pos + 4 * i : pos + 4 * i + 4], "little")
        for i in range(3)
    ]
    pos += 12
    return {
        "content": data[pos:], "dict_id": dict_id, "huf": huf,
        "tables": tables, "reps": reps,
    }


# -------------------------------------------------------------- frame decode


def decompress_frame(frame: bytes, dict_bytes: bytes | None = None) -> bytes:
    """One zstd frame (starting at the 0xFD2FB528 magic) -> content
    bytes, with optional dictionary."""
    from vtk_reserves_spark.sources.zstd import parse_frame_header

    hdr = parse_frame_header(frame, 0)
    if hdr["kind"] != "zstd":
        raise ZstdDecodeError("not a zstd data frame")
    d = parse_dictionary(dict_bytes) if dict_bytes is not None else None
    if hdr["dict_id"] and d and d["dict_id"] and hdr["dict_id"] != d["dict_id"]:
        raise ZstdDecodeError(
            f"frame wants dictionary {hdr['dict_id']}, got {d['dict_id']}"
        )
    out = bytearray(d["content"] if d else b"")
    window_start = len(out)
    reps = list(d["reps"]) if d else [1, 4, 8]
    prev_huf = d["huf"] if d else None
    prev_tables: dict = {}
    dict_tables = d["tables"] if d else None
    pos = hdr["header_end"]
    n = len(frame)
    while True:
        if pos + 3 > n:
            raise ZstdDecodeError("truncated block header")
        h = frame[pos] | (frame[pos + 1] << 8) | (frame[pos + 2] << 16)
        pos += 3
        last, btype, bsize = h & 1, (h >> 1) & 3, h >> 3
        if btype == 0:
            out += frame[pos : pos + bsize]
            pos += bsize
        elif btype == 1:
            out += bytes([frame[pos]]) * bsize
            pos += 1
        elif btype == 2:
            block = frame[pos : pos + bsize]
            if len(block) < bsize:
                raise ZstdDecodeError("truncated compressed block")
            pos += bsize
            literals, consumed, prev_huf = _decode_literals(block, prev_huf)
            p = consumed
            b0 = block[p]
            if b0 == 0:
                nseq, p = 0, p + 1
            elif b0 < 128:
                nseq, p = b0, p + 1
            elif b0 < 255:
                nseq = ((b0 - 128) << 8) + block[p + 1]
                p += 2
            else:
                nseq = block[p + 1] + (block[p + 2] << 8) + 0x7F00
                p += 3
            if nseq == 0:
                out += literals
            else:
                seqs, prev_tables = _decode_sequences(
                    block, p, nseq, prev_tables, dict_tables
                )
                reps = _execute_sequences(
                    out, window_start, seqs, literals, reps
                )
        else:
            raise ZstdDecodeError("reserved block type")
        if last:
            break
    if hdr["checksum"]:
        pos += 4  # xxhash64 low 32 bits — parsed past, not verified
    content = bytes(out[window_start:])
    if hdr["content_size"] is not None and len(content) != hdr["content_size"]:
        raise ZstdDecodeError(
            f"frame content size mismatch: header {hdr['content_size']}, "
            f"decoded {len(content)}"
        )
    return content


def decompress(data: bytes, dict_bytes: bytes | None = None) -> bytes:
    """Concatenated frames -> bytes, everything on the pure decoder
    (the libzstd-routed entry point is `sources.zstd.decompress`)."""
    from vtk_reserves_spark.sources.zstd import split_frames

    out = []
    for h in split_frames(data):
        if h["kind"] == "skippable":
            continue
        out.append(
            decompress_frame(
                data[h["offset"] : h["offset"] + h["length"]], dict_bytes
            )
        )
    return b"".join(out)


# ------------------------------------------------- fixture encoder (tests)


def _fse_write_distribution(probs: list[int], accuracy_log: int) -> bytes:
    """Serialize an FSE NCount table description — the writer twin of
    `_fse_read_distribution` (FSE_writeNCount semantics), used to
    build structured-dictionary fixtures.  ``probs`` may contain -1
    entries and must sum (counting -1 as 1) to 1 << accuracy_log."""
    acc = 0
    bitpos = 0

    def put(v: int, nb: int) -> None:
        nonlocal acc, bitpos
        acc |= v << bitpos
        bitpos += nb

    put(accuracy_log - 5, 4)
    table_size = 1 << accuracy_log
    remaining = table_size + 1
    threshold = table_size
    nb_bits = accuracy_log + 1
    i = 0
    while remaining > 1 and i < len(probs):
        p = probs[i]
        i += 1
        count = p + 1
        cap = (2 * threshold - 1) - remaining
        if count < cap:
            put(count, nb_bits - 1)
        else:
            put(count + (cap if count >= threshold else 0), nb_bits)
        remaining -= -p if p < 0 else p
        if p == 0:
            run = 0
            while i < len(probs) and probs[i] == 0:
                run += 1
                i += 1
            while True:
                put(min(run, 3), 2)
                if run < 3:
                    break
                run -= 3
        while remaining < threshold and remaining > 1:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1 or i != len(probs):
        raise ValueError("probabilities do not sum to 1 << accuracy_log")
    return acc.to_bytes((bitpos + 7) // 8, "little")


def make_structured_dictionary(
    content: bytes, dict_id: int, reps: tuple[int, int, int] = (1, 4, 8)
) -> bytes:
    """A minimal valid structured (0xEC30A437) dictionary blob:
    direct-weight Huffman table over symbols 0-3, flat two-symbol FSE
    tables for offsets/match-lengths/literals-lengths, explicit repeat
    offsets, then ``content``.  Exercises `parse_dictionary`'s
    structured path (real trained dictionaries can't be produced
    in-container: pyarrow's buffer API has no training/dict entry
    point)."""
    out = bytearray()
    out += DICT_MAGIC.to_bytes(4, "little")
    out += dict_id.to_bytes(4, "little")
    # direct Huffman weights: 3 explicit symbols of weight 1 (symbol 3
    # implied, completing the power of two)
    out += bytes([127 + 3, 0x11, 0x10])
    dist = _fse_write_distribution([16, 16], 5)
    out += dist * 3  # of, ml, ll: flat over symbols {0, 1}
    for r in reps:
        out += r.to_bytes(4, "little")
    out += content
    return bytes(out)


def _literals_raw_section(lit: bytes) -> bytes:
    n = len(lit)
    if n < 32:
        return bytes([(n << 3) | 0]) + lit
    if n < 4096:
        return bytes([((n & 0xF) << 4) | 0x04, n >> 4]) + lit
    return bytes(
        [((n & 0xF) << 4) | 0x0C, (n >> 4) & 0xFF, n >> 12]
    ) + lit


def _backward_stream(fields: list[tuple[int, int]]) -> bytes:
    """(value, nbits) fields in READ order -> backward bitstream bytes
    (sentinel topped, low-padded to a byte boundary)."""
    acc = 1
    for v, nb in fields:
        if v >> nb:
            raise ValueError("field value wider than its bit count")
        acc = (acc << nb) | v
    pad = (-acc.bit_length()) % 8
    acc <<= pad
    return acc.to_bytes((acc.bit_length() + 7) // 8, "little")


def encode_frame_fixture(
    parts: list[tuple[bytes, int, int]],
    dict_id: int = 0,
    content_size: int | None = None,
) -> bytes:
    """Hand-built single-block zstd frame for dictionary tests.

    ``parts``: sequence of (literals, match_offset, match_length);
    offsets may reach into dictionary content.  Encoded as ONE
    compressed block: raw literals + RLE sequence-code modes (one
    sequence per part, codes shared — so all parts must yield the
    same (ll_code, of_code, ml_code) triple; the helper validates).
    match_length 0 on the final part means trailing literals only."""
    seq_parts = [p for p in parts if p[2] > 0]
    trailing = b"".join(p[0] for p in parts[len(seq_parts):])
    if any(p[2] > 0 for p in parts[len(seq_parts):]):
        raise ValueError("match-bearing part after the trailing literals")
    literals = b"".join(p[0] for p in seq_parts) + trailing
    codes = set()
    fields: list[tuple[int, int]] = []
    for lit, off, ml in seq_parts:
        ll = len(lit)
        ll_code = next(
            i for i in range(len(_LL_BASE) - 1, -1, -1)
            if _LL_BASE[i][0] <= ll
            and ll - _LL_BASE[i][0] < (1 << _LL_BASE[i][1])
        )
        ml_code = next(
            i for i in range(len(_ML_BASE) - 1, -1, -1)
            if _ML_BASE[i][0] <= ml
            and ml - _ML_BASE[i][0] < (1 << _ML_BASE[i][1])
        )
        offset_value = off + 3
        of_code = offset_value.bit_length() - 1
        codes.add((ll_code, of_code, ml_code))
        fields.append((offset_value - (1 << of_code), of_code))
        fields.append((ml - _ML_BASE[ml_code][0], _ML_BASE[ml_code][1]))
        fields.append((ll - _LL_BASE[ll_code][0], _LL_BASE[ll_code][1]))
    if len(codes) > 1:
        raise ValueError(
            f"RLE sequence modes need uniform codes, got {sorted(codes)}"
        )
    block = _literals_raw_section(literals)
    if seq_parts:
        ll_code, of_code, ml_code = codes.pop()
        nseq = len(seq_parts)
        if nseq >= 128:
            raise ValueError("fixture encoder caps at 127 sequences")
        block += bytes([nseq])
        block += bytes([0b01_01_01_00])  # RLE mode for LL / OF / ML
        block += bytes([ll_code, of_code, ml_code])
        block += _backward_stream(fields)
    else:
        block += b"\x00"  # zero sequences
    # frame header
    fhd = 0
    body = b""
    did_flag = 0
    if dict_id:
        if dict_id < 256:
            did_flag = 1
            body += dict_id.to_bytes(1, "little")
        elif dict_id < 65536:
            did_flag = 2
            body += dict_id.to_bytes(2, "little")
        else:
            did_flag = 3
            body += dict_id.to_bytes(4, "little")
    fhd |= did_flag
    header = bytes([fhd | 0]) + bytes([0x88]) + body  # window descr 0x88
    bh = (len(block) << 3) | (2 << 1) | 1  # compressed, last
    frame = (
        b"\x28\xb5\x2f\xfd" + header + bh.to_bytes(3, "little") + block
    )
    return frame
