"""WebP codec front-end — pure python/numpy, no libwebp.

WebP is the second most common image format in modern web crawls;
this decodes the LOSSLESS variant (VP8L bitstream, a public Google
specification) end-to-end: LSB-first bit reading, canonical prefix
codes (simple + code-length-coded, with 16/17/18 repeats), meta-prefix
images, the color cache, LZ77 backward references with the 2-D
distance map, and all four transforms (predictor, color,
subtract-green, color-indexing incl. sub-byte pixel bundling).

LOSSY WebP ('VP8 ' chunks) dispatches to the key-frame VP8 decoder
in ``sources/vp8.py`` (RFC 6386: boolean coder, intra prediction,
token decode, inverse WHT/DCT, loop filter) and converts the decoded
YUV 4:2:0 to RGBA with a documented integer BT.601 closed form.
ANIMATED WebP (VP8X/ANIM/ANMF) decodes via :func:`decode_webp_frames`
with full canvas compositing (blend + dispose).  ALPH chunks beside
lossy frames are decoded too (raw or headerless-VP8L compression,
all four spatial filters) and applied to the RGBA output.

The companion :func:`encode_webp` writes a valid minimal VP8L stream
(optional subtract-green + run-LZ77, flat 8-bit literal codes), and
``vp8.encode_webp_lossy`` writes genuine lossy key frames, so both
paths round-trip without external libraries.

Like the other codecs this runs INSIDE Arrow-batched executors
(`operators/multimodal.py`), one payload at a time.
"""

from __future__ import annotations

import struct

import numpy as np

#: order in which code-length code lengths are transmitted
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

def _lz77_value(prefix: int, br) -> int:
    """Length/distance prefix code -> value (spec 'LZ77 prefix coding')."""
    if prefix < 4:
        return prefix + 1
    extra_bits = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


#: 2-D distance map: the first 120 distance codes address nearby pixels
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Huffman:
    """Canonical prefix code from code lengths (DEFLATE convention);
    decoded bit-by-bit (codes are at most 15 bits, streams are small
    relative to the Arrow batch around them)."""

    __slots__ = ("lookup", "single")

    def __init__(self, lengths):
        lengths = list(lengths)
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L prefix code defines no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            self.lookup = None
            return
        self.single = None
        # canonical code assignment
        max_len = max(l for l, _ in used)
        bl_count = [0] * (max_len + 1)
        for l, _ in used:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        self.lookup = {}
        for sym, l in enumerate(lengths):
            if l > 0:
                self.lookup[(l, next_code[l])] = sym
                next_code[l] += 1

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("corrupt VP8L prefix code")


def _read_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    """One prefix code: 'simple' (1-2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        num = br.read(1) + 1
        first_bits = 8 if br.read(1) else 1
        syms = [br.read(first_bits)]
        if num == 2:
            syms.append(br.read(8))
        lengths = [0] * alphabet_size
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("VP8L simple code symbol out of range")
        h = _Huffman.__new__(_Huffman)
        if num == 1:
            h.single = syms[0]
            h.lookup = None
            return h
        # two 1-bit codes assigned in LISTED order (libwebp convention),
        # which canonical-by-symbol ordering would get wrong when the
        # stream lists the larger symbol first
        h.single = None
        h.lookup = {(1, 0): syms[0], (1, 1): syms[1]}
        return h
    num_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl = _Huffman(cl_lengths)
    # optional explicit limit on the number of coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huffman(lengths)


def _read_group(br: _BitReader, cache_bits: int):
    """The 5 prefix codes of one meta-group."""
    return [
        _read_code(br, 256 + 24 + (1 << cache_bits if cache_bits else 0)),
        _read_code(br, 256),
        _read_code(br, 256),
        _read_code(br, 256),
        _read_code(br, 40),
    ]


def _decode_entropy_image(br: _BitReader, w: int, h: int, for_transform: bool):
    """Spatially-coded ARGB sub-image (used by meta-prefix images and
    the predictor/color transforms)."""
    return _decode_image(br, w, h, allow_meta=False, allow_transforms=False)


def _decode_image(br, w, h, allow_meta=True, allow_transforms=True):
    """Core VP8L image decode -> uint32 ARGB array (h, w)."""
    transforms = []
    xsize = w
    if allow_transforms:
        while br.read(1):
            ttype = br.read(2)
            if ttype in (0, 1):  # predictor / color transform
                size_bits = br.read(3) + 2
                bw = -(-xsize // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub = _decode_entropy_image(br, bw, bh, True)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append((2, 0, None))
            else:  # color indexing (palette)
                n_colors = br.read(8) + 1
                pal = _decode_entropy_image(br, n_colors, 1, True)[0]
                # palette is delta-coded left-to-right per channel
                p = pal.view()
                acc = np.zeros(4, np.uint8)
                out_pal = np.zeros(n_colors, np.uint32)
                for i in range(n_colors):
                    b = np.array(
                        [
                            (pal[i] >> 24) & 0xFF,
                            (pal[i] >> 16) & 0xFF,
                            (pal[i] >> 8) & 0xFF,
                            pal[i] & 0xFF,
                        ],
                        np.uint16,
                    )
                    acc = ((acc + b) & 0xFF).astype(np.uint8)
                    out_pal[i] = (
                        (int(acc[0]) << 24)
                        | (int(acc[1]) << 16)
                        | (int(acc[2]) << 8)
                        | int(acc[3])
                    )
                if n_colors <= 2:
                    pbits = 3  # 8 pixels per byte
                elif n_colors <= 4:
                    pbits = 2
                elif n_colors <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append((3, pbits, out_pal))
                xsize = -(-xsize // (1 << pbits))

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color-cache size {cache_bits}")
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):  # meta-prefix image present
        meta_bits = br.read(3) + 2
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _decode_entropy_image(br, mw, mh, True)
        ids = ((meta >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(ids.max()) + 1
        meta = ids
    groups = [_read_group(br, cache_bits) for _ in range(n_groups)]

    argb = np.zeros(h * xsize, np.uint32)
    n = h * xsize
    pos = 0
    while pos < n:
        x, y = pos % xsize, pos // xsize
        if meta is not None:
            g = groups[meta[y >> meta_bits, x >> meta_bits]]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:  # literal: G then R, B, A
            r = g[1].decode(br)
            b = g[2].decode(br)
            a = g[3].decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            argb[pos] = px
            if cache is not None:
                cache[((px * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _lz77_value(s - 256, br)
            dist_prefix = g[4].decode(br)
            dist_code = _lz77_value(dist_prefix, br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if length > n - pos or dist > pos:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(argb[pos - dist])
                argb[pos] = px
                if cache is not None:
                    cache[((px * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            argb[pos] = cache[s - 256 - 24]
            pos += 1
    argb = argb.reshape(h, xsize)

    for ttype, pbits, payload in reversed(transforms):
        if ttype == 2:  # add green back to red/blue
            gch = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + gch) & 0xFF
            b = ((argb & 0xFF) + gch) & 0xFF
            argb = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
        elif ttype == 3:  # color indexing
            pal = payload
            if pbits:
                per = 1 << pbits
                ibits = 8 >> pbits
                idx = (argb >> 8) & 0xFF
                wide = np.zeros((h, xsize * per), np.uint32)
                for k in range(per):
                    wide[:, k::per] = (idx >> (k * ibits)) & ((1 << ibits) - 1)
                idx = wide[:, :w]
            else:
                idx = (argb >> 8) & 0xFF
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("VP8L palette index out of range")
            argb = pal[idx.astype(np.int64)]
        elif ttype == 0:  # predictor transform
            argb = _undo_predictor(argb, payload, pbits, w)
        else:  # color transform
            argb = _undo_color_transform(argb, payload, pbits)
    return argb


def _px(argb, y, x):
    return int(argb[y, x])


def _avg2(a, b):
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((a & 0xFF) + (b & 0xFF)) // 2
    )


def _clamp_add_sub_full(a, b, c):
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) - ((c >> shift) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << shift
    return out


def _clamp_add_sub_half(a, b):
    out = 0
    for shift in (24, 16, 8, 0):
        ave = (((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) // 2
        # spec: clamp(ave + (ave - c) / 2) with c the third pixel — the
        # caller passes b = c here via the two-arg form below
        out |= ave << shift
    return out


#: predictor modes whose inputs all sit on the PREVIOUS row (or are
#: constants) — safe to vectorize over a whole same-mode run; mode 1
#: (L) is also vectorized as a per-channel cumulative sum.  The rest
#: (5, 6, 7, 10, 11, 12, 13) read the just-decoded left pixel through a
#: nonlinear function and stay scalar.
_ROW_VECTOR_MODES = frozenset({0, 2, 3, 4, 8, 9})

_SHIFTS = (24, 16, 8, 0)


def _undo_predictor_run(out, res, y, x0, x1, mode, xs):
    """Vectorized inverse predictor for one same-mode run on row y>0,
    columns [x0, x1) with x0 >= 1.  Only called for modes whose
    predictor is a pure function of row y-1 (or, for mode 1, a linear
    chain along the row)."""
    prev = out[y - 1]
    r = res[y, x0:x1]
    acc = np.zeros(x1 - x0, np.int64)
    if mode == 3 or mode == 9:
        idx = np.arange(x0 + 1, x1 + 1)
        wrap = idx[-1] >= xs
        if wrap:
            idx[-1] = 0
        tr = prev[idx]
        if wrap:
            # last column: TR wraps to the CURRENT row's first pixel —
            # libwebp's in-place row layout (upper[w] physically reads
            # out[y][0], reconstructed by the per-row x==0 step)
            tr = tr.copy()
            tr[-1] = out[y, 0]
    if mode == 1:
        seed = int(out[y, x0 - 1])
    for shift in _SHIFTS:
        rc = (r >> shift) & 0xFF
        if mode == 0:
            pc = 0xFF if shift == 24 else 0
        elif mode == 1:  # L-chain == cumulative sum seeded by the left pixel
            c = (np.cumsum(rc) + ((seed >> shift) & 0xFF)) & 0xFF
            acc |= c << shift
            continue
        elif mode == 2:
            pc = (prev[x0:x1] >> shift) & 0xFF
        elif mode == 3:
            pc = (tr >> shift) & 0xFF
        elif mode == 4:
            pc = (prev[x0 - 1 : x1 - 1] >> shift) & 0xFF
        elif mode == 8:
            pc = (((prev[x0 - 1 : x1 - 1] >> shift) & 0xFF) + ((prev[x0:x1] >> shift) & 0xFF)) // 2
        else:  # mode 9
            pc = (((prev[x0:x1] >> shift) & 0xFF) + ((tr >> shift) & 0xFF)) // 2
        acc |= ((rc + pc) & 0xFF) << shift
    out[y, x0:x1] = acc


def _undo_predictor(argb, sub, size_bits, w):
    h, xs = argb.shape
    res = argb.astype(np.int64)
    out = res.copy()

    def sel(l, t, tl):
        # Select predictor: choose l or t by Manhattan gradient.
        # STRICT < — the spec picks L only when its distance is
        # strictly smaller (RFC 9649 Select(): ``if (pL < pT)``);
        # ties go to T.  An earlier <= mis-picked L on ties.
        p_alpha = abs(((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF)) - abs(((l >> 24) & 0xFF) - ((tl >> 24) & 0xFF))
        p_red = abs(((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)) - abs(((l >> 16) & 0xFF) - ((tl >> 16) & 0xFF))
        p_green = abs(((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)) - abs(((l >> 8) & 0xFF) - ((tl >> 8) & 0xFF))
        p_blue = abs((t & 0xFF) - (tl & 0xFF)) - abs((l & 0xFF) - (tl & 0xFF))
        return l if (p_alpha + p_red + p_green + p_blue) < 0 else t

    def cas_half(a, b, c):
        out_v = 0
        for shift in (24, 16, 8, 0):
            ave2 = (((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) // 2
            cv = (c >> shift) & 0xFF
            # (ave2 - cv) / 2 with C TRUNCATION toward zero (the spec's
            # AddSubtractComponentHalf is C integer division; Python's
            # floor // rounds negative odd differences one lower)
            d = ave2 - cv
            v = ave2 + (d // 2 if d >= 0 else -((-d) // 2))
            v = 0 if v < 0 else (255 if v > 255 else v)
            out_v |= v << shift
        return out_v

    # validate every referenced mode up front (the vector path would
    # otherwise fall through to the scalar branch table silently)
    used_modes = np.unique((sub >> 8) & 0xFF)
    if int(used_modes.max(initial=0)) > 13:
        raise ValueError(f"bad VP8L predictor mode {int(used_modes.max())}")

    # row 0: every pixel predicts L (pixel 0 predicts opaque black),
    # which is a per-channel cumulative sum
    acc = np.zeros(xs, np.int64)
    for shift in _SHIFTS:
        init = 0xFF if shift == 24 else 0
        acc |= ((np.cumsum((res[0] >> shift) & 0xFF) + init) & 0xFF) << shift
    out[0] = acc

    block = 1 << size_bits
    for y in range(1, h):
        # x == 0 predicts T regardless of mode
        v = int(res[y, 0])
        t = int(out[y - 1, 0])
        px = 0
        for shift in _SHIFTS:
            px |= ((((v >> shift) & 0xFF) + ((t >> shift) & 0xFF)) & 0xFF) << shift
        out[y, 0] = px

        if xs == 1:
            continue
        mode_blocks = ((sub[y >> size_bits] >> 8) & 0xFF).astype(np.int64)
        mode_px = np.repeat(mode_blocks, block)[1:xs]  # mode at x in [1, xs)
        present = np.unique(mode_px)
        if np.isin(present, (0, 1, 2, 3, 4, 8, 9)).all():
            # whole-row vector path: every predictor reads only row y-1
            # (mode-1 chains are patched below with seeded cumsums)
            prev = out[y - 1]
            t = prev[1:xs]
            tl = prev[: xs - 1]
            tr = np.empty_like(t)
            tr[:-1] = prev[2:xs]
            # last column: TR wraps to the CURRENT row's first pixel
            # (libwebp upper[w] aliases out[y][0], written just above)
            tr[-1] = out[y, 0]
            vec_present = [int(m) for m in present if m != 1]
            uniform = len(vec_present) == 1 and 1 not in present
            masks = None if uniform else {m: mode_px == m for m in vec_present}
            packed = np.zeros(xs - 1, np.int64)
            for shift in _SHIFTS:
                tc = (t >> shift) & 0xFF
                tlc = (tl >> shift) & 0xFF
                trc = (tr >> shift) & 0xFF
                choice = {
                    0: lambda: 0xFF if shift == 24 else 0,
                    2: lambda: tc,
                    3: lambda: trc,
                    4: lambda: tlc,
                    8: lambda: (tlc + tc) // 2,
                    9: lambda: (tc + trc) // 2,
                }
                if uniform:
                    pred = choice[vec_present[0]]()
                else:
                    pred = np.zeros(xs - 1, np.int64)
                    for m in vec_present:
                        np.copyto(pred, choice[m](), where=masks[m])
                packed |= ((((res[y, 1:] >> shift) & 0xFF) + pred) & 0xFF) << shift
            out[y, 1:] = packed
            if 1 in present:
                m1 = np.concatenate(([0], (mode_px == 1).view(np.int8), [0]))
                d = np.diff(m1)
                for a, b in zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1)):
                    _undo_predictor_run(out, res, y, a + 1, b + 1, 1, xs)
            continue
        x = 1
        while x < xs:
            mode = int(mode_blocks[x >> size_bits])
            # extend the run across consecutive same-mode blocks
            x1 = min(((x >> size_bits) + 1) * block, xs)
            while x1 < xs and int(mode_blocks[x1 >> size_bits]) == mode:
                x1 = min(x1 + block, xs)
            if mode in _ROW_VECTOR_MODES or mode == 1:
                _undo_predictor_run(out, res, y, x, x1, mode, xs)
                x = x1
                continue
            for xi in range(x, x1):
                L = int(out[y, xi - 1])
                T = int(out[y - 1, xi])
                TL = int(out[y - 1, xi - 1])
                TR = int(out[y - 1, xi + 1]) if xi + 1 < xs else int(out[y, 0])
                if mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = sel(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                else:  # mode 13 (validated above)
                    pred = cas_half(L, T, TL)
                v = int(res[y, xi])
                pxv = 0
                for shift in _SHIFTS:
                    pxv |= ((((v >> shift) & 0xFF) + ((pred >> shift) & 0xFF)) & 0xFF) << shift
                out[y, xi] = pxv
            x = x1
    return out.astype(np.uint32)


def _cdelta(t, c):
    """Color-transform delta: (signed t * signed c) >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _undo_color_transform(argb, sub, size_bits):
    """Vectorized inverse color transform: per-block multipliers expand
    to per-pixel arrays; no sequential dependency exists (unlike the
    predictor transform), so megapixel photos stay numpy-speed."""
    h, xs = argb.shape
    yy = np.arange(h) >> size_bits
    xx = np.arange(xs) >> size_bits
    cx = sub[np.ix_(yy, xx)].astype(np.int64)

    def signed(v):
        return np.where(v >= 128, v - 256, v)

    g2r = signed((cx >> 8) & 0xFF)
    g2b = signed((cx >> 16) & 0xFF)
    r2b = signed((cx >> 24) & 0xFF)
    a64 = argb.astype(np.int64)
    g = signed((a64 >> 8) & 0xFF)
    r = ((a64 >> 16) & 0xFF)
    b = a64 & 0xFF
    r = (r + ((g2r * g) >> 5)) & 0xFF
    rs = signed(r)
    b = (b + ((g2b * g) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return ((a64 & 0xFF00FF00) | (r << 16) | b).astype(np.uint32)


def _iter_chunks(data: bytes, pos: int, end: int):
    """RIFF sub-chunk walk: yields (tag, body) honoring the odd-size pad."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError("truncated WebP chunk")
        yield tag, data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def _decode_vp8l_payload(body: bytes) -> np.ndarray:
    """VP8L chunk body -> (h, w, 4) uint8 RGBA."""
    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    argb = _decode_image(br, w, h)
    out = np.zeros((h, w, 4), np.uint8)
    out[:, :, 0] = (argb >> 16) & 0xFF  # R
    out[:, :, 1] = (argb >> 8) & 0xFF  # G
    out[:, :, 2] = argb & 0xFF  # B
    out[:, :, 3] = (argb >> 24) & 0xFF  # A
    return out


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane (container spec): header
    byte = rsv(2) | preprocessing(2) | filter(2) | compression(2);
    compression 0 = raw bytes, 1 = headerless VP8L stream whose GREEN
    channel carries alpha; then the inverse of the spatial filter
    (none / horizontal / vertical / gradient, libwebp border rules:
    row 0 is always a left-chain seeded with 0, and x==0 predicts from
    the pixel above).  Preprocessing is encoder-side lossy level
    reduction — nothing to invert."""
    if not body:
        raise ValueError("empty ALPH chunk")
    b0 = body[0]
    method = b0 & 3
    filt = (b0 >> 2) & 3
    if method == 0:
        if len(body) - 1 < w * h:
            raise ValueError("raw ALPH payload shorter than width*height")
        a = (
            np.frombuffer(body[1 : 1 + w * h], np.uint8)
            .reshape(h, w)
            .astype(np.int32)
        )
    elif method == 1:
        br = _BitReader(body[1:])
        argb = _decode_image(br, w, h, allow_meta=False, allow_transforms=True)
        a = ((argb >> 8) & 0xFF).astype(np.int32)
    else:
        raise ValueError(f"bad ALPH compression method {method}")
    if filt == 0:
        return a.astype(np.uint8)
    out = np.zeros((h, w), np.int32)
    # row 0: all filters degrade to a left-chain seeded with 0
    out[0] = np.cumsum(a[0]) & 0xFF
    for y in range(1, h):
        if filt == 1:  # horizontal: x==0 predicts from above
            out[y] = (np.cumsum(a[y]) + out[y - 1, 0]) & 0xFF
        elif filt == 2:  # vertical
            out[y] = (a[y] + out[y - 1]) & 0xFF
        else:  # gradient
            for x in range(w):
                if x == 0:
                    pred = out[y - 1, 0]
                else:
                    g = out[y, x - 1] + out[y - 1, x] - out[y - 1, x - 1]
                    pred = 0 if g < 0 else (255 if g > 255 else g)
                out[y, x] = (a[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def encode_alpha_chunk(alpha: np.ndarray, filt: int = 0) -> bytes:
    """(h, w) uint8 alpha -> raw-compression ALPH chunk body with the
    chosen spatial filter applied (fixture/test encoder)."""
    a = alpha.astype(np.int32)
    h, w = a.shape
    if filt == 0:
        return bytes([0]) + alpha.astype(np.uint8).tobytes()
    res = np.zeros_like(a)
    for y in range(h):
        for x in range(w):
            if y == 0:  # all filters: row 0 is a left-chain seeded 0
                pred = 0 if x == 0 else a[0, x - 1]
            elif filt == 1:
                pred = a[y, x - 1] if x else a[y - 1, 0]
            elif filt == 2:
                pred = a[y - 1, x]
            else:
                if x == 0:
                    pred = a[y - 1, 0]
                else:
                    g = a[y, x - 1] + a[y - 1, x] - a[y - 1, x - 1]
                    pred = 0 if g < 0 else (255 if g > 255 else g)
            res[y, x] = (a[y, x] - pred) & 0xFF
    return bytes([filt << 2]) + res.astype(np.uint8).tobytes()


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 RGBA — lossless (VP8L) or lossy
    (VP8 key frame via ``sources/vp8.py``, with an optional ALPH
    alpha plane applied).  For an animated WebP this is the FIRST
    composited canvas frame (the GIF convention in this codebase); use
    :func:`decode_webp_frames` for the full animation."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) stream")
    alpha_body = None
    for tag, body in _iter_chunks(data, 12, len(data)):
        if tag == b"ALPH":
            alpha_body = body
        elif tag == b"VP8L":
            return _decode_vp8l_payload(body)
        elif tag == b"VP8 ":
            from vtk_reserves_spark.sources.vp8 import decode_vp8_rgba

            img = decode_vp8_rgba(body)
            if alpha_body is not None:
                img = img.copy()
                img[:, :, 3] = _decode_alpha(
                    alpha_body, img.shape[1], img.shape[0]
                )
            return img
        elif tag in (b"ANIM", b"ANMF"):
            frames, _durations, _loop = decode_webp_frames(data)
            return frames[0]
    raise ValueError("WebP container has no VP8L or VP8 chunk")


def decode_webp_frames(data: bytes):
    """Animated (or still) WebP -> ``(frames, durations_ms, loop_count)``
    with frames a uint8 array ``(n, h, w, 4)`` of fully composited RGBA
    canvases — the WebP twin of ``gif.decode_gif``.

    Implements the public container spec: VP8X canvas geometry, the
    ANIM chunk's background color + loop count, and per-ANMF frame
    rectangles with both blending methods (alpha 'over' blend / no
    blend) and dispose-to-background.  The canvas starts as the ANIM
    background color.  Frame bitstreams may be lossless (VP8L) or
    lossy (VP8 key frames, via ``sources/vp8.py``)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) stream")
    canvas_w = canvas_h = None
    bg = np.zeros(4, np.uint8)
    loop_count = 0
    frames = []
    durations = []
    canvas = None
    saw_anim = False
    for tag, body in _iter_chunks(data, 12, len(data)):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("short VP8X chunk")
            canvas_w = 1 + int.from_bytes(body[4:7], "little")
            canvas_h = 1 + int.from_bytes(body[7:10], "little")
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("short ANIM chunk")
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]  # BGRA
            bg = np.array([r_, g_, b_, a_], np.uint8)
            loop_count = struct.unpack("<H", body[4:6])[0]
            saw_anim = True
        elif tag == b"ANMF":
            if not saw_anim or canvas_w is None:
                raise ValueError("ANMF frame outside an animated WebP")
            if len(body) < 16:
                raise ValueError("short ANMF chunk")
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            if fx + fw > canvas_w or fy + fh > canvas_h:
                raise ValueError(
                    f"WebP frame rectangle {fw}x{fh}@({fx},{fy}) exceeds "
                    f"the {canvas_w}x{canvas_h} canvas"
                )
            img = None
            frame_alpha = None
            for ftag, fbody in _iter_chunks(body, 16, len(body)):
                if ftag == b"ALPH":
                    frame_alpha = fbody
                elif ftag == b"VP8L":
                    img = _decode_vp8l_payload(fbody)
                    break
                elif ftag == b"VP8 ":
                    from vtk_reserves_spark.sources.vp8 import decode_vp8_rgba

                    img = decode_vp8_rgba(fbody)
                    if frame_alpha is not None:
                        img[:, :, 3] = _decode_alpha(
                            frame_alpha, img.shape[1], img.shape[0]
                        )
                    break
            if img is None:
                raise ValueError("ANMF frame has no VP8L/VP8 bitstream")
            if img.shape[:2] != (fh, fw):
                raise ValueError("ANMF geometry disagrees with its bitstream")
            if canvas is None:
                canvas = np.empty((canvas_h, canvas_w, 4), np.uint8)
                canvas[:] = bg
            region = canvas[fy : fy + fh, fx : fx + fw]
            if no_blend:
                region[:] = img
            else:
                # spec 'over' blend on straight (non-premultiplied) alpha
                sa = img[:, :, 3:4].astype(np.float64) / 255.0
                da = region[:, :, 3:4].astype(np.float64) / 255.0
                oa = sa + da * (1.0 - sa)
                rgb = img[:, :, :3] * sa + region[:, :, :3] * da * (1.0 - sa)
                safe = np.where(oa == 0.0, 1.0, oa)
                region[:, :, :3] = np.rint(rgb / safe).astype(np.uint8)
                region[:, :, 3] = np.rint(oa[:, :, 0] * 255.0).astype(np.uint8)
            frames.append(canvas.copy())
            durations.append(dur)
            if dispose_bg:
                canvas[fy : fy + fh, fx : fx + fw] = bg
        elif tag == b"VP8L":
            return _decode_vp8l_payload(body)[None, ...], [0], 0
        elif tag == b"VP8 ":
            from vtk_reserves_spark.sources.vp8 import decode_vp8_rgba

            return decode_vp8_rgba(body)[None, ...], [0], 0
    if not frames:
        raise ValueError("WebP container has no VP8L or ANMF chunks")
    return np.stack(frames), durations, loop_count


# ---------------------------------------------------------------------------
# minimal encoder (round-trip fixtures / export)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _emit_lengths(bw: _BitWriter, lengths: list):
    """Write a code-length-coded prefix code whose lengths take values
    in {0, 8, 9} (enough for the flat-ish codes the encoder uses)."""
    bw.write(0, 1)  # not simple
    used = set(lengths) | {0}
    assert used <= {0, 8, 9}, used
    # cl-code lengths: 8 -> 1 bit, 0 -> 2 bits, 9 -> 2 bits
    cl_len = {8: 1, 0: 2, 9: 2}
    # num_codes must reach order index of symbol 9 (=12) -> 13
    bw.write(13 - 4, 4)
    for i in range(13):
        sym = _CLC_ORDER[i]
        bw.write(cl_len.get(sym, 0) if sym in (0, 8, 9) else 0, 3)
    bw.write(0, 1)  # no max-symbol limit
    # canonical cl codes by (length, symbol): (1,8)->0; (2,0)->10; (2,9)->11
    emit = {8: (0b0, 1), 0: (0b10, 2), 9: (0b11, 2)}
    for l in lengths:
        code, n = emit[l]
        for k in range(n - 1, -1, -1):
            bw.write((code >> k) & 1, 1)


def _code_table(lengths: list) -> dict:
    """symbol -> (code, length) for canonical codes (encode side)."""
    h = _Huffman(lengths)
    return {sym: (code, l) for (l, code), sym in h.lookup.items()}


def _put_sym(bw: _BitWriter, table: dict, sym: int):
    code, n = table[sym]
    for k in range(n - 1, -1, -1):
        bw.write((code >> k) & 1, 1)


def _write_single_code(bw: _BitWriter, symbol: int):
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


#: green-code lengths covering literals AND the 24 length prefixes:
#: 232 eight-bit + 48 nine-bit codes (Kraft: 232/256 + 48/512 = 1)
_GREEN_LENGTHS = [8] * 232 + [9] * 48
_FLAT_LENGTHS = [8] * 256


def encode_webp(
    img: np.ndarray, subtract_green: bool = False, use_lz77_runs: bool = False
) -> bytes:
    """(h, w, 3|4) or (h, w) uint8 -> lossless WebP (VP8L) bytes.

    Minimal valid stream: optional subtract-green transform, one prefix
    group, near-flat literal codes (correctness over ratio).
    ``use_lz77_runs`` emits distance-1 backward references for runs in
    scan order, exercising the decoder's LZ77 + 2-D distance-map path."""
    payload = _encode_vp8l_payload(img, subtract_green, use_lz77_runs)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _encode_vp8l_payload(
    img: np.ndarray, subtract_green: bool = False, use_lz77_runs: bool = False
) -> bytes:
    a = np.asarray(img, np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.shape[2] == 3:
        a = np.dstack([a, np.full(a.shape[:2], 255, np.uint8)])
    h, w, _ = a.shape
    r = a[:, :, 0].astype(np.int32)
    g = a[:, :, 1].astype(np.int32)
    b = a[:, :, 2].astype(np.int32)
    alp = a[:, :, 3].astype(np.int32)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # a transform follows
        bw.write(2, 2)  # subtract-green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-prefix image
    _emit_lengths(bw, _GREEN_LENGTHS)
    for _ in range(3):
        _emit_lengths(bw, _FLAT_LENGTHS)
    # distance code: single symbol 1 -> dist_code 2 -> 2-D map (1, 0),
    # i.e. the previous pixel in scan order (symbol emission costs 0 bits)
    _write_single_code(bw, 1)

    green_tbl = _code_table(_GREEN_LENGTHS)
    flat_tbl = _code_table(_FLAT_LENGTHS)

    flat = list(
        zip(g.ravel().tolist(), r.ravel().tolist(), b.ravel().tolist(),
            alp.ravel().tolist())
    )
    i = 0
    n = len(flat)
    while i < n:
        if use_lz77_runs and i > 0 and flat[i] == flat[i - 1]:
            run = 1
            while i + run < n and flat[i + run] == flat[i] and run < 8:
                run += 1
            if run >= 2:
                if run <= 4:
                    _put_sym(bw, green_tbl, 256 + run - 1)
                else:
                    # prefix 4 covers 5-6 (1 extra bit), prefix 5: 7-8
                    prefix = 4 if run <= 6 else 5
                    base = 5 if run <= 6 else 7
                    _put_sym(bw, green_tbl, 256 + prefix)
                    bw.write(run - base, 1)
                i += run
                continue
        gg, rr, bb, aa = flat[i]
        _put_sym(bw, green_tbl, gg)
        _put_sym(bw, flat_tbl, rr)
        _put_sym(bw, flat_tbl, bb)
        _put_sym(bw, flat_tbl, aa)
        i += 1

    return b"\x2f" + bw.finish()


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def encode_webp_anim(
    frames,
    durations_ms=None,
    loop_count: int = 0,
    bg=(255, 255, 255, 255),
    offsets=None,
    blend: bool = False,
    dispose: bool = False,
    canvas_size=None,
    subtract_green: bool = False,
    use_lz77_runs: bool = False,
) -> bytes:
    """Frames (list of (h, w, 3|4) uint8, or an (n, h, w, c) array) ->
    animated WebP (VP8X + ANIM + per-frame ANMF/VP8L) for fixtures.

    ``offsets`` are per-frame (x, y) canvas positions (even values —
    the container stores x/2, y/2); ``blend=True`` requests the spec's
    alpha 'over' compositing, otherwise frames overwrite their
    rectangle; ``dispose=True`` restores the rectangle to the
    background color after each frame."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("animated WebP needs at least one frame")
    n = len(frames)
    if durations_ms is None:
        durations_ms = [40] * n
    if offsets is None:
        offsets = [(0, 0)] * n
    if canvas_size is None:
        cw = max(ox + f.shape[1] for (ox, _), f in zip(offsets, frames))
        ch = max(oy + f.shape[0] for (_, oy), f in zip(offsets, frames))
    else:
        cw, ch = canvas_size
    body = b""
    # VP8X: animation flag, 24-bit reserved, canvas w-1 / h-1 (24-bit)
    body += _chunk(
        b"VP8X",
        bytes([0x02, 0, 0, 0])
        + (cw - 1).to_bytes(3, "little")
        + (ch - 1).to_bytes(3, "little"),
    )
    r_, g_, b_, a_ = bg
    body += _chunk(
        b"ANIM", bytes([b_, g_, r_, a_]) + struct.pack("<H", loop_count)
    )
    flags = (0x02 if not blend else 0) | (0x01 if dispose else 0)
    for f, dur, (ox, oy) in zip(frames, durations_ms, offsets):
        if ox % 2 or oy % 2:
            raise ValueError("ANMF offsets are stored halved — use even x/y")
        fh, fw = f.shape[:2]
        payload = _encode_vp8l_payload(f, subtract_green, use_lz77_runs)
        anmf = (
            (ox // 2).to_bytes(3, "little")
            + (oy // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(dur).to_bytes(3, "little")
            + bytes([flags])
            + _chunk(b"VP8L", payload)
        )
        body += _chunk(b"ANMF", anmf)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
