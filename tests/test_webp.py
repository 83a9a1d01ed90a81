"""VP8L decoder path tests: the encoder only emits literal/LZ77
streams, so the cache / palette / predictor / color-transform /
meta-prefix paths are pinned with hand-assembled bitstreams built from
the module's own bit/code writers."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vtk_reserves_spark.sources import webp as W


def _container(payload: bytes) -> bytes:
    payload = b"\x2f" + payload
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _put(bw, tbl, sym):
    W._put_sym(bw, tbl, sym)


def _flat_codes(bw, with_meta_bit=True, with_cache_bit=True):
    """[cache-off] [+ meta-off] + near-flat literal codes, encode tables."""
    if with_cache_bit:
        bw.write(0, 1)  # no color cache
    if with_meta_bit:
        bw.write(0, 1)  # no meta image
    green_lengths = [8] * 232 + [9] * 48
    W._emit_lengths(bw, list(green_lengths))
    for _ in range(3):
        W._emit_lengths(bw, [8] * 256)
    W._write_single_code(bw, 1)
    return W._code_table(list(green_lengths)), W._code_table([8] * 256)


def _emit_pixels(bw, gtbl, ftbl, pixels):
    for a, r, g, b in pixels:
        _put(bw, gtbl, g)
        _put(bw, ftbl, r)
        _put(bw, ftbl, b)
        _put(bw, ftbl, a)


def test_vp8l_color_cache_hits():
    """A literal inserts into the cache; subsequent cache symbols must
    replay it.  Green code is length-coded over the cache-extended
    alphabet with exactly two 1-bit symbols."""
    px = (0xFF << 24) | (77 << 16) | (200 << 8) | 13
    hidx = ((px * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - 4)
    cache_sym = 256 + 24 + hidx
    bw = W._BitWriter()
    _header(bw, 5, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)
    bw.write(4, 4)  # cache_bits = 4
    bw.write(0, 1)  # no meta
    # green code: lengths 1 at {200, cache_sym}, zeros elsewhere, via the
    # cl-code {1:len1, 17:len2, 18:len2} and an explicit op budget
    bw.write(0, 1)  # not simple
    bw.write(13 - 4, 4)  # num_codes = 13 (covers order idx of 18, 17, 1)
    cl_len = {1: 1, 17: 2, 18: 2}
    for i in range(13):
        sym = W._CLC_ORDER[i]
        bw.write(cl_len.get(sym, 0), 3)
    # op budget: 18,18,'1',18,'1' = 5 ops
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(5 - 2, 2)
    # canonical cl codes: (1,1)->0; (2,17)->10; (2,18)->11
    def put_cl(sym):
        code, n = {1: (0b0, 1), 17: (0b10, 2), 18: (0b11, 2)}[sym]
        for k in range(n - 1, -1, -1):
            bw.write((code >> k) & 1, 1)
    put_cl(18); bw.write(138 - 11, 7)
    put_cl(18); bw.write(62 - 11, 7)
    put_cl(1)  # symbol 200 gets length 1
    gap = cache_sym - 201
    put_cl(18); bw.write(gap - 11, 7)
    put_cl(1)  # cache_sym gets length 1
    # r/b/a: single-symbol codes (zero bits per pixel)
    W._write_single_code(bw, 77)   # red
    W._write_single_code(bw, 13)   # blue
    W._write_single_code(bw, 255)  # alpha
    W._write_single_code(bw, 1)    # distance (unused)
    # pixels: literal (green code 0) then 4 cache hits (code 1)
    bw.write(0, 1)
    for _ in range(4):
        bw.write(1, 1)
    out = W.decode_webp(_container(bw.finish()))
    assert out.shape == (1, 5, 4)
    want = np.array([77, 200, 13, 255], np.uint8)
    assert (out == want).all()


def test_vp8l_palette_with_pixel_bundling():
    """4-color palette -> 2-bit indices bundled 4-per-byte; the palette
    itself is delta-coded as a 4x1 entropy image."""
    colors = [
        (255, 10, 20, 30), (255, 40, 50, 60), (255, 70, 80, 90),
        (255, 100, 110, 120),
    ]  # (A, R, G, B)
    w, h = 6, 2
    idx = np.array([[0, 1, 2, 3, 0, 1], [3, 2, 1, 0, 3, 2]], np.uint8)
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(4 - 1, 8)  # n_colors
    # palette entropy image (4x1): delta-coded entries, literal stream
    deltas = []
    prev = (0, 0, 0, 0)
    for c in colors:
        deltas.append(tuple((c[i] - prev[i]) & 0xFF for i in range(4)))
        prev = c
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=False)
    _emit_pixels(bw, gtbl, ftbl, deltas)
    bw.write(0, 1)  # no more transforms
    # main image at reduced width ceil(6/4)=2, bundled 2-bit indices
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=True)
    bundled = []
    for y in range(h):
        row = []
        for bx in range(-(-w // 4)):
            byte = 0
            for k in range(4):
                x = bx * 4 + k
                if x < w:
                    byte |= int(idx[y, x]) << (2 * k)
            row.append((255, 0, byte, 0))
        bundled.extend(row)
    _emit_pixels(bw, gtbl, ftbl, bundled)
    out = W.decode_webp(_container(bw.finish()))
    assert out.shape == (h, w, 4)
    pal_rgba = np.array([(r, g, b, a) for a, r, g, b in colors], np.uint8)
    assert (out == pal_rgba[idx]).all()


def test_vp8l_predictor_transform_modes():
    """Predictor transform, one block: mode 2 (top) residues restore the
    original; the spec's edge rules (first pixel 0xFF000000, top row
    predicts from the left, first column from above) are exercised."""
    rng = np.random.RandomState(3)
    w, h = 4, 3
    img = rng.randint(0, 256, (h, w, 4)).astype(np.int32)  # RGBA
    # forward-apply mode-2 residues with the decoder's edge rules
    def sub(a, b):
        return tuple((int(a[i]) - int(b[i])) & 0xFF for i in range(4))
    res = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (0, 0, 0, 255)  # ARGB 0xFF000000 as RGBA tuple
            elif y == 0:
                pred = tuple(img[y, x - 1])
            elif x == 0:
                pred = tuple(img[y - 1, x])
            else:
                pred = tuple(img[y - 1, x])  # mode 2: top
            res[y, x] = sub(img[y, x], pred)
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(4 - 2, 3)  # size_bits = 4 -> one 16x16 block
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=False)
    _emit_pixels(bw, gtbl, ftbl, [(255, 0, 2, 0)])  # mode 2 in green
    bw.write(0, 1)  # no more transforms
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=True)
    pix = [
        (int(res[y, x, 3]), int(res[y, x, 0]), int(res[y, x, 1]), int(res[y, x, 2]))
        for y in range(h)
        for x in range(w)
    ]
    _emit_pixels(bw, gtbl, ftbl, pix)
    out = W.decode_webp(_container(bw.finish()))
    assert (out == img.astype(np.uint8)).all()


def test_vp8l_color_transform():
    """Color transform, one block with fixed g->r / g->b / r->b
    multipliers; residues built with the module's own delta."""
    rng = np.random.RandomState(5)
    w, h = 5, 2
    img = rng.randint(0, 256, (h, w, 4)).astype(np.int32)  # RGBA
    g2r, g2b, r2b = 16, 240, 5
    res = img.copy()
    for y in range(h):
        for x in range(w):
            r, g, b = int(img[y, x, 0]), int(img[y, x, 1]), int(img[y, x, 2])
            res[y, x, 0] = (r - W._cdelta(g2r, g)) & 0xFF
            res[y, x, 2] = (b - W._cdelta(g2b, g) - W._cdelta(r2b, r)) & 0xFF
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # color transform
    bw.write(4 - 2, 3)  # one block
    # block pixel: A=r2b, R=g2b, G=g2r, B=anything
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=False)
    _emit_pixels(bw, gtbl, ftbl, [(r2b, g2b, g2r, 0)])
    bw.write(0, 1)
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=True)
    pix = [
        (int(res[y, x, 3]), int(res[y, x, 0]), int(res[y, x, 1]), int(res[y, x, 2]))
        for y in range(h)
        for x in range(w)
    ]
    _emit_pixels(bw, gtbl, ftbl, pix)
    out = W.decode_webp(_container(bw.finish()))
    assert (out == img.astype(np.uint8)).all()


def test_vp8l_meta_prefix_groups():
    """Meta-prefix image splits an 8x1 image into two 4-pixel blocks
    with different green codes (group 1's is a single-symbol code)."""
    bw = W._BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta image present
    bw.write(2 - 2, 3)  # meta_bits = 2 -> blocks of 4 px
    # meta image 2x1: group ids in (px >> 8) & 0xFFFF -> greens 0 and 1
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=False)
    _emit_pixels(bw, gtbl, ftbl, [(255, 0, 0, 0), (255, 0, 1, 0)])
    # group 0: flat codes; group 1: all-single codes.  _read_group
    # reads the five codes DIRECTLY — no cache/meta bits here
    g0, f0 = _flat_codes(bw, with_meta_bit=False, with_cache_bit=False)
    W._write_single_code(bw, 99)   # group 1 green
    W._write_single_code(bw, 1)
    W._write_single_code(bw, 2)
    W._write_single_code(bw, 3)
    W._write_single_code(bw, 1)    # distance
    # pixels: first 4 via group0 literals, last 4 cost zero bits (all
    # single-symbol codes)
    _emit_pixels(bw, g0, f0, [(255, 10, 20, 30)] * 4)
    out = W.decode_webp(_container(bw.finish()))
    assert out.shape == (1, 8, 4)
    assert (out[0, :4] == np.array([10, 20, 30, 255], np.uint8)).all()
    assert (out[0, 4:] == np.array([1, 99, 2, 3], np.uint8)).all()


def test_webp_rejects_garbage_and_truncated_lossy():
    with pytest.raises(ValueError, match="RIFF"):
        W.decode_webp(b"nope")
    # lossy dispatches to the VP8 decoder since round 4; an empty VP8
    # chunk is a truncated payload, not a missing-codec error
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="truncated VP8"):
        W.decode_webp(lossy)


def _undo_predictor_reference(argb, sub, size_bits):
    """Independent scalar inverse-predictor, transcribed from RFC 9649
    §4.2.2 pseudo-code (NOT from the module's code): Select computes
    the component-sum estimate and the two Manhattan distances exactly
    as written (`pL < pT` strict — ties pick T), and
    AddSubtractComponentHalf uses C integer division (truncation
    toward zero).  Cross-validating the vectorized decoder against a
    second derivation catches transcription errors that encoder/
    decoder round-trips cannot (both sides would share them)."""
    h, xs = argb.shape
    out = argb.astype(np.int64).copy()

    def chans(p):
        return [(p >> s) & 0xFF for s in (24, 16, 8, 0)]

    def pack(cs):
        o = 0
        for c, s in zip(cs, (24, 16, 8, 0)):
            o |= c << s
        return o

    def clamp(v):
        return 0 if v < 0 else 255 if v > 255 else v

    def sel(l, t, tl):
        # RFC 9649 Select(): estimate = L + T - TL per channel;
        # pL = sum |estimate - L|, pT = sum |estimate - T|
        est = [lc + tc - tlc for lc, tc, tlc in zip(chans(l), chans(t), chans(tl))]
        p_l = sum(abs(e - lc) for e, lc in zip(est, chans(l)))
        p_t = sum(abs(e - tc) for e, tc in zip(est, chans(t)))
        return l if p_l < p_t else t

    def cas_full(a, b, c):
        return pack(
            [clamp(ac + bc - cc)
             for ac, bc, cc in zip(chans(a), chans(b), chans(c))]
        )

    def c_div2(d):
        # C truncation toward zero, unlike Python's floor //
        return d // 2 if d >= 0 else -((-d) // 2)

    def cas_half(a, b, c):
        o = []
        for ac, bc, cc in zip(chans(a), chans(b), chans(c)):
            ave = (ac + bc) // 2
            o.append(clamp(ave + c_div2(ave - cc)))
        return pack(o)

    def avg2(a, b):
        o = 0
        for shift in (24, 16, 8, 0):
            o |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) // 2) << shift
        return o

    for y in range(h):
        for x in range(xs):
            mode = int((sub[y >> size_bits, x >> size_bits] >> 8) & 0xFF)
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[y, x - 1])
            elif x == 0:
                pred = int(out[y - 1, x])
            else:
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                # last-column TR wraps to the CURRENT row's first pixel
                # (libwebp's upper[w] aliases out[y][0] in-place)
                TR = int(out[y - 1, x + 1]) if x + 1 < xs else int(out[y, 0])
                pred = [
                    0xFF000000, L, T, TR, TL,
                    avg2(avg2(L, TR), T), avg2(L, TL), avg2(L, T),
                    avg2(TL, T), avg2(T, TR),
                    avg2(avg2(L, TL), avg2(T, TR)),
                    sel(L, T, TL), cas_full(L, T, TL), cas_half(L, T, TL),
                ][mode]
            v = int(out[y, x])
            r = 0
            for shift in (24, 16, 8, 0):
                r |= ((((v >> shift) & 0xFF) + ((pred >> shift) & 0xFF)) & 0xFF) << shift
            out[y, x] = r
    return out.astype(np.uint32)


def test_vp8l_predictor_vectorization_parity():
    """The batched inverse predictor is bit-identical to the scalar
    reference across all 14 modes, random mode fields, block sizes and
    shapes — including the last-column TR wrap and 1-wide/1-high edge
    shapes."""
    rng = np.random.RandomState(11)
    shapes = [(1, 1), (1, 9), (9, 1), (3, 4), (8, 8), (13, 21), (21, 13), (5, 32)]
    for h, xs in shapes:
        for size_bits in (2, 3, 5):
            block = 1 << size_bits
            bw = -(-xs // block)
            bh = -(-h // block)
            res = rng.randint(0, 2**32, (h, xs), dtype=np.uint64).astype(np.uint32)
            modes = rng.randint(0, 14, (bh, bw)).astype(np.uint32)
            sub = (modes << 8).astype(np.uint32)
            got = W._undo_predictor(res, sub, size_bits, xs)
            want = _undo_predictor_reference(res, sub, size_bits)
            assert (got == want).all(), (h, xs, size_bits)
    # every mode individually at a shape that hits the TR wrap column
    for mode in range(14):
        res = rng.randint(0, 2**32, (6, 7), dtype=np.uint64).astype(np.uint32)
        sub = np.full((2, 2), mode << 8, np.uint32)
        got = W._undo_predictor(res, sub, 2, 7)
        want = _undo_predictor_reference(res, sub, 2)
        assert (got == want).all(), mode


def test_vp8l_select_tie_goes_to_top():
    """RFC 9649 Select(): on a Manhattan-distance tie the predictor is
    T, not L (`if (pL < pT) return L; else return T`).  Pixel (1,1)
    is decoded with mode 11 where L and T are equidistant from the
    estimate, so the outputs differ by construction unless ties pick
    T."""
    # residuals chosen so the decoded neighborhood (blue channel) is
    #   TL=3  T=2
    #   L =4  X=res + Select(L, T, TL)
    # pL = sum|T-TL| = 1 equals pT = sum|L-TL| = 1 (alpha ties at 255)
    # -> tie -> spec picks T, so X_blue = (0x10 + 2) & 0xFF
    res = np.array(
        [[0x00000003, 0x000000FF],
         [0x00000001, 0x00000010]], np.uint32)
    sub = np.full((1, 1), 11 << 8, np.uint32)
    got = W._undo_predictor(res, sub, 5, 2)
    assert got[0, 0] == 0xFF000003  # TL
    assert got[0, 1] == 0xFF000002  # T
    assert got[1, 0] == 0xFF000004  # L
    assert got[1, 1] & 0xFF == 0x12  # tie -> T, not L (0x14)
    assert (got == _undo_predictor_reference(res, sub, 5)).all()
    # asymmetric control: TL=3, T=2, L=3 -> pL=1 > pT=0 -> T either way
    res2 = np.array(
        [[0x00000003, 0x000000FF],
         [0x00000000, 0x00000010]], np.uint32)
    got2 = W._undo_predictor(res2, sub, 5, 2)
    assert got2[1, 1] & 0xFF == 0x12
    assert (got2 == _undo_predictor_reference(res2, sub, 5)).all()


def test_vp8l_cas_half_truncates_toward_zero():
    """AddSubtractComponentHalf is C integer division: for a negative
    odd difference (ave - TL), truncation adds one less than Python's
    floor.  ave=(L+T)/2=10, TL=13 -> C: 10 + (-3)/2 = 9; floor would
    give 8."""
    res = np.array(
        [[0x0000000D, 0xFFFFFFFD],   # row0: TL=13, T=(13+0xFD)&0xFF=10
         [0xFFFFFFFD, 0x00000000]],  # L=(13+0xFD)&0xFF=10, X=res+pred
        np.uint32)
    sub = np.full((1, 1), 13 << 8, np.uint32)
    got = W._undo_predictor(res, sub, 5, 2)
    assert got[1, 0] & 0xFF == 10 and got[0, 1] & 0xFF == 10
    assert got[0, 0] & 0xFF == 13
    # pred blue channel = clamp(10 + trunc((10-13)/2)) = 9
    assert got[1, 1] & 0xFF == 9
    assert (got == _undo_predictor_reference(res, sub, 5)).all()


def test_vp8l_predictor_rejects_bad_mode():
    res = np.zeros((4, 4), np.uint32)
    sub = np.full((1, 1), 14 << 8, np.uint32)
    with pytest.raises(ValueError, match="predictor mode"):
        W._undo_predictor(res, sub, 2, 4)


def test_webp_anim_roundtrip_no_blend():
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (3, 6, 9, 4), dtype=np.int64).astype(np.uint8)
    data = W.encode_webp_anim(frames, durations_ms=[10, 20, 30], loop_count=5)
    got, durs, loop = W.decode_webp_frames(data)
    assert got.shape == (3, 6, 9, 4)
    assert (got == frames).all()
    assert durs == [10, 20, 30]
    assert loop == 5
    # decode_webp on an animation = first composited frame
    assert (W.decode_webp(data) == frames[0]).all()


def test_webp_anim_subrect_and_dispose():
    """Frame 2 covers a 2x2 sub-rectangle; the rest of the canvas keeps
    frame 1's pixels; dispose-to-background restores the rect after."""
    f0 = np.full((4, 4, 4), 100, np.uint8)
    patch = np.full((2, 2, 4), 200, np.uint8)
    bg = (1, 2, 3, 255)
    data = W.encode_webp_anim(
        [f0, patch, patch],
        offsets=[(0, 0), (2, 2), (0, 0)],
        bg=bg,
        dispose=True,
        canvas_size=(4, 4),
    )
    got, _durs, _loop = W.decode_webp_frames(data)
    assert got.shape[0] == 3
    # frame 0 rendered then disposed -> frame 1 shows bg outside patch
    assert (got[0] == 100).all()
    assert (got[1][2:, 2:] == 200).all()
    assert tuple(got[1][0, 0]) == bg
    # frame 1's rect was disposed too before frame 2 composited at (0,0)
    assert (got[2][:2, :2] == 200).all()
    assert tuple(got[2][3, 3]) == bg


def test_webp_anim_alpha_blend():
    """blend=True alpha-composites: a half-alpha red over opaque blue."""
    blue = np.zeros((2, 2, 4), np.uint8)
    blue[:, :, 2] = 255
    blue[:, :, 3] = 255
    red = np.zeros((2, 2, 4), np.uint8)
    red[:, :, 0] = 255
    red[:, :, 3] = 128
    data = W.encode_webp_anim([blue, red], blend=True)
    got, _d, _l = W.decode_webp_frames(data)
    px = got[1][0, 0].astype(int)
    sa = 128 / 255.0
    assert px[3] == 255  # over an opaque dst alpha stays opaque
    assert abs(px[0] - round(255 * sa)) <= 1
    assert abs(px[2] - round(255 * (1 - sa))) <= 1


def test_webp_anim_rejects_bad_geometry():
    patch = np.zeros((3, 3, 4), np.uint8)
    data = W.encode_webp_anim([patch], offsets=[(2, 0)], canvas_size=(4, 4))
    with pytest.raises(ValueError, match="exceeds"):
        W.decode_webp_frames(data)
    with pytest.raises(ValueError, match="even"):
        W.encode_webp_anim([patch], offsets=[(1, 0)])


def test_webp_frames_on_still_image():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    frames, durs, loop = W.decode_webp_frames(W.encode_webp(img))
    assert frames.shape == (1, 4, 4, 4)
    assert (frames[0, :, :, :3] == img).all()
    assert durs == [0] and loop == 0


def test_vp8l_tr_wrap_uses_current_row_first_pixel():
    """Pins the last-column TR convention for predictor mode 3: TR
    aliases out[y][0] (the CURRENT row's first reconstructed pixel, as
    in libwebp's in-place row layout where upper[w] physically reads
    it), NOT out[y-1][0].  Hand-built 2x2, mode 3 everywhere."""
    res = np.zeros((2, 2), np.uint32)
    # row 0: pixel0 = 0xFF000000 + r; pixel1 predicts L
    res[0, 0] = 0x00000005  # out00 = 0xFF000005
    res[0, 1] = 0x00000001  # out01 = 0xFF000006
    # row 1: pixel0 predicts T: + 0x10 -> 0xFF000015 (differs from out00)
    res[1, 0] = 0x00000010
    # pixel1 (last col) mode 3: TR must be out[1][0] = 0xFF000015
    res[1, 1] = 0x00000002
    sub = np.full((1, 1), 3 << 8, np.uint32)
    out = W._undo_predictor(res, sub, 5, 2)
    assert out[1, 0] == 0xFF000015
    assert out[1, 1] == 0xFF000017  # current-row wrap; 0xFF000007 would
    # indicate the (wrong) previous-row convention


def _lossy_with_alpha(alpha_body, w=16, h=16):
    """Assemble RIFF/WEBP with ALPH + a flat lossy VP8 frame."""
    from vtk_reserves_spark.sources.vp8 import DC_PRED, encode_vp8_frame

    mb = {"y_mode": DC_PRED, "uv_mode": DC_PRED,
          "y2": [4] + [0] * 15,
          "u": [[1] + [0] * 15 for _ in range(4)],
          "v": [[1] + [0] * 15 for _ in range(4)]}
    vp8 = encode_vp8_frame(w, h, [mb], qi=30)
    chunks = b""
    for tag, body in ((b"ALPH", alpha_body), (b"VP8 ", vp8)):
        if len(body) & 1:
            body += b"\x00"
        chunks += tag + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def test_alpha_raw_all_filters():
    """ALPH raw compression with filters 0-3 round-trips through the
    inverse-filter decoder and lands in the RGBA alpha channel."""
    rng = np.random.RandomState(9)
    alpha = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    for filt in range(4):
        body = W.encode_alpha_chunk(alpha, filt=filt)
        blob = _lossy_with_alpha(body)
        img = W.decode_webp(blob)
        assert (img[:, :, 3] == alpha).all(), filt
        # RGB untouched by alpha application
        assert len(np.unique(img[:, :, 0])) == 1


def test_alpha_vp8l_compressed():
    """ALPH compression method 1: a headerless VP8L stream whose green
    channel carries the alpha plane."""
    w, h = 4, 2
    alpha = np.array([[5, 250, 7, 0], [128, 1, 2, 3]], np.uint8)
    bw = W._BitWriter()
    bw.write(0, 1)  # no transforms
    gtbl, ftbl = _flat_codes(bw, with_meta_bit=False)
    pix = [(255, 0, int(alpha[y, x]), 0) for y in range(h) for x in range(w)]
    _emit_pixels(bw, gtbl, ftbl, pix)
    body = bytes([1]) + bw.finish()  # compression method 1, no filter
    got = W._decode_alpha(body, w, h)
    assert (got == alpha).all()


def test_alpha_errors():
    with pytest.raises(ValueError, match="ALPH"):
        W._decode_alpha(b"", 4, 4)
    with pytest.raises(ValueError, match="shorter"):
        W._decode_alpha(b"\x00" + b"\x01" * 5, 4, 4)
    with pytest.raises(ValueError, match="compression method"):
        W._decode_alpha(b"\x02" + b"\x00" * 64, 4, 4)
