"""VP8 intra codec tests (sources/vp8.py).

Strategy (the JPEG/VP8L playbook): the fixture encoder shares every
table with the decoder, so round-trips are table-independent; flat
DC-only frames have a CLOSED-FORM expected value (integer shifts of
level x quantizer), and richer frames are cross-checked against an
independent test-side reconstruction that drives the module's
primitives (prediction + inverse transforms) directly from the
levels — validating the bitstream/entropy-context layer, which is
where transcription bugs would hide.
"""

from __future__ import annotations

import numpy as np
import pytest

from vtk_reserves_spark.sources import vp8
from vtk_reserves_spark.sources.vp8 import (
    AC_QLOOKUP,
    B_PRED,
    DC_PRED,
    DC_QLOOKUP,
    H_PRED,
    TM_PRED,
    V_PRED,
    ZIGZAG,
    BoolDecoder,
    BoolEncoder,
    decode_vp8,
    encode_vp8_frame,
    encode_webp_lossy,
    inv_dct4x4,
    inv_walsh,
)


def test_bool_coder_roundtrip_fuzz():
    rng = np.random.RandomState(7)
    bits = rng.randint(0, 2, 4000)
    probs = rng.randint(1, 255, 4000)
    be = BoolEncoder()
    for b, p in zip(bits, probs):
        be.bool(int(p), int(b))
    data = be.finish()
    bd = BoolDecoder(data)
    got = [bd.bool(int(p)) for p in probs]
    assert got == list(bits)


def test_bool_coder_literals_and_trees():
    be = BoolEncoder()
    be.literal(7, 93)
    be.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROBS, TM_PRED)
    be.tree(vp8.COEFF_TREE, [128] * 11, vp8.CAT3)
    be.literal(8, 255)
    data = be.finish()
    bd = BoolDecoder(data)
    assert bd.literal(7) == 93
    assert bd.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROBS) == TM_PRED
    assert bd.tree(vp8.COEFF_TREE, [128] * 11) == vp8.CAT3
    assert bd.literal(8) == 255


def test_inverse_transforms_dc_only():
    # DC-only inputs have closed forms: iWHT -> (W+3)>>3 everywhere,
    # iDCT -> (D+4)>>3 everywhere (RFC 6386 §14.3-14.4)
    for W in (0, 8, 40, -33, 1000):
        out = inv_walsh([W] + [0] * 15)
        assert out == [(W + 3) >> 3] * 16
    for D in (0, 8, 41, -20, 513):
        out = inv_dct4x4([D] + [0] * 15)
        assert (out == (D + 4) >> 3).all()


def test_inverse_dct_linearity():
    rng = np.random.RandomState(3)
    a = rng.randint(-500, 500, 16).tolist()
    scaled = [4 * v for v in a]
    # the transform is linear up to the final rounding shift: compare
    # against the pre-rounded sum reconstructed from a finer input
    out1 = inv_dct4x4(a)
    out4 = inv_dct4x4(scaled)
    assert (np.abs(out4 - 4 * out1) <= 4).all()


def _flat_mb(y2=0, u=0, v=0, skip=False, y_mode=DC_PRED, uv_mode=DC_PRED):
    mb = {"y_mode": y_mode, "uv_mode": uv_mode, "skip": skip}
    if not skip:
        mb["y2"] = [y2] + [0] * 15
        mb["u"] = [[u] + [0] * 15 for _ in range(4)]
        mb["v"] = [[v] + [0] * 15 for _ in range(4)]
    return mb


def _flat_expected(qi, w, du, dv):
    y2dc = DC_QLOOKUP[qi] * 2
    uvdc = min(DC_QLOOKUP[qi], 132)
    dy = (w * y2dc + 3) >> 3
    off_y = (dy + 4) >> 3
    off_u = (du * uvdc + 4) >> 3
    off_v = (dv * uvdc + 4) >> 3
    clamp = lambda x: max(0, min(255, x))
    return clamp(128 + off_y), clamp(128 + off_u), clamp(128 + off_v)


@pytest.mark.parametrize("qi,w,du,dv", [
    (0, 5, 2, 1), (20, 3, 1, 4), (60, 7, 3, -2), (100, 2, -1, 2),
    (127, 1, 1, 1),
])
def test_flat_frame_closed_form(qi, w, du, dv):
    """Corner MB carries DC-only levels, every other MB skips; DC_PRED
    propagation makes the whole frame uniform at the closed-form
    value."""
    mbs = [_flat_mb(w, du, dv)] + [_flat_mb(skip=True)] * 5
    data = encode_vp8_frame(48, 32, mbs, qi=qi)
    f = decode_vp8(data)
    ey, eu, ev = _flat_expected(qi, w, du, dv)
    assert f["width"] == 48 and f["height"] == 32
    assert (f["y"] == ey).all()
    assert (f["u"] == eu).all()
    assert (f["v"] == ev).all()


def test_webp_lossy_container_dispatch():
    from vtk_reserves_spark.sources.webp import decode_webp

    mbs = [_flat_mb(4, 2, 2)] + [_flat_mb(skip=True)] * 3
    blob = encode_webp_lossy(32, 32, mbs, qi=40)
    img = decode_webp(blob)
    ey, eu, ev = _flat_expected(40, 4, 2, 2)
    assert img.shape == (32, 32, 4)
    # integer BT.601 closed form from the uniform YUV
    c = 298 * (ey - 16)
    er = min(255, max(0, (c + 409 * (ev - 128) + 128) >> 8))
    eg = min(255, max(0, (c - 100 * (eu - 128) - 208 * (ev - 128) + 128) >> 8))
    eb = min(255, max(0, (c + 516 * (eu - 128) + 128) >> 8))
    assert (img[:, :, 0] == er).all()
    assert (img[:, :, 1] == eg).all()
    assert (img[:, :, 2] == eb).all()
    assert (img[:, :, 3] == 255).all()


# ---------------------------------------------------------------------------
# Independent reconstruction: drive prediction + inverse transforms
# directly from the level arrays, mirroring RFC 6386 semantics but none
# of the decoder's entropy/bitstream code.
# ---------------------------------------------------------------------------


def _dequant(qi):
    y1dc, y1ac = DC_QLOOKUP[qi], AC_QLOOKUP[qi]
    y2dc, y2ac = DC_QLOOKUP[qi] * 2, max(8, AC_QLOOKUP[qi] * 155 // 100)
    uvdc, uvac = min(DC_QLOOKUP[qi], 132), AC_QLOOKUP[qi]
    return (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac)


def _levels_to_coeffs(levels, dq, first=0):
    out = [0] * 16
    for c in range(first, 16):
        out[ZIGZAG[c]] = levels[c] * (dq[0] if c == 0 else dq[1])
    return out


def _reference_reconstruct(width, height, mbs, qi):
    (y1, y2q, uvq) = _dequant(qi)
    mb_rows, mb_cols = height >> 4, width >> 4
    Y = np.empty((mb_rows * 16 + 1, mb_cols * 16 + 1), np.uint8)
    U = np.empty((mb_rows * 8 + 1, mb_cols * 8 + 1), np.uint8)
    V = np.empty_like(U)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129
        P[0, 0] = 127
    for idx, mb in enumerate(mbs):
        mb_row, mb_col = divmod(idx, mb_cols)
        ya, xa = 1 + 16 * mb_row, 1 + 16 * mb_col
        yc, xc = 1 + 8 * mb_row, 1 + 8 * mb_col
        skip = mb.get("skip", False)
        ymode = mb.get("y_mode", DC_PRED)
        uvmode = mb.get("uv_mode", DC_PRED)
        ha, hl = mb_row > 0, mb_col > 0
        if ymode != B_PRED:
            pred = vp8.predict_block(Y, ya, xa, 16, ymode, ha, hl)
            if not skip:
                ydc = inv_walsh(
                    _levels_to_coeffs(mb.get("y2", [0] * 16), y2q)
                )
                for i in range(16):
                    r, c = divmod(i, 4)
                    coeffs = _levels_to_coeffs(
                        mb.get("y", [[0] * 16] * 16)[i], y1, first=1
                    )
                    coeffs[0] = ydc[i]
                    pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += inv_dct4x4(
                        coeffs
                    )
            Y[ya : ya + 16, xa : xa + 16] = np.clip(pred, 0, 255)
        else:
            bm = np.asarray(mb["b_modes"]).reshape(4, 4)
            top = Y[ya - 1, :]
            edge = xa + 16
            mb_ar = np.empty(4, np.int32)
            if edge + 4 <= Y.shape[1]:
                mb_ar[:] = top[edge : edge + 4]
            else:
                avail = max(0, Y.shape[1] - edge)
                mb_ar[:avail] = top[edge : edge + avail]
                mb_ar[avail:] = int(top[-1])
            for i in range(16):
                r, c = divmod(i, 4)
                yy, xx = ya + 4 * r, xa + 4 * c
                A = Y[yy - 1, xx : xx + 4].astype(np.int32)
                L = Y[yy : yy + 4, xx - 1].astype(np.int32)
                AL = int(Y[yy - 1, xx - 1])
                AR = mb_ar if c == 3 else Y[yy - 1, xx + 4 : xx + 8].astype(np.int32)
                pred = vp8.predict_subblock(int(bm[r][c]), A, L, AL, AR)
                if not skip:
                    pred = pred + inv_dct4x4(
                        _levels_to_coeffs(mb.get("y", [[0] * 16] * 16)[i], y1)
                    )
                Y[yy : yy + 4, xx : xx + 4] = np.clip(pred, 0, 255)
        for P, key in ((U, "u"), (V, "v")):
            pred = vp8.predict_block(P, yc, xc, 8, uvmode, ha, hl)
            if not skip:
                for i in range(4):
                    r, c = divmod(i, 2)
                    pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += inv_dct4x4(
                        _levels_to_coeffs(mb.get(key, [[0] * 16] * 4)[i], uvq)
                    )
            P[yc : yc + 8, xc : xc + 8] = np.clip(pred, 0, 255)
    return (
        Y[1 : 1 + height, 1 : 1 + width],
        U[1 : 1 + height // 2, 1 : 1 + width // 2],
        V[1 : 1 + height // 2, 1 : 1 + width // 2],
    )


def _random_levels(rng, nonzero_p=0.3, max_abs=12):
    lv = []
    for c in range(16):
        if rng.rand() < nonzero_p:
            v = int(rng.randint(1, max_abs + 1))
            lv.append(-v if rng.rand() < 0.5 else v)
        else:
            lv.append(0)
    # no trailing ZERO-run before EOB is representable; trim is
    # automatic (encoder EOBs at the last nonzero), nothing to fix
    return lv


def _random_mb(rng, allow_bpred=True):
    mode_pool = [DC_PRED, V_PRED, H_PRED, TM_PRED] + (
        [B_PRED] if allow_bpred else []
    )
    ymode = mode_pool[rng.randint(len(mode_pool))]
    mb = {
        "y_mode": ymode,
        "uv_mode": [DC_PRED, V_PRED, H_PRED, TM_PRED][rng.randint(4)],
        "skip": bool(rng.rand() < 0.2),
    }
    if ymode == B_PRED:
        mb["b_modes"] = rng.randint(0, 10, (4, 4)).tolist()
    else:
        mb["y2"] = _random_levels(rng)
    mb["y"] = [_random_levels(rng) for _ in range(16)]
    mb["u"] = [_random_levels(rng, 0.2) for _ in range(4)]
    mb["v"] = [_random_levels(rng, 0.2) for _ in range(4)]
    return mb


@pytest.mark.parametrize("seed,qi", [(1, 10), (2, 44), (3, 80), (4, 120)])
def test_random_frames_match_reference(seed, qi):
    """Every 16x16/4x4 mode, random coefficient levels across all
    bands/categories, mixed skip MBs — the bitstream decode must equal
    the direct levels->pixels reconstruction."""
    rng = np.random.RandomState(seed)
    mb_rows, mb_cols = 3, 4
    mbs = [_random_mb(rng) for _ in range(mb_rows * mb_cols)]
    data = encode_vp8_frame(mb_cols * 16, mb_rows * 16, mbs, qi=qi)
    f = decode_vp8(data)
    ry, ru, rv = _reference_reconstruct(mb_cols * 16, mb_rows * 16, mbs, qi)
    assert (f["y"] == ry).all()
    assert (f["u"] == ru).all()
    assert (f["v"] == rv).all()


def test_large_level_categories_roundtrip():
    """CAT1..CAT6 tokens all survive: levels spanning every category."""
    lv = [0] * 16
    for i, v in enumerate((1, 2, 4, 5, 7, 11, 19, 35, 67, 900)):
        lv[i] = v if i % 2 == 0 else -v
    mb = {
        "y_mode": DC_PRED, "uv_mode": DC_PRED,
        "y2": lv, "y": [[0] * 16] * 16, "u": [[0] * 16] * 4,
        "v": [[0] * 16] * 4,
    }
    data = encode_vp8_frame(16, 16, [mb], qi=0)
    f = decode_vp8(data)  # no assertion on values — must simply decode
    ry, ru, rv = _reference_reconstruct(16, 16, [mb], 0)
    assert (f["y"] == ry).all()


def test_interframe_and_corruption_rejected():
    mbs = [_flat_mb(1, 1, 1)]
    data = bytearray(encode_vp8_frame(16, 16, mbs, qi=0))
    data[0] |= 1  # flip to interframe
    with pytest.raises(ValueError, match="interframe"):
        decode_vp8(bytes(data))
    with pytest.raises(ValueError, match="start code"):
        decode_vp8(bytes(encode_vp8_frame(16, 16, mbs))[:3] + b"xxx" + b"\x00" * 8)
    with pytest.raises(ValueError):
        decode_vp8(b"\x00\x00")


def test_loop_filter_preserves_flat_frames():
    """A uniform frame has no edges to sharpen: running the normal and
    simple filters over it must be an exact no-op (masks all pass,
    adjustments all zero)."""
    mbs = [_flat_mb(6, 2, 2)] + [_flat_mb(skip=True)] * 3
    data = encode_vp8_frame(32, 32, mbs, qi=50)
    f = decode_vp8(data)
    ey = int(f["y"][0, 0])
    Y = np.full((33, 33), ey, np.uint8)
    U = np.full((17, 17), int(f["u"][0, 0]), np.uint8)
    V = np.full((17, 17), int(f["v"][0, 0]), np.uint8)
    hdr = vp8._Header()
    hdr.filter_type = 0
    hdr.sharpness = 0
    info = [(DC_PRED, True, 30)] * 4
    vp8._loop_filter(Y, U, V, hdr, info, 2, 2)
    assert (Y == ey).all()
    hdr.filter_type = 1
    vp8._loop_filter(Y, U, V, hdr, info, 2, 2)
    assert (Y == ey).all()


def test_inv_dct_batch_parity():
    """inv_dct4x4_batch is bit-identical to the scalar transform over
    random coefficient blocks spanning the full dequantized range."""
    rng = np.random.RandomState(17)
    blocks = rng.randint(-700000, 700000, (64, 16))
    got = vp8.inv_dct4x4_batch(blocks)
    for i in range(64):
        assert (got[i] == inv_dct4x4(blocks[i].tolist())).all(), i


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def test_pixel_encoder_decode_matches_recon_and_psnr():
    """encode_vp8_pixels: the emitted stream must decode BIT-IDENTICAL
    to the encoder's own reconstruction (quantization is the only
    lossy step), and quality must be sane (smooth gradient, qi=20 ->
    high PSNR)."""
    from vtk_reserves_spark.sources.vp8 import encode_vp8_pixels, rgb_to_yuv420

    h, w = 40, 56  # non-multiples of 16: exercises true-size + padding
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = (xx * 4) % 256
    img[:, :, 1] = (yy * 3 + 40) % 256
    img[:, :, 2] = 128
    payload, enc = encode_vp8_pixels(img, qi=20)
    f = decode_vp8(payload)
    assert (f["width"], f["height"]) == (w, h)
    assert (f["y"] == enc["recon_y"]).all()
    assert (f["u"] == enc["recon_u"]).all()
    assert (f["v"] == enc["recon_v"]).all()
    y_src, u_src, v_src = rgb_to_yuv420(img)
    assert _psnr(f["y"], y_src) > 34, _psnr(f["y"], y_src)
    assert _psnr(f["u"], u_src) > 30
    # coarser quantization degrades but still decodes consistently
    payload2, enc2 = encode_vp8_pixels(img, qi=120)
    f2 = decode_vp8(payload2)
    assert (f2["y"] == enc2["recon_y"]).all()
    assert _psnr(f2["y"], y_src) > 20


def test_pixel_encoder_container_roundtrip():
    from vtk_reserves_spark.sources.vp8 import encode_webp_lossy_pixels
    from vtk_reserves_spark.sources.webp import decode_webp

    img = np.full((24, 24, 4), 200, np.uint8)
    img[8:16, 8:16, :3] = 40
    img[:, :, 3] = 255
    out = decode_webp(encode_webp_lossy_pixels(img, qi=10))
    assert out.shape == (24, 24, 4)
    # flat regions survive quantization closely
    assert abs(int(out[2, 2, 0]) - 200) < 16
    assert abs(int(out[12, 12, 0]) - 40) < 16


def test_unverified_tables_gate():
    """ADVICE r4: while the three large RFC 6386 tables await golden
    validation, lossy decode warns by default and strict=True refuses."""
    import warnings as _w

    import pytest as _pt

    from vtk_reserves_spark.sources import vp8 as v

    mb = {
        "y_mode": DC_PRED, "uv_mode": DC_PRED,
        "y2": [0] * 16, "y": [[0] * 16] * 16, "u": [[0] * 16] * 4,
        "v": [[0] * 16] * 4,
    }
    blob = encode_vp8_frame(16, 16, [mb], qi=0)
    assert v.TABLES_UNVERIFIED  # flips False when goldens land
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        v.decode_vp8(blob)
    assert any("unverified" in str(r.message) for r in rec)
    with _pt.raises(ValueError, match="unverified"):
        v.decode_vp8(blob, strict=True)


def test_unverified_table_pins():
    """Structural invariants + content pins for the three large
    RFC 6386 tables awaiting golden-vector validation: shapes are
    spec-fixed, every entry is a valid boolean-coder probability
    (1..255), and the SHA-256 pins record EXACTLY which transcription
    shipped — when a libwebp/libvpx golden file becomes available,
    validation compares against these bytes (and a pin change forces
    a deliberate review, never a silent table edit)."""
    import hashlib

    import numpy as np

    from vtk_reserves_spark.sources import vp8 as v

    pins = {
        "DEFAULT_COEFF_PROBS": ((4, 8, 3, 11), "6a7c8f6b431ff135"),
        "COEFF_UPDATE_PROBS": ((4, 8, 3, 11), "01eee48780986ecc"),
        "KF_BMODE_PROBS": ((10, 10, 9), "768b018f7e211db1"),
    }
    for name, (shape, digest) in pins.items():
        t = np.asarray(getattr(v, name))
        assert t.shape == shape, name
        assert t.min() >= 1 and t.max() <= 255, name
        got = hashlib.sha256(t.astype(np.uint8).tobytes()).hexdigest()[:16]
        assert got == digest, f"{name} transcription changed: {got}"
