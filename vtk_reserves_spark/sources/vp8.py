"""VP8 intra-frame (lossy WebP) codec — pure python/numpy, no libvpx.

Lossy WebP ('VP8 ' chunk) is the majority of real-crawl WebP, so a
lossy decoder is the top missing format by hit frequency.  This
implements the KEY-FRAME (intra) half of the public VP8 bitstream
specification (RFC 6386): the boolean arithmetic coder, the full
frame header (segmentation, filter params, quantizer indices +
deltas, token probability updates), key-frame macroblock prediction
records (16x16 DC/V/H/TM, per-subblock B_PRED with the 10 4x4 modes,
chroma modes), DCT-coefficient token decoding across up to 8
partitions, dequantization, the exact integer inverse WHT + inverse
DCT, reconstruction with the spec's 127/129 edge conventions, and
the in-loop deblocking filter (both "simple" and "normal" modes).
Interframes (golden/altref/motion) are out of scope — every still
WebP is a key frame by construction.

Fidelity note (same status as the VP8L edge predictors banked in
SURVEY.md): all ALGORITHMS here follow RFC 6386 exactly, and the
small tables (quantizer lookups, trees, bands, zigzag, token
category probabilities) are spec-verified.  Three large DATA tables
— DEFAULT_COEFF_PROBS (4x8x3x11), COEFF_UPDATE_PROBS (same shape)
and KF_BMODE_PROBS (10x10x9) — are best-effort transcriptions of
the RFC's appendices that could not be byte-verified in this
container (no libvpx/libwebp, no network); they are the only gap
between this decoder and wild-file bit-exactness, and are banked
for golden-vector validation.  Everything tested in-repo is
TABLE-INDEPENDENT: the fixture encoder shares the decoder's tables,
so round-trips and the driver oracle hold regardless.

The companion :func:`encode_vp8_frame` writes a valid key frame from
per-macroblock modes + quantized coefficient LEVELS (no forward
transform — levels in, levels out), which is exactly what the
closed-form oracle fixtures need: DC-only levels survive
quantization bit-exactly (the q:video_frames_mjpg device).

Like the other codecs this runs INSIDE Arrow-batched executors
(`operators/multimodal.py`), one payload at a time; bytes never
reach the driver.
"""

from __future__ import annotations

import warnings

import numpy as np

# Wild-file fidelity gate (ADVICE r4): the three large probability
# tables below (DEFAULT_COEFF_PROBS, COEFF_UPDATE_PROBS,
# KF_BMODE_PROBS) are best-effort RFC 6386 transcriptions that cannot
# be byte-verified in this container — no libvpx/libwebp binaries to
# produce a golden frame, no network to fetch the RFC text, so a
# "second transcription" would derive from the same source as the
# first.  Flip TABLES_UNVERIFIED to False once a reference-encoder
# golden vector validates them.  Until then decode_vp8 emits a
# one-time RuntimeWarning, and callers that need the repo's
# explicit-error-never-silent-garbage posture for WILD payloads can
# pass strict=True to refuse lossy decode outright (fixture payloads
# are table-closed-loop and unaffected either way).
TABLES_UNVERIFIED = True
UNVERIFIED_TABLES_NOTE = (
    "vp8: DEFAULT_COEFF_PROBS/COEFF_UPDATE_PROBS/KF_BMODE_PROBS are "
    "unverified RFC 6386 transcriptions; lossy decode of wild files "
    "may be inexact until golden-vector validation"
)

# ---------------------------------------------------------------------------
# Spec-verified small tables (RFC 6386 §13, §14)
# ---------------------------------------------------------------------------

DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
)

AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)

#: zigzag: coefficient position -> natural (row-major) index
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

#: coefficient position -> probability band
COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# token ids
EOB, ZERO, ONE, TWO, THREE, FOUR, CAT1, CAT2, CAT3, CAT4, CAT5, CAT6 = range(12)

#: coefficient token tree (11 internal nodes -> 11 probs per context)
COEFF_TREE = (
    -EOB, 2,
    -ZERO, 4,
    -ONE, 6,
    8, 12,
    -TWO, 10,
    -THREE, -FOUR,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
)

#: extra-bit probabilities and base values for the value categories
CAT_PROBS = {
    CAT1: (159,),
    CAT2: (165, 145),
    CAT3: (173, 148, 140),
    CAT4: (176, 155, 140, 135),
    CAT5: (180, 157, 141, 134, 130),
    CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}

# 16x16 luma modes / chroma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
#: key-frame 16x16 luma mode tree + probs (RFC 6386 §11.2)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)

# 4x4 subblock (B_PRED) modes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
#: implied subblock mode of a non-B_PRED macroblock (for bmode context)
MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


# ---------------------------------------------------------------------------
# Large default tables — BEST-EFFORT TRANSCRIPTION, banked for golden-vector
# validation (see module docstring).  Encoder and decoder share these, so
# every in-repo fixture is independent of their byte-exactness.
# ---------------------------------------------------------------------------

DEFAULT_COEFF_PROBS = (
    (  # block type 0 (luma without DC, i.e. MB has a Y2 block)
        (
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
            (189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
            (106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128),
        ),
        (
            (1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
            (181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
            (78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128),
        ),
        (
            (1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
            (184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
            (77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128),
        ),
        (
            (1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
            (170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
            (37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128),
        ),
        (
            (1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
            (207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
            (102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128),
        ),
        (
            (1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
            (177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
            (80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128),
        ),
        (
            (1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128),
            (238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (75, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
    (  # block type 1 (Y2)
        (
            (198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
            (131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1),
            (68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128),
        ),
        (
            (1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
            (184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
            (81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128),
        ),
        (
            (1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
            (99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
            (23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128),
        ),
        (
            (1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
            (109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
            (44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128),
        ),
        (
            (1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
            (94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
            (22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128),
        ),
        (
            (1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
            (124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
            (35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128),
        ),
        (
            (1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
            (121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
            (45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128),
        ),
        (
            (1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
            (203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
            (137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128),
        ),
    ),
    (  # block type 2 (chroma)
        (
            (253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
            (175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
            (73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128),
        ),
        (
            (1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
            (239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
            (155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128),
        ),
        (
            (1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
            (201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
            (69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128),
        ),
        (
            (1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
            (223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
            (141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
            (190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
            (149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
            (213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
            (55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
    (  # block type 3 (luma with DC, i.e. B_PRED macroblock)
        (
            (202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
            (126, 38, 166, 203, 127, 159, 192, 168, 221, 194, 255),
            (61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128),
        ),
        (
            (1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
            (166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128),
            (39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128),
        ),
        (
            (1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
            (124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
            (24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128),
        ),
        (
            (1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
            (149, 150, 226, 252, 216, 205, 255, 255, 128, 128, 128),
            (28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128),
        ),
        (
            (1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
            (123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
            (20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128),
        ),
        (
            (1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
            (168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
            (47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128),
        ),
        (
            (1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
            (141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
            (42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128),
        ),
        (
            (1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
)

# The update-probability table is dominated by 255 ("almost never
# update"); a handful of early entries are lower.  Transcription
# confidence is lowest here — but an error only mis-costs header
# bits on files that DO update probs; the flag semantics stay valid
# for our encoder (which never updates).
_U = 255


def _update_band(*rows):
    return tuple(tuple(r) for r in rows)


COEFF_UPDATE_PROBS = (
    (
        _update_band(
            (_U, _U, _U, _U, _U, _U, _U, _U, _U, _U, _U),
            (_U, _U, _U, _U, _U, _U, _U, _U, _U, _U, _U),
            (_U, _U, _U, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
        _update_band(
            (176, 246, _U, _U, _U, _U, _U, _U, _U, _U, _U),
            (223, 241, 252, _U, _U, _U, _U, _U, _U, _U, _U),
            (249, 253, 253, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
        _update_band(
            (_U, 244, 252, _U, _U, _U, _U, _U, _U, _U, _U),
            (234, 254, 254, _U, _U, _U, _U, _U, _U, _U, _U),
            (253, 255, 254, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
        _update_band(
            (_U, 246, 254, _U, _U, _U, _U, _U, _U, _U, _U),
            (239, 253, 254, _U, _U, _U, _U, _U, _U, _U, _U),
            (254, 255, 254, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
        _update_band(
            (_U, 248, 254, _U, _U, _U, _U, _U, _U, _U, _U),
            (251, 255, 254, _U, _U, _U, _U, _U, _U, _U, _U),
            (_U, _U, _U, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
        _update_band(
            (_U, 253, 254, _U, _U, _U, _U, _U, _U, _U, _U),
            (251, 254, 254, _U, _U, _U, _U, _U, _U, _U, _U),
            (254, 255, 254, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
        _update_band(
            (_U, 254, 253, _U, 254, _U, _U, _U, _U, _U, _U),
            (250, 255, 254, _U, 254, _U, _U, _U, _U, _U, _U),
            (254, 255, _U, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
        _update_band(
            (_U, _U, _U, _U, _U, _U, _U, _U, _U, _U, _U),
            (_U, _U, _U, _U, _U, _U, _U, _U, _U, _U, _U),
            (_U, _U, _U, _U, _U, _U, _U, _U, _U, _U, _U),
        ),
    ),
) * 4  # per-block-type structure repeats with minor variation; see note

#: key-frame B_PRED sub-mode probabilities, indexed
#: [above_bmode][left_bmode] -> 9 probs.  Best-effort: the exact
#: 10x10x9 table could not be verified in-container; unverified
#: contexts fall back to the spec's context-independent default
#: (used by inter frames), which keeps the tree/semantics valid.
_BMODE_DEFAULT = (120, 90, 79, 133, 87, 85, 80, 111, 151)
_KF_BMODE_KNOWN = {
    (B_DC, B_DC): (231, 120, 48, 89, 115, 113, 120, 152, 112),
    (B_DC, B_TM): (152, 179, 64, 126, 170, 118, 46, 70, 95),
    (B_DC, B_VE): (175, 69, 143, 80, 85, 82, 72, 155, 103),
    (B_TM, B_DC): (78, 90, 42, 147, 163, 214, 47, 123, 87),
    (B_VE, B_DC): (104, 55, 44, 218, 9, 54, 53, 130, 226),
}
KF_BMODE_PROBS = tuple(
    tuple(
        _KF_BMODE_KNOWN.get((a, l), _BMODE_DEFAULT) for l in range(10)
    )
    for a in range(10)
)


# ---------------------------------------------------------------------------
# Boolean arithmetic coder (RFC 6386 §7) — exact
# ---------------------------------------------------------------------------


class BoolDecoder:
    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, bits: int) -> int:
        v = self.literal(bits)
        return -v if self.bool(128) else v

    def flagged_signed(self, bits: int) -> int:
        """The header's optional signed value: flag, then magnitude+sign."""
        if self.bool(128):
            return self.signed_literal(bits)
        return 0

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            node = tree[i + self.bool(probs[i >> 1])]
            if node <= 0:
                return -node
            i = node


class BoolEncoder:
    __slots__ = ("out", "range", "bottom", "bit_count")

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def bool(self, prob: int, bit: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def literal(self, bits: int, value: int):
        for i in range(bits - 1, -1, -1):
            self.bool(128, (value >> i) & 1)

    def tree(self, tree, probs, symbol: int, start: int = 0):
        # walk the tree encoding the branch decisions leading to symbol
        path = []

        def find(i):
            for b in (0, 1):
                node = tree[i + b]
                if node <= 0:
                    if -node == symbol:
                        path.append((i >> 1, b))
                        return True
                else:
                    if find(node):
                        path.append((i >> 1, b))
                        return True
            return False

        if not find(start):
            raise ValueError(f"symbol {symbol} not in tree")
        for prob_idx, bit in reversed(path):
            self.bool(probs[prob_idx], bit)

    def finish(self) -> bytes:
        for _ in range(32):
            self.bool(128, 0)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 §14.3-14.4) — exact integer
# ---------------------------------------------------------------------------


def inv_walsh(coeffs) -> list:
    """4x4 inverse WHT: Y2 coefficients (natural order) -> the 16 luma
    DC values (raster subblock order)."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        out[base] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, *65536
_C2 = 35468  # sin(pi/8)*sqrt(2), *65536


def inv_dct4x4_batch(coeffs: np.ndarray) -> np.ndarray:
    """Vectorized inverse DCT over N blocks at once: (n, 16) int ->
    (n, 4, 4) residuals.  Bit-identical to :func:`inv_dct4x4` (the
    scalar form stays as the parity reference); batching the ~25
    blocks of each macroblock removes the dominant python-loop cost
    on coefficient-heavy frames."""
    ip = coeffs.reshape(-1, 4, 4).astype(np.int64)
    # pass 1: down the columns
    a1 = ip[:, 0, :] + ip[:, 2, :]
    b1 = ip[:, 0, :] - ip[:, 2, :]
    c1 = ((ip[:, 1, :] * _C2) >> 16) - (ip[:, 3, :] + ((ip[:, 3, :] * _C1) >> 16))
    d1 = (ip[:, 1, :] + ((ip[:, 1, :] * _C1) >> 16)) + ((ip[:, 3, :] * _C2) >> 16)
    tmp = np.empty_like(ip)
    tmp[:, 0, :] = a1 + d1
    tmp[:, 3, :] = a1 - d1
    tmp[:, 1, :] = b1 + c1
    tmp[:, 2, :] = b1 - c1
    # pass 2: across the rows
    a1 = tmp[:, :, 0] + tmp[:, :, 2]
    b1 = tmp[:, :, 0] - tmp[:, :, 2]
    c1 = ((tmp[:, :, 1] * _C2) >> 16) - (tmp[:, :, 3] + ((tmp[:, :, 3] * _C1) >> 16))
    d1 = (tmp[:, :, 1] + ((tmp[:, :, 1] * _C1) >> 16)) + ((tmp[:, :, 3] * _C2) >> 16)
    out = np.empty_like(ip, dtype=np.int32)
    out[:, :, 0] = (a1 + d1 + 4) >> 3
    out[:, :, 3] = (a1 - d1 + 4) >> 3
    out[:, :, 1] = (b1 + c1 + 4) >> 3
    out[:, :, 2] = (b1 - c1 + 4) >> 3
    return out


def inv_dct4x4(coeffs) -> np.ndarray:
    """4x4 inverse DCT (natural-order int coefficients) -> int residual."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.zeros((4, 4), np.int32)
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 2]
        b1 = tmp[base] - tmp[base + 2]
        t1 = (tmp[base + 1] * _C2) >> 16
        t2 = tmp[base + 3] + ((tmp[base + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[base + 1] + ((tmp[base + 1] * _C1) >> 16)
        t2 = (tmp[base + 3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 §12) — operates on bordered planes
# ---------------------------------------------------------------------------


def _pred_dc(above, left, have_above, have_left, size):
    if have_above and have_left:
        s = int(above.sum()) + int(left.sum())
        return (s + size) >> (int(np.log2(size)) + 1)
    if have_above:
        return (int(above.sum()) + (size >> 1)) >> int(np.log2(size))
    if have_left:
        return (int(left.sum()) + (size >> 1)) >> int(np.log2(size))
    return 128


def predict_block(plane, y, x, size, mode, have_above, have_left):
    """Whole-block (16x16 / 8x8) intra prediction into an int32 array.
    ``plane`` carries a 1-pixel border at index -1 handled by offset:
    callers pass bordered arrays where [0,:] / [:,0] are the borders
    and the block origin is (y, x) with y,x >= 1."""
    above = plane[y - 1, x : x + size].astype(np.int32)
    left = plane[y : y + size, x - 1].astype(np.int32)
    al = int(plane[y - 1, x - 1])
    if mode == DC_PRED:
        v = _pred_dc(above, left, have_above, have_left, size)
        return np.full((size, size), v, np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    if mode == TM_PRED:
        p = left[:, None] + above[None, :] - al
        return np.clip(p, 0, 255)
    raise ValueError(f"bad whole-block mode {mode}")


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def predict_subblock(mode, A, L, AL, AR):
    """4x4 B_PRED prediction.  A: 4 above pixels, L: 4 left pixels
    (top to bottom), AL: above-left, AR: 4 above-right pixels — all
    ints.  Returns a 4x4 int array.  Follows RFC 6386 §12.3's exact
    per-mode pixel layouts (including the shifted-row reuse in
    VR/VL/HD and the L3-saturated tail of HU/LD)."""
    a0, a1, a2, a3 = (int(v) for v in A)
    l0, l1, l2, l3 = (int(v) for v in L)
    r0, r1, r2, r3 = (int(v) for v in AR)
    al = int(AL)
    if mode == B_DC:
        v = (a0 + a1 + a2 + a3 + l0 + l1 + l2 + l3 + 4) >> 3
        return np.full((4, 4), v, np.int32)
    if mode == B_TM:
        p = (
            np.array([l0, l1, l2, l3], np.int32)[:, None]
            + np.array([a0, a1, a2, a3], np.int32)[None, :]
            - al
        )
        return np.clip(p, 0, 255)
    if mode == B_VE:
        row = [
            _avg3(al, a0, a1), _avg3(a0, a1, a2),
            _avg3(a1, a2, a3), _avg3(a2, a3, r0),
        ]
        return np.tile(np.array(row, np.int32), (4, 1))
    if mode == B_HE:
        col = [
            _avg3(al, l0, l1), _avg3(l0, l1, l2),
            _avg3(l1, l2, l3), _avg3(l2, l3, l3),
        ]
        return np.tile(np.array(col, np.int32)[:, None], (1, 4))
    if mode == B_LD:
        e = [a0, a1, a2, a3, r0, r1, r2, r3]
        B = np.zeros((4, 4), np.int32)
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    B[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
                else:
                    B[r, c] = _avg3(e[6], e[7], e[7])
        return B
    if mode == B_RD:
        e = [l3, l2, l1, l0, al, a0, a1, a2, a3]
        B = np.zeros((4, 4), np.int32)
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                B[r, c] = _avg3(e[i - 1], e[i], e[i + 1])
        return B
    if mode == B_VR:
        B = np.zeros((4, 4), np.int32)
        B[0] = [_avg2(al, a0), _avg2(a0, a1), _avg2(a1, a2), _avg2(a2, a3)]
        B[1] = [
            _avg3(l0, al, a0), _avg3(al, a0, a1),
            _avg3(a0, a1, a2), _avg3(a1, a2, a3),
        ]
        B[2, 0] = _avg3(l1, l0, al)
        B[2, 1:] = B[0, :3]
        B[3, 0] = _avg3(l2, l1, l0)
        B[3, 1:] = B[1, :3]
        return B
    if mode == B_VL:
        B = np.zeros((4, 4), np.int32)
        B[0] = [_avg2(a0, a1), _avg2(a1, a2), _avg2(a2, a3), _avg2(a3, r0)]
        B[1] = [
            _avg3(a0, a1, a2), _avg3(a1, a2, a3),
            _avg3(a2, a3, r0), _avg3(a3, r0, r1),
        ]
        B[2, :3] = B[0, 1:]
        B[2, 3] = _avg3(r0, r1, r2)
        B[3, :3] = B[1, 1:]
        B[3, 3] = _avg3(r1, r2, r3)
        return B
    if mode == B_HD:
        B = np.zeros((4, 4), np.int32)
        B[0] = [
            _avg2(l0, al), _avg3(l0, al, a0),
            _avg3(al, a0, a1), _avg3(a0, a1, a2),
        ]
        B[1, 0] = _avg2(l1, l0)
        B[1, 1] = _avg3(l1, l0, al)
        B[1, 2:] = B[0, :2]
        B[2, 0] = _avg2(l2, l1)
        B[2, 1] = _avg3(l2, l1, l0)
        B[2, 2:] = B[1, :2]
        B[3, 0] = _avg2(l3, l2)
        B[3, 1] = _avg3(l3, l2, l1)
        B[3, 2:] = B[2, :2]
        return B
    if mode == B_HU:
        B = np.zeros((4, 4), np.int32)
        B[0] = [_avg2(l0, l1), _avg3(l0, l1, l2), _avg2(l1, l2), _avg3(l1, l2, l3)]
        B[1, 0], B[1, 1] = B[0, 2], B[0, 3]
        B[1, 2] = _avg2(l2, l3)
        B[1, 3] = _avg3(l2, l3, l3)
        B[2, 0], B[2, 1] = B[1, 2], B[1, 3]
        B[2, 2] = l3
        B[2, 3] = l3
        B[3, :] = l3
        return B
    raise ValueError(f"bad subblock mode {mode}")


# ---------------------------------------------------------------------------
# Frame header (RFC 6386 §9) and dequantization factors
# ---------------------------------------------------------------------------


class _Header:
    __slots__ = (
        "width", "height", "show", "segmentation", "update_map",
        "seg_tree_probs", "seg_abs", "seg_q", "seg_lf",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "n_partitions", "qi", "y_dc_d", "y2_dc_d", "y2_ac_d",
        "uv_dc_d", "uv_ac_d", "skip_enabled", "prob_skip",
        "coeff_probs",
    )


def _parse_header(bd: BoolDecoder, hdr: _Header):
    bd.bool(128)  # color_space
    bd.bool(128)  # clamping_type
    hdr.segmentation = bd.bool(128)
    hdr.update_map = 0
    hdr.seg_tree_probs = [255, 255, 255]
    hdr.seg_abs = 0
    hdr.seg_q = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    if hdr.segmentation:
        hdr.update_map = bd.bool(128)
        update_data = bd.bool(128)
        if update_data:
            hdr.seg_abs = bd.bool(128)
            for i in range(4):
                hdr.seg_q[i] = bd.flagged_signed(7)
            for i in range(4):
                hdr.seg_lf[i] = bd.flagged_signed(6)
        if hdr.update_map:
            for i in range(3):
                if bd.bool(128):
                    hdr.seg_tree_probs[i] = bd.literal(8)
    hdr.filter_type = bd.bool(128)
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.lf_delta_enabled = bd.bool(128)
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta_enabled:
        if bd.bool(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.bool(128):
                    hdr.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bool(128):
                    hdr.mode_lf_deltas[i] = bd.signed_literal(6)
    hdr.n_partitions = 1 << bd.literal(2)
    hdr.qi = bd.literal(7)
    hdr.y_dc_d = bd.flagged_signed(4)
    hdr.y2_dc_d = bd.flagged_signed(4)
    hdr.y2_ac_d = bd.flagged_signed(4)
    hdr.uv_dc_d = bd.flagged_signed(4)
    hdr.uv_ac_d = bd.flagged_signed(4)
    bd.bool(128)  # refresh_entropy_probs (no effect within one key frame)
    probs = [
        [[list(ctx) for ctx in band] for band in btype]
        for btype in DEFAULT_COEFF_PROBS
    ]
    for t in range(4):
        for b in range(8):
            for ctx in range(3):
                for tok in range(11):
                    if bd.bool(COEFF_UPDATE_PROBS[t][b][ctx][tok]):
                        probs[t][b][ctx][tok] = bd.literal(8)
    hdr.coeff_probs = probs
    hdr.skip_enabled = bd.bool(128)
    hdr.prob_skip = bd.literal(8) if hdr.skip_enabled else 0


def _dequant_factors(hdr: _Header, segment: int):
    qi = hdr.qi
    if hdr.segmentation:
        qi = hdr.seg_q[segment] if hdr.seg_abs else qi + hdr.seg_q[segment]
    qi = _clamp_q(qi)
    y1dc = DC_QLOOKUP[_clamp_q(qi + hdr.y_dc_d)]
    y1ac = AC_QLOOKUP[qi]
    y2dc = DC_QLOOKUP[_clamp_q(qi + hdr.y2_dc_d)] * 2
    y2ac = AC_QLOOKUP[_clamp_q(qi + hdr.y2_ac_d)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(qi + hdr.uv_dc_d)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(qi + hdr.uv_ac_d)]
    return {"y1": (y1dc, y1ac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


# ---------------------------------------------------------------------------
# Token (coefficient) decode — RFC 6386 §13
# ---------------------------------------------------------------------------


def _decode_coeffs(bd, type_probs, ctx, first, dq_dc, dq_ac):
    """One 4x4 block's token run -> (natural-order int coeffs, nonzero).

    This is THE decode hot loop (25 blocks/MB x up to ~30 boolean
    symbols each), so the boolean decoder is inlined on local
    variables — ~2x over method calls; the readable BoolDecoder.bool
    stays the reference (parity pinned by the roundtrip tests)."""
    data = bd.data
    n_data = len(data)
    pos = bd.pos
    value = bd.value
    rng = bd.range
    bit_count = bd.bit_count
    tree = COEFF_TREE
    bands = COEFF_BANDS
    coeffs = [0] * 16
    c = first
    start = 0
    nz = False
    while c < 16:
        probs = type_probs[bands[c]][ctx]
        # --- inlined tree decode from `start` ---
        i = start
        while True:
            p = probs[i >> 1]
            split = 1 + (((rng - 1) * p) >> 8)
            big = split << 8
            if value >= big:
                bit = 1
                rng -= split
                value -= big
            else:
                bit = 0
                rng = split
            while rng < 128:
                value <<= 1
                rng <<= 1
                bit_count += 1
                if bit_count == 8:
                    bit_count = 0
                    if pos < n_data:
                        value |= data[pos]
                        pos += 1
            node = tree[i + bit]
            if node <= 0:
                tok = -node
                break
            i = node
        if tok == EOB:
            break
        if tok == ZERO:
            ctx = 0
            start = 2
            c += 1
            continue
        if tok == ONE:
            v = 1
            ctx = 1
        else:
            if tok <= FOUR:
                v = tok - 1  # TWO/THREE/FOUR carry values 2/3/4
            else:
                extra = 0
                for p in CAT_PROBS[tok]:
                    split = 1 + (((rng - 1) * p) >> 8)
                    big = split << 8
                    if value >= big:
                        bit = 1
                        rng -= split
                        value -= big
                    else:
                        bit = 0
                        rng = split
                    while rng < 128:
                        value <<= 1
                        rng <<= 1
                        bit_count += 1
                        if bit_count == 8:
                            bit_count = 0
                            if pos < n_data:
                                value |= data[pos]
                                pos += 1
                    extra = (extra << 1) | bit
                v = CAT_BASE[tok] + extra
            ctx = 2
        # sign bit at prob 128
        split = 1 + (((rng - 1) * 128) >> 8)
        big = split << 8
        if value >= big:
            v = -v
            rng -= split
            value -= big
        else:
            rng = split
        while rng < 128:
            value <<= 1
            rng <<= 1
            bit_count += 1
            if bit_count == 8:
                bit_count = 0
                if pos < n_data:
                    value |= data[pos]
                    pos += 1
        coeffs[ZIGZAG[c]] = v * (dq_dc if c == 0 else dq_ac)
        start = 0
        c += 1
        nz = True
    bd.pos = pos
    bd.value = value
    bd.range = rng
    bd.bit_count = bit_count
    return coeffs, nz


# ---------------------------------------------------------------------------
# Key-frame decode
# ---------------------------------------------------------------------------


def decode_vp8(data: bytes, strict: bool = False) -> dict:
    """VP8 payload (the 'VP8 ' chunk body) -> dict with uint8 planes
    ``y`` (h, w), ``u``/``v`` (ceil(h/2), ceil(w/2)) plus ``width`` /
    ``height``.  Key frames only (every still WebP is one).

    ``strict=True`` refuses to decode while :data:`TABLES_UNVERIFIED`
    is set — for callers that must not risk silently-wrong pixels on
    wild files; the default emits a one-time RuntimeWarning instead."""
    if TABLES_UNVERIFIED:
        if strict:
            raise ValueError(UNVERIFIED_TABLES_NOTE)
        warnings.warn(UNVERIFIED_TABLES_NOTE, RuntimeWarning, stacklevel=2)
    if len(data) < 10:
        raise ValueError("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe: only key frames are supported")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 key-frame start code")
    w16 = data[6] | (data[7] << 8)
    h16 = data[8] | (data[9] << 8)
    width, height = w16 & 0x3FFF, h16 & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("zero VP8 frame dimension")
    if 10 + first_part_size > len(data):
        raise ValueError("VP8 first partition overruns payload")

    bd = BoolDecoder(data[10 : 10 + first_part_size])
    hdr = _Header()
    hdr.width, hdr.height = width, height
    _parse_header(bd, hdr)

    # DCT partition table
    part_base = 10 + first_part_size
    nparts = hdr.n_partitions
    sizes = []
    table = part_base
    data_start = part_base + 3 * (nparts - 1)
    for i in range(nparts - 1):
        o = table + 3 * i
        if o + 3 > len(data):
            raise ValueError("VP8 partition size table truncated")
        sizes.append(data[o] | (data[o + 1] << 8) | (data[o + 2] << 16))
    off = data_start
    parts = []
    for i in range(nparts):
        ln = sizes[i] if i < nparts - 1 else len(data) - off
        if off + ln > len(data) or ln < 0:
            raise ValueError("VP8 DCT partition overruns payload")
        parts.append(BoolDecoder(data[off : off + ln]))
        off += ln

    mb_rows, mb_cols = (height + 15) >> 4, (width + 15) >> 4
    dq_by_seg = [_dequant_factors(hdr, s) for s in range(4)]

    # bordered reconstruction planes (index 0 = border row/col)
    Y = np.empty((mb_rows * 16 + 1, mb_cols * 16 + 1), np.uint8)
    U = np.empty((mb_rows * 8 + 1, mb_cols * 8 + 1), np.uint8)
    V = np.empty_like(U)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129
        P[0, 0] = 127

    # entropy contexts
    above_y = np.zeros((mb_cols, 4), np.int8)
    above_u = np.zeros((mb_cols, 2), np.int8)
    above_v = np.zeros((mb_cols, 2), np.int8)
    above_y2 = np.zeros(mb_cols, np.int8)
    above_bmode = np.full((mb_cols, 4), B_DC, np.int8)

    mb_info = []  # (mode, has_coeffs, filter_level) per MB for the loop filter

    for mb_row in range(mb_rows):
        left_y = np.zeros(4, np.int8)
        left_u = np.zeros(2, np.int8)
        left_v = np.zeros(2, np.int8)
        left_y2 = np.int8(0)
        left_bmode = np.full(4, B_DC, np.int8)
        td = parts[mb_row % nparts]
        for mb_col in range(mb_cols):
            # --- prediction record (first partition) ---
            segment = 0
            if hdr.segmentation and hdr.update_map:
                p = hdr.seg_tree_probs
                if bd.bool(p[0]):
                    segment = 2 + bd.bool(p[2])
                else:
                    segment = bd.bool(p[1])
            skip = bd.bool(hdr.prob_skip) if hdr.skip_enabled else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            bmodes = None
            if ymode == B_PRED:
                bmodes = np.empty((4, 4), np.int8)
                for r in range(4):
                    for c in range(4):
                        a = above_bmode[mb_col][c] if r == 0 else bmodes[r - 1][c]
                        l = left_bmode[r] if c == 0 else bmodes[r][c - 1]
                        bmodes[r][c] = bd.tree(
                            BMODE_TREE, KF_BMODE_PROBS[a][l]
                        )
                above_bmode[mb_col] = bmodes[3]
                left_bmode[:] = bmodes[:, 3]
            else:
                implied = MODE_TO_BMODE[ymode]
                above_bmode[mb_col] = implied
                left_bmode[:] = implied
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

            dqf = dq_by_seg[segment]
            has_y2 = ymode != B_PRED

            # --- coefficient tokens (DCT partition) ---
            y2_out = None
            y_coeffs = [[0] * 16 for _ in range(16)]
            u_coeffs = [[0] * 16 for _ in range(4)]
            v_coeffs = [[0] * 16 for _ in range(4)]
            any_coeffs = False
            if skip:
                # spec: a skipped MB acts as all-zero for the Y/U/V
                # entropy contexts; the Y2 context is cleared only when
                # the MB actually has a Y2 block (non-B_PRED)
                above_y[mb_col] = 0
                left_y[:] = 0
                above_u[mb_col] = 0
                left_u[:] = 0
                above_v[mb_col] = 0
                left_v[:] = 0
                if has_y2:
                    above_y2[mb_col] = 0
                    left_y2 = np.int8(0)
            else:
                probs = hdr.coeff_probs
                if has_y2:
                    ctx = int(above_y2[mb_col]) + int(left_y2)
                    coeffs, nz = _decode_coeffs(
                        td, probs[1], ctx, 0, dqf["y2"][0], dqf["y2"][1]
                    )
                    above_y2[mb_col] = left_y2 = np.int8(nz)
                    any_coeffs |= nz
                    y2_out = inv_walsh(coeffs)
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for r in range(4):
                    for c in range(4):
                        ctx = int(above_y[mb_col][c]) + int(left_y[r])
                        coeffs, nz = _decode_coeffs(
                            td, probs[ytype], ctx, first,
                            dqf["y1"][0], dqf["y1"][1],
                        )
                        above_y[mb_col][c] = left_y[r] = np.int8(nz)
                        any_coeffs |= nz
                        y_coeffs[4 * r + c] = coeffs
                for plane_coeffs, above_c, left_c in (
                    (u_coeffs, above_u, left_u),
                    (v_coeffs, above_v, left_v),
                ):
                    for r in range(2):
                        for c in range(2):
                            ctx = int(above_c[mb_col][c]) + int(left_c[r])
                            coeffs, nz = _decode_coeffs(
                                td, probs[2], ctx, 0,
                                dqf["uv"][0], dqf["uv"][1],
                            )
                            above_c[mb_col][c] = left_c[r] = np.int8(nz)
                            any_coeffs |= nz
                            plane_coeffs[2 * r + c] = coeffs
                if y2_out is not None:
                    for i in range(16):
                        y_coeffs[i][0] = y2_out[i]

            # --- reconstruction ---
            ya, xa = 1 + mb_row * 16, 1 + mb_col * 16
            have_above, have_left = mb_row > 0, mb_col > 0
            y_res = (
                None
                if skip
                else inv_dct4x4_batch(np.asarray(y_coeffs, np.int64))
            )
            if ymode != B_PRED:
                pred = predict_block(Y, ya, xa, 16, ymode, have_above, have_left)
                if not skip:
                    for i in range(16):
                        r, c = divmod(i, 4)
                        pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += y_res[i]
                Y[ya : ya + 16, xa : xa + 16] = np.clip(pred, 0, 255).astype(np.uint8)
            else:
                # per-subblock: above-right for right-column subblocks
                # rows 1-3 comes from the row ABOVE the MB (spec quirk)
                top = Y[ya - 1, :]
                mb_ar = np.empty(4, np.int32)
                edge = xa + 16
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
                    if c == 3:
                        AR = mb_ar
                    else:
                        AR = Y[yy - 1, xx + 4 : xx + 8].astype(np.int32)
                    pred = predict_subblock(int(bmodes[r][c]), A, L, AL, AR)
                    if not skip:
                        pred = pred + y_res[i]
                    Y[yy : yy + 4, xx : xx + 4] = np.clip(pred, 0, 255).astype(
                        np.uint8
                    )
            yc, xc = 1 + mb_row * 8, 1 + mb_col * 8
            for P, pc in ((U, u_coeffs), (V, v_coeffs)):
                pred = predict_block(P, yc, xc, 8, uvmode, have_above, have_left)
                if not skip:
                    uv_res = inv_dct4x4_batch(np.asarray(pc, np.int64))
                    for i in range(4):
                        r, c = divmod(i, 2)
                        pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += uv_res[i]
                P[yc : yc + 8, xc : xc + 8] = np.clip(pred, 0, 255).astype(np.uint8)

            lf = hdr.filter_level
            if hdr.segmentation:
                lf = (
                    hdr.seg_lf[segment]
                    if hdr.seg_abs
                    else lf + hdr.seg_lf[segment]
                )
            if hdr.lf_delta_enabled:
                lf += hdr.ref_lf_deltas[0]  # intra frame
                if ymode == B_PRED:
                    lf += hdr.mode_lf_deltas[0]
            lf = max(0, min(63, lf))
            mb_info.append((ymode, bool(any_coeffs) and not skip, lf))

    if hdr.filter_level > 0:
        _loop_filter(Y, U, V, hdr, mb_info, mb_rows, mb_cols)

    return {
        "width": width,
        "height": height,
        "y": Y[1 : 1 + height, 1 : 1 + width].copy(),
        "u": U[1 : 1 + ((height + 1) >> 1), 1 : 1 + ((width + 1) >> 1)].copy(),
        "v": V[1 : 1 + ((height + 1) >> 1), 1 : 1 + ((width + 1) >> 1)].copy(),
    }


# ---------------------------------------------------------------------------
# In-loop deblocking filter (RFC 6386 §15) — vectorized across each edge
# ---------------------------------------------------------------------------


def _s(x):
    """uint8 pixel vector -> signed domain (int32, -128..127)."""
    return x.astype(np.int32) - 128


def _u(x):
    """signed domain -> uint8 with clamp."""
    return (np.clip(x, -128, 127) + 128).astype(np.uint8)


def _c(x):
    """clamp to signed-char range (the spec's c() operator)."""
    return np.clip(x, -128, 127)


def _common_adjust(use_outer, p1, p0, q0, q1):
    a = _c(np.where(use_outer, _c(p1 - q1), 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    return p0 + e, q0 - f, f


def _filter_mask(limit, edge_limit, p3, p2, p1, p0, q0, q1, q2, q3):
    return (
        (np.abs(p3 - p2) <= limit)
        & (np.abs(p2 - p1) <= limit)
        & (np.abs(p1 - p0) <= limit)
        & (np.abs(q1 - q0) <= limit)
        & (np.abs(q2 - q1) <= limit)
        & (np.abs(q3 - q2) <= limit)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_limit)
    )


def _hev(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _subblock_filter(hev_t, interior, edge_limit, px):
    """px: list of 8 signed vectors [p3 p2 p1 p0 q0 q1 q2 q3] -> filtered."""
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    mask = _filter_mask(interior, edge_limit, *px)
    hv = _hev(hev_t, p1, p0, q0, q1)
    np0, nq0, f = _common_adjust(hv, p1, p0, q0, q1)
    a = (_c(f + 1)) >> 1
    np1 = np.where(~hv, p1 + a, p1)
    nq1 = np.where(~hv, q1 - a, q1)
    return [
        p3, p2,
        np.where(mask, np1, p1), np.where(mask, np0, p0),
        np.where(mask, nq0, q0), np.where(mask, nq1, q1),
        q2, q3,
    ]


def _mbedge_filter(hev_t, interior, edge_limit, px):
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    mask = _filter_mask(interior, edge_limit, *px)
    hv = _hev(hev_t, p1, p0, q0, q1)
    # hev path: common adjust with outer taps
    hp0, hq0, _ = _common_adjust(np.ones_like(p0, bool), p1, p0, q0, q1)
    # non-hev path: wide 3-tap smoothing
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a27 = _c((27 * w + 63) >> 7)
    a18 = _c((18 * w + 63) >> 7)
    a9 = _c((9 * w + 63) >> 7)
    np0 = np.where(hv, hp0, p0 + a27)
    nq0 = np.where(hv, hq0, q0 - a27)
    np1 = np.where(hv, p1, p1 + a18)
    nq1 = np.where(hv, q1, q1 - a18)
    np2 = np.where(hv, p2, p2 + a9)
    nq2 = np.where(hv, q2, q2 - a9)
    return [
        p3,
        np.where(mask, np2, p2), np.where(mask, np1, p1),
        np.where(mask, np0, p0), np.where(mask, nq0, q0),
        np.where(mask, nq1, q1), np.where(mask, nq2, q2),
        q3,
    ]


def _apply_edge(plane, y0, x0, n, vertical, fn):
    """Filter one edge: ``vertical`` means the edge line is vertical
    (pixels left/right of x0 change).  n = edge length."""
    if vertical:
        cols = [plane[y0 : y0 + n, x0 + d] for d in range(-4, 4)]
        px = [_s(c) for c in cols]
        out = fn(px)
        for d, v in zip(range(-4, 4), out):
            plane[y0 : y0 + n, x0 + d] = _u(v)
    else:
        rows = [plane[y0 + d, x0 : x0 + n] for d in range(-4, 4)]
        px = [_s(r) for r in rows]
        out = fn(px)
        for d, v in zip(range(-4, 4), out):
            plane[y0 + d, x0 : x0 + n] = _u(v)


def _simple_edge(plane, y0, x0, n, vertical, edge_limit):
    if vertical:
        p1, p0, q0, q1 = (
            _s(plane[y0 : y0 + n, x0 - 2]), _s(plane[y0 : y0 + n, x0 - 1]),
            _s(plane[y0 : y0 + n, x0]), _s(plane[y0 : y0 + n, x0 + 1]),
        )
    else:
        p1, p0, q0, q1 = (
            _s(plane[y0 - 2, x0 : x0 + n]), _s(plane[y0 - 1, x0 : x0 + n]),
            _s(plane[y0, x0 : x0 + n]), _s(plane[y0 + 1, x0 : x0 + n]),
        )
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_limit
    np0, nq0, _ = _common_adjust(np.ones_like(p0, bool), p1, p0, q0, q1)
    p0f = np.where(mask, np0, p0)
    q0f = np.where(mask, nq0, q0)
    if vertical:
        plane[y0 : y0 + n, x0 - 1] = _u(p0f)
        plane[y0 : y0 + n, x0] = _u(q0f)
    else:
        plane[y0 - 1, x0 : x0 + n] = _u(p0f)
        plane[y0, x0 : x0 + n] = _u(q0f)


def _loop_filter(Y, U, V, hdr, mb_info, mb_rows, mb_cols):
    """Deblock in MB raster order: left MB edge, interior vertical
    edges, top MB edge, interior horizontal edges — per RFC 6386 §15.
    Interior edges are skipped for skipped/coeff-free non-B_PRED MBs."""
    simple = bool(hdr.filter_type)
    sharp = hdr.sharpness
    for idx, (mode, has_coeffs, level) in enumerate(mb_info):
        if level == 0:
            continue
        mb_row, mb_col = divmod(idx, mb_cols)
        interior = level
        if sharp:
            interior >>= 2 if sharp > 4 else 1
            cap = 9 - sharp
            if interior > cap:
                interior = cap
        if interior < 1:
            interior = 1
        mbe_limit = ((level + 2) * 2) + interior
        sub_limit = (level * 2) + interior
        hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
        inner = has_coeffs or mode == B_PRED
        ya, xa = 1 + 16 * mb_row, 1 + 16 * mb_col
        yc, xc = 1 + 8 * mb_row, 1 + 8 * mb_col

        if simple:
            if mb_col > 0:
                _simple_edge(Y, ya, xa, 16, True, mbe_limit)
            if inner:
                for dx in (4, 8, 12):
                    _simple_edge(Y, ya, xa + dx, 16, True, sub_limit)
            if mb_row > 0:
                _simple_edge(Y, ya, xa, 16, False, mbe_limit)
            if inner:
                for dy in (4, 8, 12):
                    _simple_edge(Y, ya + dy, xa, 16, False, sub_limit)
            continue

        mb_fn = lambda px: _mbedge_filter(hev_t, interior, mbe_limit, px)
        sb_fn = lambda px: _subblock_filter(hev_t, interior, sub_limit, px)
        if mb_col > 0:
            _apply_edge(Y, ya, xa, 16, True, mb_fn)
            _apply_edge(U, yc, xc, 8, True, mb_fn)
            _apply_edge(V, yc, xc, 8, True, mb_fn)
        if inner:
            for dx in (4, 8, 12):
                _apply_edge(Y, ya, xa + dx, 16, True, sb_fn)
            _apply_edge(U, yc, xc + 4, 8, True, sb_fn)
            _apply_edge(V, yc, xc + 4, 8, True, sb_fn)
        if mb_row > 0:
            _apply_edge(Y, ya, xa, 16, False, mb_fn)
            _apply_edge(U, yc, xc, 8, False, mb_fn)
            _apply_edge(V, yc, xc, 8, False, mb_fn)
        if inner:
            for dy in (4, 8, 12):
                _apply_edge(Y, ya + dy, xa, 16, False, sb_fn)
            _apply_edge(U, yc + 4, xc, 8, False, sb_fn)
            _apply_edge(V, yc + 4, xc, 8, False, sb_fn)


# ---------------------------------------------------------------------------
# YUV 4:2:0 -> RGBA
# ---------------------------------------------------------------------------


def yuv420_to_rgba(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Integer BT.601 limited-range conversion with nearest-neighbor
    chroma upsampling — OUR documented display conversion (the VP8
    spec does not normatively define one; libwebp's fancy upsampler
    differs by design).  Exact integer closed form, so oracles can
    replay it in SQL:
        r = clip((298*(y-16) + 409*(v-128) + 128) >> 8)
        g = clip((298*(y-16) - 100*(u-128) - 208*(v-128) + 128) >> 8)
        b = clip((298*(y-16) + 516*(u-128) + 128) >> 8)
    """
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    yy = y.astype(np.int32)
    c = 298 * (yy - 16)
    r = np.clip((c + 409 * (vv - 128) + 128) >> 8, 0, 255)
    g = np.clip((c - 100 * (uu - 128) - 208 * (vv - 128) + 128) >> 8, 0, 255)
    b = np.clip((c + 516 * (uu - 128) + 128) >> 8, 0, 255)
    out = np.empty((h, w, 4), np.uint8)
    out[:, :, 0] = r
    out[:, :, 1] = g
    out[:, :, 2] = b
    out[:, :, 3] = 255
    return out


def decode_vp8_rgba(data: bytes, strict: bool = False) -> np.ndarray:
    f = decode_vp8(data, strict=strict)
    return yuv420_to_rgba(f["y"], f["u"], f["v"])


# ---------------------------------------------------------------------------
# Fixture encoder — levels in, valid key frame out (shares all tables)
# ---------------------------------------------------------------------------


def _encode_coeffs(be, type_probs, ctx, first, levels):
    """Token-encode one block's SCAN-ORDER quantized levels (c order,
    i.e. pre-zigzag).  Mirrors _decode_coeffs exactly; returns nonzero."""
    last = -1
    for i in range(first, 16):
        if levels[i]:
            last = i
    c = first
    start = 0
    nz = False
    while c < 16:
        probs = type_probs[COEFF_BANDS[c]][ctx]
        if c > last:
            be.tree(COEFF_TREE, probs, EOB, start)
            return nz
        v = levels[c]
        if v == 0:
            be.tree(COEFF_TREE, probs, ZERO, start)
            ctx = 0
            start = 2
            c += 1
            continue
        av = abs(v)
        if av == 1:
            be.tree(COEFF_TREE, probs, ONE, start)
            ctx = 1
        elif av <= 4:
            be.tree(COEFF_TREE, probs, av + 1, start)
            ctx = 2
        else:
            for tok in (CAT1, CAT2, CAT3, CAT4, CAT5, CAT6):
                hi = CAT_BASE[tok] + (1 << len(CAT_PROBS[tok])) - 1
                if av <= hi:
                    break
            else:
                raise ValueError(f"level {av} too large for CAT6")
            be.tree(COEFF_TREE, probs, tok, start)
            extra = av - CAT_BASE[tok]
            for i, p in enumerate(CAT_PROBS[tok]):
                be.bool(p, (extra >> (len(CAT_PROBS[tok]) - 1 - i)) & 1)
            ctx = 2
        be.bool(128, 1 if v < 0 else 0)
        start = 0
        c += 1
        nz = True
    return nz


def encode_vp8_frame(width: int, height: int, mbs: list, qi: int = 0) -> bytes:
    """Key-frame encoder for fixtures: per-MB dicts with keys
    ``y_mode`` (DC_PRED..B_PRED), ``uv_mode``, optional ``b_modes``
    (4x4 list, required for B_PRED), ``skip`` (bool), and SCAN-ORDER
    quantized levels ``y2`` (16), ``y`` (16x16), ``u``/``v`` (4x16).
    Non-multiple-of-16 dimensions follow the spec: the frame header
    carries the true size and macroblocks pad implicitly (the decoder
    crops).  No segmentation, loop filter level 0, one DCT partition,
    default probabilities (shared with the decoder, making every
    round-trip table-independent)."""
    mb_rows, mb_cols = (height + 15) >> 4, (width + 15) >> 4
    if len(mbs) != mb_rows * mb_cols:
        raise ValueError("need one MB spec per macroblock")

    he = BoolEncoder()
    he.bool(128, 0)  # color_space
    he.bool(128, 0)  # clamping
    he.bool(128, 0)  # segmentation_enabled
    he.bool(128, 0)  # filter_type (normal)
    he.literal(6, 0)  # filter_level 0
    he.literal(3, 0)  # sharpness
    he.bool(128, 0)  # lf delta enable
    he.literal(2, 0)  # log2(partitions) = 0 -> 1 partition
    he.literal(7, qi)
    for _ in range(5):
        he.bool(128, 0)  # quant deltas absent
    he.bool(128, 1)  # refresh_entropy_probs
    for t in range(4):
        for b in range(8):
            for ctx in range(3):
                for tok in range(11):
                    he.bool(COEFF_UPDATE_PROBS[t][b][ctx][tok], 0)
    he.bool(128, 1)  # mb_no_coeff_skip enabled
    he.literal(8, 128)  # prob_skip_false

    te = BoolEncoder()
    above_y = np.zeros((mb_cols, 4), np.int8)
    above_u = np.zeros((mb_cols, 2), np.int8)
    above_v = np.zeros((mb_cols, 2), np.int8)
    above_y2 = np.zeros(mb_cols, np.int8)
    above_bmode = np.full((mb_cols, 4), B_DC, np.int8)
    probs = DEFAULT_COEFF_PROBS

    for mb_row in range(mb_rows):
        left_y = np.zeros(4, np.int8)
        left_u = np.zeros(2, np.int8)
        left_v = np.zeros(2, np.int8)
        left_y2 = np.int8(0)
        left_bmode = np.full(4, B_DC, np.int8)
        for mb_col in range(mb_cols):
            mb = mbs[mb_row * mb_cols + mb_col]
            ymode = mb.get("y_mode", DC_PRED)
            uvmode = mb.get("uv_mode", DC_PRED)
            skip = bool(mb.get("skip", False))
            has_y2 = ymode != B_PRED
            he.bool(128, 1 if skip else 0)
            he.tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            if ymode == B_PRED:
                bm = np.asarray(mb["b_modes"], np.int8).reshape(4, 4)
                for r in range(4):
                    for c in range(4):
                        a = above_bmode[mb_col][c] if r == 0 else bm[r - 1][c]
                        l = left_bmode[r] if c == 0 else bm[r][c - 1]
                        he.tree(BMODE_TREE, KF_BMODE_PROBS[a][l], int(bm[r][c]))
                above_bmode[mb_col] = bm[3]
                left_bmode[:] = bm[:, 3]
            else:
                implied = MODE_TO_BMODE[ymode]
                above_bmode[mb_col] = implied
                left_bmode[:] = implied
            he.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)

            if skip:
                above_y[mb_col] = 0
                left_y[:] = 0
                above_u[mb_col] = 0
                left_u[:] = 0
                above_v[mb_col] = 0
                left_v[:] = 0
                if has_y2:
                    above_y2[mb_col] = 0
                    left_y2 = np.int8(0)
                continue
            if has_y2:
                ctx = int(above_y2[mb_col]) + int(left_y2)
                nz = _encode_coeffs(
                    te, probs[1], ctx, 0, mb.get("y2", [0] * 16)
                )
                above_y2[mb_col] = left_y2 = np.int8(nz)
            ytype = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            ylv = mb.get("y", [[0] * 16 for _ in range(16)])
            for r in range(4):
                for c in range(4):
                    ctx = int(above_y[mb_col][c]) + int(left_y[r])
                    nz = _encode_coeffs(te, probs[ytype], ctx, first, ylv[4 * r + c])
                    above_y[mb_col][c] = left_y[r] = np.int8(nz)
            for key, above_c, left_c in (
                ("u", above_u, left_u), ("v", above_v, left_v)
            ):
                lv = mb.get(key, [[0] * 16 for _ in range(4)])
                for r in range(2):
                    for c in range(2):
                        ctx = int(above_c[mb_col][c]) + int(left_c[r])
                        nz = _encode_coeffs(te, probs[2], ctx, 0, lv[2 * r + c])
                        above_c[mb_col][c] = left_c[r] = np.int8(nz)

    first_part = he.finish()
    tokens = te.finish()
    tag = (len(first_part) << 5) | (1 << 4) | 0  # show_frame, key frame
    head = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
    ) + b"\x9d\x01\x2a" + bytes(
        [width & 0xFF, (width >> 8) & 0x3F, height & 0xFF, (height >> 8) & 0x3F]
    )
    return head + first_part + tokens


def encode_webp_lossy(width: int, height: int, mbs: list, qi: int = 0) -> bytes:
    """Wrap a fixture VP8 key frame in a minimal RIFF/WEBP container."""
    import struct

    payload = encode_vp8_frame(width, height, mbs, qi)
    if len(payload) & 1:
        payload += b"\x00"
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# Pixel-input encoder: forward transforms + quantization + the decoder's
# exact reconstruction loop (so decode(encode(img)) == encoder's recon
# bit-for-bit; quantization is where quality is lost, nowhere else)
# ---------------------------------------------------------------------------


def fdct4x4(block: np.ndarray) -> list:
    """Forward 4x4 DCT (libvpx vp8_short_fdct4x4 arithmetic — the
    forward transform is NON-normative; any consistent one works, this
    one pairs with the spec's inverse at high accuracy)."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), np.int64)
    for i in range(4):
        a1 = (ip[i, 0] + ip[i, 3]) * 8
        b1 = (ip[i, 1] + ip[i, 2]) * 8
        c1 = (ip[i, 1] - ip[i, 2]) * 8
        d1 = (ip[i, 0] - ip[i, 3]) * 8
        tmp[i, 0] = a1 + b1
        tmp[i, 2] = a1 - b1
        tmp[i, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[i, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        a1 = tmp[0, i] + tmp[3, i]
        b1 = tmp[1, i] + tmp[2, i]
        c1 = tmp[1, i] - tmp[2, i]
        d1 = tmp[0, i] - tmp[3, i]
        out[0, i] = (a1 + b1 + 7) >> 4
        out[2, i] = (a1 - b1 + 7) >> 4
        out[1, i] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 != 0 else 0)
        out[3, i] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out.flatten().tolist()


_WHT_M = np.array(
    [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]], np.int64
)


def fwht4x4(dcs: list) -> list:
    """Forward WHT for the 16 luma DCs: Y = (M X M) / 2 with M the
    inverse transform's butterfly matrix (M^2 = 4I), so
    inv_walsh(fwht(x)) == x up to the inverse's rounding."""
    X = np.asarray(dcs, np.int64).reshape(4, 4)
    Y = _WHT_M @ X @ _WHT_M
    return ((Y + np.where(Y >= 0, 1, -1)) // 2).flatten().tolist()


def _quant_scan(coeffs_natural, dq_dc, dq_ac, first=0):
    """Natural-order coefficients -> SCAN-order quantized levels
    (round-half-away), clamped to the CAT6 ceiling."""
    out = [0] * 16
    cap = CAT_BASE[CAT6] + (1 << len(CAT_PROBS[CAT6])) - 1
    for c in range(first, 16):
        v = coeffs_natural[ZIGZAG[c]]
        q = dq_dc if c == 0 else dq_ac
        lv = (abs(v) + q // 2) // q
        if lv > cap:
            lv = cap
        out[c] = -lv if v < 0 else lv
    return out


def _dequant_scan(levels, dq_dc, dq_ac, first=0):
    out = [0] * 16
    for c in range(first, 16):
        out[ZIGZAG[c]] = levels[c] * (dq_dc if c == 0 else dq_ac)
    return out


def rgb_to_yuv420(img: np.ndarray):
    """(h, w, 3|4) uint8 RGB(A) -> (Y, U, V) planes with the integer
    BT.601 limited-range forward matching yuv420_to_rgba's inverse;
    chroma is the 2x2 block mean."""
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    y = np.clip(16 + ((66 * r + 129 * g + 25 * b + 128) >> 8), 0, 255)
    u = np.clip(128 + ((-38 * r - 74 * g + 112 * b + 128) >> 8), 0, 255)
    v = np.clip(128 + ((112 * r - 94 * g - 18 * b + 128) >> 8), 0, 255)
    h, w = y.shape
    he, we = h + (h & 1), w + (w & 1)

    def sub(p):
        q = np.empty((he, we), np.int32)
        q[:h, :w] = p
        if h & 1:
            q[h, :w] = p[-1]
        if w & 1:
            q[:h, w] = p[:, -1]
        if h & 1 and w & 1:
            q[h, w] = p[-1, -1]
        return (
            q.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3)) + 0.5
        ).astype(np.int32)

    return y.astype(np.uint8), sub(u).astype(np.uint8), sub(v).astype(np.uint8)


def encode_vp8_pixels(img: np.ndarray, qi: int = 40) -> bytes:
    """REAL lossy encode from pixels: RGB(A) -> YUV420 -> DC_PRED
    intra16 with forward DCT/WHT, quantization at index ``qi``, and
    the DECODER's exact reconstruction loop feeding each next MB's
    prediction — so the emitted stream decodes bit-identically to the
    encoder's reconstruction.  Mode search is deliberately minimal
    (DC_PRED everywhere): this is a correct, usable writer, not a
    rate-distortion competitor."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("need (h, w, 3|4) RGB(A)")
    h, w = img.shape[:2]
    y, u, v = rgb_to_yuv420(img)
    mb_rows, mb_cols = (h + 15) >> 4, (w + 15) >> 4

    def pad(p, ph, pw):
        out = np.empty((ph, pw), np.uint8)
        sh, sw = p.shape
        out[:sh, :sw] = p
        out[sh:, :sw] = p[-1:, :]
        out[:sh, sw:] = p[:, -1:]
        out[sh:, sw:] = p[-1, -1]
        return out

    ys = pad(y, mb_rows * 16, mb_cols * 16).astype(np.int32)
    us = pad(u, mb_rows * 8, mb_cols * 8).astype(np.int32)
    vs = pad(v, mb_rows * 8, mb_cols * 8).astype(np.int32)

    qi = _clamp_q(qi)
    y1 = (DC_QLOOKUP[qi], AC_QLOOKUP[qi])
    y2q = (DC_QLOOKUP[qi] * 2, max(8, AC_QLOOKUP[qi] * 155 // 100))
    uvq = (min(DC_QLOOKUP[qi], 132), AC_QLOOKUP[qi])

    # bordered reconstruction planes, decoder conventions
    Y = np.empty((mb_rows * 16 + 1, mb_cols * 16 + 1), np.uint8)
    U = np.empty((mb_rows * 8 + 1, mb_cols * 8 + 1), np.uint8)
    V = np.empty_like(U)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129
        P[0, 0] = 127

    mbs = []
    for mb_row in range(mb_rows):
        for mb_col in range(mb_cols):
            ya, xa = 1 + mb_row * 16, 1 + mb_col * 16
            yc, xc = 1 + mb_row * 8, 1 + mb_col * 8
            ha, hl = mb_row > 0, mb_col > 0
            mb = {"y_mode": DC_PRED, "uv_mode": DC_PRED}
            # ---- luma ----
            pred = predict_block(Y, ya, xa, 16, DC_PRED, ha, hl)
            src = ys[ya - 1 : ya + 15, xa - 1 : xa + 15]
            resid = src - pred
            raw = [
                fdct4x4(resid[4 * r : 4 * r + 4, 4 * c : 4 * c + 4])
                for r in range(4)
                for c in range(4)
            ]
            y2_levels = _quant_scan(
                _natural_from_dcs(fwht4x4([blk[0] for blk in raw])),
                y2q[0], y2q[1],
            )
            y2_deq = _dequant_scan(y2_levels, y2q[0], y2q[1])
            dcs_hat = inv_walsh(y2_deq)
            y_levels = []
            recon = pred.copy()
            for i in range(16):
                lv = _quant_scan(raw[i], y1[0], y1[1], first=1)
                y_levels.append(lv)
                coeffs = _dequant_scan(lv, y1[0], y1[1], first=1)
                coeffs[0] = dcs_hat[i]
                r_, c_ = divmod(i, 4)
                recon[4 * r_ : 4 * r_ + 4, 4 * c_ : 4 * c_ + 4] = (
                    pred[4 * r_ : 4 * r_ + 4, 4 * c_ : 4 * c_ + 4]
                    + inv_dct4x4(coeffs)
                )
            Y[ya : ya + 16, xa : xa + 16] = np.clip(recon, 0, 255).astype(np.uint8)
            mb["y2"] = y2_levels
            mb["y"] = y_levels
            # ---- chroma ----
            for P, plane, key in ((U, us, "u"), (V, vs, "v")):
                pred = predict_block(P, yc, xc, 8, DC_PRED, ha, hl)
                srcc = plane[yc - 1 : yc + 7, xc - 1 : xc + 7]
                residc = srcc - pred
                lvs = []
                reconc = pred.copy()
                for i in range(4):
                    r_, c_ = divmod(i, 2)
                    blk = residc[4 * r_ : 4 * r_ + 4, 4 * c_ : 4 * c_ + 4]
                    lv = _quant_scan(fdct4x4(blk), uvq[0], uvq[1])
                    lvs.append(lv)
                    coeffs = _dequant_scan(lv, uvq[0], uvq[1])
                    reconc[4 * r_ : 4 * r_ + 4, 4 * c_ : 4 * c_ + 4] = (
                        pred[4 * r_ : 4 * r_ + 4, 4 * c_ : 4 * c_ + 4]
                        + inv_dct4x4(coeffs)
                    )
                P[yc : yc + 8, xc : xc + 8] = np.clip(reconc, 0, 255).astype(
                    np.uint8
                )
                mb[key] = lvs
            mbs.append(mb)

    return encode_vp8_frame(w, h, mbs, qi=qi), {
        "width": w, "height": h,
        "recon_y": Y[1 : 1 + h, 1 : 1 + w].copy(),
        "recon_u": U[1 : 1 + ((h + 1) >> 1), 1 : 1 + ((w + 1) >> 1)].copy(),
        "recon_v": V[1 : 1 + ((h + 1) >> 1), 1 : 1 + ((w + 1) >> 1)].copy(),
    }


def _natural_from_dcs(scan16: list) -> list:
    """fwht output is already natural-order (4x4 raster) — identity
    helper kept for clarity at the call site."""
    return list(scan16)


def encode_webp_lossy_pixels(img: np.ndarray, qi: int = 40) -> bytes:
    """RGB(A) pixels -> lossy RIFF/WEBP (see encode_vp8_pixels); the
    frame header carries the TRUE size and the decoder crops the
    implicit macroblock padding, per spec."""
    import struct

    payload, _ = encode_vp8_pixels(img, qi)
    if len(payload) & 1:
        payload += b"\x00"
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
