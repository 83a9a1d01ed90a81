"""GIF87a/89a codec — pure-python LZW, no image libraries.

Web corpora carry GIFs everywhere (the third web image format after
JPEG/PNG), so the multimodal pipeline decodes them for real like the
other pure codecs (PNG `image.py`, JPEG `jpeg.py`, AVI `avi.py`).
Public specification: GIF89a (CompuServe, 1990) + the GIF LZW variant
(variable code width 3..12 bits, clear/EOI codes).

Supported: global + local color tables, interlaced images
(deinterlaced on decode), animation frames with Graphic Control
Extensions (delay, transparency, disposal methods 0-3), sub-rectangle
frames composited onto the logical screen.  Decode returns full
composited RGB frames — what a frame sampler wants.  The encoder
(test fixtures / export) writes a global-palette animation from uint8
grayscale or RGB frames with at most 256 distinct colors; GIF is
LOSSLESS for palette-sized content, which is what makes the oracle
queries exact.

Like the other codecs this runs INSIDE Arrow-batched executors
(`operators/multimodal.py`), one payload at a time.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size+1``, CLEAR resets the table, EOI ends the stream.
    Returns ``expected`` palette indices (uint8 array)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, np.uint8)
    n_out = 0

    # bit reader over the concatenated sub-block payload (LSB first)
    acc = 0
    nbits = 0
    pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                # missing EOI: tolerated by every real decoder
                return out[:n_out] if n_out < expected else out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = init_table()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        take = min(len(entry), expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if n_out >= expected:
            break
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < expected:
        raise ValueError(f"GIF LZW underrun: {n_out}/{expected} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_decode` (always emits a leading CLEAR and
    a trailing EOI; resets the table when it fills)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    prev = b""
    for b in indices.tobytes():
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            # widen BEFORE overflowing: the decoder widens after
            # assigning the same code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        put(table[prev], width)
        if next_code == (1 << width) and width < 12:
            width += 1
            # (matches decoder widening point; EOI below uses new width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes):
    """GIF bytes -> ``(frames, delays_cs, loop_count)`` with frames a
    uint8 array ``(n, h, w, 3)`` of fully composited RGB logical
    screens, ``delays_cs`` the per-frame delay in centiseconds (0 for
    plain single-image GIFs) and ``loop_count`` the Netscape
    application-extension repeat count (0 = loop forever, the extension
    default; also 0 when the extension is absent — single-pass GIFs
    simply have one frame)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode_gif_inner(data)
    except (IndexError, struct.error) as exc:
        # a truncated stream runs the sub-block walk off the end; type
        # it as the same error class every other codec here raises
        raise ValueError(f"truncated or corrupt GIF stream: {exc}") from exc


def _decode_gif_inner(data: bytes):
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    screen = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        screen[:] = gct[bg]
    bg_rgb = screen[0, 0].copy() if h and w else np.zeros(3, np.uint8)

    frames = []
    delays = []
    loop_count = 0
    transparent = None
    disposal = 0
    delay = 0
    prev_screen = None

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                sz = data[pos]
                gflags, delay, tindex = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                disposal = (gflags >> 2) & 7
                transparent = tindex if gflags & 1 else None
                pos += 1 + sz
                if data[pos] != 0:
                    raise ValueError("bad GCE terminator")
                pos += 1
            else:  # comment / app / plain text: walk sub-blocks
                is_netscape = False
                first = True
                while True:
                    sz = data[pos]
                    block_body = data[pos + 1 : pos + 1 + sz]
                    if label == 0xFF and first and block_body == b"NETSCAPE2.0":
                        is_netscape = True
                    elif is_netscape and sz == 3 and block_body[0] == 1:
                        # Netscape loop sub-block: id 1 + 16-bit count
                        loop_count = struct.unpack("<H", block_body[1:3])[0]
                    first = False
                    pos += 1 + sz
                    if sz == 0:
                        break
            continue
        if block != 0x2C:  # image descriptor
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if ix + iw > w or iy + ih > h:
            # numpy slicing would silently clamp the region and then
            # fail on shape mismatch deep in compositing — reject here
            raise ValueError(
                f"GIF frame rectangle {iw}x{ih}@({ix},{iy}) exceeds the "
                f"{w}x{h} logical screen"
            )
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code = data[pos]
        pos += 1
        sub = bytearray()
        while True:
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            sub += data[pos : pos + sz]
            pos += sz
        idx = _lzw_decode(bytes(sub), min_code, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: reorder rows
            de = np.empty_like(idx)
            src = 0
            for start, step in _DEINTERLACE_PASSES:
                rows = range(start, ih, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de

        if disposal == 3:
            prev_screen = screen.copy()
        region = screen[iy : iy + ih, ix : ix + iw]
        rgb = ct[np.clip(idx, 0, len(ct) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(screen.copy())
        delays.append(delay)

        if disposal == 2:  # restore to background
            screen[iy : iy + ih, ix : ix + iw] = bg_rgb
        elif disposal == 3 and prev_screen is not None:  # restore previous
            screen = prev_screen
        transparent = None
        disposal = 0
        delay = 0

    if not frames:
        raise ValueError("GIF has no image data")
    return np.stack(frames), delays, loop_count


def encode_gif(
    frames: np.ndarray, delay_cs: int = 4, loop_count: int = 0
) -> bytes:
    """uint8 frames ``(n, h, w)`` grayscale or ``(n, h, w, 3)`` RGB ->
    animated GIF89a with ONE global palette built from the distinct
    colors (raises above 256 — quantization is out of scope; GIF stays
    lossless here, which the oracle queries rely on)."""
    f = np.asarray(frames, np.uint8)
    if f.ndim == 3:
        f = np.repeat(f[:, :, :, None], 3, axis=3)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError(f"frames must be (n,h,w) or (n,h,w,3), got {frames.shape}")
    n, h, w, _ = f.shape
    flat = f.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors — the lossless encoder needs <= 256"
        )
    # palette size must be a power of two >= 2
    pbits = max(1, int(len(colors) - 1).bit_length())
    psize = 1 << pbits
    palette = np.zeros((psize, 3), np.uint8)
    palette[: len(colors)] = colors
    idx_frames = inverse.reshape(n, h, w).astype(np.uint8)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pbits - 1), 0, 0)
    out += palette.tobytes()
    if n > 1:  # Netscape loop extension
        out += (
            b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
            + struct.pack("<H", loop_count)
            + b"\x00"
        )
    min_code = max(2, pbits)
    for fi in range(n):
        if n > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(idx_frames[fi].ravel(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
