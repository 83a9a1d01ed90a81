"""Shared RIFF chunk walker for the WAV and AVI codecs.

Both containers use the identical chunk grammar from the public RIFF
specification — 4-byte tag + uint32-LE payload size + payload, with odd
payloads padded to even offsets.  ``sources/wav.py`` and
``sources/avi.py`` previously each carried a private copy of this walk
whose pad/bounds rules could drift independently; this module is the
single source of truth.
"""

from __future__ import annotations

import struct
from typing import Iterator


def walk_chunks(buf: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(tag, payload_offset, payload_size)`` for each RIFF chunk
    in ``buf[pos:end]``.

    A chunk whose declared size runs past ``end`` is still yielded (the
    caller slices defensively / validates payload length); the walk then
    terminates because the next offset falls outside the window.  Odd
    payloads advance one extra pad byte per the RIFF rules.
    """
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)
