"""LZ4 frame/block + Snappy raw/framing codec edges: hash known
vectors, round-trips across data shapes, checksum verification,
malformed-input rejection, transfer-sniff integration."""
import random
import struct

import pytest

from vtk_reserves_spark.sources.lz4 import (
    compress_block,
    compress_frame,
    decompress_block,
    decompress_frame,
    xxh32,
)
from vtk_reserves_spark.sources.snappy import (
    compress,
    compress_framed,
    crc32c,
    decompress,
    decompress_framed,
)

RND = random.Random(7)
CASES = [
    b"",
    b"a",
    b"hello hello hello hello world",
    b"ab" * 4000,
    bytes(RND.randrange(256) for _ in range(5000)),  # incompressible
    b"the quick brown fox " * 300,
    bytes(RND.randrange(4) for _ in range(20000)),   # low-entropy
]


def test_xxh32_known_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"abc", seed=1) != xxh32(b"abc")


def test_crc32c_known_vectors():
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283  # the standard check value
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 test vector


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_lz4_roundtrips(data):
    assert decompress_block(compress_block(data)) == data
    assert decompress_frame(compress_frame(data)) == data
    assert decompress_frame(
        compress_frame(data, block_checksums=True, block_size=1024)
    ) == data


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_snappy_roundtrips(data):
    assert decompress(compress(data)) == data
    assert decompress_framed(compress_framed(data)) == data
    assert decompress_framed(compress_framed(data, chunk_size=777)) == data


def test_lz4_compresses():
    data = b"the quick brown fox " * 300
    assert len(compress_frame(data)) < len(data) // 5


def test_lz4_corruption_detected():
    data = bytes(RND.randrange(256) for _ in range(2000))
    blob = bytearray(compress_frame(data))
    blob[-1] ^= 1  # content checksum
    with pytest.raises(ValueError, match="checksum"):
        decompress_frame(bytes(blob))
    blob = bytearray(compress_frame(data))
    blob[6] ^= 1  # header checksum byte region
    with pytest.raises(ValueError):
        decompress_frame(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        decompress_frame(b"\x00\x00\x00\x00" + b"x" * 10)
    with pytest.raises(ValueError, match="legacy"):
        decompress_frame(struct.pack("<I", 0x184C2102) + b"x" * 10)


def test_snappy_corruption_detected():
    data = bytes(RND.randrange(256) for _ in range(2000))
    blob = bytearray(compress_framed(data))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decompress_framed(bytes(blob))
    with pytest.raises(ValueError, match="identifier"):
        decompress_framed(b"not a snappy stream")
    # declared-length mismatch in the raw format
    raw = bytearray(compress(b"abcdef" * 10))
    raw[0] += 1  # bump the declared size varint
    with pytest.raises(ValueError, match="declared"):
        decompress(bytes(raw))


def test_snappy_padding_and_repeated_id_skipped():
    data = b"payload " * 100
    blob = bytearray(compress_framed(data))
    # insert a padding chunk and a repeated stream identifier
    insert = (bytes([0xFE]) + (3).to_bytes(3, "little") + b"pad"
              + b"\xff\x06\x00\x00sNaPpY")
    blob[10:10] = b""  # no-op keeps bytearray type clear
    out = bytes(blob[:10]) + insert + bytes(blob[10:])
    assert decompress_framed(out) == data


def test_overlapping_match_semantics():
    # RLE-style: match overlapping its own output (offset 1)
    blob = compress_block(b"a" * 500)
    assert decompress_block(blob) == b"a" * 500
    assert len(blob) < 20
    s = compress(b"b" * 500)
    assert decompress(s) == b"b" * 500 and len(s) < 30


def test_sniff_and_decompress_payload():
    from vtk_reserves_spark.operators.multimodal import (
        decompress_payload, sniff_compression,
    )

    data = b"transfer payload " * 40
    lz = compress_frame(data)
    sn = compress_framed(data)
    assert sniff_compression(lz) == "lz4"
    assert sniff_compression(sn) == "snappy"
    assert decompress_payload(lz) == ("lz4", data)
    assert decompress_payload(sn) == ("snappy", data)


def test_lz4_linked_blocks_cross_block_match():
    """Linked frames (FLG bit 5 clear — the lz4 CLI default for
    multi-block files) thread prior output as match history; a
    hand-built frame whose second block references first-block bytes
    must decode on both the pure and native paths."""
    blk1 = b"ABCDEFGH" * 100
    blk2 = blk1[:50] + b"tail-literals-here!!"
    c1 = compress_block(blk1)
    c2 = compress_block(blk2, history=blk1)
    flg = (1 << 6) | (1 << 2)  # v1, linked, content checksum
    desc = bytes([flg, 4 << 4])
    frame = (
        struct.pack("<I", 0x184D2204)
        + desc
        + bytes([(xxh32(desc) >> 8) & 0xFF])
        + struct.pack("<I", len(c1)) + c1
        + struct.pack("<I", len(c2)) + c2
        + struct.pack("<I", 0)
        + struct.pack("<I", xxh32(blk1 + blk2))
    )
    assert decompress_frame(frame, native=False) == blk1 + blk2
    assert decompress_frame(frame, native=True) == blk1 + blk2


def test_lz4_linked_frame_roundtrip_multi_block():
    data = b"spark analytics engine " * 8000  # ~184 KB -> 3 blocks
    frame = compress_frame(data, linked=True)
    assert frame[4] & (1 << 5) == 0  # FLG declares linked
    assert decompress_frame(frame, native=False) == data
    assert decompress_frame(frame, native=True) == data
    # linked frames compress at least as well as independent ones
    assert len(frame) <= len(compress_frame(data, linked=False))


def test_lz4_bd_code_tracks_block_size():
    """BD max-block-size code must cover the actual block size
    (4=64KB 5=256KB 6=1MB 7=4MB) so conformant external decoders
    accept the frame; beyond 4 MB is a frame-format error."""
    for bs, code in ((1 << 16, 4), ((1 << 16) + 1, 5), (1 << 18, 5),
                     (1 << 20, 6), (1 << 22, 7)):
        assert compress_frame(b"x" * 64, block_size=bs)[5] >> 4 == code
    with pytest.raises(ValueError, match="4 MB"):
        compress_frame(b"x", block_size=(1 << 22) + 1)


def test_lz4_dictionary_frame_rejected():
    flg = (1 << 6) | (1 << 5) | 1  # v1, independent, DictID present
    desc = bytes([flg, 4 << 4]) + struct.pack("<I", 0xDEADBEEF)
    frame = (
        struct.pack("<I", 0x184D2204)
        + desc
        + bytes([(xxh32(desc) >> 8) & 0xFF])
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="dictionary"):
        decompress_frame(frame)


def test_crc32c_slice_by_16_matches_bytewise():
    from vtk_reserves_spark.sources.snappy import _CRC_TABLE

    for n in (0, 1, 15, 16, 17, 31, 33, 1000):
        data = bytes(RND.randrange(256) for _ in range(n))
        ref = 0xFFFFFFFF
        for b in data:
            ref = _CRC_TABLE[(ref ^ b) & 0xFF] ^ (ref >> 8)
        assert crc32c(data) == ref ^ 0xFFFFFFFF
