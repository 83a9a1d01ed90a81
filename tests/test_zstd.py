"""Zstandard (.warc.zst) tests.

Golden vectors come from pyarrow's bundled libzstd (the reference
implementation), so the pure-python RFC 8878 decoder is pinned
bit-for-bit against the real thing across corpora and levels — the
strongest parity signal available in-container.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from vtk_reserves_spark.sources import zstd, zstd_pure
from vtk_reserves_spark.sources.warc import (
    build_warc_index,
    parse_warc,
    write_warc,
)


def _corpora():
    rng = random.Random(7)
    words = [bytes(f"tok{i % 211}", "ascii") for i in range(1000)]
    return {
        "ascii_rep": b"the quick brown fox jumps over the lazy dog. " * 200,
        "rand": bytes(rng.randrange(256) for _ in range(500)),
        "semi": b"".join(
            bytes(f"row {i} value {i * i % 97}\n", "ascii")
            for i in range(3000)
        ),
        "zeros": b"\x00" * 10000,
        "mixed": b"".join(
            b"HDR" + bytes([i % 256]) * (i % 50) + b"\n" for i in range(800)
        ),
        "text": b" ".join(rng.choice(words) for _ in range(40000)),
        "tiny": b"abc",
        "empty": b"",
    }


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_pure_decoder_matches_libzstd(level):
    for name, data in _corpora().items():
        comp = pa.Codec("zstd", compression_level=level).compress(
            data, asbytes=True
        )
        assert zstd_pure.decompress(comp) == data, (name, level)


def test_multiblock_frame():
    # > 128 KiB of content forces multiple compressed blocks and
    # cross-block match offsets / carried-over entropy tables
    rng = random.Random(3)
    data = b"".join(
        bytes(f'{{"id":{i},"v":{rng.randrange(1009)}}}\n', "ascii")
        for i in range(30000)
    )
    comp = pa.Codec("zstd", compression_level=6).compress(data, asbytes=True)
    assert len(data) > 4 * 128 * 1024
    assert zstd_pure.decompress(comp) == data


def test_frame_walker_no_decompress():
    parts = [b"alpha" * 100, b"beta" * 200, b"x"]
    blobs = [zstd.compress_frame(p) for p in parts]
    stream = (
        zstd.make_skippable_frame(b"ignored", magic=zstd.SKIPPABLE_MIN)
        + b"".join(blobs)
    )
    frames = zstd.split_frames(stream)
    assert [f["kind"] for f in frames] == ["skippable"] + ["zstd"] * 3
    offs = [f["offset"] for f in frames]
    lens = [f["length"] for f in frames]
    assert offs[1] == len(stream) - sum(len(b) for b in blobs)
    for f, blob, part in zip(frames[1:], blobs, parts):
        assert stream[f["offset"] : f["offset"] + f["length"]] == blob
        assert f["content_size"] == len(part)


def test_ncount_writer_reader_roundtrip():
    cases = [
        ([16, 16], 5),
        ([1, 4, 3] + [0] * 5 + [8, 16], 5),
        ([-1, -1, 2, 26, 0, 0, 0, 0, 2], 5),
        (zstd_pure._LL_DEFAULT[0], 6),
        (zstd_pure._OF_DEFAULT[0], 5),
    ]
    for probs, log in cases:
        blob = zstd_pure._fse_write_distribution(probs, log)
        got, got_log, consumed = zstd_pure._fse_read_distribution(blob)
        assert (got, got_log, consumed) == (probs, log, len(blob))


def test_raw_content_dictionary_frame():
    dict_content = b"WARC/1.0\r\nWARC-Type: response\r\n" + b"boiler " * 20
    lit = b"Hello "
    frame = zstd_pure.encode_frame_fixture(
        [(lit, len(dict_content) + len(lit), 19), (b" tail", 0, 0)],
        dict_id=77,
    )
    out = zstd_pure.decompress_frame(frame, dict_bytes=dict_content)
    assert out == lit + dict_content[:19] + b" tail"
    # no dictionary -> clear error from the router
    with pytest.raises(zstd.ZstdFormatError, match="references dictionary"):
        zstd.decompress(frame)


def test_structured_dictionary():
    content = b"shared dictionary content 0123456789" * 4
    d = zstd_pure.make_structured_dictionary(content, dict_id=123)
    parsed = zstd_pure.parse_dictionary(d)
    assert parsed["dict_id"] == 123
    assert parsed["content"] == content
    assert parsed["huf"] is not None
    assert set(parsed["tables"]) == {"of", "ml", "ll"}
    assert parsed["reps"] == [1, 4, 8]
    frame = zstd_pure.encode_frame_fixture(
        [(b"X", len(content) + 1, 26), (b"!", 0, 0)], dict_id=123
    )
    assert (
        zstd_pure.decompress_frame(frame, dict_bytes=d)
        == b"X" + content[:26] + b"!"
    )
    wrong = zstd_pure.make_structured_dictionary(content, dict_id=9)
    with pytest.raises(zstd_pure.ZstdDecodeError, match="wants dictionary"):
        zstd_pure.decompress_frame(frame, dict_bytes=wrong)


def _sample_records():
    return [
        {"warc_type": "warcinfo", "payload": b"software: test"},
        {
            "warc_type": "response",
            "target_uri": "http://example.com/",
            "http_status": 200,
            "http_content_type": "text/html",
            "payload": b"<html><body>hi</body></html>",
        },
        {
            "warc_type": "response",
            "target_uri": "http://example.org/x",
            "http_status": 404,
            "http_content_type": "text/plain",
            "payload": b"gone",
        },
    ]


def test_warc_zst_roundtrip():
    blob = write_warc(_sample_records(), zstd_frames=True)
    assert blob[:4] == b"\x28\xb5\x2f\xfd"
    back = parse_warc(blob)
    assert [r["warc_type"] for r in back] == [
        "warcinfo",
        "response",
        "response",
    ]
    assert back[1]["payload"] == b"<html><body>hi</body></html>"
    assert back[1]["http_status"] == 200


def test_warc_zst_dictionary_frame_and_index():
    dict_content = b"WARC/1.0\r\nWARC-Type: response\r\n"
    blob = write_warc(
        _sample_records(), zstd_frames=True, zstd_dict=dict_content
    )
    assert zstd.extract_warc_dictionary(blob) == dict_content
    assert len(parse_warc(blob)) == 3
    # index spans are zstd frame boundaries, excluding the dict frame
    idx = build_warc_index(blob)
    assert len(idx) == 3
    assert idx[0][0] == 8 + len(dict_content)
    for off, ln in idx:
        assert len(parse_warc(blob[off : off + ln])) == 1


def test_warc_zst_compressed_dictionary():
    dict_content = b"dictionary " * 50
    stream = zstd.make_skippable_frame(
        zstd.compress_frame(dict_content)
    ) + zstd.compress_frame(b"payload")
    assert zstd.extract_warc_dictionary(stream) == dict_content
    assert zstd.decompress(stream) == b"payload"


def test_read_warc_indexed_zst_dictionary(spark, tmp_path):
    """Record-grain ranged reads of a dict-referencing `.warc.zst`
    shard: every frame copies its WARC header prefix out of the
    shard-head dictionary, so the runner MUST fetch the dictionary
    (one extra ranged read per path) for any frame to decode."""
    dict_content = b"WARC/1.0\r\nWARC-Type: response\r\n" + b"\x00" * 16
    prefix = b"WARC/1.0\r\n"
    frames = []
    for rec in _sample_records():
        raw = write_warc([rec])
        assert raw[: len(prefix)] == prefix
        frames.append(
            zstd_pure.encode_frame_fixture(
                [
                    (b"", len(dict_content), len(prefix)),
                    (raw[len(prefix) :], 0, 0),
                ],
                dict_id=5,
            )
        )
    shard = zstd.make_skippable_frame(dict_content) + b"".join(frames)
    p = tmp_path / "shard.warc.zst"
    p.write_bytes(shard)

    # whole-file path (dict extracted from the leading frame)
    assert len(parse_warc(shard)) == 3

    from vtk_reserves_spark.sources.warc import (
        index_warc_files,
        read_warc_indexed,
    )

    idx = index_warc_files(spark, str(p))
    rows = idx.orderBy("offset").collect()
    assert len(rows) == 3
    assert rows[0]["offset"] == 8 + len(dict_content)
    out = read_warc_indexed(spark, idx).orderBy("target_uri").collect()
    assert [r["warc_type"] for r in out] == [
        "warcinfo",
        "response",
        "response",
    ]
    uris = [r["target_uri"] for r in out if r["target_uri"]]
    assert uris == ["http://example.com/", "http://example.org/x"]
    assert bytes(out[1]["payload"]) == b"<html><body>hi</body></html>"


def test_write_warc_rejects_double_compression():
    with pytest.raises(ValueError, match="pick one"):
        write_warc(_sample_records(), gzip_members=True, zstd_frames=True)
