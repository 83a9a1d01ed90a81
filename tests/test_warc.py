"""WARC reader/writer + html_to_text tests."""

from __future__ import annotations

import gzip

import numpy as np  # noqa: F401
import pytest

from vtk_reserves_spark.sources.warc import parse_warc, read_warc, write_warc


def _sample_records():
    return [
        {
            "warc_type": "warcinfo",
            "payload": b"software: test\r\n",
            "content_type": "application/warc-fields",
        },
        {
            "warc_type": "response",
            "target_uri": "http://example.com/a",
            "http_status": 200,
            "http_content_type": "text/html; charset=utf-8",
            "payload": b"<html><body>hello</body></html>",
        },
        {
            "warc_type": "response",
            "target_uri": "http://example.com/b",
            "http_status": 404,
            "http_content_type": "text/plain",
            "payload": b"not here",
        },
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    data = write_warc(_sample_records(), gzip_members=gz)
    if gz:
        assert data[:2] == b"\x1f\x8b"
        # CommonCrawl layout: one member per record
        assert data.count(b"\x1f\x8b\x08") == 3
    recs = parse_warc(data)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[0]["payload"] == b"software: test\r\n"
    assert recs[0]["http_status"] is None
    assert recs[1]["target_uri"] == "http://example.com/a"
    assert recs[1]["http_status"] == 200
    assert recs[1]["http_content_type"] == "text/html; charset=utf-8"
    assert recs[1]["payload"] == b"<html><body>hello</body></html>"
    assert recs[2]["http_status"] == 404
    assert recs[2]["payload"] == b"not here"


def test_warc_max_payload_truncates():
    recs = parse_warc(write_warc(_sample_records()), max_payload=5)
    assert recs[1]["payload"] == b"<html"
    assert recs[1]["content_length"] > 5  # original length preserved


def test_warc_rejects_corrupt():
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    good = write_warc(_sample_records())
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(good.replace(b"Content-Length", b"X-Length", 1))
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(good[:-40])
    gz = write_warc(_sample_records(), gzip_members=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(gz[:-10])


def test_warc_header_quirks():
    # duplicate headers keep the first; missing optional headers -> None
    raw = (
        b"WARC/1.1\r\n"
        b"WARC-Type: metadata\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: 2\r\n\r\n"
        b"ok\r\n\r\n"
    )
    (r,) = parse_warc(raw)
    assert r["content_type"] == "text/plain"
    assert r["target_uri"] is None and r["http_status"] is None
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")


def test_read_warc_distributed(spark, tmp_path):
    """read_warc parallelizes per file and explodes records to rows."""
    for i, gz in enumerate([False, True]):
        data = write_warc(_sample_records(), gzip_members=gz)
        (tmp_path / f"shard{i}.warc{'.gz' if gz else ''}").write_bytes(data)
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.collect()
    assert len(rows) == 6
    got = {(r.path.split("/")[-1], r.target_uri, r.http_status) for r in rows}
    assert ("shard0.warc", "http://example.com/a", 200) in got
    assert ("shard1.warc.gz", "http://example.com/b", 404) in got
    # payload binary survives
    a = [r for r in rows if r.target_uri == "http://example.com/a"][0]
    assert bytes(a.payload) == b"<html><body>hello</body></html>"


def test_html_to_text(spark):
    from pyspark.sql import functions as F

    from vtk_reserves_spark.functions.text import html_to_text

    cases = [
        # script/style/comment blocks vanish wholesale
        ("<script>var a = '<p>not text</p>';</script>hi", "hi"),
        ("<style type='text/css'>p { color: red }</style>x", "x"),
        ("a<!-- <b>comment</b> -->b", "a b"),
        # tags become word boundaries
        ("<p>one</p><p>two</p>", "one two"),
        ("line<br/>break", "line break"),
        # entities, &amp; decoded last
        ("fish &amp; chips &lt;now&gt;", "fish & chips <now>"),
        ("&amp;lt; stays literal", "&lt; stays literal"),
        ("a&nbsp;&nbsp;b &quot;q&quot; &#39;s&#39;", 'a b "q" \'s\''),
        # whitespace collapse + trim
        ("  <div>\n\thello\n  world\n</div> ", "hello world"),
        # attributes with > inside quotes are NOT handled (documented
        # cheap-extraction contract) but plain attrs are
        ('<a href="http://x.com/p">link</a>', "link"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    out = [r.t for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    assert out == [w for _, w in cases]


def test_gunzip_many_members_chunked():
    """The member walk must stay linear in total size (chunked feed,
    no per-member tail copies) and handle hundreds of members."""
    recs = [
        {"warc_type": "resource", "payload": f"doc {i}".encode(),
         "content_type": "text/plain"}
        for i in range(300)
    ]
    data = write_warc(recs, gzip_members=True)
    out = parse_warc(data)
    assert len(out) == 300
    assert out[299]["payload"] == b"doc 299"


def test_build_warc_index_gzip_and_plain():
    from vtk_reserves_spark.sources.warc import build_warc_index

    recs = _sample_records()
    for gz in (True, False):
        data = write_warc(recs, gzip_members=gz)
        spans = build_warc_index(data)
        assert len(spans) == len(recs)
        # spans tile the stream exactly
        assert spans[0][0] == 0
        for (o1, l1), (o2, _) in zip(spans, spans[1:]):
            assert o1 + l1 == o2
        assert spans[-1][0] + spans[-1][1] == len(data)
        # each span parses standalone to the matching record
        for (off, ln), want in zip(spans, recs):
            got = parse_warc(data[off : off + ln])
            assert len(got) == 1
            assert got[0]["warc_type"] == want["warc_type"]


def test_read_warc_indexed_record_grain(spark, tmp_path):
    """Ranged record-grain reads: same rows as read_warc, and the
    physical plan parallelizes over the INDEX (a round-robin
    repartition of the cdx rows), not over files."""
    from vtk_reserves_spark.sources.warc import build_warc_index, read_warc_indexed

    recs = [
        {"warc_type": "response", "target_uri": f"http://e.com/{i}",
         "http_status": 200, "http_content_type": "text/plain",
         "payload": f"payload {i}".encode()}
        for i in range(24)
    ]
    data = write_warc(recs, gzip_members=True)
    p = tmp_path / "shard.warc.gz"
    p.write_bytes(data)

    idx_rows = [(str(p), off, ln) for off, ln in build_warc_index(data)]
    idx = spark.createDataFrame(idx_rows, "path string, offset long, length long")
    out = read_warc_indexed(spark, idx)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan or "Exchange" in plan
    # record grain: one task per index partition, many partitions
    assert out.rdd.getNumPartitions() > 1

    rows = {r.target_uri: bytes(r.payload) for r in out.collect()}
    assert len(rows) == 24
    assert rows["http://e.com/7"] == b"payload 7"


def test_zstd_warc_supported():
    """The former NotImplementedError gap: `.warc.zst` now decodes
    (sources/zstd.py routes frames to libzstd or the pure RFC 8878
    decoder).  Garbage after the magic still fails loudly."""
    data = write_warc(_sample_records(), zstd_frames=True)
    assert data[:4] == b"\x28\xb5\x2f\xfd"
    assert len(parse_warc(data)) == len(_sample_records())
    from vtk_reserves_spark.sources.zstd import ZstdFormatError

    with pytest.raises(ZstdFormatError):
        parse_warc(b"\x28\xb5\x2f\xfd" + b"\xff" * 32)


def test_read_cdx_roundtrip(spark, tmp_path):
    """CDXJ text -> index DataFrame -> ranged record reads: the full
    CommonCrawl workflow (index-filter, then fetch only matching
    records)."""
    from vtk_reserves_spark.sources.warc import (
        build_warc_index, read_cdx, read_warc_indexed, write_cdx,
    )

    recs = [
        {"warc_type": "response", "target_uri": f"http://e.com/p{i}",
         "http_status": 200, "http_content_type": "text/html",
         "payload": f"body {i}".encode()}
        for i in range(6)
    ]
    data = write_warc(recs, gzip_members=True)
    shard = tmp_path / "x.warc.gz"
    shard.write_bytes(data)
    spans = build_warc_index(data)
    cdx_lines = [
        (
            f"com,e)/p{i}",
            "20240101000000",
            {"url": f"http://e.com/p{i}", "mime": "text/html",
             "status": "200", "digest": "x", "filename": "x.warc.gz",
             "offset": str(off), "length": str(ln)},
        )
        for i, (off, ln) in enumerate(spans)
    ]
    cdx_path = tmp_path / "idx.cdx"
    cdx_path.write_text(write_cdx(cdx_lines))

    idx = read_cdx(spark, str(cdx_path), base=str(tmp_path) + "/")
    rows = idx.orderBy("offset").collect()
    assert [r.url for r in rows] == [f"http://e.com/p{i}" for i in range(6)]
    assert rows[0].status == 200 and rows[0].offset == 0

    # pre-filter on the index (the 200-GB-scan-avoidance move), then
    # ranged-read only the selected records
    pick = idx.filter("urlkey like '%p3' or urlkey like '%p5'")
    out = read_warc_indexed(spark, pick)
    got = sorted(r.target_uri for r in out.collect())
    assert got == ["http://e.com/p3", "http://e.com/p5"]


def test_wet_roundtrip():
    from vtk_reserves_spark.sources.warc import build_wet, parse_wet

    pages = [
        {"url": "https://x.org/1", "text": "hello wörld\nline two"},
        {"url": "https://x.org/2", "text": "",
         "date": "2023-05-05T00:00:00Z"},
    ]
    for gz in (True, False):
        got = parse_wet(build_wet(pages, gzip_members=gz))
        assert [p["url"] for p in got] == ["https://x.org/1",
                                          "https://x.org/2"]
        assert got[0]["text"] == "hello wörld\nline two"
        assert got[1]["date"] == "2023-05-05T00:00:00Z"


def test_wat_roundtrip_and_envelope_shape():
    import json

    from vtk_reserves_spark.sources.warc import (
        build_wat, parse_warc, parse_wat,
    )

    pages = [{"url": "https://x.org/1", "title": "T1",
              "links": ["https://a", "https://b"]},
             {"url": "https://x.org/2"}]
    blob = build_wat(pages)
    got = parse_wat(blob)
    assert got[0]["title"] == "T1"
    assert got[0]["links"] == ["https://a", "https://b"]
    assert got[1]["title"] == "" and got[1]["links"] == []
    # the JSON payload carries the real CommonCrawl Envelope path
    recs = [r for r in parse_warc(blob) if r["warc_type"] == "metadata"]
    env = json.loads(recs[0]["payload"])
    links = (env["Envelope"]["Payload-Metadata"]
             ["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"])
    assert links[0] == {"path": "A@/href", "url": "https://a"}


def test_wet_skips_non_conversion_records():
    from vtk_reserves_spark.sources.warc import parse_wet, write_warc

    mixed = write_warc([
        {"warc_type": "response", "target_uri": "https://x/1",
         "http_status": 200, "payload": b"<html>hi</html>"},
        {"warc_type": "conversion", "target_uri": "https://x/1",
         "content_type": "text/plain", "payload": b"hi"},
    ])
    got = parse_wet(mixed)
    assert len(got) == 1 and got[0]["text"] == "hi"
