"""Wild-file regression corpus — files produced by THIRD-PARTY
writers (Python stdlib tarfile/zipfile/wave/gzip/email, DuckDB's
CSV writer), parsed by this repo's own-codec readers.

The format walkers are fixture-validated everywhere else (our
writer -> our reader under the driver oracle); these tests convert
"fixture parity" into "wild parity" for the highest-traffic
readers, using the independent producers available in-container
(VERDICT r9 next-round item 6).  Producers that do not exist here
(LibreOffice xlsx, a real Hudi log, zstd WARCs, PIL images) are
documented as out of reach in the module docstring rather than
skipped tests — there is nothing to run without the producer.
"""
import gzip
import io
import os
import tarfile
import zipfile

import numpy as np
import pytest


def test_tar_walker_reads_tarfile_output(tmp_path):
    """stdlib tarfile (pax format, the modern default, plus GNU) ->
    our ustar/pax walker, including >100-char paths that force
    extended headers and a WebDataset-style sample grouping."""
    from vtk_reserves_spark.sources.tar import group_webdataset, iter_tar

    longdir = "d" * 60 + "/" + "e" * 60
    samples = {
        "000001.json": b'{"a": 1}',
        "000001.txt": b"hello world",
        "000002.json": b'{"a": 2}',
        "000002.txt": b"second",
        f"{longdir}/000003.txt": b"deep",
    }
    for fmt in (tarfile.PAX_FORMAT, tarfile.GNU_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            for name, data in samples.items():
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 1700000000
                tf.addfile(info, io.BytesIO(data))
        got = {name: payload for name, payload in iter_tar(buf.getvalue())}
        assert got == samples, f"format {fmt}"
    grouped = group_webdataset(got.items())
    assert grouped["000001"]["txt"] == b"hello world"
    assert grouped["000002"]["json"] == b'{"a": 2}'


def test_zip_walker_reads_zipfile_output():
    """stdlib zipfile (stored AND deflated members, an archive
    comment, a directory entry) -> our zip walker with CRC checks."""
    from vtk_reserves_spark.sources.zip import iter_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("plain.txt", b"stored " * 10,
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("packed.bin", os.urandom(64) + b"\x00" * 5000,
                   compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("dir/nested.txt", b"nested",
                   compress_type=zipfile.ZIP_DEFLATED)
        z.comment = b"produced by stdlib zipfile"
    data = buf.getvalue()
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        want = {n: z.read(n) for n in z.namelist()}
    got = {name: payload for name, payload, *_ in iter_zip(data)}
    assert got == want


def test_wav_decoder_reads_wave_module_output():
    """stdlib wave module (PCM16, stereo + mono) -> our RIFF/WAVE
    decoder: exact samples and rate."""
    import wave

    from vtk_reserves_spark.sources.wav import decode_wav

    t = np.arange(800)
    mono = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(mono.tobytes())
    samples, rate = decode_wav(buf.getvalue())
    assert rate == 8000
    assert np.array_equal(np.asarray(samples).ravel(), mono)
    # stereo interleaved
    stereo = np.stack([mono, -mono], axis=1).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(stereo.reshape(-1).tobytes())
    samples, rate = decode_wav(buf.getvalue())
    assert rate == 16000
    arr = np.asarray(samples)
    assert arr.size == stereo.size
    assert np.array_equal(arr.reshape(-1), stereo.reshape(-1))


def test_warc_parser_reads_stdlib_gzip_members():
    """WARC records compressed per-record by stdlib gzip (the
    CommonCrawl member-gzip convention) -> our member walker +
    record parser."""
    from vtk_reserves_spark.sources.warc import parse_warc

    def record(url, body):
        headers = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Record-ID: <urn:uuid:0000>\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode()
        return headers + body + b"\r\n\r\n"

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body>wild</body></html>"
    )
    raw = (
        gzip.compress(record("http://a.example/", http))
        + gzip.compress(record("http://b.example/", http))
    )
    recs = list(parse_warc(raw))
    assert len(recs) == 2
    urls = sorted(r["target_uri"] for r in recs)
    assert urls == ["http://a.example/", "http://b.example/"]


def test_mbox_and_email_read_stdlib_mailbox_output(tmp_path):
    """stdlib mailbox.mbox + email.mime (its OWN generator writes
    the bytes: multipart, base64, quoted-printable, encoded
    headers) -> our mbox splitter + RFC-2822 parser."""
    import mailbox
    from email.header import Header
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    from vtk_reserves_spark.sources.email import parse_email, split_mbox

    mb_path = str(tmp_path / "wild.mbox")
    mb = mailbox.mbox(mb_path)
    m1 = MIMEText("plain ascii body\nline two\n")
    m1["Subject"] = "simple"
    m1["From"] = "a@example.com"
    m1["To"] = "b@example.com"
    mb.add(m1)
    m2 = MIMEMultipart("alternative")
    m2["Subject"] = str(Header("café résumé", "utf-8"))
    m2["From"] = "c@example.com"
    m2.attach(MIMEText("unicode café body", "plain", "utf-8"))
    m2.attach(MIMEText("<p>html café</p>", "html", "utf-8"))
    mb.add(m2)
    mb.flush()
    mb.close()
    with open(mb_path, "rb") as fh:
        data = fh.read()
    msgs = list(split_mbox(data))
    assert len(msgs) == 2
    p1 = parse_email(msgs[0])
    assert p1["subject"] == "simple"
    assert "line two" in p1["text"]
    p2 = parse_email(msgs[1])
    assert "café" in p2["subject"]
    assert "café" in p2["text"]


def test_csv_sniffer_reads_duckdb_output(tmp_path, spark):
    """DuckDB's COPY TO csv writer (an entirely independent
    producer: its own quoting, escaping and header emission) -> the
    dispatch loader's separator-sniffing CSV path."""
    import duckdb

    from vtk_reserves_spark.sources.loaders import load_dataframe

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "(1, 'plain', 1.5), "
        "(2, 'comma, inside', -2.25), "
        "(3, 'quote \"q\" inside', 0.0), "
        "(4, NULL, 99.0)"
        ") v(id, name, val)"
    )
    for sep, name in ((",", "comma.csv"), (";", "semi.csv")):
        p = str(tmp_path / name)
        con.execute(
            f"COPY t TO '{p}' (HEADER, DELIMITER '{sep}')"
        )
        df = load_dataframe(spark, p)
        rows = {r["id"]: (r["name"], r["val"])
                for r in df.collect()}
        assert rows[2] == ("comma, inside", -2.25), name
        assert rows[3] == ('quote "q" inside', 0.0), name
        assert rows[4][0] is None and rows[4][1] == 99.0, name
