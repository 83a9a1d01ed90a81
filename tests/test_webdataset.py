"""ustar walker + WebDataset grouping edges: checksum verification,
GNU long names, pax headers, stdlib cross-validation, shard-grain
Spark reads."""
import io
import tarfile

import pytest

from vtk_reserves_spark.sources.tar import (
    build_tar, group_webdataset, iter_tar,
)


def test_roundtrip_and_stdlib_reads_ours():
    members = [("d/0001.jpg", b"JPG"), ("d/0001.json", b"{}"),
               ("plain", b"X")]
    blob = build_tar(members)
    assert list(iter_tar(blob)) == members
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] \
        == members


def test_gnu_longname():
    name = "shards/" + "x" * 150 + ".txt"
    blob = build_tar([(name, b"LONG")])
    assert list(iter_tar(blob)) == [(name, b"LONG")]
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert tf.getmembers()[0].name == name


def test_reads_stdlib_pax_tar():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT) as w:
        for n, p in [("y/ünïcode-" + "z" * 140 + ".cls", b"A"),
                     ("y/b.txt", b"B")]:
            info = tarfile.TarInfo(n)
            info.size = len(p)
            w.addfile(info, io.BytesIO(p))
    got = list(iter_tar(buf.getvalue()))
    assert got[0][0].startswith("y/ünïcode-") and got[0][1] == b"A"
    assert got[1] == ("y/b.txt", b"B")


def test_checksum_rejected():
    blob = bytearray(build_tar([("a.txt", b"hello")]))
    blob[0] ^= 0xFF  # corrupt the name; checksum no longer matches
    with pytest.raises(ValueError, match="checksum"):
        list(iter_tar(bytes(blob)))


def test_truncated_payload_rejected():
    blob = build_tar([("a.txt", b"hello world")])
    with pytest.raises(ValueError):
        list(iter_tar(blob[:516]))  # header intact, payload cut short


def test_group_webdataset_first_dot():
    groups = group_webdataset([
        ("s/0001.jpg", b"1"), ("s/0001.seg.json", b"2"),
        ("s/0002.jpg", b"3"), ("noext", b"4"),
    ])
    assert set(groups) == {"s/0001", "s/0002", "noext"}
    assert groups["s/0001"] == {"jpg": b"1", "seg.json": b"2"}
    assert groups["noext"] == {"": b"4"}


def test_spark_read_webdataset(spark, tmp_path):
    from vtk_reserves_spark.sources.webdataset import read_webdataset

    for shard in range(2):
        members = []
        for i in range(3):
            key = f"{shard}{i:03d}"
            members.append((f"{key}.txt", f"text {key}".encode()))
            members.append((f"{key}.cls", str(i).encode()))
        (tmp_path / f"s{shard}.tar").write_bytes(build_tar(members))
    df = read_webdataset(spark, str(tmp_path / "*.tar"))
    rows = df.collect()
    assert len(rows) == 12
    keys = {r.key for r in rows}
    assert len(keys) == 6
    txt = {r.key: bytes(r.payload) for r in rows if r.ext == "txt"}
    assert txt["0001"] == b"text 0001"
    # shard column carries the filename (the unit of parallelism)
    assert {r.shard for r in rows} == {"s0.tar", "s1.tar"}


def test_spark_on_error_null(spark, tmp_path):
    from vtk_reserves_spark.sources.webdataset import read_webdataset

    (tmp_path / "bad.tar").write_bytes(b"\x01" * 1024)
    (tmp_path / "good.tar").write_bytes(build_tar([("k.txt", b"ok")]))
    df = read_webdataset(spark, str(tmp_path / "*.tar"), on_error="null")
    rows = df.collect()
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].shard == "bad.tar"
    assert len(rows) == 2
    with pytest.raises(Exception):
        read_webdataset(spark, str(tmp_path / "*.tar")).collect()
    with pytest.raises(ValueError):
        read_webdataset(spark, "x", on_error="bogus")


def test_pax_global_header_defaults():
    """pax 'g' records set defaults for ALL following members;
    per-file 'x' overrides for exactly one member."""
    from vtk_reserves_spark.sources.tar import _header, _pad, iter_tar

    def pax(body: bytes, typ: bytes) -> bytes:
        for ln in range(len(body) + 3, len(body) + 8):
            cand = f"{ln} ".encode() + body + b"\n"
            if len(cand) == ln:
                return _header("pax", len(cand), typ) + _pad(cand)
        raise AssertionError("unreachable")

    g = pax(b"path=global/name.txt", b"g")
    x = pax(b"path=per/file.bin", b"x")
    f = _header("ignored", 2, b"0") + _pad(b"AA")
    got = list(iter_tar(g + x + f + f + b"\x00" * 1024))
    assert [n for n, _ in got] == ["per/file.bin", "global/name.txt"]
