"""ZIP central-directory walker edges: EOCD comment scan, stored vs
deflated, CRC verification, directory entries, encryption/ZIP64
rejection, stdlib cross-validation, archive-grain Spark reads."""
import io
import struct
import zipfile

import pytest

from vtk_reserves_spark.sources.zip import iter_zip


def _make(entries, comment=b"", method=zipfile.ZIP_DEFLATED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.comment = comment
        for name, payload in entries:
            z.writestr(name, payload, method)
    return buf.getvalue()


def test_roundtrip_both_methods():
    blob = _make([("a.txt", b"x" * 300)], method=zipfile.ZIP_DEFLATED)
    (name, payload, method, csize) = next(iter_zip(blob))
    assert (name, payload, method) == ("a.txt", b"x" * 300, "deflated")
    assert csize < 300  # actually compressed
    blob = _make([("b.txt", b"raw")], method=zipfile.ZIP_STORED)
    assert next(iter_zip(blob))[1:] == (b"raw", "stored", 3)


def test_eocd_behind_comment():
    blob = _make([("x.txt", b"d")], comment=b"C" * 5000)
    assert next(iter_zip(blob))[0] == "x.txt"


def test_directories_skipped():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("dir/", "")
        z.writestr("dir/f.txt", "F")
    assert [n for n, *_ in iter_zip(buf.getvalue())] == ["dir/f.txt"]


def test_crc_mismatch_raises():
    blob = bytearray(_make([("x.txt", b"data")], method=zipfile.ZIP_STORED))
    blob[blob.find(b"data")] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        list(iter_zip(bytes(blob)))


def test_encrypted_rejected():
    blob = bytearray(_make([("x.txt", b"data")], method=zipfile.ZIP_STORED))
    cen = blob.find(b"PK\x01\x02")
    flags = struct.unpack_from("<H", blob, cen + 8)[0]
    struct.pack_into("<H", blob, cen + 8, flags | 1)
    with pytest.raises(ValueError, match="encrypted"):
        list(iter_zip(bytes(blob)))


def test_not_a_zip():
    with pytest.raises(ValueError):
        list(iter_zip(b"definitely not a zip file"))


def test_unicode_names():
    blob = _make([("ünïcode/ファイル.txt", b"U")])
    assert next(iter_zip(blob))[0] == "ünïcode/ファイル.txt"


def test_spark_read_zip_archive(spark, tmp_path):
    from vtk_reserves_spark.sources.zip import read_zip_archive

    for i in range(2):
        (tmp_path / f"a{i}.zip").write_bytes(
            _make([(f"m{i}.txt", f"payload {i}".encode())])
        )
    rows = read_zip_archive(spark, str(tmp_path / "*.zip")).collect()
    assert len(rows) == 2
    got = {r.member: bytes(r.payload) for r in rows}
    assert got == {"m0.txt": b"payload 0", "m1.txt": b"payload 1"}
    assert {r.archive for r in rows} == {"a0.zip", "a1.zip"}


def test_spark_on_error_null(spark, tmp_path):
    from vtk_reserves_spark.sources.zip import read_zip_archive

    (tmp_path / "bad.zip").write_bytes(b"\x00" * 100)
    (tmp_path / "ok.zip").write_bytes(_make([("k.txt", b"ok")]))
    rows = read_zip_archive(
        spark, str(tmp_path / "*.zip"), on_error="null"
    ).collect()
    errs = [r for r in rows if r.error is not None]
    assert len(errs) == 1 and errs[0].archive == "bad.zip"
    with pytest.raises(Exception):
        read_zip_archive(spark, str(tmp_path / "*.zip")).collect()


def test_zip64_from_stdlib():
    """ZIP64 archives (EOCD64 locator + 0xFFFFFFFF sentinels +
    0x0001 extra fields) parse; stdlib writes them under
    force_zip64."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", allowZip64=True) as z:
        with z.open(zipfile.ZipInfo("big.bin"), "w", force_zip64=True) as f:
            f.write(b"payload data" * 100)
        z.writestr("small.txt", "ok")
    got = list(iter_zip(buf.getvalue()))
    assert got[0][:2] == ("big.bin", b"payload data" * 100)
    assert got[1][:2] == ("small.txt", b"ok")


def test_sentinel_entry_count_without_zip64():
    # an EOCD field that happens to equal a ZIP64 sentinel, with no
    # EOCD64 locator present, is a plain archive per APPNOTE — the
    # EOCD values stand (previously raised)
    blob = bytearray(_make([("x.txt", b"data")], method=zipfile.ZIP_STORED))
    eocd = blob.rfind(b"PK\x05\x06")
    struct.pack_into("<H", blob, eocd + 10, 0xFFFF)
    got = list(iter_zip(bytes(blob)))
    assert len(got) == 1 and got[0][0] == "x.txt" and got[0][1] == b"data"
