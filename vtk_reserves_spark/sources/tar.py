"""TAR archive walking + WebDataset sample grouping — pure-stdlib.

WebDataset — tar shards whose members group into samples by basename
stem (``000123.jpg`` + ``000123.json`` + ``000123.txt``) — is the de
facto packaging for large multimodal training corpora (LAION,
DataComp releases ship exactly this).  A 100 TB pipeline must read
tar shards WITHOUT unpacking them: the shard is the unit of
parallelism (same file-grain posture as `sources/warc.py` for
crawl archives — one task per shard, members streamed inside the
task, bytes never on the driver).

The walker reads the POSIX ustar layout directly (512-byte headers,
octal or base-256 sizes, checksum verification) including GNU
``L``-type long names and pax ``x`` extended headers (path
override).  The builder emits valid ustar archives so every parse
path sits under the driver oracle.  Corrupt headers raise
ValueError — the Spark operators map that to error rows under
``on_error='null'``.
"""

from __future__ import annotations

__all__ = ["iter_tar", "build_tar", "group_webdataset"]

_BLOCK = 512


def _octal(field: bytes) -> int:
    if field and field[0] & 0x80:  # GNU base-256 extension
        val = 0
        for i, b in enumerate(field):
            val = (val << 8) | (b & (0x7F if i == 0 else 0xFF))
        return val
    s = field.split(b"\x00")[0].strip()
    return int(s or b"0", 8)


def iter_tar(data: bytes):
    """Yield (name, payload) for each regular file member.  Handles
    GNU long names (type 'L'), pax extended headers (type 'x' path
    key), and verifies header checksums.  Raises ValueError on
    structural corruption."""
    pos = 0
    pending_name: str | None = None
    global_name: str | None = None
    while pos + _BLOCK <= len(data):
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:  # end-of-archive marker
            break
        stored = _octal(hdr[148:156])
        summed = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
        if summed != stored:
            raise ValueError(f"tar: header checksum mismatch at {pos}")
        size = _octal(hdr[124:136])
        typeflag = hdr[156:157]
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        body = data[pos + _BLOCK : pos + _BLOCK + size]
        if len(body) < size:
            raise ValueError("tar: member payload overruns archive")
        pos += _BLOCK + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        if typeflag == b"L":  # GNU long name for the NEXT member
            pending_name = body.rstrip(b"\x00").decode("utf-8", "replace")
            continue
        if typeflag in (b"x", b"g"):
            # pax extended header: length key=value\n records.
            # 'x' applies to the NEXT member; 'g' sets defaults for
            # ALL following members (per-file 'x' overrides)
            p = 0
            path_val = None
            while p < len(body):
                sp = body.index(b" ", p)
                ln = int(body[p:sp])
                rec = body[p + (sp - p) + 1 : p + ln - 1]
                k, _, v = rec.partition(b"=")
                if k == b"path":
                    path_val = v.decode("utf-8", "replace")
            # noqa: the loop advances by the declared record length
                p += ln
            if typeflag == b"x":
                pending_name = path_val
            elif path_val is not None:
                global_name = path_val
            continue
        if pending_name is not None:
            name = pending_name
            pending_name = None
        elif global_name is not None:
            name = global_name
        if typeflag in (b"0", b"\x00"):
            yield name, body


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Build a ustar archive of regular files (inverse of
    :func:`iter_tar`).  Names longer than 100 bytes are emitted via
    a GNU 'L' long-name record."""
    out = b""
    for name, payload in members:
        nb = name.encode()
        if len(nb) > 100:
            out += _header("././@LongLink", len(nb) + 1, b"L")
            out += _pad(nb + b"\x00")
        out += _header(name if len(nb) <= 100 else name[:100],
                       len(payload), b"0")
        out += _pad(payload)
    return out + b"\x00" * (_BLOCK * 2)


def _pad(body: bytes) -> bytes:
    rem = len(body) % _BLOCK
    return body + (b"\x00" * (_BLOCK - rem) if rem else b"")


def _header(name: str, size: int, typeflag: bytes) -> bytes:
    hdr = bytearray(_BLOCK)
    nb = name.encode()[:100]
    hdr[0 : len(nb)] = nb
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = f"{size:011o}\x00".encode()
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b" " * 8
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}\x00 ".encode()
    return bytes(hdr)


def group_webdataset(members) -> dict[str, dict[str, bytes]]:
    """Group tar members into WebDataset samples: key = path up to
    the FIRST dot of the basename, extension = everything after it
    (so ``a/b/0001.seg.json`` -> key ``a/b/0001``, ext
    ``seg.json``).  Returns {key: {ext: payload}} preserving member
    order."""
    out: dict[str, dict[str, bytes]] = {}
    for name, payload in members:
        slash = name.rfind("/")
        dot = name.find(".", slash + 1)
        if dot < 0:
            key, ext = name, ""
        else:
            key, ext = name[:dot], name[dot + 1 :]
        out.setdefault(key, {})[ext] = payload
    return out
