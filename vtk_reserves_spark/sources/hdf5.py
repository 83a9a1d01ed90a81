"""HDF5 reader/writer — pure-stdlib + numpy subset of the public
HDF5 file format specification.

HDF5 is, with Zarr (`sources/zarr.py`), the other array-store format
embedding dumps and scientific datasets ship in.  No h5py/libhdf5
exists in this container, so this implements the documented on-disk
format (HDF5 File Format Specification v3.0, the hdfgroup public
spec) directly:

reader
  * superblock v0/v1 (symbol-table root) and v2/v3 (root object
    header address + checksums);
  * object headers v1 and v2 (``OHDR``, incl. creation-order /
    timestamp optional fields), continuation blocks;
  * groups: old-style symbol tables (local heap + v1 B-tree + SNOD
    nodes), new-style compact link messages (0x0006), and DENSE
    link storage (Link Info -> fractal heap of link messages + v2
    B-tree of name-hash records — the layout libhdf5 switches to
    past 8 links); huge/tiny heap IDs, filtered heaps, nested
    indirect blocks and B-tree depth > 1 gate with clear errors;
  * dataspace v1/v2, datatype classes fixed-point / float / string
    (fixed ASCII), little- and big-endian;
  * data layout v3: compact, contiguous, and chunked via the v1
    B-tree chunk index (node type 1), with the filter pipeline
    message — deflate (1), shuffle (2), fletcher32 (3, verified);
  * fill value for unallocated chunks.

writer (fixture + report scale, driver-side like the zarr writer)
  * superblock v0 with an old-style root group: local heap, SNOD
    symbol nodes under a v1 group B-tree — the layout every HDF5
    tool accepts (libhdf5 "earliest" libver);
  * contiguous or chunked datasets (v1 chunk B-tree), optional
    shuffle + deflate + fletcher32 filters, defined fill values
    (message 0x0005 v3, with all-fill chunks left unallocated),
    the same dtype subset;
  * ``dense_links=True``: root-group links stored densely (fractal
    heap + v2 B-tree with Jenkins-lookup3 name hashes), so the
    dense READ path has an in-repo producer to round-trip against.

Golden-vector caveat: like `sources/zarr.py`/`sources/vp8.py`,
cross-validation against libhdf5 is environment-blocked (no wheel,
no network); layouts follow the published spec, round-trip under
property tests, and the q:hdf5_embeddings query hash-checks the
pipeline against DuckDB on the parquet side.

Scale posture: **chunk grain**.  `read_hdf5_df` walks the metadata
(superblock -> object header -> chunk B-tree) once, driver-side —
metadata is KBs — then ships ``(chunk offset, address, size)``
triples to executors that each read + decode their byte range, so a
multi-TB .h5 fans out one task per chunk with zero shuffle, the same
shape as the Zarr reader and the cdx-indexed WARC reader.
"""

from __future__ import annotations

import os
import struct
import zlib
from itertools import product

import numpy as np
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_hdf5_meta", "read_hdf5_array", "write_hdf5",
    "read_hdf5_df", "write_hdf5_df", "list_datasets",
]

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


def _u(data, pos, n):
    return int.from_bytes(data[pos : pos + n], "little")


# ------------------------------------------------------------------ read


class _H5:
    """Parsed-file context: raw bytes + superblock fields."""

    def __init__(self, data: bytes):
        self.data = data
        if data[:8] != _SIG:
            # spec allows the signature at 512, 1024, ... byte offsets;
            # the subset rejects those (nothing modern writes them)
            raise ValueError("hdf5: bad signature")
        ver = data[8]
        self.sb_version = ver
        if ver in (0, 1):
            self.off_size = data[13]
            self.len_size = data[14]
            if (self.off_size, self.len_size) != (8, 8):
                raise ValueError("hdf5: only 8-byte offsets/lengths")
            pos = 24 if ver == 0 else 24 + 4  # v1 adds indexed-k + pad
            self.base = _u(data, pos, 8)
            self.eof = _u(data, pos + 16, 8)
            # root group symbol table entry
            entry = pos + 32
            self.root_header = _u(data, entry + 8, 8)
        elif ver in (2, 3):
            self.off_size = data[9]
            self.len_size = data[10]
            if (self.off_size, self.len_size) != (8, 8):
                raise ValueError("hdf5: only 8-byte offsets/lengths")
            self.base = _u(data, 12, 8)
            self.eof = _u(data, 28, 8)
            self.root_header = _u(data, 36, 8)
        else:
            raise ValueError(f"hdf5: unsupported superblock v{ver}")


def _parse_messages_v1(h: _H5, addr: int) -> list[tuple[int, bytes]]:
    d = h.data
    if d[addr] != 1:
        raise ValueError(f"hdf5: object header v{d[addr]} at {addr:#x}")
    nmsgs = _u(d, addr + 2, 2)
    hsize = _u(d, addr + 8, 4)
    msgs: list[tuple[int, bytes]] = []
    blocks = [(addr + 16, hsize)]
    while blocks and len(msgs) < nmsgs:
        pos, remaining = blocks.pop(0)
        end = pos + remaining
        while pos + 8 <= end and len(msgs) < nmsgs:
            mtype = _u(d, pos, 2)
            msize = _u(d, pos + 2, 2)
            body = d[pos + 8 : pos + 8 + msize]
            pos += 8 + msize
            if mtype == 0x0010:  # continuation
                cont_addr = _u(body, 0, 8)
                cont_len = _u(body, 8, 8)
                blocks.append((cont_addr, cont_len))
                msgs.append((mtype, body))
            else:
                msgs.append((mtype, body))
    return msgs


def _parse_messages_v2(h: _H5, addr: int) -> list[tuple[int, bytes]]:
    d = h.data
    if d[addr : addr + 4] != b"OHDR":
        raise ValueError(f"hdf5: missing OHDR signature at {addr:#x}")
    flags = d[addr + 5]
    pos = addr + 6
    if flags & 0x20:  # times present
        pos += 16
    if flags & 0x10:  # max compact/dense attributes
        pos += 4
    size_bytes = 1 << (flags & 0x3)
    hsize = _u(d, pos, size_bytes)
    pos += size_bytes
    track_order = bool(flags & 0x04)
    msgs: list[tuple[int, bytes]] = []
    blocks = [(pos, hsize, False)]
    while blocks:
        bpos, blen, is_cont = blocks.pop(0)
        if is_cont:
            if d[bpos : bpos + 4] != b"OCHK":
                raise ValueError("hdf5: bad continuation signature")
            bpos += 4
            blen -= 8  # signature + trailing checksum
        # "size of chunk 0" counts message data only (the 4-byte
        # checksum FOLLOWS it); continuation lengths include sig +
        # checksum, already stripped above
        end = bpos + blen
        pos = bpos
        while pos + 4 <= end:
            mtype = d[pos]
            msize = _u(d, pos + 1, 2)
            pos += 4
            if track_order:
                pos += 2
            body = d[pos : pos + msize]
            pos += msize
            if mtype == 0x10:
                blocks.append((_u(body, 0, 8), _u(body, 8, 8), True))
            msgs.append((mtype, body))
    return msgs


def _object_messages(h: _H5, addr: int) -> list[tuple[int, bytes]]:
    if h.data[addr : addr + 4] == b"OHDR":
        return _parse_messages_v2(h, addr)
    return _parse_messages_v1(h, addr)


def _walk_group(h: _H5, addr: int, prefix: str, out: dict) -> None:
    msgs = _object_messages(h, addr)
    by_type: dict[int, list[bytes]] = {}
    for t, b in msgs:
        by_type.setdefault(t, []).append(b)
    if 0x0008 in by_type or 0x0003 in by_type:  # dataset (layout/dtype)
        out[prefix.rstrip("/") or "/"] = (addr, msgs)
        return
    if 0x0011 in by_type:  # symbol table message: old-style group
        body = by_type[0x0011][0]
        btree, heap = _u(body, 0, 8), _u(body, 8, 8)
        for name, child in _iter_symbol_table(h, btree, heap):
            _walk_group(h, child, prefix + name + "/", out)
        return
    if 0x0006 in by_type:  # compact link messages: new-style group
        for body in by_type[0x0006]:
            name, child = _parse_link_message(body)
            _walk_group(h, child, prefix + name + "/", out)
        return
    if 0x0002 in by_type:  # link info -> dense (fractal heap) links
        for name, child in _iter_dense_links(h, by_type[0x0002][0]):
            _walk_group(h, child, prefix + name + "/", out)
        return
    # empty group
    return


def _iter_dense_links(h: _H5, link_info: bytes):
    """Dense link storage (the layout libhdf5 switches to past 8
    links with creation-order tracking): the Link Info message
    (0x0002) points at a FRACTAL HEAP holding the link messages and
    a v2 B-TREE (record type 5: name hash + heap ID) indexing them.
    Enumerating = walk every B-tree record, fetch each link message
    from the heap by its managed heap ID."""
    flags = link_info[1]
    pos = 2
    if flags & 0x01:
        pos += 8  # max creation index
    heap_addr = _u(link_info, pos, 8)
    name_btree = _u(link_info, pos + 8, 8)
    if heap_addr == _UNDEF or name_btree == _UNDEF:
        return []
    heap = _FractalHeap(h, heap_addr)
    links = []
    for rec in _v2_btree_records(h, name_btree):
        # type-5 record: 4-byte name hash + managed heap ID
        obj = heap.read_object(rec[4:])
        links.append(_parse_link_message(obj))
    return sorted(links)


class _FractalHeap:
    """Fractal heap subset: unfiltered managed objects, direct root
    block or one level of indirect block (the shapes dense link/
    attribute storage produces; huge/tiny IDs and filtered blocks
    gate with clear errors)."""

    def __init__(self, h: _H5, addr: int):
        d = h.data
        if d[addr : addr + 4] != b"FRHP":
            raise ValueError("hdf5: bad fractal heap signature")
        if d[addr + 4] != 0:
            raise ValueError("hdf5: fractal heap version != 0")
        self.h = h
        pos = addr + 5
        self.id_len = _u(d, pos, 2)
        io_filter_len = _u(d, pos + 2, 2)
        self.flags = d[pos + 4]
        self.max_man_size = _u(d, pos + 5, 4)
        pos += 9
        pos += 16  # next huge id + huge btree addr
        pos += 32  # free space, fs mgr addr, managed space, alloc space
        pos += 8  # direct block iterator offset
        self.n_managed = _u(d, pos, 8)
        pos += 8
        pos += 32  # huge size, n huge, tiny size, n tiny
        self.width = _u(d, pos, 2)
        self.start_block = _u(d, pos + 2, 8)
        self.max_direct = _u(d, pos + 10, 8)
        self.max_heap_bits = _u(d, pos + 18, 2)
        self.start_rows = _u(d, pos + 20, 2)
        self.root_addr = _u(d, pos + 22, 8)
        self.cur_rows = _u(d, pos + 30, 2)
        if io_filter_len:
            raise ValueError("hdf5: filtered fractal heap not supported")
        self.off_size = (self.max_heap_bits + 7) // 8
        # object-length field width: min(bytes for an offset within
        # the largest direct block, bytes to encode max_man_size) —
        # libhdf5's heap_len_size rule
        b1 = ((self.max_direct.bit_length() - 1) + 7) // 8
        b2 = (self.max_man_size.bit_length() - 1) // 8 + 1
        self.len_size = min(b1, b2)
        self._dblock_hdr = 4 + 1 + 8 + self.off_size + (
            4 if self.flags & 0x02 else 0
        )

    def _direct_blocks(self):
        """[(heap-space offset, file addr, size)] for every direct
        block reachable from the root."""
        if self.root_addr == _UNDEF:
            return []
        if self.cur_rows == 0:  # root IS a direct block
            return [(0, self.root_addr, self.start_block)]
        d = self.h.data
        addr = self.root_addr
        if d[addr : addr + 4] != b"FHIB":
            raise ValueError("hdf5: bad indirect block signature")
        pos = addr + 5 + 8 + self.off_size  # sig+ver, heap addr, off
        out = []
        heap_off = 0
        max_direct_rows = (
            (self.max_direct.bit_length() - 1)
            - (self.start_block.bit_length() - 1) + 2
        )
        for row in range(self.cur_rows):
            if row >= max_direct_rows:
                raise ValueError(
                    "hdf5: nested indirect fractal-heap blocks not "
                    "supported"
                )
            size = (
                self.start_block if row <= 1
                else self.start_block << (row - 1)
            )
            for _ in range(self.width):
                baddr = _u(d, pos, 8)
                pos += 8
                if baddr != _UNDEF:
                    out.append((heap_off, baddr, size))
                heap_off += size
        return out

    def read_object(self, heap_id: bytes) -> bytes:
        typ = (heap_id[0] >> 4) & 0x3
        if typ != 0:
            raise ValueError(
                f"hdf5: fractal-heap ID type {typ} (huge/tiny) not "
                "supported"
            )
        off = int.from_bytes(heap_id[1 : 1 + self.off_size], "little")
        ln = int.from_bytes(
            heap_id[1 + self.off_size : 1 + self.off_size + self.len_size],
            "little",
        )
        for b_off, b_addr, b_size in self._direct_blocks():
            if b_off <= off < b_off + b_size:
                # heap-space offsets INCLUDE block headers, so the
                # file position is addr + (off - block_off)
                p = b_addr + (off - b_off)
                return self.h.data[p : p + ln]
        raise ValueError(f"hdf5: heap offset {off} outside all blocks")


def _v2_btree_records(h: _H5, addr: int) -> list[bytes]:
    """All records of a v2 B-tree (BTHD header; depth 0 = one BTLF
    leaf, depth 1 = BTIN root over leaves — the shapes dense link
    storage produces at fixture-to-large scale)."""
    d = h.data
    if d[addr : addr + 4] != b"BTHD":
        raise ValueError("hdf5: bad v2 B-tree signature")
    pos = addr + 5  # sig + version
    pos += 1  # type
    node_size = _u(d, pos, 4)
    record_size = _u(d, pos + 4, 2)
    depth = _u(d, pos + 6, 2)
    pos += 8 + 2  # split/merge percent
    root_addr = _u(d, pos, 8)
    root_nrec = _u(d, pos + 8, 2)
    if root_addr == _UNDEF:
        return []
    # leaf capacity -> width of the per-child record-count field
    max_nrec_leaf = (node_size - 10) // record_size
    nrec_size = (max_nrec_leaf.bit_length() + 7) // 8
    records: list[bytes] = []

    def leaf(naddr, nrec):
        if d[naddr : naddr + 4] != b"BTLF":
            raise ValueError("hdf5: bad v2 B-tree leaf signature")
        p = naddr + 6
        for i in range(nrec):
            records.append(bytes(d[p + i * record_size
                                   : p + (i + 1) * record_size]))

    if depth == 0:
        leaf(root_addr, root_nrec)
    elif depth == 1:
        if d[root_addr : root_addr + 4] != b"BTIN":
            raise ValueError("hdf5: bad v2 B-tree internal signature")
        p = root_addr + 6
        for i in range(root_nrec):
            records.append(bytes(d[p + i * record_size
                                   : p + (i + 1) * record_size]))
        p += root_nrec * record_size
        for _ in range(root_nrec + 1):
            child = _u(d, p, 8)
            cnrec = _u(d, p + 8, nrec_size)
            p += 8 + nrec_size
            leaf(child, cnrec)
    else:
        raise ValueError(
            f"hdf5: v2 B-tree depth {depth} not supported"
        )
    return records


def _parse_link_message(body: bytes) -> tuple[str, int]:
    ver, flags = body[0], body[1]
    pos = 2
    if flags & 0x08:  # link type
        ltype = body[pos]
        pos += 1
        if ltype != 0:
            raise ValueError("hdf5: only hard links supported")
    if flags & 0x04:
        pos += 8  # creation order
    if flags & 0x10:
        pos += 1  # charset
    ln_size = 1 << (flags & 0x3)
    nlen = _u(body, pos, ln_size)
    pos += ln_size
    name = body[pos : pos + nlen].decode()
    pos += nlen
    return name, _u(body, pos, 8)


def _local_heap_data(h: _H5, heap_addr: int) -> int:
    d = h.data
    if d[heap_addr : heap_addr + 4] != b"HEAP":
        raise ValueError("hdf5: bad local heap signature")
    return _u(d, heap_addr + 24, 8)


def _iter_symbol_table(h: _H5, btree_addr: int, heap_addr: int):
    d = h.data
    heap_data = _local_heap_data(h, heap_addr)

    def walk_node(addr):
        if d[addr : addr + 4] != b"TREE":
            raise ValueError("hdf5: bad group B-tree signature")
        level = d[addr + 5]
        nentries = _u(d, addr + 6, 2)
        pos = addr + 8 + 16  # skip left/right sibling
        pos += 8  # key 0
        for _ in range(nentries):
            child = _u(d, pos, 8)
            pos += 8 + 8  # child + next key
            if level > 0:
                yield from walk_node(child)
            else:
                yield from walk_snod(child)

    def walk_snod(addr):
        if d[addr : addr + 4] != b"SNOD":
            raise ValueError("hdf5: bad symbol node signature")
        nsyms = _u(d, addr + 6, 2)
        pos = addr + 8
        for _ in range(nsyms):
            name_off = _u(d, pos, 8)
            header = _u(d, pos + 8, 8)
            pos += 40
            end = h.data.index(b"\x00", heap_data + name_off)
            yield d[heap_data + name_off : end].decode(), header

    yield from walk_node(btree_addr)


def _parse_dataspace(body: bytes) -> list[int]:
    ver = body[0]
    rank = body[1]
    if ver == 1:
        pos = 8
    elif ver == 2:
        pos = 4
    else:
        raise ValueError(f"hdf5: dataspace v{ver}")
    return [_u(body, pos + 8 * i, 8) for i in range(rank)]


def _parse_datatype(body: bytes) -> np.dtype:
    cv = body[0]
    cls, ver = cv & 0x0F, cv >> 4
    if ver not in (1, 2, 3):
        raise ValueError(f"hdf5: datatype version {ver}")
    bits0 = body[1]
    size = _u(body, 4, 4)
    if cls == 0:  # fixed-point
        big = bits0 & 0x1
        signed = bool(bits0 & 0x8)
        kind = "i" if signed else "u"
        return np.dtype(f"{'>' if big else '<'}{kind}{size}")
    if cls == 1:  # float
        big = bits0 & 0x1
        if size not in (4, 8):
            raise ValueError(f"hdf5: float size {size}")
        return np.dtype(f"{'>' if big else '<'}f{size}")
    if cls == 3:  # string (fixed length)
        return np.dtype(f"S{size}")
    raise ValueError(f"hdf5: unsupported datatype class {cls}")


def _parse_filters(body: bytes) -> list[tuple[int, tuple[int, ...]]]:
    ver = body[0]
    nfilters = body[1]
    out = []
    if ver == 1:
        pos = 8
    elif ver == 2:
        pos = 2
    else:
        raise ValueError(f"hdf5: filter pipeline v{ver}")
    for _ in range(nfilters):
        fid = _u(body, pos, 2)
        if ver == 1 or fid >= 256:
            nlen = _u(body, pos + 2, 2)
        else:
            nlen = 0
        flags = _u(body, pos + 4, 2)
        ncdv = _u(body, pos + 6, 2)
        pos += 8
        if nlen:
            pad = nlen + (-nlen % 8) if ver == 1 else nlen
            pos += pad
        cdv = tuple(_u(body, pos + 4 * i, 4) for i in range(ncdv))
        pos += 4 * ncdv
        if ver == 1 and ncdv % 2:
            pos += 4
        out.append((fid, cdv))
    return out


def _apply_filters_decode(
    raw: bytes, filters, dtype_size: int, filter_mask: int = 0
) -> bytes:
    # filters apply in reverse on read; filter_mask bit i set means
    # pipeline position i was SKIPPED for this chunk (spec v1 B-tree
    # key semantics)
    for i, (fid, cdv) in reversed(list(enumerate(filters))):
        if filter_mask & (1 << i):
            continue
        if fid == 1:  # deflate
            raw = zlib.decompress(raw)
        elif fid == 2:  # shuffle
            ts = cdv[0] if cdv else dtype_size
            n = len(raw)
            m = (n // ts) * ts
            arr = np.frombuffer(raw, np.uint8, count=m).reshape(ts, -1)
            raw = arr.T.tobytes() + raw[m:]
        elif fid == 3:  # fletcher32: payload + 4-byte checksum
            payload, stored = raw[:-4], raw[-4:]
            if _fletcher32(payload) != int.from_bytes(stored, "little"):
                raise ValueError("hdf5: fletcher32 checksum mismatch")
            raw = payload
        else:
            raise ValueError(f"hdf5: unsupported filter id {fid}")
    return raw


def _fletcher32(data: bytes) -> int:
    """libhdf5's H5_checksum_fletcher32: 16-bit words assembled
    BIG-endian (``data[0]<<8 | data[1]``), an odd trailing byte
    contributing its value in the HIGH byte, and the fold reduction
    ``(s & 0xffff) + (s >> 16)`` applied after every 360-word block
    (on the 32-bit-wrapped accumulators) plus once more at the end."""
    n = len(data)
    odd = n % 2
    words = np.frombuffer(data, ">u2", count=(n - odd) // 2).astype(
        np.uint64
    )
    M = 0xFFFFFFFF
    s1 = 0
    s2 = 0
    for i in range(0, len(words), 360):
        blk = words[i : i + 360]
        c1 = np.cumsum(blk, dtype=np.uint64)
        t = len(blk)
        # exact uint64 block sums, then wrap to the C code's uint32
        new_s1 = (s1 + int(c1[-1])) & M
        s2 = (s2 + t * s1 + int(c1.sum())) & M
        s1 = new_s1
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    if odd:
        s1 = (s1 + (data[-1] << 8)) & M
        s2 = (s2 + s1) & M
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    return ((s2 << 16) | s1) & 0xFFFFFFFF


def _parse_fill_value(body: bytes, dtype: np.dtype):
    """Fill value message (0x0005) v1-v3 -> scalar or None (None =
    the default fill, i.e. zeros)."""
    ver = body[0]
    if ver in (1, 2):
        defined = body[3]
        if not defined:
            return None
        sz = _u(body, 4, 4)
        data = body[8 : 8 + sz]
    elif ver == 3:
        flags = body[1]
        if not (flags & 0x20):  # bit 5: fill value defined
            return None
        sz = _u(body, 2, 4)
        data = body[6 : 6 + sz]
    else:
        raise ValueError(f"hdf5: fill value message v{ver}")
    if sz == 0:
        return None
    if len(data) != dtype.itemsize:
        raise ValueError(
            f"hdf5: fill value size {len(data)} != dtype size "
            f"{dtype.itemsize}"
        )
    return np.frombuffer(data, dtype)[0]


class _Dataset:
    def __init__(self, h: _H5, msgs):
        self.h = h
        by = {}
        for t, b in msgs:
            by.setdefault(t, []).append(b)
        self.shape = _parse_dataspace(by[0x0001][0])
        self.dtype = _parse_datatype(by[0x0003][0])
        self.filters = (
            _parse_filters(by[0x000B][0]) if 0x000B in by else []
        )
        self.fill = None
        if 0x0005 in by:
            self.fill = _parse_fill_value(by[0x0005][0], self.dtype)
        elif 0x0004 in by:  # old-style fill value: size + data
            body = by[0x0004][0]
            sz = _u(body, 0, 4)
            if sz == self.dtype.itemsize:
                self.fill = np.frombuffer(body[4 : 4 + sz], self.dtype)[0]
        layout = by[0x0008][0]
        ver = layout[0]
        if ver != 3:
            raise ValueError(f"hdf5: data layout v{ver} (want 3)")
        self.layout_class = layout[1]
        if self.layout_class == 0:  # compact
            sz = _u(layout, 2, 2)
            self.compact = layout[4 : 4 + sz]
        elif self.layout_class == 1:  # contiguous
            self.address = _u(layout, 2, 8)
            self.size = _u(layout, 10, 8)
        elif self.layout_class == 2:  # chunked
            rank1 = layout[2]
            self.btree = _u(layout, 3, 8)
            self.chunk_shape = [
                _u(layout, 11 + 4 * i, 4) for i in range(rank1 - 1)
            ]
            elem = _u(layout, 11 + 4 * (rank1 - 1), 4)
            if elem != self.dtype.itemsize:
                raise ValueError("hdf5: chunk element size != dtype size")
        else:
            raise ValueError(f"hdf5: layout class {self.layout_class}")

    # -- chunk index ---------------------------------------------------
    def chunks(self) -> list[tuple[tuple[int, ...], int, int, int]]:
        """[(chunk offset coords, file address, stored nbytes,
        filter_mask)] from the v1 B-tree (node type 1)."""
        d = self.h.data
        rank = len(self.shape)
        out = []

        def walk(addr):
            if addr == _UNDEF:
                return
            if d[addr : addr + 4] != b"TREE":
                raise ValueError("hdf5: bad chunk B-tree signature")
            if d[addr + 4] != 1:
                raise ValueError("hdf5: B-tree node type != chunk")
            level = d[addr + 5]
            nentries = _u(d, addr + 6, 2)
            key_size = 8 + 8 * (rank + 1)
            pos = addr + 8 + 16
            for i in range(nentries):
                ksize = _u(d, pos, 4)
                kmask = _u(d, pos + 4, 4)
                coords = tuple(
                    _u(d, pos + 8 + 8 * j, 8) for j in range(rank)
                )
                child = _u(d, pos + key_size, 8)
                pos += key_size + 8
                if level > 0:
                    walk(child)
                else:
                    out.append((coords, child, ksize, kmask))

        walk(self.btree)
        return out

    def decode_chunk(self, raw: bytes, filter_mask: int = 0) -> np.ndarray:
        if self.filters:
            raw = _apply_filters_decode(
                raw, self.filters, self.dtype.itemsize, filter_mask
            )
        n = int(np.prod(self.chunk_shape))
        return np.frombuffer(raw, self.dtype, count=n).reshape(
            self.chunk_shape
        )

    def _fill_array(self, shape) -> np.ndarray:
        if self.fill is not None:
            return np.full(shape, self.fill, self.dtype)
        return np.zeros(shape, self.dtype)

    def read(self) -> np.ndarray:
        d = self.h.data
        if self.layout_class == 0:
            return np.frombuffer(
                self.compact, self.dtype
            ).reshape(self.shape)
        if self.layout_class == 1:
            if self.address == _UNDEF:
                return self._fill_array(self.shape)
            raw = d[self.address : self.address + self.size]
            return np.frombuffer(raw, self.dtype).reshape(self.shape)
        out = self._fill_array(self.shape)
        cs = self.chunk_shape
        for coords, addr, nbytes, mask in self.chunks():
            chunk = self.decode_chunk(d[addr : addr + nbytes], mask)
            sl = tuple(
                slice(c, min(c + k, s))
                for c, k, s in zip(coords, cs, self.shape)
            )
            clip = tuple(slice(0, s.stop - s.start) for s in sl)
            out[sl] = chunk[clip]
        return out


def read_hdf5_meta(path_or_bytes) -> dict:
    """File -> {dataset path: _Dataset} (driver-side metadata walk)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            data = fh.read()
    h = _H5(data)
    objects: dict[str, tuple[int, list]] = {}
    _walk_group(h, h.root_header, "/", objects)
    return {name: _Dataset(h, msgs) for name, (addr, msgs) in objects.items()}


def list_datasets(path) -> list[str]:
    return sorted(read_hdf5_meta(path))


def read_hdf5_array(path, dataset: str) -> np.ndarray:
    """One dataset, driver-side (tests / fixture scale)."""
    metas = read_hdf5_meta(path)
    key = dataset if dataset.startswith("/") else "/" + dataset
    if key not in metas:
        raise KeyError(f"hdf5: no dataset {dataset!r}; have {sorted(metas)}")
    return metas[key].read()


# ----------------------------------------------------------------- write


class _MemSink:
    """In-memory sink for the writer (tobytes path)."""

    def __init__(self):
        self.buf = bytearray()

    def tell(self) -> int:
        return len(self.buf)

    def extend(self, b) -> None:
        self.buf.extend(b)

    def align(self, n: int = 8) -> None:
        while len(self.buf) % n:
            self.buf.append(0)

    def copy_file(self, path: str, nbytes: int) -> None:
        with open(path, "rb") as fh:
            self.buf.extend(fh.read(nbytes))

    def backpatch(self, pos: int, b: bytes) -> None:
        self.buf[pos : pos + len(b)] = b


class _FileSink:
    """Streaming file sink: chunk payloads copy through without ever
    being held whole in driver memory (the 100 TB-honest path for
    `write_hdf5_df`'s assembly pass)."""

    def __init__(self, fh):
        self.fh = fh
        self.pos = 0

    def tell(self) -> int:
        return self.pos

    def extend(self, b) -> None:
        self.fh.write(b)
        self.pos += len(b)

    def align(self, n: int = 8) -> None:
        pad = (-self.pos) % n
        if pad:
            self.extend(b"\x00" * pad)

    def copy_file(self, path: str, nbytes: int) -> None:
        with open(path, "rb") as src:
            remaining = nbytes
            while remaining:
                block = src.read(min(remaining, 8 << 20))
                if not block:
                    raise ValueError(f"hdf5: short chunk file {path}")
                self.extend(block)
                remaining -= len(block)

    def backpatch(self, pos: int, b: bytes) -> None:
        cur = self.pos
        self.fh.seek(pos)
        self.fh.write(b)
        self.fh.seek(cur)


def jenkins_lookup3(data: bytes, init: int = 0) -> int:
    """Bob Jenkins' lookup3 ``hashlittle`` (public domain), the hash
    HDF5 uses for v2 metadata checksums and dense-link name hashes
    (H5_checksum_lookup3)."""
    M = 0xFFFFFFFF

    def rot(x, k):
        return ((x << k) | (x >> (32 - k))) & M

    a = b = c = (0xDEADBEEF + len(data) + init) & M
    i = 0
    length = len(data)
    while length > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & M
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & M
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & M
        # mix(a, b, c)
        a = (a - c) & M; a ^= rot(c, 4); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 6); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 8); b = (b + a) & M
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 4); b = (b + a) & M
        i += 12
        length -= 12
    if length:
        t = data[i:] + b"\x00" * (12 - length)
        a = (a + int.from_bytes(t[0:4], "little")) & M
        b = (b + int.from_bytes(t[4:8], "little")) & M
        c = (c + int.from_bytes(t[8:12], "little")) & M
        # final(a, b, c)
        c ^= b; c = (c - rot(b, 14)) & M
        a ^= c; a = (a - rot(c, 11)) & M
        b ^= a; b = (b - rot(a, 25)) & M
        c ^= b; c = (c - rot(b, 16)) & M
        a ^= c; a = (a - rot(c, 4)) & M
        b ^= a; b = (b - rot(a, 14)) & M
        c ^= b; c = (c - rot(b, 24)) & M
    return c


def _encode_chunk_bytes(raw: bytes, filters) -> bytes:
    """Apply the filter pipeline in forward (write) order — shared by
    the driver-side writer and the distributed chunk tasks."""
    for fid, cdv in filters:
        if fid == 2:
            ts = cdv[0]
            m = (len(raw) // ts) * ts
            arr = np.frombuffer(raw, np.uint8, count=m).reshape(-1, ts)
            raw = arr.T.tobytes() + raw[m:]
        elif fid == 1:
            raw = zlib.compress(raw, cdv[0])
        elif fid == 3:
            raw = raw + _fletcher32(raw).to_bytes(4, "little")
    return raw


class _Writer:
    """Minimal old-style (superblock v0) writer: root group as a
    local-heap + one-SNOD v1 B-tree symbol table — the layout every
    HDF5 reader accepts."""

    def __init__(self, dense_links: bool = False):
        self.datasets: list[tuple[str, np.ndarray | None, dict]] = []
        self.dense_links = dense_links

    def add(self, name: str, data: np.ndarray, **opts) -> None:
        self.datasets.append((name, np.ascontiguousarray(data), opts))

    def add_precoded(
        self, name: str, shape, dtype, chunks, chunk_files,
        filters=(), fillvalue=None,
    ) -> None:
        """A chunked dataset whose chunk payloads are ALREADY encoded
        on disk (the distributed write path): ``chunk_files`` is
        ``[(offset coords, path, nbytes)]``; the assembly pass
        streams each file into place and builds only metadata."""
        self.datasets.append((name, None, {
            "_precoded": {
                "shape": tuple(int(s) for s in shape),
                "dtype": np.dtype(dtype),
                "chunks": tuple(int(c) for c in chunks),
                "files": list(chunk_files),
                "filters": list(filters),
            },
            "fillvalue": fillvalue,
        }))

    def tobytes(self) -> bytes:
        sink = _MemSink()
        self.write_to(sink)
        return bytes(sink.buf)

    # layout plan: [superblock 96][per-dataset object headers + data]
    # [local heap][SNOD][B-tree]
    def write_to(self, sink) -> None:
        sink.extend(b"\x00" * 96)  # superblock placeholder

        entries = []  # (heap name offset, header addr)
        named = []  # (name, header addr) for the dense-link path
        heap_names = bytearray(b"\x00")  # offset 0 reserved (empty name)
        for name, data, opts in sorted(
            self.datasets, key=lambda t: t[0]
        ):
            name_off = len(heap_names)
            heap_names += name.encode() + b"\x00"
            # _dataset_header appends the dataset's raw/chunked data to
            # the sink while building; the header itself lands after it
            hdr = self._dataset_header(data, opts, sink)
            sink.align()
            header_addr = sink.tell()
            sink.extend(hdr)
            entries.append((name_off, header_addr))
            named.append((name, header_addr))
        if self.dense_links:
            root_addr = self._dense_root(named, sink)
            sink.align()
            eof = sink.tell()
            sb = (
                _SIG
                + bytes([0, 0, 0, 0, 0, 8, 8, 0])
                + struct.pack("<HHI", 4, 16, 0)
                + struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
                + struct.pack("<QQII", 0, root_addr, 0, 0)
                + b"\x00" * 16
            )
            sink.backpatch(0, sb)
            return
        while len(heap_names) % 8:
            heap_names += b"\x00"
        sink.align()
        heap_data_addr = sink.tell() + 32
        heap = (
            b"HEAP\x00\x00\x00\x00"
            + struct.pack("<QQQ", len(heap_names), len(heap_names),
                          heap_data_addr)
            + heap_names
        )
        heap_addr = sink.tell()
        sink.extend(heap)
        sink.align()
        snod_addr = sink.tell()
        snod = bytearray(b"SNOD\x01\x00" + struct.pack("<H", len(entries)))
        for name_off, header_addr in entries:
            snod += struct.pack("<QQII", name_off, header_addr, 0, 0)
            snod += b"\x00" * 16
        sink.extend(snod)
        sink.align()
        btree_addr = sink.tell()
        # group B-tree: one leaf pointing at the SNOD; keys are heap
        # offsets of the lexically-first/last names (0 = empty string
        # low key, last entry's name as high key)
        high_key = entries[-1][0] if entries else 0
        btree = (
            b"TREE\x00\x00" + struct.pack("<H", 1 if entries else 0)
            + struct.pack("<QQ", _UNDEF, _UNDEF)
            + struct.pack("<Q", 0)
            + (struct.pack("<QQ", snod_addr, high_key) if entries else b"")
        )
        sink.extend(btree)
        sink.align()
        root_addr = sink.tell()
        stmsg = struct.pack("<QQ", btree_addr, heap_addr)
        root = (
            b"\x01\x00" + struct.pack("<H", 1)
            + struct.pack("<I", 1)
            + struct.pack("<I", 8 + len(stmsg))
            + b"\x00" * 4
            + struct.pack("<HH", 0x0011, len(stmsg))
            + b"\x00" * 4
            + stmsg
        )
        sink.extend(root)
        sink.align()
        eof = sink.tell()
        sb = (
            _SIG
            # sb ver, freespace ver, root-group ver, reserved,
            # shared-msg ver, offset size, length size, reserved
            + bytes([0, 0, 0, 0, 0, 8, 8, 0])
            + struct.pack("<HHI", 4, 16, 0)
            + struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
            # root symbol table entry
            + struct.pack("<QQII", 0, root_addr, 0, 0)
            + b"\x00" * 16
        )
        sink.backpatch(0, sb)

    def _dense_root(self, named, sink) -> int:
        """Root group with DENSE link storage (the layout libhdf5
        switches to past 8 links): link messages live in a fractal
        heap (one direct root block), a v2 B-tree of (lookup3 name
        hash, heap ID) records indexes them, and the root object
        header carries only a Link Info message.  Returns the root
        header address."""
        # link message bodies (v1, flags=0 -> 1-byte name length)
        bodies = []
        for name, addr in named:
            nb = name.encode()
            if len(nb) > 255:
                raise ValueError("hdf5: link name too long")
            bodies.append(
                bytes([1, 0, len(nb)]) + nb + struct.pack("<Q", addr)
            )
        # fractal heap geometry (libhdf5's dense-link defaults)
        width = 4
        max_heap_bits = 32
        off_size = 4  # ceil(32 / 8)
        max_man_size = 4096
        if any(len(b) > max_man_size for b in bodies):
            raise ValueError("hdf5: link message exceeds managed size")
        hdr_size = 4 + 1 + 8 + off_size  # FHDB header, no checksum
        need = hdr_size + sum(len(b) for b in bodies)
        start_block = 1 << max(9, (need - 1).bit_length())
        max_direct = max(start_block, 1 << 16)
        b1 = ((max_direct.bit_length() - 1) + 7) // 8
        b2 = (max_man_size.bit_length() - 1) // 8 + 1
        len_size = min(b1, b2)
        id_len = 1 + off_size + len_size

        # layout: [direct block][FRHP][BTLF][BTHD][root header]
        sink.align()
        dblock_addr = sink.tell()
        frhp_addr = dblock_addr + start_block
        frhp_addr += (-frhp_addr) % 8

        dblock = bytearray()
        dblock += b"FHDB" + bytes([0]) + struct.pack("<Q", frhp_addr)
        dblock += (0).to_bytes(off_size, "little")  # block offset 0
        heap_ids = []
        for b in bodies:
            off = len(dblock)  # heap space includes the block header
            heap_ids.append(
                bytes([0])  # version 0, managed
                + off.to_bytes(off_size, "little")
                + len(b).to_bytes(len_size, "little")
            )
            dblock += b
        dblock += b"\x00" * (start_block - len(dblock))
        sink.extend(dblock)

        sink.align()
        assert sink.tell() == frhp_addr
        frhp = bytearray()
        frhp += b"FRHP" + bytes([0])
        frhp += struct.pack("<HHB", id_len, 0, 0)  # id len, filters, flags
        frhp += struct.pack("<I", max_man_size)
        frhp += struct.pack("<QQ", 0, _UNDEF)  # next huge id, huge btree
        frhp += struct.pack("<QQ", 0, _UNDEF)  # free space, fs mgr
        used = hdr_size + sum(len(b) for b in bodies)
        frhp += struct.pack("<QQ", start_block, start_block)  # man/alloc
        frhp += struct.pack("<Q", used)  # direct block iterator offset
        frhp += struct.pack("<Q", len(bodies))  # n managed
        frhp += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny size+count
        frhp += struct.pack("<H", width)
        frhp += struct.pack("<QQ", start_block, max_direct)
        frhp += struct.pack("<HH", max_heap_bits, 1)  # heap bits, rows
        frhp += struct.pack("<Q", dblock_addr)
        frhp += struct.pack("<H", 0)  # cur rows: 0 = root is direct
        frhp += struct.pack("<I", jenkins_lookup3(bytes(frhp)))
        sink.extend(frhp)

        # v2 B-tree: records sorted by (name hash, heap id)
        record_size = 4 + id_len
        recs = sorted(
            struct.pack("<I", jenkins_lookup3(name.encode())) + hid
            for (name, _), hid in zip(named, heap_ids)
        )
        node_size = max(512, 10 + len(recs) * record_size)
        sink.align()
        btlf_addr = sink.tell()
        btlf = bytearray(b"BTLF" + bytes([0, 5]))
        for r in recs:
            btlf += r
        btlf += struct.pack("<I", jenkins_lookup3(bytes(btlf)))
        sink.extend(btlf)
        sink.align()
        bthd_addr = sink.tell()
        bthd = bytearray(b"BTHD" + bytes([0, 5]))
        bthd += struct.pack("<I", node_size)
        bthd += struct.pack("<H", record_size)
        bthd += struct.pack("<H", 0)  # depth
        bthd += bytes([100, 40])  # split / merge percent
        bthd += struct.pack("<Q", btlf_addr)
        bthd += struct.pack("<H", len(recs))
        bthd += struct.pack("<Q", len(recs))
        bthd += struct.pack("<I", jenkins_lookup3(bytes(bthd)))
        sink.extend(bthd)

        # root object header: one Link Info message (v0, flags 0)
        li = bytes([0, 0]) + struct.pack("<QQ", frhp_addr, bthd_addr)
        pad = (-len(li)) % 8
        sink.align()
        root_addr = sink.tell()
        root = (
            b"\x01\x00" + struct.pack("<H", 1)
            + struct.pack("<I", 1)
            + struct.pack("<I", 8 + len(li) + pad)
            + b"\x00" * 4
            + struct.pack("<HH", 0x0002, len(li) + pad)
            + b"\x00" * 4
            + li + b"\x00" * pad
        )
        sink.extend(root)
        return root_addr

    def _dataset_header(self, data, opts, sink) -> bytes:
        precoded = opts.get("_precoded")
        chunks = opts.get("chunks")
        deflate = opts.get("deflate")
        shuffle = bool(opts.get("shuffle"))
        fletcher = bool(opts.get("fletcher32"))
        fillvalue = opts.get("fillvalue")
        if precoded:
            dt = precoded["dtype"]
            shape = precoded["shape"]
            chunks = precoded["chunks"]
        else:
            dt = data.dtype
            shape = data.shape
        if dt.kind not in "iufS":
            raise ValueError(f"hdf5: unsupported dtype {dt}")
        if dt.byteorder == ">":
            if precoded:
                raise ValueError("hdf5: precoded chunks must be LE")
            data = data.astype(dt.newbyteorder("<"))
            dt = data.dtype
        # dataspace v1
        rank = len(shape)
        ds_body = bytes([1, rank, 0, 0]) + b"\x00" * 4 + b"".join(
            struct.pack("<Q", s) for s in shape
        )
        # datatype
        if dt.kind in "iu":
            bits = 0x08 if dt.kind == "i" else 0x00
            dt_body = bytes([0x10, bits, 0, 0]) + struct.pack(
                "<I", dt.itemsize
            ) + struct.pack("<HH", 0, dt.itemsize * 8)
        elif dt.kind == "f":
            # little-endian IEEE float bit fields per spec examples
            if dt.itemsize == 4:
                fields = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
                sign_loc = 31
            else:
                fields = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
                sign_loc = 63
            dt_body = bytes([0x11, 0x20, sign_loc, 0]) + struct.pack(
                "<I", dt.itemsize
            ) + fields
        else:  # fixed string
            dt_body = bytes([0x13, 0x00, 0, 0]) + struct.pack(
                "<I", dt.itemsize
            )
        msgs: list[tuple[int, bytes]] = [
            (0x0001, ds_body), (0x0003, dt_body),
        ]
        if fillvalue is not None:
            fv = np.asarray(fillvalue, dt)
            # v3 message: flags = incremental alloc (3) | defined (bit 5)
            msgs.append((
                0x0005,
                bytes([3, 0x23]) + struct.pack("<I", dt.itemsize)
                + fv.tobytes(),
            ))
        if precoded:
            filters = [tuple(f) for f in precoded["filters"]]
            filters = [(int(f), tuple(c)) for f, c in filters]
        else:
            filters = []
            if shuffle:
                filters.append((2, (dt.itemsize,)))
            if deflate is not None:
                filters.append((1, (int(deflate),)))
            if fletcher:
                # last in the pipeline, as h5py appends it: the
                # checksum covers the (shuffled/compressed) bytes
                filters.append((3, ()))
            if filters and not chunks:
                chunks = shape  # filters require chunked layout
        if filters:
            fp = bytearray([1, len(filters), 0, 0, 0, 0, 0, 0])
            for fid, cdv in filters:
                fp += struct.pack("<HHHH", fid, 0, 1, len(cdv))
                for v in cdv:
                    fp += struct.pack("<I", v)
                if len(cdv) % 2:
                    fp += b"\x00" * 4
            msgs.append((0x000B, bytes(fp)))
        if precoded:
            addr_btree = self._stream_precoded_chunks(
                precoded["files"], tuple(chunks), shape, dt, sink
            )
            lay = bytes([3, 2, len(chunks) + 1]) + struct.pack(
                "<Q", addr_btree
            ) + b"".join(struct.pack("<I", c) for c in chunks) + struct.pack(
                "<I", dt.itemsize
            )
        elif chunks:
            addr_btree = self._write_chunked(
                data, tuple(chunks), filters, sink,
                fillvalue=fillvalue,
            )
            lay = bytes([3, 2, len(chunks) + 1]) + struct.pack(
                "<Q", addr_btree
            ) + b"".join(struct.pack("<I", c) for c in chunks) + struct.pack(
                "<I", dt.itemsize
            )
        else:
            sink.align()
            addr = sink.tell()
            raw = data.tobytes()
            sink.extend(raw)
            sink.align()
            lay = bytes([3, 1]) + struct.pack("<QQ", addr, len(raw))
        msgs.append((0x0008, lay))
        out = bytearray()
        body_parts = []
        for mtype, body in msgs:
            pad = (-len(body)) % 8
            body_parts.append(
                struct.pack("<HH", mtype, len(body) + pad)
                + b"\x00" * 4 + body + b"\x00" * pad
            )
        total = sum(len(p) for p in body_parts)
        out += b"\x01\x00" + struct.pack("<H", len(msgs))
        out += struct.pack("<I", 1) + struct.pack("<I", total)
        out += b"\x00" * 4
        for p in body_parts:
            out += p
        return bytes(out)

    def _write_chunked(self, data, chunks, filters, sink,
                       fillvalue=None) -> int:
        dt = data.dtype
        entries = []
        counts = [
            max(1, -(-s // c)) for s, c in zip(data.shape, chunks)
        ]
        fv = None if fillvalue is None else np.asarray(fillvalue, dt)
        for coord in product(*(range(c) for c in counts)):
            sl = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(coord, chunks, data.shape)
            )
            part = data[sl]
            if fv is not None and np.all(part == fv):
                # all-fill chunk: leave unallocated (no B-tree entry),
                # like libhdf5's FILL_TIME_IFSET behavior
                continue
            full = (
                np.zeros(chunks, dt) if fv is None
                else np.full(chunks, fv, dt)
            )
            full[tuple(slice(0, p) for p in part.shape)] = part
            raw = _encode_chunk_bytes(full.tobytes(), filters)
            sink.align()
            addr = sink.tell()
            sink.extend(raw)
            offs = tuple(i * c for i, c in zip(coord, chunks))
            entries.append((offs, addr, len(raw)))
        return self._chunk_btree(entries, chunks, data.shape, dt, sink)

    def _stream_precoded_chunks(self, files, chunks, shape, dt,
                                sink) -> int:
        """Stream already-encoded chunk payload files into place and
        emit the B-tree (the driver half of `write_hdf5_df`)."""
        entries = []
        # deterministic chunk order in the file (and the B-tree must
        # be key-sorted for readers that binary-search)
        for offs, path, nbytes in sorted(files):
            sink.align()
            addr = sink.tell()
            sink.copy_file(path, int(nbytes))
            entries.append((tuple(offs), addr, int(nbytes)))
        return self._chunk_btree(entries, chunks, shape, dt, sink)

    def _chunk_btree(self, entries, chunks, shape, dt, sink) -> int:
        sink.align()
        btree_addr = sink.tell()
        # single leaf node (fixture-scale metadata; entries are
        # key-sorted); nentries keys have one extra high key
        entries = sorted(entries)
        node = bytearray(b"TREE\x01\x00" + struct.pack("<H", len(entries)))
        node += struct.pack("<QQ", _UNDEF, _UNDEF)
        for offs, addr, nbytes in entries:
            node += struct.pack("<II", nbytes, 0)
            for o in offs:
                node += struct.pack("<Q", o)
            node += struct.pack("<Q", 0)  # element offset
            node += struct.pack("<Q", addr)
        # high key: one past the last chunk in every dimension
        node += struct.pack("<II", 0, 0)
        for c, s in zip(chunks, shape):
            node += struct.pack("<Q", max(1, -(-s // c)) * c)
        node += struct.pack("<Q", dt.itemsize)
        sink.extend(node)
        return btree_addr


def write_hdf5(path_or_none, datasets: dict,
               dense_links: bool = False) -> bytes:
    """``{name: ndarray | (ndarray, opts)}`` -> HDF5 bytes (and
    optionally a file).  opts: ``chunks`` tuple, ``deflate`` level,
    ``shuffle`` / ``fletcher32`` bools, ``fillvalue`` scalar.
    ``dense_links=True`` stores the root group's links densely
    (fractal heap + v2 B-tree, the >8-link libhdf5 layout)."""
    w = _Writer(dense_links=dense_links)
    for name, v in datasets.items():
        if isinstance(v, tuple):
            data, opts = v
        else:
            data, opts = v, {}
        w.add(name, np.asarray(data), **opts)
    blob = w.tobytes()
    if path_or_none is not None:
        with open(path_or_none, "wb") as fh:
            fh.write(blob)
    return blob


# ----------------------------------------------------------------- spark


def read_hdf5_df(
    spark: SparkSession, path: str, dataset: str
) -> DataFrame:
    """Dataset -> exploded DataFrame at chunk grain (chunked layout)
    or row-slab grain (contiguous): the driver walks metadata only;
    executors read + decode their own byte ranges.  Columns
    ``i0..i{ndim-1}`` + ``value`` (double for floats, bigint for
    ints), matching `sources/zarr.read_zarr_df`."""
    metas = read_hdf5_meta(path)
    key = dataset if dataset.startswith("/") else "/" + dataset
    if key not in metas:
        raise KeyError(f"hdf5: no dataset {dataset!r}; have {sorted(metas)}")
    ds = metas[key]
    shape = ds.shape
    ndim = len(shape)
    if ndim == 0:
        raise ValueError("hdf5: 0-d datasets have no tabular form")
    dt = ds.dtype
    if dt.kind == "S":
        raise ValueError("hdf5: string datasets not exposed as values")
    val_t = "double" if dt.kind == "f" else "bigint"
    schema = ", ".join(f"i{d} bigint" for d in range(ndim)) + f", value {val_t}"
    if ds.layout_class == 2:
        cs = ds.chunk_shape
        tasks = [
            (list(coords), addr, nbytes, mask)
            for coords, addr, nbytes, mask in ds.chunks()
        ]
        # unallocated chunks hold the fill value (default 0) — emit
        # them as addr=-1 tasks so the tabular view stays dense,
        # matching _Dataset.read()
        present = {tuple(t[0]) for t in tasks}
        for coord in product(
            *(range(0, s, c) for s, c in zip(shape, cs))
        ):
            if coord not in present:
                tasks.append((list(coord), -1, 0, 0))
    else:
        # contiguous: slab by first dimension into ~32 MB ranges
        row_bytes = int(np.prod(shape[1:], dtype=np.int64)) * dt.itemsize
        rows_per = max(1, (32 << 20) // max(1, row_bytes))
        allocated = getattr(ds, "address", _UNDEF) != _UNDEF
        tasks = []
        for r0 in range(0, shape[0], rows_per):
            nrows = min(rows_per, shape[0] - r0)
            tasks.append(
                ([r0] + [0] * (ndim - 1),
                 ds.address + r0 * row_bytes if allocated else -1,
                 nrows * row_bytes, 0)
            )
        cs = None
    tasks_df = spark.createDataFrame(
        tasks, "coords array<bigint>, addr long, nbytes long, mask int"
    ).repartition(max(1, len(tasks)))
    fill_scalar = None if ds.fill is None else ds.fill.item()
    meta_blob = {
        "shape": shape, "chunk": cs, "dtype": dt.str,
        "filters": ds.filters, "layout": ds.layout_class,
        "fill": fill_scalar,
    }

    def decode(batches):
        import pandas as pd

        dtype = np.dtype(meta_blob["dtype"])
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                coords = [int(c) for c in row.coords]
                if int(row.addr) < 0:
                    # unallocated: synthesize the fill value
                    fv = meta_blob["fill"]
                    if meta_blob["layout"] == 2:
                        ashape = [
                            min(ch, s - c)
                            for c, ch, s in zip(
                                coords, meta_blob["chunk"],
                                meta_blob["shape"],
                            )
                        ]
                    else:
                        nrows = int(row.nbytes) // max(
                            1,
                            int(np.prod(meta_blob["shape"][1:] or [1]))
                            * dtype.itemsize,
                        )
                        ashape = [nrows] + list(meta_blob["shape"][1:])
                    arr = (
                        np.zeros(ashape, dtype)
                        if fv is None
                        else np.full(ashape, fv, dtype)
                    )
                    idx = np.indices(arr.shape).reshape(ndim, -1)
                    cols = {
                        f"i{d}": idx[d] + coords[d] for d in range(ndim)
                    }
                    vals = arr.reshape(-1)
                    cols["value"] = (
                        vals.astype(np.float64)
                        if dtype.kind == "f"
                        else vals.astype(np.int64)
                    )
                    yield pd.DataFrame(cols)
                    continue
                with open(path, "rb") as fh:
                    fh.seek(int(row.addr))
                    raw = fh.read(int(row.nbytes))
                if meta_blob["layout"] == 2:
                    if meta_blob["filters"]:
                        raw = _apply_filters_decode(
                            raw, meta_blob["filters"], dtype.itemsize,
                            int(row.mask),
                        )
                    arr = np.frombuffer(
                        raw, dtype,
                        count=int(np.prod(meta_blob["chunk"])),
                    ).reshape(meta_blob["chunk"])
                    clip = tuple(
                        slice(0, min(ch, s - c))
                        for c, ch, s in zip(
                            coords, meta_blob["chunk"], meta_blob["shape"]
                        )
                    )
                    arr = arr[clip]
                else:
                    nrows = int(row.nbytes) // (
                        int(np.prod(meta_blob["shape"][1:] or [1]))
                        * dtype.itemsize
                    )
                    arr = np.frombuffer(raw, dtype).reshape(
                        [nrows] + list(meta_blob["shape"][1:])
                    )
                idx = np.indices(arr.shape).reshape(ndim, -1)
                cols = {
                    f"i{d}": idx[d] + coords[d] for d in range(ndim)
                }
                vals = arr.reshape(-1)
                cols["value"] = (
                    vals.astype(np.float64)
                    if dtype.kind == "f"
                    else vals.astype(np.int64)
                )
                yield pd.DataFrame(cols)

    return tasks_df.mapInPandas(decode, schema)


def write_hdf5_df(
    df: DataFrame,
    path: str,
    dataset: str,
    shape: tuple[int, ...],
    chunks: tuple[int, ...],
    dtype: str = "<f8",
    deflate: int | None = None,
    shuffle: bool = False,
    fletcher32: bool = False,
    fillvalue=None,
) -> int:
    """DISTRIBUTED HDF5 writer — the inverse of `read_hdf5_df` and
    the single-file counterpart of `sources/zarr.write_zarr_df`.

    ``df`` carries the exploded layout the reader emits (columns
    ``i0..i{ndim-1}`` + ``value``).  Phase 1 (distributed, the heavy
    work): rows shuffle ONCE to their owning chunk
    (``floor(i_d / chunk_d)`` ownership), each task materializes its
    full chunk, applies the filter pipeline (shuffle/deflate/
    fletcher32 — the CPU cost of an HDF5 write), and spills the
    encoded payload to a scratch file via temp-name + ``os.replace``
    (idempotent under retries).  Phase 2 (driver, IO-bound only):
    stream every scratch payload into the final file and emit the
    chunk B-tree + object headers — HDF5 is a single file, so SOME
    single-writer pass is unavoidable; keeping it a byte-copy with
    KB-scale metadata is the honest version (at object-store scale
    the same manifest drives a multipart upload).  Chunks that
    receive no rows are left unallocated and read back as the fill
    value.  Returns the number of chunks written."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    ndim = len(shape)
    if ndim == 0 or len(chunks) != ndim:
        raise ValueError("hdf5: shape/chunks rank mismatch")
    need = [f"i{d}" for d in range(ndim)] + ["value"]
    missing = [c for c in need if c not in df.columns]
    if missing:
        raise ValueError(f"hdf5: input is missing columns {missing}")
    dt = np.dtype(dtype)
    if dt.byteorder == ">":
        raise ValueError("hdf5: write_hdf5_df wants a LE dtype")
    filters: list[tuple[int, tuple[int, ...]]] = []
    if shuffle:
        filters.append((2, (dt.itemsize,)))
    if deflate is not None:
        filters.append((1, (int(deflate),)))
    if fletcher32:
        filters.append((3, ()))
    shape_l, chunks_l = [int(s) for s in shape], [int(c) for c in chunks]
    scratch = tempfile.mkdtemp(
        prefix=os.path.basename(path) + ".chunks-",
        dir=os.path.dirname(os.path.abspath(path)) or ".",
    )
    fv = fillvalue

    keyed = df.select(
        *[
            F.floor(F.col(f"i{d}") / F.lit(chunks_l[d])).alias(f"_c{d}")
            for d in range(ndim)
        ],
        *[F.col(f"i{d}") for d in range(ndim)],
        F.col("value"),
    )

    def encode_chunk(key, pdf):
        import os as _os
        import uuid

        import pandas as pd

        coord = tuple(int(k) for k in key)
        arr = np.full(chunks_l, 0 if fv is None else fv, dtype=dt)
        loc = []
        for d in range(ndim):
            i = pdf[f"i{d}"].to_numpy(np.int64) - coord[d] * chunks_l[d]
            hi = min(chunks_l[d], shape_l[d] - coord[d] * chunks_l[d])
            if (i < 0).any() or (i >= hi).any():
                raise ValueError(
                    f"hdf5: index out of bounds in chunk {coord} dim {d}"
                )
            loc.append(i)
        arr[tuple(loc)] = pdf["value"].to_numpy().astype(dt)
        if fv is not None and bool(np.all(arr == np.asarray(fv, dt))):
            # all-fill: leave unallocated, like the driver writer
            return pd.DataFrame({
                "coords": [[]], "path": [""], "nbytes": [0],
            }).iloc[:0]
        raw = _encode_chunk_bytes(arr.tobytes(), filters)
        name = "c_" + "_".join(str(c) for c in coord) + ".bin"
        p = _os.path.join(scratch, name)
        tmp = f"{p}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(raw)
        _os.replace(tmp, p)
        offs = [coord[d] * chunks_l[d] for d in range(ndim)]
        return pd.DataFrame({
            "coords": [offs], "path": [p], "nbytes": [len(raw)],
        })

    try:
        manifest = keyed.groupBy(
            *[f"_c{d}" for d in range(ndim)]
        ).applyInPandas(
            encode_chunk, "coords array<bigint>, path string, nbytes long"
        ).collect()  # one small row per chunk
        files = [
            (tuple(int(c) for c in r["coords"]), r["path"], int(r["nbytes"]))
            for r in manifest
        ]
        w = _Writer()
        w.add_precoded(
            dataset, shape_l, dt, chunks_l, files,
            filters=filters, fillvalue=fv,
        )
        tmp_out = f"{path}.tmp-assembly"
        with open(tmp_out, "wb") as fh:
            w.write_to(_FileSink(fh))
        os.replace(tmp_out, path)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return len(files)
