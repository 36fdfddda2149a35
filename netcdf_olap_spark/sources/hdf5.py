"""Vendored pure-numpy HDF5 reader/writer for NetCDF-4 ingest.

The reference reads NetCDF files through NetCDF-Java (`edu.ucar:cdm`,
gddp/build.sbt; Gddp.scala:53-56), which handles BOTH the classic
CDF-1/CDF-2 format and the NetCDF-4 (HDF5-container) format. Our
vendored classic reader (sources/netcdf3.py) covers the former; this
module closes the remaining input-format gap: .nc files that are HDF5
containers — the default output of netCDF-C ≥4.0 / h5netcdf / xarray's
``engine="netcdf4"``.

Implemented against the public *HDF5 File Format Specification*
(HDF Group, version 3.0 of the spec document) — not a port of any
library. Scope is the structural subset the netCDF-4 default writer
(HDF5 1.8-compatible "earliest" format) emits:

- superblock v0/v1, little-endian, 8-byte offsets/lengths
- v1 object headers (+ continuation blocks)
- symbol-table groups (v1 B-tree + local heap + SNOD nodes)
- messages: NIL, dataspace (v1/v2), datatype (fixed/float/string/vlen),
  fill value (v1/v2/v3), data layout v3 (compact/contiguous/chunked),
  filter pipeline (v1/v2: deflate, shuffle, fletcher32), attributes
  (v1/v2/v3), object-header continuation, symbol table, mtime
- chunked data via the v1 chunk B-tree, with edge-chunk clipping
- vlen-string attribute values via the global heap (GCOL)

Also implemented, for "latest" libver files: superblock v2/v3, v2
("OHDR") object headers with OCHK continuation blocks, compact
link-message groups, the Jenkins lookup3 checksum those structures
carry (validated against the algorithm's published test vectors), and
version-4 data layouts with all five 1.10+ chunk indexes: the three
fixed-shape ones (single chunk, implicit, fixed array FAHD/FADB),
the extensible array (EAHD/EAIB/EASB/EADB — what netCDF-4 files with
one unlimited dimension, i.e. every appended time series, use) and
the version-2 B-tree (BTHD/BTIN/BTLF, ≥2 unlimited dimensions, ANY
depth — the generic walker implements H5B2's per-level pointer-width
math, including the cumulative-count field depth ≥ 2 pointers carry).
DENSE storage both ways (round 7): dense (fractal-heap) groups and
dense attribute storage — FRHP/FHDB heaps plus type-5 (link name)
and type-8 (attribute name) v2-B-tree indexes, the layout
libver="latest" files switch to past max_compact (default 8), where
``_FillValue`` itself lives in the heap; the read side additionally
handles FHIB-rooted (root-indirect) heaps and checksummed direct
blocks, which libhdf5 produces as heaps grow. Compound and enum
datatypes decode for ATTRIBUTES (v1/v2/v3 member encodings; 1-field
compounds — a wild-type ``_FillValue`` shape — unwrap to the scalar,
enums to their base integers with symbol names kept on the datatype);
enum data variables read as base integers; compound DATA variables
(station-record shapes) read as numpy structured arrays and write as
v3 compound datatype messages, member offsets honored (padding holes
kept). Fractal heaps read at ANY depth — rows past max_direct_rows
recurse into child indirect blocks per the doubling table. Out of
scope (clear errors, documented in README's format matrix):
I/O-filtered heaps, huge/tiny heap objects, paged EA
index-block-direct blocks (impossible at library defaults), szip,
region references. (Object references and opaque datatypes moved IN
scope late in round 7 — see below.)
Paged FIXED-array data blocks (page bitmap in the block) and paged
EXTENSIBLE-array data blocks (page-init bitmap in the parent super
block, flat dblk·npages+page indexing) are supported read+write, with
per-page checksums; bitmap bits are MSB-first within each byte, per
libhdf5's H5VM bit macros ("bit offset 0 in the first byte's high-bit
position"). Object-reference datatypes (class 7, type 0) decode in
attributes: netCDF-4's DIMENSION_LIST (vlen reference) resolves to
per-axis dimension-scale names on ``H5File.dim_scales`` — structural
coordinate attachment, independent of naming conventions — and
REFERENCE_LIST (vlen compound back-pointers) is decoded then dropped;
the writer emits DIMENSION_LIST + a global heap collection via its
``dim_scales`` parameter. ARRAY datatypes (class 10, v2+v3) decode —
compound members with sub-array shapes read as numpy sub-array fields
and write as v3 array wrappers. Region references and other remaining
unsupported attribute datatypes still skip, never fatal. OPAQUE
datatypes (class 5) read and write as numpy void — the uninterpreted
fixed-size binary-blob carrier.

The writer exists to make fixtures for the reader (the container has
no HDF5 library to generate files with) and doubles as an HDF5 sink.
Round-trip tests alone could hide complementary reader/writer bugs,
so tests/test_hdf5.py also asserts raw on-disk structure —
signatures, superblock field offsets, message type codes, chunk
B-tree keys — straight from the spec document.

Scale note: like sources/netcdf3.py this parses ONE file's bytes in
memory; distribution happens a level up (sources/netcdf.py
ingest_directory — binaryFile + mapInPandas, one file per task).
"""

from __future__ import annotations

import itertools
import math
import struct
import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"

# message type codes (spec section IV.A.2)
MSG_NIL = 0x0000
MSG_DATASPACE = 0x0001
MSG_LINK_INFO = 0x0002
MSG_DATATYPE = 0x0003
MSG_FILL_OLD = 0x0004
MSG_FILL = 0x0005
MSG_LINK = 0x0006
MSG_LAYOUT = 0x0008
MSG_GROUP_INFO = 0x000A
MSG_FILTER = 0x000B
MSG_ATTRIBUTE = 0x000C
MSG_CONTINUATION = 0x0010
MSG_SYMBOL_TABLE = 0x0011
MSG_MTIME = 0x0012
MSG_ATTRIBUTE_INFO = 0x0015

# datatype classes
CLS_FIXED = 0
CLS_FLOAT = 1
CLS_TIME = 2
CLS_STRING = 3
CLS_OPAQUE = 5
CLS_COMPOUND = 6
CLS_REFERENCE = 7
CLS_ENUM = 8
CLS_VLEN = 9
CLS_ARRAY = 10

# filter ids
FILTER_DEFLATE = 1
FILTER_SHUFFLE = 2
FILTER_FLETCHER32 = 3


_M32 = 0xFFFFFFFF


def lookup3(data: bytes, initval: int = 0) -> int:
    """Bob Jenkins' lookup3 ``hashlittle`` — the checksum HDF5 uses on
    v2 superblocks/object headers. Pure-Python port of the published
    public-domain algorithm; tests pin the paper's self-test vectors
    ("Four score and seven years ago" → 0x17770551 / 0xcd628161)."""

    def rot(x: int, k: int) -> int:
        return ((x << k) | (x >> (32 - k))) & _M32

    def mix(a: int, b: int, c: int) -> tuple[int, int, int]:
        a = (a - c) & _M32; a ^= rot(c, 4);  c = (c + b) & _M32  # noqa: E702
        b = (b - a) & _M32; b ^= rot(a, 6);  a = (a + c) & _M32  # noqa: E702
        c = (c - b) & _M32; c ^= rot(b, 8);  b = (b + a) & _M32  # noqa: E702
        a = (a - c) & _M32; a ^= rot(c, 16); c = (c + b) & _M32  # noqa: E702
        b = (b - a) & _M32; b ^= rot(a, 19); a = (a + c) & _M32  # noqa: E702
        c = (c - b) & _M32; c ^= rot(b, 4);  b = (b + a) & _M32  # noqa: E702
        return a, b, c

    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & _M32
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & _M32
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & _M32
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & _M32
        a, b, c = mix(a, b, c)
        i += 12
        length -= 12
    if length == 0:
        return c
    last = data[i : i + length] + b"\x00" * (12 - length)
    a = (a + int.from_bytes(last[0:4], "little")) & _M32
    b = (b + int.from_bytes(last[4:8], "little")) & _M32
    c = (c + int.from_bytes(last[8:12], "little")) & _M32
    # final()
    def rot_(x, k):
        return ((x << k) | (x >> (32 - k))) & _M32

    c ^= b; c = (c - rot_(b, 14)) & _M32  # noqa: E702
    a ^= c; a = (a - rot_(c, 11)) & _M32  # noqa: E702
    b ^= a; b = (b - rot_(a, 25)) & _M32  # noqa: E702
    c ^= b; c = (c - rot_(b, 16)) & _M32  # noqa: E702
    a ^= c; a = (a - rot_(c, 4)) & _M32  # noqa: E702
    b ^= a; b = (b - rot_(a, 14)) & _M32  # noqa: E702
    c ^= b; c = (c - rot_(b, 24)) & _M32  # noqa: E702
    return c


@dataclass
class H5Var:
    name: str
    shape: tuple[int, ...]
    attributes: dict[str, Any]
    dtype: np.dtype
    data: np.ndarray

    def __getitem__(self, key):
        return self.data[key]


@dataclass
class H5File:
    attributes: dict[str, Any] = field(default_factory=dict)
    variables: dict[str, H5Var] = field(default_factory=dict)
    #: per variable: the dimension-scale variable attached to each axis
    #: (from the netCDF-4 DIMENSION_LIST object-reference attribute),
    #: None where an axis has no scale — structural coordinate
    #: resolution, independent of naming conventions
    dim_scales: dict[str, list[str | None]] = field(default_factory=dict)


def is_hdf5(content: bytes) -> bool:
    return content[:8] == HDF5_MAGIC


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class _DT:
    """Decoded datatype message: enough to map to a numpy dtype."""

    def __init__(
        self,
        cls: int,
        size: int,
        little: bool,
        signed: bool,
        base: "_DT | None" = None,
        vlen_string: bool = False,
        members: "list[tuple[str, int, _DT]] | None" = None,
        enum_names: dict[int, str] | None = None,
        array_dims: tuple[int, ...] | None = None,
    ):
        self.cls = cls
        self.size = size
        self.little = little
        self.signed = signed
        self.base = base
        self.vlen_string = vlen_string
        self.members = members  # compound: (name, byte offset, member dt)
        self.enum_names = enum_names  # enum: base value -> symbol
        self.array_dims = array_dims  # array (class 10): element shape

    def numpy(self) -> np.dtype:
        bo = "<" if self.little else ">"
        if self.cls == CLS_FIXED:
            return np.dtype(f"{bo}{'i' if self.signed else 'u'}{self.size}")
        if self.cls == CLS_FLOAT:
            if self.size not in (2, 4, 8):
                raise NotImplementedError(f"float datatype of size {self.size}")
            return np.dtype(f"{bo}f{self.size}")
        if self.cls == CLS_STRING:
            # a corrupt size wraps numpy's int32 itemsize NEGATIVE
            # (np.dtype("S2181038120").itemsize == -2113929176) and
            # later element access SEGFAULTS the interpreter — refuse
            # implausible sizes here, the single choke point
            if not 0 < self.size <= 2**31 - 1:
                raise ValueError(f"implausible string datatype size {self.size}")
            return np.dtype(f"S{self.size}")
        if self.cls == CLS_ENUM and self.base is not None:
            return self.base.numpy()  # enums read as their base integers
        if self.cls == CLS_COMPOUND and self.members is not None:
            return np.dtype(
                {
                    "names": [m[0] for m in self.members],
                    "formats": [m[2].numpy() for m in self.members],
                    "offsets": [m[1] for m in self.members],
                    "itemsize": self.size,
                }
            )
        if self.cls == CLS_REFERENCE:
            # object reference: an 8-byte object-header address
            return np.dtype(f"<u{self.size}")
        if self.cls == CLS_ARRAY and self.base is not None:
            return np.dtype((self.base.numpy(), self.array_dims or ()))
        if self.cls == CLS_OPAQUE:
            if not 0 < self.size <= 2**31 - 1:
                raise ValueError(f"implausible opaque datatype size {self.size}")
            return np.dtype(f"V{self.size}")
        raise NotImplementedError(f"datatype class {self.cls} has no numpy mapping")


def _parse_datatype(buf: bytes, pos: int) -> tuple[_DT, int]:
    """Parse a datatype message at ``pos``; returns (dt, bytes consumed)."""
    b0 = buf[pos]
    version, cls = b0 >> 4, b0 & 0x0F
    if version not in (1, 2, 3):
        raise NotImplementedError(f"datatype message version {version}")
    bits = buf[pos + 1 : pos + 4]
    (size,) = struct.unpack_from("<I", buf, pos + 4)
    little = not (bits[0] & 0x01)
    consumed = 8
    if cls == CLS_FIXED:
        consumed += 4  # bit offset (2) + precision (2)
        return _DT(cls, size, little, bool(bits[0] & 0x08)), consumed
    if cls == CLS_FLOAT:
        consumed += 12  # offset/precision/exp/man fields + bias
        return _DT(cls, size, little, True), consumed
    if cls == CLS_STRING:
        return _DT(cls, size, True, False), consumed
    if cls == CLS_OPAQUE:
        # bit field bits 0-7 = ASCII tag length; properties = the tag,
        # padded to a multiple of 8. The payload is uninterpreted
        # fixed-size bytes (numpy void)
        tag_len = bits[0]
        return _DT(cls, size, True, False), consumed + ((tag_len + 7) & ~7)
    if cls == CLS_VLEN:
        vtype = bits[0] & 0x0F
        base, base_used = _parse_datatype(buf, pos + 8)
        return _DT(cls, size, True, False, base=base, vlen_string=(vtype == 1)), consumed + base_used
    if cls == CLS_TIME:
        consumed += 2
        return _DT(cls, size, little, False), consumed
    if cls == CLS_REFERENCE:
        # class 7: bit-field low nibble = reference type; only OBJECT
        # references (type 0 — what DIMENSION_LIST/REFERENCE_LIST use)
        # are 8-byte header addresses we can resolve
        if bits[0] & 0x0F:
            raise NotImplementedError("dataset-region reference datatype")
        return _DT(cls, size, True, False), consumed
    if cls == CLS_COMPOUND:
        # member count in class bit-field bits 0-15; member encoding
        # differs by version: v1 pads names to 8 and carries a 4-D
        # array stanza, v2 pads names only, v3 drops padding and
        # shrinks the offset field to the minimum bytes for `size`
        nmembers = bits[0] | (bits[1] << 8)
        members: list[tuple[str, int, _DT]] = []
        p = pos + 8
        # v3 offset width = H5VM_limit_enc_size(size): floor(log2)/8 + 1
        off_len = ((size.bit_length() - 1) // 8) + 1 if size else 1
        for _ in range(nmembers):
            end = buf.index(b"\x00", p)
            name = buf[p:end].decode("utf-8")
            p += (end - p + 8) & ~7 if version in (1, 2) else end - p + 1
            if version == 3:
                off = int.from_bytes(buf[p : p + off_len], "little")
                p += off_len
            else:
                (off,) = struct.unpack_from("<I", buf, p)
                p += 4
            if version == 1:  # dimensionality(1) + reserved(3) + perm(4) + reserved(4) + 4 dims
                p += 1 + 3 + 4 + 4 + 16
            mdt, used = _parse_datatype(buf, p)
            p += used
            members.append((name, off, mdt))
        return _DT(cls, size, True, False, members=members), p - pos
    if cls == CLS_ENUM:
        base, base_used = _parse_datatype(buf, pos + 8)
        nmembers = bits[0] | (bits[1] << 8)
        p = pos + 8 + base_used
        names = []
        for _ in range(nmembers):
            end = buf.index(b"\x00", p)
            names.append(buf[p:end].decode("utf-8"))
            p += (end - p + 8) & ~7 if version in (1, 2) else end - p + 1
        bnp = base.numpy()
        vals = np.frombuffer(buf, dtype=bnp, count=nmembers, offset=p)
        p += nmembers * bnp.itemsize
        enum_names = {int(v): n for n, v in zip(names, vals)}
        return _DT(cls, size, base.little, base.signed, base=base, enum_names=enum_names), p - pos
    if cls == CLS_ARRAY:
        # v2: ndims(1) + reserved(3) + dims(u32 each) + permutations
        # (u32 each, v2 only); v3 drops the reserved and permutation
        # fields. Base datatype message follows.
        ndims = buf[pos + 8]
        p = pos + 9 + (3 if version == 2 else 0)
        dims = tuple(struct.unpack_from(f"<{ndims}I", buf, p))
        p += 4 * ndims
        if version == 2:
            p += 4 * ndims  # permutation indexes (never used by libhdf5)
        base, base_used = _parse_datatype(buf, p)
        return _DT(cls, size, base.little, base.signed, base=base, array_dims=dims), p + base_used - pos
    raise NotImplementedError(f"datatype class {cls} (shared/vlen-data not supported)")


def _parse_dataspace(buf: bytes, pos: int) -> tuple[int, ...]:
    return _parse_dataspace_max(buf, pos)[0]


def _parse_dataspace_max(
    buf: bytes, pos: int
) -> tuple[tuple[int, ...], tuple[int, ...] | None]:
    """(dims, max_dims-or-None). A max dim of UNDEF means unlimited —
    the extensible-array chunk index needs to know WHICH dimension is
    unlimited (its element order swizzles that dimension first)."""
    version = buf[pos]
    ndim = buf[pos + 1]
    flags = buf[pos + 2]
    if version == 1:
        dim_pos = pos + 8  # version, dim, flags, reserved(5)
    elif version == 2:
        dim_pos = pos + 4  # version, dim, flags, type
    else:
        raise NotImplementedError(f"dataspace message version {version}")
    dims = tuple(struct.unpack_from(f"<{ndim}Q", buf, dim_pos)) if ndim else ()
    maxdims = None
    if flags & 0x01 and ndim:
        maxdims = tuple(struct.unpack_from(f"<{ndim}Q", buf, dim_pos + 8 * ndim))
    return dims, maxdims


def _ea_sblk_info(
    max_bits: int, dblk_min: int
) -> list[tuple[int, int, int, int]]:
    """Extensible-array super-block table (H5EA geometry, spec
    IV.A.2): for super block u, (ndblks, dblk_nelmts, start_idx,
    start_dblk) with ndblks = 2^(u//2) and dblk_nelmts =
    2^((u+1)//2) · data_blk_min_elmts — data blocks double in size
    every other super block, so capacity grows geometrically while
    early appends stay small. start_idx counts elements AFTER the
    index block's own ``idx_blk_elmts`` directly-stored elements."""
    nsblks = 1 + (max_bits - (dblk_min.bit_length() - 1))
    info = []
    start_idx = start_dblk = 0
    for u in range(nsblks):
        ndblks = 1 << (u // 2)
        nelmts = (1 << ((u + 1) // 2)) * dblk_min
        info.append((ndblks, nelmts, start_idx, start_dblk))
        start_idx += ndblks * nelmts
        start_dblk += ndblks
    return info


class _Reader:
    def __init__(self, buf: bytes):
        if not is_hdf5(buf):
            raise ValueError("not an HDF5 file (missing \\x89HDF signature)")
        self.buf = buf
        sb_ver = buf[8]
        self.root_btree = self.root_heap = UNDEF
        if sb_ver in (0, 1):
            if buf[13] != 8 or buf[14] != 8:
                raise NotImplementedError("only 8-byte offsets/lengths supported")
            # root group symbol table entry after the fixed fields:
            # sig(8) + version/reserved(8..12) + offsets/lengths/res(13..15)
            # + group-k(16..19) + flags(20..23) = 24; v1 adds 4 (indexed-k);
            # then base/fs/eof/driver addrs (32)
            ste = 24 + (4 if sb_ver == 1 else 0) + 32
            self.root_header_addr = struct.unpack_from("<Q", buf, ste + 8)[0]
            cache = struct.unpack_from("<I", buf, ste + 16)[0]
            if cache == 1:
                self.root_btree, self.root_heap = struct.unpack_from("<QQ", buf, ste + 24)
        elif sb_ver in (2, 3):
            # sig(8) ver(1) offsz(1) lensz(1) flags(1) base(8) ext(8)
            # eof(8) root-ohdr(8) checksum(4)
            if buf[9] != 8 or buf[10] != 8:
                raise NotImplementedError("only 8-byte offsets/lengths supported")
            self.root_header_addr = struct.unpack_from("<Q", buf, 36)[0]
        else:
            raise NotImplementedError(f"HDF5 superblock version {sb_ver}")

    # -- object header ------------------------------------------------------

    def messages(self, addr: int) -> list[tuple[int, int, int]]:
        """All (type, body_offset, body_size) of a v1 or v2 ("OHDR")
        object header, following continuation blocks."""
        buf = self.buf
        if buf[addr : addr + 4] == b"OHDR":
            return self._messages_v2(addr)
        if buf[addr] != 1:
            raise ValueError(f"bad object header version {buf[addr]} at {addr:#x}")
        nmsgs = struct.unpack_from("<H", buf, addr + 2)[0]
        hdr_size = struct.unpack_from("<I", buf, addr + 8)[0]
        blocks = [(addr + 16, addr + 16 + hdr_size)]
        seen = {blocks[0]}
        out: list[tuple[int, int, int]] = []
        bi = 0
        while bi < len(blocks) and len(out) < nmsgs:
            pos, end = blocks[bi]
            bi += 1
            while pos + 8 <= end and len(out) < nmsgs:
                mtype, msize = struct.unpack_from("<HH", buf, pos)
                body = pos + 8
                if mtype == MSG_CONTINUATION:
                    o, length = struct.unpack_from("<QQ", buf, body)
                    blk = (o, o + length)
                    # corrupt files can point continuations at each
                    # other — a visited set keeps this loop finite
                    if blk not in seen:
                        seen.add(blk)
                        blocks.append(blk)
                else:
                    out.append((mtype, body, msize))
                pos = body + msize
        return out

    def _messages_v2(self, addr: int) -> list[tuple[int, int, int]]:
        """v2 ("OHDR") object header: no message count — parse each
        chunk until its end; OCHK continuation blocks carry a
        signature and trailing checksum."""
        buf = self.buf
        flags = buf[addr + 5]
        p = addr + 6
        if flags & 0x20:
            p += 16  # access/mod/change/birth times
        if flags & 0x10:
            p += 4  # max-compact / min-dense attribute counts
        size_bytes = 1 << (flags & 0x3)
        chunk0 = int.from_bytes(buf[p : p + size_bytes], "little")
        p += size_bytes
        corder = 2 if flags & 0x04 else 0  # creation-order field per message
        blocks = [(p, p + chunk0)]
        seen = {blocks[0]}
        out: list[tuple[int, int, int]] = []
        bi = 0
        while bi < len(blocks):
            pos, end = blocks[bi]
            bi += 1
            while pos + 4 + corder <= end:
                mtype = buf[pos]
                (msize,) = struct.unpack_from("<H", buf, pos + 1)
                body = pos + 4 + corder
                if body + msize > end:
                    break  # trailing gap (< one message header)
                if mtype == MSG_CONTINUATION:
                    o, length = struct.unpack_from("<QQ", buf, body)
                    if buf[o : o + 4] != b"OCHK":
                        raise ValueError("bad continuation signature")
                    blk = (o + 4, o + length - 4)  # strip sig + checksum
                    if blk not in seen:  # cycle guard for corrupt files
                        seen.add(blk)
                        blocks.append(blk)
                else:
                    out.append((mtype, body, msize))
                pos = body + msize
        return out

    def parse_link(self, pos: int) -> tuple[str, int] | None:
        """Hard Link message → (name, object header address); soft and
        external links → None."""
        buf = self.buf
        flags = buf[pos + 1]
        p = pos + 2
        ltype = 0
        if flags & 0x08:
            ltype = buf[p]
            p += 1
        if flags & 0x04:
            p += 8  # creation order
        if flags & 0x10:
            p += 1  # charset
        lsz = 1 << (flags & 0x3)
        nlen = int.from_bytes(buf[p : p + lsz], "little")
        p += lsz
        name = buf[p : p + nlen].decode("utf-8")
        p += nlen
        if ltype != 0:
            return None
        return name, struct.unpack_from("<Q", buf, p)[0]

    def link_info_is_dense(self, pos: int) -> bool:
        flags = self.buf[pos + 1]
        p = pos + 2 + (8 if flags & 0x01 else 0)
        fheap = struct.unpack_from("<Q", self.buf, p)[0]
        return fheap != UNDEF

    def attribute_info_is_dense(self, pos: int) -> bool:
        """Attribute Info message (type 0x0015, spec IV.A.2.v): dense
        attribute storage is in use iff the fractal heap address is
        defined. 'latest'-libver files move attributes (including
        ``_FillValue``) into the heap once a dataset exceeds
        max_compact (default 8) — silently ignoring this message would
        lose fill sentinels, so the reader raises instead (same scope
        contract as dense groups)."""
        flags = self.buf[pos + 1]
        p = pos + 2 + (2 if flags & 0x01 else 0)  # optional max creation index (u2)
        fheap = struct.unpack_from("<Q", self.buf, p)[0]
        return fheap != UNDEF

    # -- fractal heap (dense groups / dense attributes) ---------------------

    def _fractal_heap(self, addr: int):
        """Parse a fractal heap header (FRHP, spec III.F) and return a
        ``heap_id -> (absolute offset, length)`` resolver for MANAGED
        objects — the only kind the dense-link and dense-attribute
        heaps of ordinary files hold (huge = objects over ~the direct
        block size, tiny = packed into the ID itself; both raise).

        Heap-ID field widths follow libhdf5's header math: the heap
        offset field is ceil(max-heap-size-bits / 8) bytes; the length
        field is min(bytes addressing within the largest direct block,
        bytes encoding the max managed object size). The stated Heap
        ID Length header field may be LARGER (dense-attribute heaps
        declare 8 while encoding 7 meaningful bytes) — trailing pad is
        ignored. Supports a root direct block (FHDB) or a root
        indirect block (FHIB); rows past max_direct_rows hold CHILD
        indirect blocks (the doubling table, spec III.G), walked
        recursively — a child at row r spans start_size·2^(r-1) bytes
        and has log2(span) − log2(start_size·width) + 1 rows of its
        own (H5HF__dtable_size_to_rows)."""
        buf = self.buf
        if buf[addr : addr + 4] != b"FRHP":
            raise ValueError("bad fractal heap signature")
        _hid_len, filter_len = struct.unpack_from("<HH", buf, addr + 5)
        flags = buf[addr + 9]
        (max_man,) = struct.unpack_from("<I", buf, addr + 10)
        if filter_len:
            raise NotImplementedError("I/O-filtered fractal heap")
        # 12 u64 stats (huge/free/managed/tiny counters) before the table
        p = addr + 14 + 12 * 8
        width, start_size, max_direct = struct.unpack_from("<HQQ", buf, p)
        max_heap_bits, _start_rows = struct.unpack_from("<HH", buf, p + 18)
        (root_blk,) = struct.unpack_from("<Q", buf, p + 22)
        (cur_rows,) = struct.unpack_from("<H", buf, p + 30)
        off_size = (max_heap_bits + 7) // 8
        enc = lambda n: ((n.bit_length() - 1) // 8) + 1 if n else 1  # noqa: E731
        # length field: min(bytes addressing WITHIN the largest direct
        # block — i.e. bytes for log2(max_direct) bits — and bytes
        # encoding the max managed object size), per H5HFhdr
        dir_off_size = ((max_direct.bit_length() - 1) + 7) // 8
        len_size = min(dir_off_size, enc(max_man))
        dblk_hdr = 4 + 1 + 8 + off_size + (4 if flags & 0x02 else 0)  # +checksum

        # (heap offset, block size, file address) for every direct block
        blocks: list[tuple[int, int, int]] = []
        # doubling-table row geometry: rows 0/1 are start_size, then
        # doubling; rows whose block size exceeds max_direct hold
        # CHILD indirect blocks instead of direct ones
        max_direct_rows = (max_direct.bit_length() - start_size.bit_length()) + 2
        first_row_bits = (start_size.bit_length() - 1) + (width.bit_length() - 1)

        def walk_iblock(iaddr: int, nrows: int, base_off: int) -> None:
            if buf[iaddr : iaddr + 4] != b"FHIB":
                raise ValueError("bad fractal heap indirect block signature")
            q = iaddr + 4 + 1 + 8 + off_size  # sig, version, heap addr, block offset
            heap_off = base_off
            for r in range(nrows):
                row_size = start_size if r < 2 else start_size << (r - 1)
                for _c in range(width):
                    (caddr,) = struct.unpack_from("<Q", buf, q)
                    q += 8
                    if caddr != UNDEF:
                        if r < max_direct_rows:
                            blocks.append((heap_off, row_size, caddr))
                        else:
                            # nested indirect child spanning row_size bytes
                            child_rows = (row_size.bit_length() - 1) - first_row_bits + 1
                            walk_iblock(caddr, child_rows, heap_off)
                    heap_off += row_size

        if root_blk != UNDEF:
            if cur_rows == 0:  # root IS a direct block of the starting size
                blocks.append((0, start_size, root_blk))
            else:
                walk_iblock(root_blk, cur_rows, 0)

        def resolve(heap_id: bytes) -> tuple[int, int]:
            b0 = heap_id[0]
            version, idtype = (b0 & 0xC0) >> 6, (b0 & 0x30) >> 4
            if version != 0 or idtype != 0:
                raise NotImplementedError(f"fractal heap ID version {version} type {idtype}")
            off = int.from_bytes(heap_id[1 : 1 + off_size], "little")
            length = int.from_bytes(heap_id[1 + off_size : 1 + off_size + len_size], "little")
            for hoff, size, faddr in blocks:
                if hoff <= off < hoff + size:
                    if buf[faddr : faddr + 4] != b"FHDB":
                        raise ValueError("bad fractal heap direct block signature")
                    if off - hoff < dblk_hdr:
                        raise ValueError("fractal heap object inside block header")
                    return faddr + (off - hoff), length
            raise ValueError(f"fractal heap offset {off} outside managed blocks")

        return resolve

    def dense_links(self, pos: int) -> list[tuple[str, int]]:
        """Links of a DENSE group: Link Info message → fractal heap of
        Link messages + v2 B-tree name index (record type 5: name hash
        + heap ID). Enumeration walks the B-tree — the authoritative
        object index — and resolves each heap ID to a Link message in
        the heap (spec IV.A.2.c / III.A.2)."""
        buf = self.buf
        flags = buf[pos + 1]
        p = pos + 2 + (8 if flags & 0x01 else 0)  # optional max creation index (u8)
        fheap, name_bt = struct.unpack_from("<QQ", buf, p)
        if name_bt == UNDEF:
            raise NotImplementedError("dense group without a link-name index")
        resolve = self._fractal_heap(fheap)
        _bt, rec_size, recs = self._btree2_records(name_bt, expect={5})
        out = []
        for e in recs:
            hid = buf[e + 4 : e + rec_size]  # record: hash (4) + heap ID
            opos, _olen = resolve(hid)
            if (lk := self.parse_link(opos)) is not None:
                out.append(lk)
        return out

    def dense_attributes(self, pos: int) -> dict[str, Any]:
        """Attributes in DENSE storage: Attribute Info message →
        fractal heap of Attribute messages + v2 B-tree name index
        (record type 8: 8-byte heap ID + message flags + creation
        order + name hash). This is where ``libver='latest'`` files
        put EVERY attribute — including ``_FillValue`` — once an
        object passes max_compact (default 8)."""
        buf = self.buf
        flags = buf[pos + 1]
        p = pos + 2 + (2 if flags & 0x01 else 0)  # optional max creation index (u2)
        fheap, name_bt = struct.unpack_from("<QQ", buf, p)
        if name_bt == UNDEF:
            raise NotImplementedError("dense attributes without a name index")
        resolve = self._fractal_heap(fheap)
        _bt, _rec_size, recs = self._btree2_records(name_bt, expect={8})
        out: dict[str, Any] = {}
        for e in recs:
            if buf[e + 8] & 0x03:
                raise NotImplementedError("shared message in dense attribute storage")
            opos, _olen = resolve(buf[e : e + 8])
            try:
                k, v = self.parse_attribute(opos)
                out[k] = v
            except NotImplementedError:
                continue  # unsupported attr datatype: skip, as in compact storage
        return out

    # -- groups (symbol table path) ----------------------------------------

    def group_links(self, btree_addr: int, heap_addr: int) -> list[tuple[str, int]]:
        """(name, object header address) pairs from a v1 group B-tree."""
        buf = self.buf
        if buf[heap_addr : heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        heap_data = struct.unpack_from("<Q", buf, heap_addr + 24)[0]

        def heap_str(off: int) -> str:
            end = buf.index(b"\x00", heap_data + off)
            return buf[heap_data + off : end].decode("utf-8")

        out: list[tuple[str, int]] = []
        visited: set[int] = set()

        def walk(addr: int) -> None:
            if addr in visited:  # cyclic pointers in a corrupt file
                raise ValueError(f"cyclic group B-tree at {addr:#x}")
            visited.add(addr)
            if buf[addr : addr + 4] != b"TREE":
                raise ValueError("bad group B-tree signature")
            node_type, level = buf[addr + 4], buf[addr + 5]
            if node_type != 0:
                raise ValueError(f"expected group B-tree, got node type {node_type}")
            entries = struct.unpack_from("<H", buf, addr + 6)[0]
            pos = addr + 24
            for i in range(entries):
                child = struct.unpack_from("<Q", buf, pos + 8 + i * 16)[0]
                if level > 0:
                    walk(child)
                else:  # SNOD leaf
                    if buf[child : child + 4] != b"SNOD":
                        raise ValueError("bad symbol node signature")
                    nsym = struct.unpack_from("<H", buf, child + 6)[0]
                    for s in range(nsym):
                        e = child + 8 + s * 40
                        name_off, ohdr = struct.unpack_from("<QQ", buf, e)
                        out.append((heap_str(name_off), ohdr))

        walk(btree_addr)
        return out

    # -- attributes ---------------------------------------------------------

    def _gheap_object(self, addr: int, index: int) -> bytes:
        buf = self.buf
        if buf[addr : addr + 4] != b"GCOL":
            raise ValueError("bad global heap signature")
        size = struct.unpack_from("<Q", buf, addr + 8)[0]
        pos, end = addr + 16, addr + size
        while pos + 16 <= end:
            idx, _ref = struct.unpack_from("<HH", buf, pos)
            osize = struct.unpack_from("<Q", buf, pos + 8)[0]
            if idx == 0:
                break
            if idx == index:
                return buf[pos + 16 : pos + 16 + osize]
            pos += 16 + ((osize + 7) & ~7)
        raise ValueError(f"global heap object {index} not found at {addr:#x}")

    @staticmethod
    def _elem(v: Any) -> Any:
        """One numpy element → Python value. ARRAY-typed (class 10)
        elements and sub-array compound members index out as ndarrays,
        where ``.item()`` raises — those become nested lists."""
        return v.tolist() if isinstance(v, np.ndarray) else v.item()

    def _attr_values(self, dt: _DT, shape: tuple[int, ...], pos: int) -> Any:
        n = math.prod(shape) if shape else 1  # exact bigint: corrupt shapes must not overflow
        if dt.cls == CLS_VLEN:
            # every vlen element is a 16-byte global-heap descriptor:
            # count(u4) + collection address(u8) + object index(u4).
            # Strings decode to str; other bases (object references →
            # DIMENSION_LIST, compounds → REFERENCE_LIST) decode to
            # lists of base-type values per element
            vals: list[Any] = []
            for i in range(n):
                p = pos + i * 16
                (length,) = struct.unpack_from("<I", self.buf, p)
                gaddr, gidx = struct.unpack_from("<QI", self.buf, p + 4)
                if length == 0 or gaddr in (0, UNDEF):
                    vals.append("" if dt.vlen_string else [])
                    continue
                raw = self._gheap_object(gaddr, gidx)
                if dt.vlen_string:
                    vals.append(raw[:length].decode("utf-8"))
                    continue
                base = dt.base
                assert base is not None
                seq = np.frombuffer(raw, dtype=base.numpy(), count=length)
                if base.cls == CLS_COMPOUND and base.members is not None:
                    vals.append([{m[0]: self._elem(r[m[0]]) for m in base.members} for r in seq])
                else:
                    vals.append([self._elem(v) for v in seq])
            return vals[0] if not shape else vals
        npdt = dt.numpy()
        # bounds check BEFORE touching the buffer: np.frombuffer with a
        # corrupt count/itemsize combination must become a clean parse
        # error, never undefined behavior in a Spark executor
        if npdt.itemsize <= 0 or n < 0 or pos + n * npdt.itemsize > len(self.buf):
            raise ValueError(
                f"attribute value out of file bounds (itemsize {npdt.itemsize}, count {n})"
            )
        arr = np.frombuffer(self.buf, dtype=npdt, count=n, offset=pos)
        if dt.cls == CLS_COMPOUND:
            # 1-field compounds (``_FillValue`` in the wild) unwrap to
            # the field's scalar; wider compounds become name→value maps
            def one(rec):
                if len(dt.members) == 1:
                    return self._elem(rec[dt.members[0][0]])
                return {m[0]: self._elem(rec[m[0]]) for m in dt.members}

            return one(arr[0]) if not shape else [one(r) for r in arr]
        if dt.cls == CLS_STRING:
            s = arr[0].rstrip(b"\x00").decode("utf-8")
            return s if not shape else [v.rstrip(b"\x00").decode("utf-8") for v in arr]
        if not shape:
            return self._elem(arr[0])
        if npdt.shape:  # ARRAY (class 10): frombuffer yields (n, *elem_dims)
            return arr.reshape(tuple(shape) + npdt.shape).copy()
        return arr.reshape(shape).copy()

    def parse_attribute(self, pos: int) -> tuple[str, Any]:
        buf = self.buf
        version = buf[pos]
        if version not in (1, 2, 3):
            raise NotImplementedError(f"attribute message version {version}")
        name_size, dt_size, ds_size = struct.unpack_from("<HHH", buf, pos + 2)
        if version >= 2 and buf[pos + 1] & 0x03:
            raise NotImplementedError("shared datatype/dataspace in attribute")
        p = pos + 8 + (1 if version == 3 else 0)  # v3: +1 name-encoding byte
        pad = (lambda n: (n + 7) & ~7) if version == 1 else (lambda n: n)
        name = buf[p : p + name_size].split(b"\x00")[0].decode("utf-8")
        p += pad(name_size)
        dt, _ = _parse_datatype(buf, p)
        p += pad(dt_size)
        shape = _parse_dataspace(buf, p)
        p += pad(ds_size)
        return name, self._attr_values(dt, shape, p)

    # -- dataset data -------------------------------------------------------

    def _chunk_entries(self, addr: int, ndim: int) -> list[tuple[tuple[int, ...], int, int, int]]:
        """(offsets, data address, stored size, filter mask) for every
        chunk in a v1 chunk B-tree (node type 1)."""
        buf = self.buf
        out: list[tuple[tuple[int, ...], int, int, int]] = []
        key_size = 8 + 8 * (ndim + 1)
        visited: set[int] = set()

        def walk(a: int) -> None:
            if a in visited:  # cyclic pointers in a corrupt file
                raise ValueError(f"cyclic chunk B-tree at {a:#x}")
            visited.add(a)
            if buf[a : a + 4] != b"TREE":
                raise ValueError("bad chunk B-tree signature")
            node_type, level = buf[a + 4], buf[a + 5]
            if node_type != 1:
                raise ValueError(f"expected chunk B-tree, got node type {node_type}")
            entries = struct.unpack_from("<H", buf, a + 6)[0]
            pos = a + 24
            for _ in range(entries):
                nbytes, mask = struct.unpack_from("<II", buf, pos)
                offs = struct.unpack_from(f"<{ndim + 1}Q", buf, pos + 8)
                child = struct.unpack_from("<Q", buf, pos + key_size)[0]
                if level > 0:
                    walk(child)
                else:
                    out.append((offs[:ndim], child, nbytes, mask))
                pos += key_size + 8

        if addr != UNDEF:
            walk(addr)
        return out

    @staticmethod
    def _defilter(raw: bytes, filters: list[tuple[int, tuple[int, ...]]], mask: int) -> bytes:
        # filters applied in reverse pipeline order on read
        for i in reversed(range(len(filters))):
            fid, client = filters[i]
            if mask & (1 << i):
                continue
            if fid == FILTER_DEFLATE:
                raw = zlib.decompress(raw)
            elif fid == FILTER_SHUFFLE:
                es = client[0] if client else 1
                if es > 1:
                    raw = np.frombuffer(raw, "u1").reshape(es, -1).T.tobytes()
            elif fid == FILTER_FLETCHER32:
                raw = raw[:-4]
            else:
                raise NotImplementedError(f"HDF5 filter id {fid}")
        return raw

    def read_dataset(self, msgs: list[tuple[int, int, int]], name: str) -> H5Var:
        buf = self.buf
        dt: _DT | None = None
        shape: tuple[int, ...] = ()
        maxshape: tuple[int, ...] | None = None
        attrs: dict[str, Any] = {}
        layout: tuple[Any, ...] | None = None
        filters: list[tuple[int, tuple[int, ...]]] = []
        fill_pos: int | None = None
        for mtype, pos, _size in msgs:
            if mtype == MSG_DATATYPE:
                dt, _ = _parse_datatype(buf, pos)
            elif mtype == MSG_DATASPACE:
                shape, maxshape = _parse_dataspace_max(buf, pos)
            elif mtype == MSG_ATTRIBUTE:
                try:
                    k, v = self.parse_attribute(pos)
                    attrs[k] = v
                except NotImplementedError:
                    # real netCDF-4 files attach DIMENSION_LIST /
                    # REFERENCE_LIST (vlen object-reference / compound
                    # datatypes) to every variable; they describe shape
                    # we already have from the dataspace — skip rather
                    # than fail the whole file
                    continue
            elif mtype == MSG_LAYOUT:
                layout = self._parse_layout(pos)
            elif mtype == MSG_FILTER:
                filters = self._parse_filters(pos)
            elif mtype == MSG_FILL:
                fill_pos = pos
            elif mtype == MSG_ATTRIBUTE_INFO and self.attribute_info_is_dense(pos):
                attrs.update(self.dense_attributes(pos))
        if dt is None or layout is None:
            raise ValueError(f"dataset {name!r} missing datatype or layout message")
        npdt = dt.numpy()
        n = math.prod(shape) if shape else 1  # exact bigint: corrupt shapes must not overflow
        # corrupt-shape guard: deflate can legitimately expand far past
        # the file size, but not by >4096x — beyond that the dataspace
        # is garbage, and a clean error beats a multi-GiB np.full
        # allocation inside an executor. Exemption (r7 advice): a
        # dataset with NO allocated storage (undefined data address /
        # chunk index — a valid netCDF-4 never-written variable) reads
        # as pure fill, so the file-size-relative cap doesn't apply;
        # it gets a fixed 2 GiB cap instead (the fill array itself
        # must still be materializable).
        declared = n * npdt.itemsize
        kind = layout[0]
        if kind == "contiguous" or kind == "chunked":
            allocated = layout[1] != UNDEF
        elif kind == "chunked4":
            allocated = layout[3][0] != UNDEF
        else:
            allocated = True  # compact: the data lives in the message
        if allocated and declared > max(1 << 28, 4096 * len(buf)):
            raise ValueError(
                f"dataset {name!r} declares {declared} bytes — implausible for a "
                f"{len(buf)}-byte file"
            )
        if not allocated and declared > (1 << 31):
            raise ValueError(
                f"dataset {name!r} declares {declared} bytes of never-written fill "
                f"— above the 2 GiB materialization cap"
            )

        # HDF5 semantics: unallocated data reads as the declared fill
        # value; fall back to NaN (floats) / 0 (ints) when undefined
        fill = self._parse_fill(fill_pos, npdt)

        def background() -> np.ndarray:
            if fill is not None:
                return np.full(shape, fill, dtype=npdt)
            return np.full(shape, np.nan, dtype=npdt) if npdt.kind == "f" else np.zeros(shape, dtype=npdt)

        if kind == "compact":
            data = np.frombuffer(layout[1], dtype=npdt, count=n).reshape(shape)
        elif kind == "contiguous":
            addr, _dsize = layout[1], layout[2]
            if addr == UNDEF:  # never allocated → all fill
                data = background()
            else:
                data = np.frombuffer(buf, dtype=npdt, count=n, offset=addr).reshape(shape)
        elif kind in ("chunked", "chunked4"):
            if kind == "chunked":
                chunk_shape = layout[2]
                # UNDEF B-tree address = no chunk ever written → all fill
                entries = self._chunk_entries(layout[1], len(shape)) if allocated else []
            else:
                _k, dims, index_type, info = layout
                # v4 chunk dims: tolerate both rank and rank+1 (trailing
                # element-size dim, as in v3) encodings
                chunk_shape = dims[:-1] if len(dims) == len(shape) + 1 else dims
                entries = self._chunk_entries_v4(
                    shape, chunk_shape, npdt.itemsize, index_type, info, bool(filters), maxshape
                )
            data = background()
            for offs, caddr, nbytes, mask in entries:
                raw = self._defilter(buf[caddr : caddr + nbytes], filters, mask)
                chunk = np.frombuffer(raw, dtype=npdt, count=math.prod(chunk_shape)).reshape(chunk_shape)
                sel = tuple(
                    slice(o, min(o + c, s)) for o, c, s in zip(offs, chunk_shape, shape)
                )
                clip = tuple(slice(0, sl.stop - sl.start) for sl in sel)
                data[sel] = chunk[clip]
        else:  # pragma: no cover
            raise NotImplementedError(kind)
        return H5Var(name, shape, attrs, npdt, np.ascontiguousarray(data))

    def _parse_fill(self, pos: int | None, npdt: np.dtype) -> Any:
        """Defined fill value from a Fill Value message (v1/v2/v3), or
        None when absent/undefined/size-mismatched."""
        if pos is None:
            return None
        buf = self.buf
        version = buf[pos]
        if version == 1:  # version, alloc time, write time, size, value
            (size,) = struct.unpack_from("<I", buf, pos + 3)
            vpos = pos + 7
        elif version == 2:  # + defined flag; size/value only when defined
            if buf[pos + 3] != 1:
                return None
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            vpos = pos + 8
        elif version == 3:  # flags byte; bit 5 = fill value defined
            if not (buf[pos + 1] & 0x20):
                return None
            (size,) = struct.unpack_from("<I", buf, pos + 2)
            vpos = pos + 6
        else:
            return None
        if size != npdt.itemsize:
            return None
        return np.frombuffer(buf, dtype=npdt, count=1, offset=vpos)[0]

    @staticmethod
    def _chunk_grid(shape: tuple[int, ...], chunk_shape: tuple[int, ...]) -> list[tuple[int, ...]]:
        """Chunk origin offsets in row-major linear-index order — the
        element order of the implicit and fixed-array indexes."""
        grids = [range(0, s, c) for s, c in zip(shape, chunk_shape)]
        return list(itertools.product(*grids))

    def _chunk_entries_v4(
        self,
        shape: tuple[int, ...],
        chunk_shape: tuple[int, ...],
        itemsize: int,
        index_type: int,
        info: tuple[Any, ...],
        filtered: bool,
        maxshape: tuple[int, ...] | None = None,
    ) -> list[tuple[tuple[int, ...], int, int, int]]:
        """(offsets, address, stored size, filter mask) for the five
        version-4 chunk indexes: single chunk (1), implicit (2),
        fixed array (3), extensible array (4), v2 B-tree (5)."""
        buf = self.buf
        if info[0] == UNDEF:  # index never allocated → zero chunks, all fill
            return []
        chunk_nbytes = math.prod(chunk_shape) * itemsize
        origins = self._chunk_grid(shape, chunk_shape)
        if index_type == 1:  # single chunk
            addr, stored, mask = info
            if addr == UNDEF:
                return []
            return [((0,) * len(shape), addr, stored if filtered else chunk_nbytes, mask)]
        if index_type == 2:  # implicit: unfiltered chunks packed in linear order
            (addr,) = info
            if addr == UNDEF:
                return []
            return [
                (offs, addr + i * chunk_nbytes, chunk_nbytes, 0) for i, offs in enumerate(origins)
            ]
        if index_type == 3:  # fixed array
            (fa_addr,) = info
            if fa_addr == UNDEF:
                return []
            if buf[fa_addr : fa_addr + 4] != b"FAHD":
                raise ValueError("bad fixed-array header signature")
            client_id = buf[fa_addr + 5]
            entry_size = buf[fa_addr + 6]
            page_bits = buf[fa_addr + 7]
            max_entries, db_addr = struct.unpack_from("<QQ", buf, fa_addr + 8)
            # the data block stores all pages back-to-back, so a corrupt
            # max_entries (or zero entry size) cannot describe more
            # entries than the file holds — guard before the entry loop
            if entry_size == 0 or max_entries * entry_size > len(buf):
                raise ValueError(
                    f"fixed-array index declares {max_entries} entries of "
                    f"{entry_size} bytes — exceeds the {len(buf)}-byte file"
                )
            if buf[db_addr : db_addr + 4] != b"FADB":
                raise ValueError("bad fixed-array data block signature")
            hdr_end = db_addr + 6 + 8  # sig, version, client id, header address
            page_nelmts = 1 << page_bits

            if max_entries > page_nelmts:
                # PAGED data block (spec III.K): header, page bitmap
                # (1 bit per page, MSB-first within each byte — libhdf5's
                # H5VM_bit_get places bit offset 0 in the first byte's
                # HIGH-bit position; set = page initialized), checksum,
                # then the pages back-to-back, each page_nelmts elements
                # (last page truncated) + checksum
                npages = -(-int(max_entries) // page_nelmts)
                bitmap = buf[hdr_end : hdr_end + (npages + 7) // 8]
                page0 = hdr_end + (npages + 7) // 8 + 4
                page_starts = []
                pos = page0
                for pg in range(npages):
                    n_in_pg = min(page_nelmts, int(max_entries) - pg * page_nelmts)
                    page_starts.append(pos)
                    pos += n_in_pg * entry_size + 4

                def entry_pos(i: int) -> int | None:
                    pg, within = divmod(i, page_nelmts)
                    if not (bitmap[pg // 8] >> (7 - pg % 8)) & 1:
                        return None  # uninitialized page → all fill
                    return page_starts[pg] + within * entry_size
            else:

                def entry_pos(i: int) -> int | None:
                    return hdr_end + i * entry_size

            out = []
            for i in range(int(max_entries)):
                e = entry_pos(i)
                if e is None:
                    continue
                (caddr,) = struct.unpack_from("<Q", buf, e)
                if caddr == UNDEF:
                    continue
                if client_id == 1:  # filtered: address + chunk size + mask
                    size_len = entry_size - 12
                    stored = int.from_bytes(buf[e + 8 : e + 8 + size_len], "little")
                    (mask,) = struct.unpack_from("<I", buf, e + 8 + size_len)
                else:
                    stored, mask = chunk_nbytes, 0
                out.append((origins[i], caddr, stored, mask))
            return out
        if index_type == 4:  # extensible array
            ea_addr = info[0]
            if ea_addr == UNDEF:
                return []
            return self._earray_entries(ea_addr, shape, chunk_shape, chunk_nbytes, maxshape)
        if index_type == 5:  # v2 B-tree
            bt_addr = info[0]
            if bt_addr == UNDEF:
                return []
            return self._btree2_entries(bt_addr, len(shape), chunk_shape, chunk_nbytes)
        raise NotImplementedError(f"v4 chunk index type {index_type}")

    def _earray_entries(
        self,
        ea_addr: int,
        shape: tuple[int, ...],
        chunk_shape: tuple[int, ...],
        chunk_nbytes: int,
        maxshape: tuple[int, ...] | None,
    ) -> list[tuple[tuple[int, ...], int, int, int]]:
        """Extensible-array chunk index (spec IV.A.2: EAHD header,
        EAIB index block, EASB super blocks, EADB data blocks) — what
        HDF5 ≥1.10 uses for a dataset with exactly ONE unlimited
        dimension, i.e. every netCDF-4 file that appends along time.

        Geometry: the index block stores the first ``idx_blk_elmts``
        elements inline plus direct pointers to the data blocks of the
        first ``2·log2(sup_blk_min_data_ptrs)`` super blocks; later
        super blocks get their own EASB holding data-block pointers,
        with data blocks doubling in size every other super block
        (``_ea_sblk_info``). Elements are ordered by the chunk's
        linear index over the chunk grid SWIZZLED so the unlimited
        dimension varies slowest (H5VM_swizzle_coords) — identity for
        netCDF-4's (time, y, x) since time is already first. Paged
        data blocks (dblk_nelmts > 2^page_bits — super-block children
        past ~½M chunks at libhdf5 defaults) are read via the parent
        super block's page-init bitmap; only the index-block-direct
        paged case (impossible at library defaults) raises."""
        buf = self.buf
        if buf[ea_addr : ea_addr + 4] != b"EAHD":
            raise ValueError("bad extensible-array header signature")
        client = buf[ea_addr + 5]
        elmt_size = buf[ea_addr + 6]
        max_bits = buf[ea_addr + 7]
        idx_elmts = buf[ea_addr + 8]
        dblk_min = buf[ea_addr + 9]
        sblk_min_ptrs = buf[ea_addr + 10]
        page_bits = buf[ea_addr + 11]
        # 6 stats lengths (secondary blk count/size, data blk count/
        # size, max index set, element count) precede the index-block
        # address; the reader walks the structure so only the address
        # is needed
        (ib_addr,) = struct.unpack_from("<Q", buf, ea_addr + 12 + 6 * 8)
        if client not in (0, 1):
            raise NotImplementedError(f"extensible-array client id {client}")
        if ib_addr == UNDEF:
            return []
        if dblk_min & (dblk_min - 1) or sblk_min_ptrs & (sblk_min_ptrs - 1):
            raise ValueError("extensible-array creation params must be powers of two")
        if max_bits > 64 or elmt_size == 0:
            # corrupt creation params would size super blocks at 2^max_bits
            # elements and drive unbounded decode loops
            raise ValueError(
                f"implausible extensible-array params (max_bits {max_bits}, "
                f"element size {elmt_size})"
            )
        arr_off = (max_bits + 7) // 8
        sblk_info = _ea_sblk_info(max_bits, dblk_min)
        ib_nsblks = 2 * (sblk_min_ptrs.bit_length() - 1)
        ib_ndblk_addrs = 2 * (sblk_min_ptrs - 1)
        ib_nsblk_addrs = len(sblk_info) - ib_nsblks
        page_nelmts = 1 << page_bits

        def decode_elems(pos: int, n: int) -> list[tuple[int, int, int] | None]:
            if n * elmt_size > len(buf):
                raise ValueError(
                    f"extensible-array block declares {n} elements of "
                    f"{elmt_size} bytes — exceeds the {len(buf)}-byte file"
                )
            out: list[tuple[int, int, int] | None] = []
            for i in range(n):
                e = pos + i * elmt_size
                (caddr,) = struct.unpack_from("<Q", buf, e)
                if caddr == UNDEF:
                    out.append(None)
                elif client == 1:  # filtered: addr + stored size + mask
                    size_len = elmt_size - 12
                    stored = int.from_bytes(buf[e + 8 : e + 8 + size_len], "little")
                    (mask,) = struct.unpack_from("<I", buf, e + 8 + size_len)
                    out.append((caddr, stored, mask))
                else:
                    out.append((caddr, chunk_nbytes, 0))
            return out

        if buf[ib_addr : ib_addr + 4] != b"EAIB":
            raise ValueError("bad extensible-array index block signature")
        p = ib_addr + 6 + 8  # sig, version, client id, header address
        elements = decode_elems(p, idx_elmts)
        p += idx_elmts * elmt_size
        dblk_addrs = struct.unpack_from(f"<{ib_ndblk_addrs}Q", buf, p)
        p += 8 * ib_ndblk_addrs
        sblk_addrs = struct.unpack_from(f"<{ib_nsblk_addrs}Q", buf, p)

        def read_dblk(
            daddr: int, nelmts: int, page_init: "Callable[[int], bool] | None" = None
        ) -> list:
            if daddr == UNDEF:
                return [None] * nelmts
            if nelmts > page_nelmts and page_init is None:
                # an index-block-direct data block could only page if
                # page_bits < the early data-block sizes — libhdf5's
                # defaults (page 1024, dblk_min 16, min_ptrs 4) never
                # produce this, and the page-init bitmap for direct
                # blocks has no on-disk home we know of
                raise NotImplementedError("paged index-block-direct extensible-array data block")
            if buf[daddr : daddr + 4] != b"EADB":
                raise ValueError("bad extensible-array data block signature")
            # sig, version, client id, header addr, block offset
            body = daddr + 6 + 8 + arr_off
            if nelmts <= page_nelmts:
                return decode_elems(body, nelmts)
            # PAGED (spec IV.A.2 / H5EAdblkpage): the block on disk is
            # prefix + checksum only; pages follow back-to-back, each
            # page_nelmts elements + its own checksum. Which pages are
            # initialized lives in the PARENT super block's bitmap.
            out: list = []
            if (nelmts // page_nelmts) * 4 > len(buf):
                raise ValueError("paged data block declares more pages than the file can hold")
            for pg in range(nelmts // page_nelmts):
                if not page_init(pg):
                    out.extend([None] * page_nelmts)
                    continue
                out.extend(decode_elems(body + 4 + pg * (page_nelmts * elmt_size + 4), page_nelmts))
            return out

        grid_dims = tuple(-(-s // c) for s, c in zip(shape, chunk_shape))
        nchunks = math.prod(grid_dims) if grid_dims else 1
        dblk_cursor = 0
        for u, (ndblks, nelmts, _si, _sd) in enumerate(sblk_info):
            if len(elements) >= nchunks:
                break
            if u < ib_nsblks:  # data blocks pointed to directly from the index block
                for _ in range(ndblks):
                    elements.extend(read_dblk(dblk_addrs[dblk_cursor], nelmts))
                    dblk_cursor += 1
            else:
                saddr = sblk_addrs[u - ib_nsblks]
                if saddr == UNDEF:
                    elements.extend([None] * (ndblks * nelmts))
                    continue
                if buf[saddr : saddr + 4] != b"EASB":
                    raise ValueError("bad extensible-array super block signature")
                sp = saddr + 6 + 8 + arr_off
                if nelmts > page_nelmts:
                    # paged data blocks: the super block carries one flat
                    # page-init bitstream for all its data blocks' pages
                    # (ndblks × ceil(npages/8) bytes allocated; bit for
                    # (dblk j, page p) at flat index j·npages + p,
                    # MSB-first per byte — libhdf5 H5VM_bit_get)
                    npg = nelmts // page_nelmts
                    bm = buf[sp : sp + ndblks * ((npg + 7) // 8)]
                    sp += len(bm)

                    def pinit(j: int, p: int, _bm=bm, _npg=npg) -> bool:
                        i = j * _npg + p
                        return bool((_bm[i // 8] >> (7 - i % 8)) & 1)

                else:
                    pinit = None
                for j, daddr in enumerate(struct.unpack_from(f"<{ndblks}Q", buf, sp)):
                    elements.extend(
                        read_dblk(
                            daddr,
                            nelmts,
                            None if pinit is None else (lambda p, _j=j: pinit(_j, p)),
                        )
                    )

        unlim = 0
        if maxshape:
            for i, m in enumerate(maxshape):
                if m == UNDEF:
                    unlim = i
                    break
        order = [unlim] + [i for i in range(len(shape)) if i != unlim]
        out = []
        for offs in self._chunk_grid(shape, chunk_shape):
            g = [o // c for o, c in zip(offs, chunk_shape)]
            idx = 0
            for d in order:  # ravel over the swizzled chunk grid
                idx = idx * grid_dims[d] + g[d]
            ent = elements[idx] if idx < len(elements) else None
            if ent is not None:
                out.append((offs, ent[0], ent[1], ent[2]))
        return out

    def _btree2_records(self, bt_addr: int, expect: set[int]) -> tuple[int, int, list[int]]:
        """Generic version-2 B-tree walk (spec III.A.2: BTHD header,
        BTIN internal nodes, BTLF leaves) at ANY depth. Returns
        (record type, record size, [absolute record offsets]) in tree
        order. Shared by the chunk indexes (types 10/11), the dense-
        group link-name index (type 5) and the dense-attribute name
        index (type 8).

        Per-level geometry follows libhdf5's H5B2 header math: leaf
        capacity fixes the child-record-count field width
        (H5VM_limit_enc_size of the leaf max); internal capacity at
        level u accounts for its own pointer size, which embeds the
        CUMULATIVE subtree-record-count width of level u-1 once the
        child itself is internal (depth ≥ 2) — that extra field is
        exactly what the old depth-≤1 reader couldn't parse."""
        buf = self.buf
        if buf[bt_addr : bt_addr + 4] != b"BTHD":
            raise ValueError("bad v2 B-tree header signature")
        btype = buf[bt_addr + 5]
        (node_size,) = struct.unpack_from("<I", buf, bt_addr + 6)
        rec_size, depth = struct.unpack_from("<HH", buf, bt_addr + 10)
        # split%, merge% (1 byte each) precede the root pointer
        root_addr, root_nrec = struct.unpack_from("<QH", buf, bt_addr + 16)
        if btype not in expect:
            raise NotImplementedError(f"v2 B-tree record type {btype} (expected one of {sorted(expect)})")
        if root_addr == UNDEF:
            return btype, rec_size, []
        # ONE definition of the per-level H5B2 geometry, shared with
        # the writer's planner (_b2_capacities below) — reader and
        # writer cannot drift apart
        _max_nrec, _cum_max, cum_size, max_nrec_size = _b2_capacities(
            node_size, rec_size, max_depth=depth
        )
        if depth >= len(cum_size):
            raise ValueError(f"v2 B-tree depth {depth} impossible at node size {node_size}")

        out: list[int] = []

        def walk(addr: int, nrec: int, level: int) -> None:
            if level == 0:
                if buf[addr : addr + 4] != b"BTLF":
                    raise ValueError("bad v2 B-tree leaf signature")
                out.extend(addr + 6 + i * rec_size for i in range(nrec))
                return
            if buf[addr : addr + 4] != b"BTIN":
                raise ValueError("bad v2 B-tree internal node signature")
            recs_pos = addr + 6
            ptr_pos = recs_pos + nrec * rec_size
            # child pointers: address + record count (+ cumulative
            # subtree count when the child is itself internal)
            child_cum = cum_size[level - 1] if level - 1 >= 1 else 0
            ptr_size = 8 + max_nrec_size + child_cum
            for i in range(nrec + 1):
                e = ptr_pos + i * ptr_size
                (caddr,) = struct.unpack_from("<Q", buf, e)
                cnrec = int.from_bytes(buf[e + 8 : e + 8 + max_nrec_size], "little")
                walk(caddr, cnrec, level - 1)
                if i < nrec:  # in-order: internal nodes carry real records too
                    out.append(recs_pos + i * rec_size)

        walk(root_addr, root_nrec, depth)
        return btype, rec_size, out

    def _btree2_entries(
        self, bt_addr: int, rank: int, chunk_shape: tuple[int, ...], chunk_nbytes: int
    ) -> list[tuple[tuple[int, ...], int, int, int]]:
        """Version-2 B-tree chunk index — HDF5 ≥1.10's index for a
        dataset with MORE THAN ONE unlimited dimension. Record type 10
        = non-filtered chunk (address + scaled offsets), 11 = filtered
        (+ stored size + filter mask); 'scaled' offsets are chunk-grid
        coordinates, multiplied back out here. Any tree depth (the
        generic ``_btree2_records`` walker)."""
        buf = self.buf
        btype, rec_size, recs = self._btree2_records(bt_addr, expect={10, 11})
        filtered = btype == 11

        def parse_rec(e: int) -> tuple[tuple[int, ...], int, int, int]:
            (caddr,) = struct.unpack_from("<Q", buf, e)
            q = e + 8
            if filtered:
                size_len = rec_size - 12 - 8 * rank
                stored = int.from_bytes(buf[q : q + size_len], "little")
                (mask,) = struct.unpack_from("<I", buf, q + size_len)
                q += size_len + 4
            else:
                stored, mask = chunk_nbytes, 0
            scaled = struct.unpack_from(f"<{rank}Q", buf, q)
            offs = tuple(s * c for s, c in zip(scaled, chunk_shape))
            return (offs, caddr, stored, mask)

        return [parse_rec(e) for e in recs]

    def _parse_layout(self, pos: int) -> tuple[Any, ...]:
        buf = self.buf
        version = buf[pos]
        if version == 4:
            return self._parse_layout_v4(pos)
        if version != 3:
            raise NotImplementedError(f"data layout message version {version} (only v3/v4 supported)")
        cls = buf[pos + 1]
        if cls == 0:  # compact
            (size,) = struct.unpack_from("<H", buf, pos + 2)
            return ("compact", buf[pos + 4 : pos + 4 + size])
        if cls == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", buf, pos + 2)
            return ("contiguous", addr, size)
        if cls == 2:  # chunked
            ndim_p1 = buf[pos + 2]
            (btree,) = struct.unpack_from("<Q", buf, pos + 3)
            dims = struct.unpack_from(f"<{ndim_p1}I", buf, pos + 11)
            return ("chunked", btree, tuple(dims[:-1]))  # last dim = element size
        raise NotImplementedError(f"layout class {cls}")

    def _parse_layout_v4(self, pos: int) -> tuple[Any, ...]:
        """Version-4 data layout (HDF5 ≥1.10). Compact/contiguous are
        byte-identical to v3; chunked carries per-dataset chunk-index
        metadata instead of a v1 B-tree pointer."""
        buf = self.buf
        cls = buf[pos + 1]
        if cls == 0:
            (size,) = struct.unpack_from("<H", buf, pos + 2)
            return ("compact", buf[pos + 4 : pos + 4 + size])
        if cls == 1:
            addr, size = struct.unpack_from("<QQ", buf, pos + 2)
            return ("contiguous", addr, size)
        if cls != 2:
            raise NotImplementedError(f"layout v4 class {cls}")
        flags = buf[pos + 2]
        ndims = buf[pos + 3]
        enc_len = buf[pos + 4]
        p = pos + 5
        dims = tuple(
            int.from_bytes(buf[p + i * enc_len : p + (i + 1) * enc_len], "little") for i in range(ndims)
        )
        p += ndims * enc_len
        index_type = buf[p]
        p += 1
        if index_type == 1:  # single chunk
            if flags & 0x02:  # filtered: stored size + filter mask precede the address
                stored = struct.unpack_from("<Q", buf, p)[0]
                (mask,) = struct.unpack_from("<I", buf, p + 8)
                p += 12
            else:
                stored, mask = 0, 0
            (addr,) = struct.unpack_from("<Q", buf, p)
            info: tuple[Any, ...] = (addr, stored, mask)
        elif index_type == 2:  # implicit
            info = (struct.unpack_from("<Q", buf, p)[0],)
        elif index_type == 3:  # fixed array
            _page_bits = buf[p]
            info = (struct.unpack_from("<Q", buf, p + 1)[0],)
        elif index_type == 4:  # extensible array: 5 creation-param bytes + EAHD addr
            max_bits, idx_elmts, min_ptrs, min_elmts, page_bits = buf[p : p + 5]
            info = (
                struct.unpack_from("<Q", buf, p + 5)[0],
                (max_bits, idx_elmts, min_ptrs, min_elmts, page_bits),
            )
        elif index_type == 5:  # v2 B-tree: node size, split%, merge% + BTHD addr
            (node_size,) = struct.unpack_from("<I", buf, p)
            info = (struct.unpack_from("<Q", buf, p + 6)[0], node_size)
        else:
            raise NotImplementedError(f"v4 chunk index type {index_type}")
        # NOTE: dims may or may not carry v3's trailing element-size
        # dimension depending on the writer; read_dataset resolves it
        # against the dataspace rank (tolerates both encodings)
        return ("chunked4", dims, index_type, info)

    def _parse_filters(self, pos: int) -> list[tuple[int, tuple[int, ...]]]:
        buf = self.buf
        version, nfilters = buf[pos], buf[pos + 1]
        out: list[tuple[int, tuple[int, ...]]] = []
        p = pos + (8 if version == 1 else 2)
        for _ in range(nfilters):
            (fid,) = struct.unpack_from("<H", buf, p)
            p += 2
            name_len = 0
            if version == 1 or fid >= 256:
                (name_len,) = struct.unpack_from("<H", buf, p)
                p += 2
            _flags, ncv = struct.unpack_from("<HH", buf, p)
            p += 4 + name_len
            client = struct.unpack_from(f"<{ncv}I", buf, p)
            p += 4 * ncv
            if version == 1 and ncv % 2 == 1:
                p += 4
            out.append((fid, client))
        return out


def read_hdf5(content: bytes, variables: list[str] | None = None) -> H5File:
    """Parse an HDF5 (NetCDF-4 container) file from bytes into the same
    shape as ``read_netcdf3``: variables + attributes, data fully
    materialized as numpy arrays.

    ``variables``: optional allowlist of 3-D measure variables —
    projection pushdown into the container. Coordinate/auxiliary
    (non-3-D) datasets always load; unlisted 3-D datasets are skipped
    BEFORE their (possibly deflate-compressed) data is touched, so a
    one-variable read of a five-variable file decompresses one
    variable, not five."""
    r = _Reader(content)
    out = H5File()

    root_msgs = r.messages(r.root_header_addr)
    btree, heap = r.root_btree, r.root_heap
    links: list[tuple[str, int]] = []
    for mtype, pos, _size in root_msgs:
        if mtype == MSG_SYMBOL_TABLE:
            btree, heap = struct.unpack_from("<QQ", r.buf, pos)
        elif mtype == MSG_ATTRIBUTE:
            try:
                k, v = r.parse_attribute(pos)
                out.attributes[k] = v
            except NotImplementedError:
                continue  # unsupported attr datatype: skip, don't fail the file
        elif mtype == MSG_LINK:  # compact 'latest'-libver group
            if (lk := r.parse_link(pos)) is not None:
                links.append(lk)
        elif mtype == MSG_LINK_INFO and r.link_info_is_dense(pos):
            links.extend(r.dense_links(pos))
        elif mtype == MSG_ATTRIBUTE_INFO and r.attribute_info_is_dense(pos):
            out.attributes.update(r.dense_attributes(pos))
    if btree != UNDEF:
        links = r.group_links(btree, heap)
    elif not links:
        return out

    for name, ohdr in links:
        msgs = r.messages(ohdr)
        types = {t for t, _, _ in msgs}
        if MSG_SYMBOL_TABLE in types:
            continue  # sub-group: netCDF-4 classic model keeps all vars in root
        if MSG_LAYOUT not in types:
            continue
        if variables is not None:
            shape = next(
                (_parse_dataspace(r.buf, pos) for t, pos, _s in msgs if t == MSG_DATASPACE), ()
            )
            if len(shape) == 3 and name not in variables:
                continue  # pushdown: data never decompressed
        out.variables[name] = r.read_dataset(msgs, name)

    # resolve DIMENSION_LIST object references (header addresses) to
    # variable names; REFERENCE_LIST is the back-pointer bookkeeping on
    # the scale itself — drop it so attribute dicts stay export-clean
    addr_to_name = {ohdr: nm for nm, ohdr in links}
    for name, var in out.variables.items():
        dl = var.attributes.pop("DIMENSION_LIST", None)
        var.attributes.pop("REFERENCE_LIST", None)
        if dl is None:
            continue
        axes = dl if isinstance(dl, list) else [dl]
        out.dim_scales[name] = [
            next(
                (addr_to_name[int(a)] for a in (ax if isinstance(ax, list) else [ax]) if int(a) in addr_to_name),
                None,
            )
            for ax in axes
        ]
    return out


# ---------------------------------------------------------------------------
# writer (fixture generator + HDF5 sink)
# ---------------------------------------------------------------------------


def _dt_message(arr: np.ndarray) -> bytes:
    """Datatype message body for the array's dtype (v1, little-endian)."""
    dt = arr.dtype
    if dt.byteorder == ">":
        # the emitted descriptors below hard-code little-endian bit
        # order while the data path writes raw ``tobytes()`` — a
        # big-endian dtype would round-trip byte-swapped; callers
        # byteswap to native first
        raise NotImplementedError(f"cannot write big-endian dtype {dt}")
    if dt.kind == "f":
        if dt.itemsize == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
            bits = bytes([0x20, 63, 0])
        elif dt.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
            bits = bytes([0x20, 31, 0])
        else:
            raise NotImplementedError(f"cannot write dtype {dt}")
        return bytes([0x11]) + bits + struct.pack("<I", dt.itemsize) + props
    if dt.kind in "iu":
        bits = bytes([0x08 if dt.kind == "i" else 0x00, 0, 0])
        props = struct.pack("<HH", 0, dt.itemsize * 8)
        return bytes([0x10]) + bits + struct.pack("<I", dt.itemsize) + props
    if dt.kind == "S":
        return bytes([0x13, 0x00, 0x00, 0x00]) + struct.pack("<I", dt.itemsize)
    if dt.kind == "V" and not dt.names:
        # plain void → OPAQUE (class 5): uninterpreted fixed-size
        # bytes; tag is advisory ASCII, NUL-padded to 8
        return bytes([0x15, 8, 0x00, 0x00]) + struct.pack("<I", dt.itemsize) + b"bytes\x00\x00\x00"
    if dt.kind == "V" and dt.names:
        # compound, VERSION 3 encoding (spec IV.A.2.d): member names
        # NUL-terminated without padding, byte offsets in the minimum
        # width for the compound's size; nested member messages reuse
        # the scalar emitters above
        off_len = ((dt.itemsize.bit_length() - 1) // 8) + 1 if dt.itemsize else 1
        n = len(dt.names)
        body = bytearray(bytes([0x36, n & 0xFF, (n >> 8) & 0xFF, 0]) + struct.pack("<I", dt.itemsize))
        for name in dt.names:
            mdt, moff = dt.fields[name][0], dt.fields[name][1]
            body += name.encode("utf-8") + b"\x00"
            body += int(moff).to_bytes(off_len, "little")
            if mdt.subdtype is not None:
                # sub-array member → ARRAY datatype (class 10, v3)
                # wrapper: ndims + u32 dims + the base scalar message
                base_dt, shape = mdt.subdtype
                props = bytes([len(shape)]) + b"".join(struct.pack("<I", d) for d in shape)
                body += (
                    bytes([0x3A, 0, 0, 0])
                    + struct.pack("<I", mdt.itemsize)
                    + props
                    + _dt_message(np.zeros((), dtype=base_dt))
                )
            else:
                body += _dt_message(np.zeros((), dtype=mdt))
        return bytes(body)
    raise NotImplementedError(f"cannot write dtype {dt}")


def _ds_message(shape: tuple[int, ...], maxshape: tuple[int, ...] | None = None) -> bytes:
    # dataspace v1: version, ndim, flags, reserved(5), dims
    # [, max dims when flags bit 0 set — UNDEF = unlimited]
    flags = 0x01 if maxshape is not None else 0
    body = struct.pack("<BBB5x", 1, len(shape), flags)
    body += b"".join(struct.pack("<Q", d) for d in shape)
    if maxshape is not None:
        body += b"".join(struct.pack("<Q", d) for d in maxshape)
    return body


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _attr_message(name: str, value: Any) -> bytes:
    """Attribute message v1: name/datatype/dataspace sections padded to 8."""
    if isinstance(value, str):
        arr = np.array(value.encode("utf-8") + b"\x00", dtype=f"S{len(value.encode('utf-8')) + 1}")
        shape: tuple[int, ...] = ()
    else:
        a = np.asarray(value)
        if a.dtype.kind == "f":
            a = a.astype("<f8")
        elif a.dtype.kind in "iu":
            a = a.astype("<i8") if a.dtype.kind == "i" else a.astype("<u8")
        arr, shape = a, a.shape
    nameb = name.encode("utf-8") + b"\x00"
    dtm = _dt_message(arr.reshape(-1)[:1] if arr.shape else arr)
    dsm = _ds_message(shape)
    head = struct.pack("<BxHHH", 1, len(nameb), len(dtm), len(dsm))
    return head + _pad8(nameb) + _pad8(dtm) + _pad8(dsm) + arr.tobytes()


def _dimension_list_attr(gidxs: list[int | None], gcol_addr: int) -> bytes:
    """netCDF-4's ``DIMENSION_LIST``: a rank-length 1-D attribute of
    vlen(object reference). Each element is the 16-byte global-heap
    descriptor (count, collection address, object index) whose heap
    object holds one 8-byte header address; axes without a scale get
    an empty (count-0) sequence. Attribute BYTES are address-size
    invariant, so the two-pass writer can size headers before the
    global heap's address is known."""
    nameb = b"DIMENSION_LIST\x00"
    base = bytes([0x17, 0x00, 0x00, 0x00]) + struct.pack("<I", 8)  # class 7 v1, object ref
    dtm = bytes([0x19, 0x00, 0x00, 0x00]) + struct.pack("<I", 16) + base  # class 9 v1, sequence
    dsm = _ds_message((len(gidxs),))
    val = b"".join(
        struct.pack("<IQI", 1, gcol_addr, g) if g else struct.pack("<IQI", 0, 0, 0)
        for g in gidxs
    )
    head = struct.pack("<BxHHH", 1, len(nameb), len(dtm), len(dsm))
    return head + _pad8(nameb) + _pad8(dtm) + _pad8(dsm) + val


# single flat B-tree nodes keep the writer simple; the superblock
# declares K values large enough that external readers size their
# node buffers correctly, and writes beyond these limits raise
GROUP_LEAF_K = 1024  # ≤ 2·K symbols per SNOD
INDEXED_K = 8192  # ≤ 2·K chunk entries per v1 chunk B-tree leaf


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


def _msg_v2(mtype: int, body: bytes) -> bytes:
    # v2 headers pack messages without alignment padding
    return struct.pack("<BHB", mtype, len(body), 0) + body


def _object_header_v2(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    # flags 0x02: chunk-0 size stored as 4 bytes; no times, no phase change
    head = b"OHDR" + struct.pack("<BBI", 2, 0x02, len(blob))
    body = head + blob
    return body + struct.pack("<I", lookup3(body))


def _link_msg(name: str, ohdr_addr: int) -> bytes:
    nameb = name.encode("utf-8")
    if len(nameb) >= 256:
        raise ValueError(f"link name too long ({len(nameb)} bytes) for 1-byte length field")
    # v1, flags 0: hard link, 1-byte name length, no creation order/charset
    return struct.pack("<BBB", 1, 0, len(nameb)) + nameb + struct.pack("<Q", ohdr_addr)


def _shuffle_bytes(raw: bytes, es: int) -> bytes:
    return np.frombuffer(raw, "u1").reshape(-1, es).T.tobytes()


# --- fractal heap writer profile (dense groups / dense attributes) --------
# libhdf5's default doubling table for link/attribute heaps: width 4,
# 512-byte starting blocks doubling to 64 KiB, 32-bit heap address
# space, 4 KiB managed-object ceiling. These fix the heap-ID widths:
# offset ceil(32/8)=4, length min(bytes for log2(65536) bits,
# bytes for 4096) = 2 → 7-byte IDs (dense-attribute B-tree records
# still reserve 8, zero-padded, per spec III.A.2 record type 8).
_FH_WIDTH = 4
_FH_START = 512
_FH_MAX_DIRECT = 65536
_FH_MAX_HEAP_BITS = 32
_FH_MAX_MAN_OBJ = 4096
_FH_OFF_SIZE = (_FH_MAX_HEAP_BITS + 7) // 8
_FH_LEN_SIZE = 2
_FH_ID_LEN = 1 + _FH_OFF_SIZE + _FH_LEN_SIZE  # 7 meaningful heap-ID bytes
_FH_DBLK_HDR = 4 + 1 + 8 + _FH_OFF_SIZE  # FHDB header, unchecksummed (flags=0)
_FH_NAME_NODE = 2048  # v2 name-index node size (link + attribute indexes)


def _fh_layout(obj_sizes: list[int]) -> tuple[list[int], list[bytes], int]:
    """Back-to-back managed-object layout in a single ROOT DIRECT
    block: (heap offsets, 7-byte heap IDs, block size). The root
    direct block is always the starting block size, so the starting
    size is grown (power of two, ≤ max direct) to fit — a heap
    needing more than one 64 KiB block raises."""
    offs, ids = [], []
    cursor = _FH_DBLK_HDR
    for sz in obj_sizes:
        if sz > _FH_MAX_MAN_OBJ:
            raise ValueError(f"object of {sz} bytes exceeds the managed-object ceiling ({_FH_MAX_MAN_OBJ})")
        offs.append(cursor)
        ids.append(
            bytes([0x00])  # version 0, managed
            + cursor.to_bytes(_FH_OFF_SIZE, "little")
            + sz.to_bytes(_FH_LEN_SIZE, "little")
        )
        cursor += sz
    block = _FH_START
    while block < cursor:
        block <<= 1
    if block > _FH_MAX_DIRECT:
        raise ValueError(f"{cursor} bytes of dense objects exceed one {_FH_MAX_DIRECT}-byte direct block")
    return offs, ids, block


def _fh_header(nobjs: int, used: int, block: int, root_addr: int, hid_len: int) -> bytes:
    """FRHP bytes for the single-root-direct-block profile."""
    h = b"FRHP" + struct.pack("<BHHB", 0, hid_len, 0, 0)
    h += struct.pack("<I", _FH_MAX_MAN_OBJ)
    h += struct.pack("<QQ", 0, UNDEF)  # next huge id, huge-object B-tree
    h += struct.pack("<QQ", block - used, UNDEF)  # free space, no free-space manager
    h += struct.pack("<QQQ", block, block, block)  # managed / allocated / iterator offset
    h += struct.pack("<QQQQQ", nobjs, 0, 0, 0, 0)  # nobjs; huge/tiny sizes+counts
    h += struct.pack("<HQQ", _FH_WIDTH, block, _FH_MAX_DIRECT)
    h += struct.pack("<HH", _FH_MAX_HEAP_BITS, 1)  # max heap size (bits), starting rows
    h += struct.pack("<QH", root_addr, 0)  # root block addr, cur rows = 0 (root is direct)
    return h + struct.pack("<I", lookup3(h))


def _fh_direct_block(heap_addr: int, objects: list[bytes], block: int) -> bytes:
    body = b"FHDB" + bytes([0]) + struct.pack("<Q", heap_addr)
    body += (0).to_bytes(_FH_OFF_SIZE, "little")  # block offset 0 in heap space
    body += b"".join(objects)
    return body + b"\x00" * (block - len(body))


# --- generic v2 B-tree writer planning (any depth) -------------------------


def _b2_enc_size(n: int) -> int:
    return ((n.bit_length() - 1) // 8) + 1 if n else 1


def _b2_capacities(node_size: int, rec_size: int, max_depth: int = 8):
    """Per-level node capacities and pointer-field widths, mirroring
    the reader's (and libhdf5's H5B2) header math."""
    max_nrec = [(node_size - 10) // rec_size]
    cum = [max_nrec[0]]
    cum_sz = [_b2_enc_size(cum[0])]
    mns = _b2_enc_size(max_nrec[0])
    for u in range(1, max_depth + 1):
        ptr = 8 + mns + (cum_sz[u - 1] if u > 1 else 0)
        n = (node_size - 10 - ptr) // (rec_size + ptr)
        if n < 1:
            break
        max_nrec.append(n)
        cum.append((n + 1) * cum[u - 1] + n)
        cum_sz.append(_b2_enc_size(cum[u]))
    return max_nrec, cum, cum_sz, mns


def _b2_plan(n: int, node_size: int, rec_size: int):
    """(depth, plan, mns, cum, cum_sz) for n records: plan is a nested
    (nrec_in_node, [child plans]) tuple distributing records evenly at
    every level — the generalization of the old depth-≤1 layout (to
    which it is byte-identical for depth 0/1)."""
    max_nrec, cum, cum_sz, mns = _b2_capacities(node_size, rec_size)
    depth = next((d for d, c in enumerate(cum) if c >= n), None)
    if depth is None:
        raise ValueError(f"{n} records exceed v2 B-tree capacity at node size {node_size}")

    def split(m: int, level: int):
        if level == 0:
            return (m, [])
        k_children = -(-(m + 1) // (cum[level - 1] + 1))
        nrec = k_children - 1
        rest = m - nrec
        base, extra = divmod(rest, k_children)
        sizes = [base + 1] * extra + [base] * (k_children - extra)
        if nrec > max_nrec[level]:
            raise ValueError(f"v2 B-tree node overflow at level {level}")
        return (nrec, [split(s, level - 1) for s in sizes])

    return depth, split(n, depth), mns, cum, cum_sz


def _b2_node_sizes(plan, level: int, rec_size: int, mns: int, cum_sz: list[int]):
    """[(path, level, byte size)] for every node, root first."""
    nrec, children = plan
    if level == 0:
        return [("", 0, 6 + nrec * rec_size + 4)]
    ptr = 8 + mns + (cum_sz[level - 1] if level - 1 >= 1 else 0)
    out = [("", level, 6 + nrec * rec_size + (nrec + 1) * ptr + 4)]
    for i, ch in enumerate(children):
        for path, lv, sz in _b2_node_sizes(ch, level - 1, rec_size, mns, cum_sz):
            out.append((f"{i}" if not path else f"{i}.{path}", lv, sz))
    return out


def _b2_totals(plan) -> int:
    nrec, children = plan
    return nrec + sum(_b2_totals(ch) for ch in children)


def _b2_emit(
    plan,
    level: int,
    records: list[bytes],
    btype: int,
    mns: int,
    cum_sz: list[int],
    node_addr,  # path -> file address
) -> list[tuple[int, bytes]]:
    """(address, bytes) for every node of the tree; records are
    consumed in order via in-order traversal (child, separator,
    child, ...)."""
    pieces: list[tuple[int, bytes]] = []
    cursor = 0

    def take() -> bytes:
        nonlocal cursor
        r = records[cursor]
        cursor += 1
        return r

    def emit(p, level: int, path: str) -> tuple[int, int]:
        """returns (own nrec, subtree total)"""
        nrec, children = p
        if level == 0:
            body = b"BTLF" + bytes([0, btype]) + b"".join(take() for _ in range(nrec))
            pieces.append((node_addr(path), body + struct.pack("<I", lookup3(body))))
            return nrec, nrec
        own: list[bytes] = []
        ptrs: list[bytes] = []
        child_cum = cum_sz[level - 1] if level - 1 >= 1 else 0
        total = nrec
        for i, ch in enumerate(children):
            cpath = f"{i}" if not path else f"{path}.{i}"
            cnrec, ctotal = emit(ch, level - 1, cpath)
            total += ctotal
            ptr = struct.pack("<Q", node_addr(cpath)) + cnrec.to_bytes(mns, "little")
            if child_cum:
                ptr += ctotal.to_bytes(child_cum, "little")
            ptrs.append(ptr)
            if i < len(children) - 1:
                own.append(take())
        body = b"BTIN" + bytes([0, btype]) + b"".join(own) + b"".join(ptrs)
        pieces.append((node_addr(path), body + struct.pack("<I", lookup3(body))))
        return nrec, total

    emit(plan, level, "")
    assert cursor == len(records), "v2 B-tree plan/record mismatch"
    return pieces


def _b2_header(btype: int, node_size: int, rec_size: int, depth: int, root_addr: int, root_nrec: int, total: int) -> bytes:
    h = b"BTHD" + bytes([0, btype])
    h += struct.pack("<IHH", node_size, rec_size, depth)
    h += bytes([100, 40])  # split % / merge %
    h += struct.pack("<QHQ", root_addr, root_nrec, total)
    return h + struct.pack("<I", lookup3(h))


def _chunk_size_len(chunk_nbytes: int) -> int:
    """Encoded width of a filtered chunk's stored-size field — H5D's
    ``1 + ((log2(chunk_size) + 8) / 8)``, capped at 8. Shared by the
    extensible-array element and v2-B-tree record encodings."""
    return min(8, 1 + ((chunk_nbytes.bit_length() - 1 + 8) // 8))


def write_hdf5(
    variables: dict[str, tuple[np.ndarray, dict[str, Any]]],
    global_attrs: dict[str, Any] | None = None,
    chunks: dict[str, tuple[int, ...]] | None = None,
    gzip: int | None = None,
    shuffle: bool = False,
    libver: str = "earliest",
    chunk_index: str | None = None,
    ea_params: tuple[int, int, int, int, int] = (32, 4, 4, 16, 10),
    bt2_node_size: int = 2048,
    dense_attrs: bool = False,
    dense_groups: bool = False,
    fa_page_bits: int = 10,
    dim_scales: dict[str, tuple[str | None, ...]] | None = None,
) -> bytes:
    """Serialize arrays to an HDF5 file.

    ``libver="earliest"`` (default): superblock v0, v1 object headers,
    symbol-table root group — the structural profile the netCDF-4
    default writer produces. ``libver="latest"``: superblock v2, v2
    ("OHDR") object headers with lookup3 checksums, compact
    link-message root group — the HDF5 1.10 "latest" profile.

    ``variables``: name -> (array, attributes). Arrays keep their
    dtype (f4/f8/int/S supported). ``chunks`` maps variable names to
    chunk shapes (unlisted vars are contiguous); ``gzip`` enables the
    deflate filter on chunked vars at that level, ``shuffle`` prepends
    the byte-shuffle filter.

    ``chunk_index``: None → version-3 layout + v1 chunk B-tree (the
    1.8 profile); ``"single"`` / ``"implicit"`` / ``"fixed_array"`` →
    version-4 layout with that HDF5 ≥1.10 chunk index (single: exactly
    one chunk; implicit: unfiltered only, chunks packed back-to-back);
    ``"extensible_array"`` → the index HDF5 uses when ONE dimension is
    unlimited (appended netCDF-4 time series) — dim 0 is declared
    unlimited in the dataspace, ``ea_params`` = (max_nelmts_bits,
    idx_blk_elmts, sup_blk_min_data_ptrs, data_blk_min_elmts,
    max_dblk_page_nelmts_bits) in the LAYOUT-message field order
    (library defaults; shrink to exercise super blocks with few
    chunks); ``"btree_v2"`` → the ≥2-unlimited-dimensions index (all
    dims declared unlimited), tree depth chosen automatically from
    record count and ``bt2_node_size``.

    ``dense_attrs`` (libver="latest" only): store every variable's
    attributes DENSELY — in a fractal heap with a v2-B-tree name index
    (record type 8) — instead of compact header messages; the storage
    real HDF5 files switch to past max_compact (default 8) attributes.
    ``dense_groups`` (libver="latest" only): store the root group's
    links densely (fractal heap + type-5 name index) instead of
    compact Link messages — the "new style" group storage.

    ``fa_page_bits``: fixed-array page size (2^bits elements, library
    default 10); more chunks than one page → a PAGED data block (page
    bitmap + per-page checksums), the layout any large fixed-shape
    chunked dataset gets. Shrink to exercise paging at fixture size.

    ``dim_scales``: variable name → per-axis scale variable name (or
    None) — emits the netCDF-4 ``DIMENSION_LIST`` attribute (vlen
    object references into a global heap collection), the structural
    coordinate attachment real netCDF-4 writers produce; the reader
    surfaces it as ``H5File.dim_scales``.
    """
    if libver not in ("earliest", "latest"):
        raise ValueError(f"libver must be 'earliest' or 'latest', got {libver!r}")
    if (dense_attrs or dense_groups) and libver != "latest":
        raise ValueError("dense attribute/group storage requires libver='latest'")
    if chunk_index not in (None, "single", "implicit", "fixed_array", "extensible_array", "btree_v2"):
        raise ValueError(f"unknown chunk_index {chunk_index!r}")
    if chunk_index == "implicit" and (gzip is not None or shuffle):
        raise ValueError("implicit chunk index requires unfiltered chunks")
    global_attrs = dict(global_attrs or {})
    global_attrs.setdefault("_NCProperties", "version=2,netcdf=vendored,hdf5=vendored")
    chunks = chunks or {}
    names = sorted(variables)

    # --- local heap: offset 0 = empty string, then each name padded to 8
    heap_data = bytearray(8)
    name_off: dict[str, int] = {}
    for nm in names:
        name_off[nm] = len(heap_data)
        heap_data += _pad8(nm.encode("utf-8") + b"\x00")
    heap_hdr_size = 32
    heap_size = heap_hdr_size + len(heap_data)

    enc = _msg if libver == "earliest" else _msg_v2
    hdr = _object_header if libver == "earliest" else _object_header_v2

    # --- per-variable messages (addresses patched in second pass)
    def var_header(nm: str, data_addr: int, btree_addr: int) -> bytes:
        arr, attrs = variables[nm]
        arr = np.ascontiguousarray(arr)
        fillv = attrs.get("_FillValue")
        if isinstance(fillv, (int, float, np.integer, np.floating)) and arr.dtype.kind in "iuf":
            fv = np.array([fillv], dtype=arr.dtype).tobytes()
            # fill v2, defined: unallocated regions must read as _FillValue
            fill_body = struct.pack("<BBBB", 2, 2, 0, 1) + struct.pack("<I", len(fv)) + fv
        else:
            # fill v2: alloc time = late(2), write time = never(2), undefined
            fill_body = struct.pack("<BBBB", 2, 2, 2, 0)
        maxshape = None
        if nm in chunks and chunk_index == "extensible_array":
            maxshape = (UNDEF,) + arr.shape[1:]  # dim 0 unlimited (appendable time)
        elif nm in chunks and chunk_index == "btree_v2":
            maxshape = (UNDEF,) * len(arr.shape)  # ≥2 unlimited dims
        msgs = [
            enc(MSG_DATASPACE, _ds_message(arr.shape, maxshape)),
            enc(MSG_DATATYPE, _dt_message(arr)),
            enc(MSG_FILL, fill_body),
        ]
        if nm in chunks:
            cs = chunks[nm]
            pipeline = []
            if shuffle:
                pipeline.append((FILTER_SHUFFLE, (arr.dtype.itemsize,)))
            if gzip is not None:
                pipeline.append((FILTER_DEFLATE, (gzip,)))
            if chunk_index is None:
                # v3: dims as u32 with trailing element size, v1 B-tree addr
                body = struct.pack("<BBB", 3, 2, len(cs) + 1) + struct.pack("<Q", btree_addr)
                body += b"".join(struct.pack("<I", c) for c in cs) + struct.pack("<I", arr.dtype.itemsize)
            else:
                # v4: flags, rank(+elem dim), encoded dim width, dims,
                # index type + index-specific fields; btree_addr holds
                # the index address (chunk-0 / implicit base / FAHD)
                flags = 0x02 if (chunk_index == "single" and pipeline) else 0
                dims = (*cs, arr.dtype.itemsize)
                body = struct.pack("<BBBBB", 4, 2, flags, len(dims), 8)
                body += b"".join(struct.pack("<Q", d) for d in dims)
                body += struct.pack(
                    "<B",
                    {"single": 1, "implicit": 2, "fixed_array": 3,
                     "extensible_array": 4, "btree_v2": 5}[chunk_index],
                )
                if chunk_index == "single":
                    if pipeline:
                        body += struct.pack("<QI", len(all_blobs[nm][0][1]), 0)
                    body += struct.pack("<Q", btree_addr)
                elif chunk_index == "implicit":
                    body += struct.pack("<Q", btree_addr)
                elif chunk_index == "fixed_array":
                    body += struct.pack("<B", fa_page_bits) + struct.pack("<Q", btree_addr)  # page bits, FAHD
                elif chunk_index == "extensible_array":
                    # layout-message param order: max bits, index elmts,
                    # MIN POINTERS, MIN ELEMENTS, page bits — note the
                    # EAHD header stores the middle two SWAPPED
                    body += bytes(ea_params) + struct.pack("<Q", btree_addr)  # EAHD addr
                else:  # btree_v2: node size, split %, merge %, BTHD addr
                    body += struct.pack("<IBB", bt2_node_size, 100, 40)
                    body += struct.pack("<Q", btree_addr)
            msgs.append(enc(MSG_LAYOUT, body))
            if pipeline:
                fbody = struct.pack("<BB6x", 1, len(pipeline))
                for fid, client in pipeline:
                    fname = {FILTER_DEFLATE: b"deflate\x00", FILTER_SHUFFLE: b"shuffle\x00"}[fid]
                    fbody += struct.pack("<HHHH", fid, len(fname), 1, len(client)) + fname
                    fbody += b"".join(struct.pack("<I", c) for c in client)
                    if len(client) % 2 == 1:
                        fbody += b"\x00\x00\x00\x00"
                msgs.append(enc(MSG_FILTER, fbody))
        else:
            msgs.append(enc(MSG_LAYOUT, struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes)))
        if nm in adense_plan:
            # dense: ONE Attribute Info message pointing at the
            # variable's fractal heap + name index, no attr messages
            msgs.append(
                enc(
                    MSG_ATTRIBUTE_INFO,
                    struct.pack(
                        "<BBQQ", 0, 0,
                        addr.get(f"afrhp:{nm}", 0), addr.get(f"abthd:{nm}", 0),
                    ),
                )
            )
        else:
            for k, v in attrs.items():
                msgs.append(enc(MSG_ATTRIBUTE, _attr_message(k, v)))
        if dim_scales and nm in dim_scales and nm not in adense_plan:
            # compact message (length is address-independent — gcol
            # address defaults to 0 during the sizing pass); in
            # dense_attrs mode the attribute rides in the dense plan
            # instead, because libhdf5 reads attributes EXCLUSIVELY
            # from dense storage once the heap address is set
            gidxs = [dl_index.get((nm, ax)) for ax in range(arr.ndim)]
            msgs.append(enc(MSG_ATTRIBUTE, _dimension_list_attr(gidxs, addr.get("gcol", 0))))
        return hdr(msgs)

    def chunk_blobs(nm: str) -> list[tuple[tuple[int, ...], bytes]]:
        arr, _ = variables[nm]
        arr = np.ascontiguousarray(arr)
        cs = chunks[nm]
        grids = [range(0, s, c) for s, c in zip(arr.shape, cs)]
        out = []
        for offs in itertools.product(*grids):
            sel = tuple(slice(o, min(o + c, s)) for o, c, s in zip(offs, cs, arr.shape))
            chunk = np.zeros(cs, dtype=arr.dtype)
            piece = arr[sel]
            chunk[tuple(slice(0, p) for p in piece.shape)] = piece
            raw = chunk.tobytes()
            if shuffle:
                raw = _shuffle_bytes(raw, arr.dtype.itemsize)
            if gzip is not None:
                raw = zlib.compress(raw, gzip)
            out.append((offs, raw))
        return out

    # --- shared per-variable pieces (headers, chunk B-trees, data)
    def data_pieces(addr: dict[str, Any]) -> list[tuple[int, bytes]]:
        pieces: list[tuple[int, bytes]] = []
        for nm in names:
            pieces.append(
                (addr[f"ohdr:{nm}"], var_header(nm, addr.get(f"data:{nm}", UNDEF), addr.get(f"cbt:{nm}", UNDEF)))
            )
            if nm in adense_plan:
                build_objs, block, recs_a, depth_a, plan_a, mns_a, cum_sz_a = adense_plan[nm]
                objs = build_objs(addr.get("gcol", 0))
                used = _FH_DBLK_HDR + sum(len(o) for o in objs)
                fh, db = addr[f"afrhp:{nm}"], addr[f"afhdb:{nm}"]
                # dense-attribute heaps declare 8-byte IDs (the type-8
                # record field width) around 7 meaningful bytes
                pieces.append((fh, _fh_header(len(objs), used, block, db, hid_len=8)))
                pieces.append((db, _fh_direct_block(fh, objs, block)))
                pieces.append(
                    (
                        addr[f"abthd:{nm}"],
                        _b2_header(8, _FH_NAME_NODE, 17, depth_a, addr[f"ab2n:{nm}:"], plan_a[0], len(recs_a)),
                    )
                )
                pieces += _b2_emit(
                    plan_a, depth_a, recs_a, 8, mns_a, cum_sz_a,
                    lambda p, _nm=nm: addr[f"ab2n:{_nm}:{p}"],
                )
            if nm in chunks:
                blobs = addr[f"blobs:{nm}"]
                if chunk_index is None:
                    cbt = b"TREE" + struct.pack("<BBH", 1, 0, len(blobs)) + struct.pack("<QQ", UNDEF, UNDEF)
                    for offs, raw, caddr in blobs:
                        cbt += struct.pack("<II", len(raw), 0)
                        cbt += b"".join(struct.pack("<Q", o) for o in offs) + struct.pack("<Q", 0)
                        cbt += struct.pack("<Q", caddr)
                    # final key (past-the-end)
                    arr = variables[nm][0]
                    cbt += struct.pack("<II", 0, 0)
                    cbt += b"".join(struct.pack("<Q", s) for s in arr.shape) + struct.pack("<Q", 0)
                    pieces.append((addr[f"cbt:{nm}"], cbt))
                elif chunk_index == "fixed_array":
                    client = 1 if (gzip is not None or shuffle) else 0
                    entry_size = 20 if client else 8
                    fahd_addr, fadb_addr = addr[f"cbt:{nm}"], addr[f"fadb:{nm}"]
                    fahd = b"FAHD" + struct.pack("<BBBB", 0, client, entry_size, fa_page_bits)
                    fahd += struct.pack("<QQ", len(blobs), fadb_addr)
                    fahd += struct.pack("<I", lookup3(fahd))
                    pieces.append((fahd_addr, fahd))

                    def fa_entry(b) -> bytes:
                        _offs, raw, caddr = b
                        e = struct.pack("<Q", caddr)
                        if client:
                            e += struct.pack("<QI", len(raw), 0)
                        return e

                    pg_n = 1 << fa_page_bits
                    fadb = b"FADB" + struct.pack("<BB", 0, client) + struct.pack("<Q", fahd_addr)
                    if len(blobs) > pg_n:
                        # paged: bitmap (every page initialized — emitted as
                        # all-ones bytes, which reads as "all initialized"
                        # under any bit-order interpretation; libhdf5's
                        # H5VM bit macros are MSB-first and never consult
                        # bits past the page count) + header checksum,
                        # then pages each with its own checksum
                        npages = -(-len(blobs) // pg_n)
                        fadb += b"\xff" * ((npages + 7) // 8)
                        fadb += struct.pack("<I", lookup3(fadb))
                        for pg in range(npages):
                            page = b"".join(fa_entry(b) for b in blobs[pg * pg_n : (pg + 1) * pg_n])
                            fadb += page + struct.pack("<I", lookup3(page))
                    else:
                        for b in blobs:
                            fadb += fa_entry(b)
                        fadb += struct.pack("<I", lookup3(fadb))
                    pieces.append((fadb_addr, fadb))
                elif chunk_index == "extensible_array":
                    (client, elmt_size, size_len, arr_off, sblk_info,
                     ib_nsblks, ib_ndblk, ib_nsblk, dblks) = addr[f"eaplan:{nm}"]
                    max_bits, idx_elmts, min_ptrs, min_elmts, page_bits = ea_params
                    n = len(blobs)

                    def enc_elmt(i: int) -> bytes:
                        if i >= n:
                            return struct.pack("<Q", UNDEF) + b"\x00" * (elmt_size - 8)
                        _offs, raw, caddr = blobs[i]
                        if client:
                            return (struct.pack("<Q", caddr)
                                    + len(raw).to_bytes(size_len, "little")
                                    + struct.pack("<I", 0))
                        return struct.pack("<Q", caddr)

                    eahd_addr, ib_addr = addr[f"eahd:{nm}"], addr[f"eaib:{nm}"]
                    used_sblks = sorted({u for u, _, _ in dblks if u >= ib_nsblks})
                    _pg = 1 << page_bits
                    ndata_bytes = sum(
                        6 + 8 + arr_off + 4 + (ne // _pg) * (_pg * elmt_size + 4)
                        if ne > _pg
                        else 6 + 8 + arr_off + ne * elmt_size + 4
                        for _, ne, _ in dblks
                    )
                    nsblk_bytes = sum(
                        6
                        + 8
                        + arr_off
                        + (
                            sblk_info[u][0] * ((sblk_info[u][1] // _pg + 7) // 8)
                            if sblk_info[u][1] > _pg
                            else 0
                        )
                        + 8 * sblk_info[u][0]
                        + 4
                        for u in used_sblks
                    )
                    # EAHD config order: idx elmts, MIN ELEMENTS, MIN
                    # POINTERS, page bits — middle two swapped vs the
                    # layout message (H5EAhdr vs H5Dlayout field order)
                    hdrb = b"EAHD" + bytes(
                        [0, client, elmt_size, max_bits, idx_elmts, min_elmts, min_ptrs, page_bits]
                    )
                    hdrb += struct.pack(
                        "<6Q", len(used_sblks), nsblk_bytes, len(dblks), ndata_bytes, n, n
                    )
                    hdrb += struct.pack("<Q", ib_addr)
                    hdrb += struct.pack("<I", lookup3(hdrb))
                    pieces.append((eahd_addr, hdrb))

                    ib = b"EAIB" + bytes([0, client]) + struct.pack("<Q", eahd_addr)
                    for i in range(idx_elmts):
                        ib += enc_elmt(i)
                    direct = [addr[f"eadb:{nm}:{i}"] for i, (u, _, _) in enumerate(dblks) if u < ib_nsblks]
                    ib += b"".join(struct.pack("<Q", a) for a in direct)
                    ib += struct.pack("<Q", UNDEF) * (ib_ndblk - len(direct))
                    sblk_addr_map = {u: addr[f"easb:{nm}:{u}"] for u in used_sblks}
                    for s in range(ib_nsblk):
                        ib += struct.pack("<Q", sblk_addr_map.get(ib_nsblks + s, UNDEF))
                    ib += struct.pack("<I", lookup3(ib))
                    pieces.append((ib_addr, ib))

                    ea_page = 1 << page_bits
                    for i, (u, nelmts_u, eoff) in enumerate(dblks):
                        db = b"EADB" + bytes([0, client]) + struct.pack("<Q", eahd_addr)
                        db += eoff.to_bytes(arr_off, "little")
                        if nelmts_u > ea_page:
                            # paged: prefix carries its own checksum; pages
                            # (elements + page checksum) follow back-to-back
                            db += struct.pack("<I", lookup3(db))
                            for pg in range(nelmts_u // ea_page):
                                page = b"".join(
                                    enc_elmt(eoff + pg * ea_page + k) for k in range(ea_page)
                                )
                                db += page + struct.pack("<I", lookup3(page))
                        else:
                            for k in range(nelmts_u):
                                db += enc_elmt(eoff + k)
                            db += struct.pack("<I", lookup3(db))
                        pieces.append((addr[f"eadb:{nm}:{i}"], db))

                    for u in used_sblks:
                        ndblks_u, nelmts_u, start_u, _sd = sblk_info[u]
                        sbb = b"EASB" + bytes([0, client]) + struct.pack("<Q", eahd_addr)
                        sbb += (idx_elmts + start_u).to_bytes(arr_off, "little")
                        if nelmts_u > ea_page:
                            # page-init bitmap for every child data block's
                            # pages — all pages initialized, emitted as
                            # all-ones bytes so any bit-order interpretation
                            # reads "initialized" (libhdf5's H5VM macros are
                            # MSB-first; bits past the page count are never
                            # consulted)
                            sbb += b"\xff" * (ndblks_u * ((nelmts_u // ea_page + 7) // 8))
                        addrs_u = [addr[f"eadb:{nm}:{i}"] for i, (du, _, _) in enumerate(dblks) if du == u]
                        sbb += b"".join(struct.pack("<Q", a) for a in addrs_u)
                        sbb += struct.pack("<Q", UNDEF) * (ndblks_u - len(addrs_u))
                        sbb += struct.pack("<I", lookup3(sbb))
                        pieces.append((sblk_addr_map[u], sbb))
                elif chunk_index == "btree_v2":
                    client, size_len, rec_size, depth, plan, mns, cum_sz = addr[f"bt2plan:{nm}"]
                    cs = chunks[nm]
                    btype = 11 if client else 10

                    def enc_rec(offs, raw, caddr) -> bytes:
                        rb = struct.pack("<Q", caddr)
                        if client:
                            rb += len(raw).to_bytes(size_len, "little") + struct.pack("<I", 0)
                        # 'scaled' offsets = chunk-grid coordinates
                        rb += b"".join(struct.pack("<Q", o // c) for o, c in zip(offs, cs))
                        return rb

                    records = [enc_rec(offs, raw, caddr) for offs, raw, caddr in blobs]
                    pieces.append(
                        (
                            addr[f"bthd:{nm}"],
                            _b2_header(
                                btype, bt2_node_size, rec_size, depth,
                                addr[f"bt2n:{nm}:"], plan[0], len(blobs),
                            ),
                        )
                    )
                    pieces += _b2_emit(
                        plan, depth, records, btype, mns, cum_sz,
                        lambda p, _nm=nm: addr[f"bt2n:{_nm}:{p}"],
                    )
                # "single"/"implicit": the layout message itself is the index
                for offs, raw, caddr in blobs:
                    pieces.append((caddr, raw))
            else:
                arr = np.ascontiguousarray(variables[nm][0])
                pieces.append((addr[f"data:{nm}"], arr.tobytes()))
        if dl_entries:
            # global heap collection: one 8-byte header address per
            # attached (variable, axis), then the index-0 free-space
            # object covering the remainder of the collection
            body = bytearray(b"GCOL" + bytes([1, 0, 0, 0]) + struct.pack("<Q", gcol_size))
            for sn, gidx in dl_entries:
                body += struct.pack("<HH4xQ", gidx, 1, 8) + struct.pack("<Q", addr[f"ohdr:{sn}"])
            body += struct.pack("<HH4xQ", 0, 0, gcol_size - len(body))
            body += bytes(gcol_size - len(body))
            pieces.append((addr["gcol"], bytes(body)))
        return pieces

    def assemble(sb: bytes, pieces: list[tuple[int, bytes]], patch_eof_at: int) -> bytes:
        total = max([len(sb)] + [a + len(b) for a, b in pieces])
        out = bytearray(total)
        out[0 : len(sb)] = sb
        struct.pack_into("<Q", out, patch_eof_at, total)
        for a, b in pieces:
            out[a : a + len(b)] = b
        return bytes(out)

    # --- two-pass layout: sizes are address-independent
    def build(addr: dict[str, Any]) -> bytes:
        root_msgs = [
            _msg(MSG_SYMBOL_TABLE, struct.pack("<QQ", addr["btree"], addr["heap"]))
        ] + [_msg(MSG_ATTRIBUTE, _attr_message(k, v)) for k, v in global_attrs.items()]
        pieces: list[tuple[int, bytes]] = [(addr["root"], _object_header(root_msgs))]

        # group B-tree: one leaf entry → the single SNOD
        bt = b"TREE" + struct.pack("<BBH", 0, 0, 1)
        bt += struct.pack("<QQ", UNDEF, UNDEF)
        last_off = name_off[names[-1]] if names else 0
        bt += struct.pack("<QQQ", 0, addr["snod"], last_off)
        pieces.append((addr["btree"], bt))

        heap = b"HEAP" + struct.pack("<B3x", 0) + struct.pack("<QQQ", len(heap_data), 1, addr["heap_data"])
        pieces.append((addr["heap"], heap))
        pieces.append((addr["heap_data"], bytes(heap_data)))

        snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
        for nm in names:
            snod += struct.pack("<QQI4x16x", name_off[nm], addr[f"ohdr:{nm}"], 0)
        pieces.append((addr["snod"], snod))
        pieces += data_pieces(addr)

        # superblock v1: like v0 plus the indexed-storage (chunk
        # B-tree) K field — we emit single flat B-tree nodes, so the
        # declared K values must cover the actual entry counts for
        # external HDF5 readers (which size nodes from K): group leaf
        # K=1024 → ≤2048 symbols/SNOD, indexed K=8192 → ≤16384 chunk
        # entries per leaf (guarded at write time)
        sb = bytearray(100)
        sb[0:8] = HDF5_MAGIC
        sb[8:16] = struct.pack("<8B", 1, 0, 0, 0, 0, 8, 8, 0)
        sb[16:20] = struct.pack("<HH", GROUP_LEAF_K, 16)  # group leaf/internal K
        sb[20:24] = struct.pack("<I", 0)  # consistency flags
        sb[24:28] = struct.pack("<HH", INDEXED_K, 0)  # indexed-storage K + reserved
        sb[28:60] = struct.pack("<QQQQ", 0, UNDEF, 0, UNDEF)  # EOF patched in assemble
        # root symbol table entry
        sb[60:100] = struct.pack("<QQI4xQQ", 0, addr["root"], 1, addr["btree"], addr["heap"])
        return assemble(bytes(sb), pieces, patch_eof_at=44)

    def root_header_latest(addr: dict[str, Any]) -> bytes:
        if gdense_plan is not None:
            # dense group: Link Info points at the fractal heap + name
            # index; links live there, not as header messages
            msgs = [
                _msg_v2(
                    MSG_LINK_INFO,
                    struct.pack("<BBQQ", 0, 0, addr.get("gfrhp", 0), addr.get("gbthd", 0)),
                ),
                _msg_v2(MSG_GROUP_INFO, struct.pack("<BB", 0, 0)),
            ]
        else:
            # link info: no creation-order tracking, compact (fractal
            # heap + name index both undefined); group info: defaults
            msgs = [
                _msg_v2(MSG_LINK_INFO, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)),
                _msg_v2(MSG_GROUP_INFO, struct.pack("<BB", 0, 0)),
            ]
            msgs += [_msg_v2(MSG_LINK, _link_msg(nm, addr.get(f"ohdr:{nm}", 0))) for nm in names]
        msgs += [_msg_v2(MSG_ATTRIBUTE, _attr_message(k, v)) for k, v in global_attrs.items()]
        return _object_header_v2(msgs)

    def build_latest(addr: dict[str, Any]) -> bytes:
        pieces = [(addr["root"], root_header_latest(addr))] + data_pieces(addr)
        if gdense_plan is not None:
            _gids, gblock, grecs, gdepth, gplan, gmns, gcum_sz = gdense_plan
            gobjs = [_link_msg(nm, addr[f"ohdr:{nm}"]) for nm in names]
            used = _FH_DBLK_HDR + sum(len(o) for o in gobjs)
            pieces.append(
                (addr["gfrhp"], _fh_header(len(gobjs), used, gblock, addr["gfhdb"], hid_len=_FH_ID_LEN))
            )
            pieces.append((addr["gfhdb"], _fh_direct_block(addr["gfrhp"], gobjs, gblock)))
            pieces.append(
                (
                    addr["gbthd"],
                    _b2_header(5, _FH_NAME_NODE, 4 + _FH_ID_LEN, gdepth, addr["gb2n:"], gplan[0], len(grecs)),
                )
            )
            pieces += _b2_emit(gplan, gdepth, grecs, 5, gmns, gcum_sz, lambda p: addr[f"gb2n:{p}"])
        # superblock v2: sig, ver, offset/length sizes, flags, base,
        # extension, EOF (patched), root header addr, lookup3 checksum
        sb = HDF5_MAGIC + struct.pack("<BBBB", 2, 8, 8, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, 0, addr["root"])
        sb += struct.pack("<I", lookup3(sb))
        out = assemble(sb, pieces, patch_eof_at=28)
        # re-checksum with the patched EOF field
        fixed = bytearray(out)
        struct.pack_into("<I", fixed, 44, lookup3(bytes(fixed[:44])))
        return bytes(fixed)

    # materialize (possibly filtered) chunk payloads once; their sizes
    # fix the layout
    all_blobs: dict[str, list[tuple[tuple[int, ...], bytes]]] = {
        nm: chunk_blobs(nm) for nm in names if nm in chunks
    }

    # message sizes are address-independent (addresses are fixed-width
    # fields), so one sizing pass with dummy addresses fixes the layout
    # and a second pass writes the real bytes
    if libver == "earliest" and len(names) > 2 * GROUP_LEAF_K:
        raise ValueError(f"{len(names)} variables exceed the declared SNOD capacity (2·K={2 * GROUP_LEAF_K})")
    if chunk_index is None:
        # v2 superblocks carry no indexed-storage K field, so external
        # readers assume the library default (K=32 → 64 entries/leaf)
        leaf_cap = 2 * INDEXED_K if libver == "earliest" else 64
        for nm in names:
            if nm in chunks and nm in all_blobs and len(all_blobs[nm]) > leaf_cap:
                raise ValueError(
                    f"{len(all_blobs[nm])} chunks for {nm!r} exceed one v1 B-tree leaf "
                    f"(cap {leaf_cap}); use larger chunks or chunk_index='fixed_array'"
                )

    # --- DIMENSION_LIST planning: one global-heap object (an 8-byte
    # header address) per attached (variable, axis); indexes assigned
    # up front so attribute bytes are address-independent. Planned
    # BEFORE dense attributes so the attribute can ride in the dense
    # plan when dense_attrs is on.
    dl_entries: list[tuple[str, int]] = []  # (scale var name, heap index), heap order
    dl_index: dict[tuple[str, int], int] = {}  # (var, axis) -> heap index
    gcol_size = 0
    if dim_scales:
        for nm in sorted(dim_scales):
            if nm not in variables:
                raise ValueError(f"dim_scales names unknown variable {nm!r}")
            if "DIMENSION_LIST" in variables[nm][1]:
                # the generated attribute would collide with the user's
                # — two same-named attributes make the dense name index
                # ambiguous and one value is silently lost on read
                raise ValueError(
                    f"variable {nm!r} carries a user attribute named DIMENSION_LIST "
                    "while dim_scales also attaches one; drop the user attribute"
                )
            scales_t = dim_scales[nm]
            rank = np.asarray(variables[nm][0]).ndim
            if len(scales_t) != rank:
                raise ValueError(
                    f"dim_scales[{nm!r}] has {len(scales_t)} axes, variable has {rank}"
                )
            for ax, sn in enumerate(scales_t):
                if sn is None:
                    continue
                if sn not in variables:
                    raise ValueError(f"dim_scales[{nm!r}] axis {ax} names unknown variable {sn!r}")
                gidx = len(dl_entries) + 1
                dl_entries.append((sn, gidx))
                dl_index[(nm, ax)] = gidx
        # libhdf5 sizes global heap collections at ≥4096 bytes; honor
        # that so external readers' buffer math holds
        gcol_size = max(4096, 16 + 24 * len(dl_entries) + 16)

    def _dl_gidxs(nm: str) -> list[int | None]:
        return [dl_index.get((nm, ax)) for ax in range(np.asarray(variables[nm][0]).ndim)]

    # --- dense-storage planning (all sizes are address-independent) -----
    # per-variable dense attributes: heap objects are the encoded
    # Attribute messages; B-tree records are type 8 (8-byte heap ID +
    # message flags + creation order + lookup3 name hash), sorted by
    # (hash, name) — the name-index comparator. libhdf5 reads attrs
    # EXCLUSIVELY from dense storage once the attribute-info heap
    # address is set, so DIMENSION_LIST must live in the heap too —
    # its bytes depend on the global-heap address, hence heap objects
    # are a FUNCTION of that address (sizes are address-independent,
    # so layout/ids/records are planned once with address 0)
    adense_plan: dict[str, tuple] = {}
    if dense_attrs:
        for nm in names:
            a_attrs = variables[nm][1]
            has_dl = bool(dim_scales) and nm in dim_scales
            if not a_attrs and not has_dl:
                continue
            keys = list(a_attrs) + (["DIMENSION_LIST"] if has_dl else [])

            def build_objs(gcol_addr: int, _attrs=a_attrs, _nm=nm, _dl=has_dl) -> list[bytes]:
                out = [_attr_message(k, v) for k, v in _attrs.items()]
                if _dl:
                    out.append(_dimension_list_attr(_dl_gidxs(_nm), gcol_addr))
                return out

            objs = build_objs(0)
            _offs, ids, block = _fh_layout([len(o) for o in objs])
            hs = [lookup3(k.encode("utf-8")) for k in keys]
            order = sorted(range(len(keys)), key=lambda i: (hs[i], keys[i]))
            recs = [
                ids[i] + b"\x00" + b"\x00" + struct.pack("<II", i, hs[i])
                for i in order
            ]
            depth_a, plan_a, mns_a, _c, cum_sz_a = _b2_plan(len(recs), _FH_NAME_NODE, 17)
            adense_plan[nm] = (build_objs, block, recs, depth_a, plan_a, mns_a, cum_sz_a)

    # dense root group: heap objects are the Link message bodies
    # (fixed-size: addresses are 8-byte fields); records are type 5
    # (hash + heap ID)
    gdense_plan: tuple | None = None
    if dense_groups and names:
        _goffs, gids, gblock = _fh_layout([len(_link_msg(nm, 0)) for nm in names])
        ghs = [lookup3(nm.encode("utf-8")) for nm in names]
        gorder = sorted(range(len(names)), key=lambda i: (ghs[i], names[i]))
        grecs = [struct.pack("<I", ghs[i]) + gids[i] for i in gorder]
        gdepth, gplan, gmns, _gc, gcum_sz = _b2_plan(len(grecs), _FH_NAME_NODE, 4 + _FH_ID_LEN)
        gdense_plan = (gids, gblock, grecs, gdepth, gplan, gmns, gcum_sz)

    addr: dict[str, Any] = {}
    # v1 superblock is 100 bytes; start allocation at the next 8-byte
    # boundary so object headers (and their messages) stay 8-aligned
    cursor = 48 if libver == "latest" else 104

    def alloc(key: str, size: int) -> int:
        nonlocal cursor
        a = cursor
        addr[key] = a
        cursor += (size + 7) & ~7
        return a

    if libver == "latest":
        alloc("root", len(root_header_latest({f"ohdr:{nm}": 0 for nm in names})))
        if gdense_plan is not None:
            _gids, gblock, grecs, gdepth, gplan, gmns, gcum_sz = gdense_plan
            alloc("gfrhp", 146)
            alloc("gfhdb", gblock)
            alloc("gbthd", 38)
            for path, _lv, sz in _b2_node_sizes(gplan, gdepth, 4 + _FH_ID_LEN, gmns, gcum_sz):
                alloc(f"gb2n:{path}", sz)
    else:
        root_hdr_size = len(
            _object_header(
                [_msg(MSG_SYMBOL_TABLE, struct.pack("<QQ", 0, 0))]
                + [_msg(MSG_ATTRIBUTE, _attr_message(k, v)) for k, v in global_attrs.items()]
            )
        )
        alloc("root", root_hdr_size)
        alloc("btree", 24 + 24)
        alloc("heap", heap_hdr_size)
        alloc("heap_data", len(heap_data))
        alloc("snod", 8 + 40 * len(names))
    for nm in names:
        hdr_bytes = var_header(nm, 0, 0)
        alloc(f"ohdr:{nm}", len(hdr_bytes))
        if nm in adense_plan:
            _objs, block, recs_a, depth_a, plan_a, mns_a, cum_sz_a = adense_plan[nm]
            alloc(f"afrhp:{nm}", 146)
            alloc(f"afhdb:{nm}", block)
            alloc(f"abthd:{nm}", 38)
            for path, _lv, sz in _b2_node_sizes(plan_a, depth_a, 17, mns_a, cum_sz_a):
                alloc(f"ab2n:{nm}:{path}", sz)
        if nm in chunks:
            blobs_src = all_blobs[nm]
            if chunk_index is None:
                ndim = len(variables[nm][0].shape)
                key_size = 8 + 8 * (ndim + 1)
                alloc(f"cbt:{nm}", 24 + len(blobs_src) * (key_size + 8) + key_size)
                placed = []
                for offs, raw in blobs_src:
                    caddr = alloc(f"chunk:{nm}:{offs}", len(raw))
                    placed.append((offs, raw, caddr))
            elif chunk_index == "single":
                if len(blobs_src) != 1:
                    raise ValueError(
                        f"single-chunk index needs exactly one chunk for {nm!r}, got {len(blobs_src)}"
                    )
                offs, raw = blobs_src[0]
                caddr = alloc(f"chunk:{nm}:{offs}", len(raw))
                addr[f"cbt:{nm}"] = caddr  # index address = the chunk itself
                placed = [(offs, raw, caddr)]
            elif chunk_index == "implicit":
                # unfiltered chunks packed back-to-back: address arithmetic
                # (base + i·chunk_nbytes) IS the index, so no padding allowed
                chunk_nbytes = len(blobs_src[0][1])
                base = alloc(f"impl:{nm}", chunk_nbytes * len(blobs_src))
                addr[f"cbt:{nm}"] = base
                placed = [(offs, raw, base + i * chunk_nbytes) for i, (offs, raw) in enumerate(blobs_src)]
            elif chunk_index == "fixed_array":
                placed = []
                for offs, raw in blobs_src:
                    caddr = alloc(f"chunk:{nm}:{offs}", len(raw))
                    placed.append((offs, raw, caddr))
                entry_size = 20 if (gzip is not None or shuffle) else 8
                alloc(f"fahd:{nm}", 28)
                addr[f"cbt:{nm}"] = addr[f"fahd:{nm}"]
                pg_n = 1 << fa_page_bits
                if len(placed) > pg_n:  # paged: bitmap + hdr checksum + per-page checksums
                    npages = -(-len(placed) // pg_n)
                    alloc(
                        f"fadb:{nm}",
                        6 + 8 + (npages + 7) // 8 + 4 + len(placed) * entry_size + 4 * npages,
                    )
                else:
                    alloc(f"fadb:{nm}", 6 + 8 + len(placed) * entry_size + 4)
            elif chunk_index == "extensible_array":
                placed = []
                for offs, raw in blobs_src:
                    caddr = alloc(f"chunk:{nm}:{offs}", len(raw))
                    placed.append((offs, raw, caddr))
                arr0 = variables[nm][0]
                cs = chunks[nm]
                chunk_nbytes = int(np.prod(cs)) * arr0.dtype.itemsize
                client = 1 if (gzip is not None or shuffle) else 0
                size_len = _chunk_size_len(chunk_nbytes) if client else 0
                elmt_size = 8 + size_len + 4 if client else 8
                max_bits, idx_elmts, min_ptrs, min_elmts, page_bits = ea_params
                sblk_info = _ea_sblk_info(max_bits, min_elmts)
                ib_nsblks = 2 * (min_ptrs.bit_length() - 1)
                ib_ndblk = 2 * (min_ptrs - 1)
                ib_nsblk = len(sblk_info) - ib_nsblks
                arr_off = (max_bits + 7) // 8
                n = len(placed)
                # data blocks needed to cover elements past the index
                # block's inline slots: (sblk u, nelmts, absolute
                # array index of first element)
                needed = max(0, n - idx_elmts)
                dblks: list[tuple[int, int, int]] = []
                cov = 0
                ea_page = 1 << page_bits
                for u, (ndblks_u, nelmts_u, start_u, _sd) in enumerate(sblk_info):
                    if cov >= needed:
                        break
                    if nelmts_u > ea_page and u < ib_nsblks:
                        raise ValueError(
                            f"{n} chunks for {nm!r} would page an index-block-direct "
                            "extensible-array data block (no on-disk page bitmap "
                            "exists there); raise page_bits or min_ptrs"
                        )
                    for j in range(ndblks_u):
                        if cov >= needed:
                            break
                        dblks.append((u, nelmts_u, idx_elmts + start_u + j * nelmts_u))
                        cov += nelmts_u
                if cov < needed:
                    raise ValueError(f"{n} chunks exceed extensible-array capacity for max_bits={max_bits}")
                alloc(f"eahd:{nm}", 72)
                addr[f"cbt:{nm}"] = addr[f"eahd:{nm}"]
                alloc(f"eaib:{nm}", 6 + 8 + idx_elmts * elmt_size + 8 * (ib_ndblk + ib_nsblk) + 4)
                for i, (u, nelmts_u, _eoff) in enumerate(dblks):
                    if nelmts_u > ea_page:
                        # paged: prefix + its checksum, then per-page
                        # (elements + checksum) laid back-to-back
                        npg = nelmts_u // ea_page
                        alloc(
                            f"eadb:{nm}:{i}",
                            6 + 8 + arr_off + 4 + npg * (ea_page * elmt_size + 4),
                        )
                    else:
                        alloc(f"eadb:{nm}:{i}", 6 + 8 + arr_off + nelmts_u * elmt_size + 4)
                for u in sorted({u for u, _, _ in dblks if u >= ib_nsblks}):
                    ndblks_u, nelmts_u = sblk_info[u][0], sblk_info[u][1]
                    bm_bytes = (
                        ndblks_u * ((nelmts_u // ea_page + 7) // 8) if nelmts_u > ea_page else 0
                    )
                    alloc(f"easb:{nm}:{u}", 6 + 8 + arr_off + bm_bytes + 8 * ndblks_u + 4)
                addr[f"eaplan:{nm}"] = (
                    client, elmt_size, size_len, arr_off, sblk_info, ib_nsblks, ib_ndblk, ib_nsblk, dblks
                )
            else:  # btree_v2
                placed = []
                for offs, raw in blobs_src:
                    caddr = alloc(f"chunk:{nm}:{offs}", len(raw))
                    placed.append((offs, raw, caddr))
                arr0 = variables[nm][0]
                cs = chunks[nm]
                rank = len(arr0.shape)
                chunk_nbytes = int(np.prod(cs)) * arr0.dtype.itemsize
                client = 1 if (gzip is not None or shuffle) else 0
                size_len = _chunk_size_len(chunk_nbytes) if client else 0
                rec_size = 8 + (size_len + 4 if client else 0) + 8 * rank
                depth, plan, mns, _cum, cum_sz = _b2_plan(len(placed), bt2_node_size, rec_size)
                alloc(f"bthd:{nm}", 38)
                addr[f"cbt:{nm}"] = addr[f"bthd:{nm}"]
                for path, _lv, sz in _b2_node_sizes(plan, depth, rec_size, mns, cum_sz):
                    alloc(f"bt2n:{nm}:{path}", sz)
                addr[f"bt2plan:{nm}"] = (client, size_len, rec_size, depth, plan, mns, cum_sz)
            addr[f"blobs:{nm}"] = placed
        else:
            alloc(f"data:{nm}", variables[nm][0].nbytes)
    if dl_entries:
        alloc("gcol", gcol_size)

    return build_latest(addr) if libver == "latest" else build(addr)
