"""Vendored NetCDF-3 "classic format" reader/writer (pure numpy).

The reference's core input is real ``.nc`` files (Gddp.scala:53-56
opens them with ucar.nc2; geopy.py:18-19 with netCDF4). That library
is not installed in this container, and the classic format is a small,
fully-public binary layout — so this module implements it directly
from the published spec (the "NetCDF Classic Format Specification",
magic ``CDF\\x01`` / 64-bit-offset ``CDF\\x02``):

    file    = header, data
    header  = magic, numrecs, dim_list, gatt_list, var_list
    dim     = name, length            (length 0 -> record dimension)
    attr    = name, nc_type, nelems, values (padded to 4)
    var     = name, ndims, dimids, vatt_list, nc_type, vsize, begin
    data    = fixed-size vars at their begin offsets, then record
              slabs interleaved per record (record r of var v lives at
              v.begin + r * recsize)

All integers are big-endian; names and values pad to 4-byte
boundaries; ``begin`` is 4 bytes in CDF-1 and 8 bytes in CDF-2/5.
Types: BYTE(1) CHAR(2) SHORT(3) INT(4) FLOAT(5) DOUBLE(6).

CDF-5 (``CDF\\x05``, the 64-bit-data variant from the same published
spec) is also supported, read and write: every NON_NEG field —
numrecs, list counts, name lengths, dimension lengths, attribute
nelems, ndims, vsize — widens to 8 bytes (dimension IDs stay 4-byte
INTs), and the unsigned/64-bit atomic types UBYTE(7) USHORT(8)
UINT(9) INT64(10) UINT64(11) become available.

Scale note: one ``.nc`` file decodes inside one executor task
(sources/netcdf.py ``ingest_directory``); this module only ever sees
one file's bytes at a time, so its memory footprint is the file size —
the distribution story lives a layer up.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field
from typing import Any

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
# CDF-5 additions
NC_UBYTE, NC_USHORT, NC_UINT, NC_INT64, NC_UINT64 = 7, 8, 9, 10, 11
_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C
_STREAMING = 0xFFFFFFFF
_STREAMING64 = 0xFFFFFFFFFFFFFFFF

# big-endian numpy dtypes per nc_type
_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
    NC_UBYTE: np.dtype(">u1"),
    NC_USHORT: np.dtype(">u2"),
    NC_UINT: np.dtype(">u4"),
    NC_INT64: np.dtype(">i8"),
    NC_UINT64: np.dtype(">u8"),
}
_SIZES = {t: dt.itemsize for t, dt in _DTYPES.items()}
_CDF5_ONLY = {NC_UBYTE, NC_USHORT, NC_UINT, NC_INT64, NC_UINT64}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


@dataclass
class Nc3Var:
    name: str
    dimensions: tuple[str, ...]
    shape: tuple[int, ...]
    attributes: dict[str, Any]
    nc_type: int
    data: np.ndarray

    def __getitem__(self, key):
        return self.data[key]


@dataclass
class Nc3File:
    dimensions: dict[str, int | None] = field(default_factory=dict)  # None = record dim
    attributes: dict[str, Any] = field(default_factory=dict)
    variables: dict[str, Nc3Var] = field(default_factory=dict)


class _Cursor:
    def __init__(self, buf: bytes, version: int = 1):
        self.buf = buf
        self.pos = 0
        self.version = version

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def nn(self) -> int:
        """NON_NEG: 4 bytes in CDF-1/2, 8 bytes in CDF-5."""
        return self.u64() if self.version == 5 else self.u32()

    def name(self) -> str:
        n = self.nn()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += _pad4(n)
        return s

    def values(self, nc_type: int, nelems: int) -> Any:
        nbytes = _SIZES[nc_type] * nelems
        raw = self.buf[self.pos : self.pos + nbytes]
        self.pos += _pad4(nbytes)
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=_DTYPES[nc_type])
        if nelems == 1:
            return arr[0].item()
        return arr.copy()

    def att_list(self) -> dict[str, Any]:
        tag = self.u32()
        n = self.nn()
        if not (tag in (_TAG_ATT, 0) and (tag != 0 or n == 0)):
            raise ValueError(f"bad att_list tag {tag:#x}")
        out: dict[str, Any] = {}
        for _ in range(n):
            nm = self.name()
            t = self.u32()
            ne = self.nn()
            out[nm] = self.values(t, ne)
        return out


def read_netcdf3(content: bytes, variables: list[str] | None = None) -> Nc3File:
    """Parse a classic-format (CDF-1/CDF-2/CDF-5) NetCDF file from bytes.

    ``variables``: optional allowlist of 3-D measure variables
    (projection pushdown — skips materializing unlisted cubes; the
    record-variable path copies slabs, so the skip is real work
    saved). Non-3-D variables (coordinates) always load."""
    if content[:3] != b"CDF":
        raise ValueError("not a classic NetCDF file (missing CDF magic)")
    version = content[3]
    if version not in (1, 2, 5):
        raise ValueError(f"unsupported NetCDF classic version byte {version}")
    big_begin = version in (2, 5)

    c = _Cursor(content, version)
    c.pos = 4
    numrecs = c.nn()

    # dimensions
    tag, n = c.u32(), c.nn()
    if not (tag in (_TAG_DIM, 0) and (tag != 0 or n == 0)):
        raise ValueError(f"bad dim_list tag {tag:#x}")
    dim_names: list[str] = []
    dim_sizes: list[int | None] = []
    rec_dim = -1
    for i in range(n):
        nm = c.name()
        sz = c.nn()
        dim_names.append(nm)
        if sz == 0:
            rec_dim = i
            dim_sizes.append(None)
        else:
            dim_sizes.append(sz)

    out = Nc3File(dimensions=dict(zip(dim_names, dim_sizes)), attributes=c.att_list())

    # variable metadata
    tag, nvars = c.u32(), c.nn()
    if not (tag in (_TAG_VAR, 0) and (tag != 0 or nvars == 0)):
        raise ValueError(f"bad var_list tag {tag:#x}")
    metas = []
    for _ in range(nvars):
        nm = c.name()
        ndims = c.nn()
        dimids = [c.u32() for _ in range(ndims)]  # dimids stay 4-byte INTs in CDF-5
        attrs = c.att_list()
        nc_type = c.u32()
        vsize = c.nn()
        begin = c.u64() if big_begin else c.u32()
        metas.append((nm, dimids, attrs, nc_type, vsize, begin))

    rec_vars = [m for m in metas if m[1] and m[1][0] == rec_dim]
    # per-record slab stride: sum of padded vsizes; spec special case —
    # a SINGLE record variable of byte/char/short packs with no padding
    if len(rec_vars) == 1 and _SIZES[rec_vars[0][3]] < 4:
        nm, dimids, _a, t, _v, _b = rec_vars[0]
        per_rec = _SIZES[t]
        for d in dimids[1:]:
            per_rec *= dim_sizes[d]  # type: ignore[operator]
        recsize = per_rec
    else:
        recsize = sum(m[4] for m in rec_vars)

    streaming = numrecs == (_STREAMING64 if version == 5 else _STREAMING)
    if rec_vars:
        # one shared record base/capacity: the streaming sentinel means
        # "records run to EOF" (numrecs = avail), and a concrete numrecs
        # must fit the record section — a corrupt count (including
        # zeroed vsizes → recsize 0, which makes the slab loop's offset
        # stride 0) must raise, not hang the executor
        first = min(m[5] for m in rec_vars)
        avail = max(0, len(content) - first) // recsize if recsize else 0
        if streaming:
            numrecs = avail
        elif numrecs > avail:
            # r7 advice: tolerate a FINAL record whose trailing
            # alignment padding was truncated (all data bytes present
            # — scipy and other readers accept these). Required bytes
            # = full records 0..numrecs-2 plus the last record up to
            # the end of its last variable's DATA (no padding): for
            # each record var, its in-record offset + unpadded bytes.
            unpadded_last = max(
                (m[5] - first)
                + _SIZES[m[3]] * math.prod(dim_sizes[d] for d in m[1][1:])
                for m in rec_vars
            )
            need = first + (numrecs - 1) * recsize + unpadded_last
            if numrecs != avail + 1 or len(content) < need:
                raise ValueError(
                    f"numrecs {numrecs} exceeds the {avail} records the file can hold"
                )
    elif streaming:
        numrecs = 0

    for nm, dimids, attrs, nc_type, vsize, begin in metas:
        if variables is not None and len(dimids) == 3 and nm not in variables:
            continue  # pushdown: slabs never copied
        dims = tuple(dim_names[d] for d in dimids)
        is_rec = bool(dimids) and dimids[0] == rec_dim
        fixed_shape = tuple(dim_sizes[d] for d in (dimids[1:] if is_rec else dimids))
        # exact bigint product: a corrupt dim list must not overflow
        # int64 into a negative count (np.frombuffer(count=-1) would
        # silently read the whole buffer as data)
        count = math.prod(fixed_shape) if fixed_shape else 1
        dt = _DTYPES[nc_type]
        if is_rec:
            slabs = [
                np.frombuffer(content, dtype=dt, count=count, offset=begin + r * recsize)
                for r in range(numrecs)
            ]
            data = (
                np.stack(slabs).reshape((numrecs, *fixed_shape))
                if slabs
                else np.empty((0, *fixed_shape), dtype=dt)
            )
            shape = (numrecs, *fixed_shape)
        else:
            data = np.frombuffer(content, dtype=dt, count=count, offset=begin).reshape(fixed_shape)
            shape = fixed_shape
        if nc_type == NC_CHAR:
            data = data.view("S1")
        out.variables[nm] = Nc3Var(nm, dims, shape, attrs, nc_type, data)
    return out


# ---------------------------------------------------------------------------
# writer (fixtures/tests + .nc export sink)
# ---------------------------------------------------------------------------


def _nc_type_of(arr: np.ndarray, version: int = 1) -> int:
    k = arr.dtype.kind, arr.dtype.itemsize
    if version == 5:
        table = {
            ("i", 1): NC_BYTE,
            ("S", 1): NC_CHAR,
            ("i", 2): NC_SHORT,
            ("i", 4): NC_INT,
            ("i", 8): NC_INT64,
            ("u", 1): NC_UBYTE,
            ("u", 2): NC_USHORT,
            ("u", 4): NC_UINT,
            ("u", 8): NC_UINT64,
            ("f", 4): NC_FLOAT,
            ("f", 8): NC_DOUBLE,
        }
    else:
        table = {
            ("i", 1): NC_BYTE,
            ("S", 1): NC_CHAR,
            ("i", 2): NC_SHORT,
            ("i", 4): NC_INT,
            ("i", 8): NC_INT,  # narrowed; CDF-1/2 have no 64-bit int
            ("f", 4): NC_FLOAT,
            ("f", 8): NC_DOUBLE,
        }
    if k not in table:
        raise ValueError(f"unsupported dtype {arr.dtype} for classic NetCDF version {version}")
    return table[k]


def _nn_fmt(version: int) -> str:
    return ">Q" if version == 5 else ">I"


def _enc_name(s: str, version: int = 1) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(_nn_fmt(version), len(b)) + b + b"\x00" * (_pad4(len(b)) - len(b))


def _enc_att_value(v: Any, version: int = 1) -> tuple[int, int, bytes]:
    if isinstance(v, str):
        b = v.encode("utf-8")
        return NC_CHAR, len(b), b + b"\x00" * (_pad4(len(b)) - len(b))
    arr = np.atleast_1d(np.asarray(v))
    t = _nc_type_of(arr, version)
    arr = arr.astype(_DTYPES[t])
    raw = arr.tobytes()
    return t, arr.size, raw + b"\x00" * (_pad4(len(raw)) - len(raw))


def _enc_att_list(attrs: dict[str, Any], version: int = 1) -> bytes:
    nn = _nn_fmt(version)
    if not attrs:
        return struct.pack(">I", 0) + struct.pack(nn, 0)
    out = [struct.pack(">I", _TAG_ATT) + struct.pack(nn, len(attrs))]
    for nm, v in attrs.items():
        t, ne, raw = _enc_att_value(v, version)
        out.append(_enc_name(nm, version) + struct.pack(">I", t) + struct.pack(nn, ne) + raw)
    return b"".join(out)


def write_netcdf3(
    dimensions: dict[str, int | None],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict[str, Any]]],
    global_attrs: dict[str, Any] | None = None,
    version: int = 1,
) -> bytes:
    """Serialize arrays to classic bytes: CDF-1 (default), CDF-2
    (64-bit offsets), or CDF-5 (64-bit data + unsigned/64-bit types).

    ``dimensions``: name -> length (None = the record dimension).
    ``variables``: name -> (dim names, array, attributes); arrays whose
    first dim is the record dim provide the record count.
    """
    if version not in (1, 2, 5):
        raise ValueError(f"version must be 1, 2, or 5, got {version}")
    nn = _nn_fmt(version)
    begin_fmt = ">Q" if version in (2, 5) else ">I"
    dim_names = list(dimensions)
    rec_name = next((k for k, v in dimensions.items() if v is None), None)

    # normalize arrays + compute vsize
    metas = []  # (name, dimids, attrs, nc_type, vsize, is_rec, arr)
    numrecs = 0
    for nm, (dims, arr, attrs) in variables.items():
        arr = np.asarray(arr)
        t = _nc_type_of(arr, version)
        arr = arr.astype(_DTYPES[t]) if t != NC_CHAR else arr.view("S1")
        dimids = [dim_names.index(d) for d in dims]
        is_rec = bool(dims) and dims[0] == rec_name
        if is_rec:
            numrecs = max(numrecs, arr.shape[0])
        per_slab = arr.dtype.itemsize
        for d in dims[1:] if is_rec else dims:
            per_slab *= dimensions[d]  # type: ignore[operator]
        metas.append((nm, dimids, attrs, t, _pad4(per_slab), is_rec, arr))

    rec_metas = [m for m in metas if m[5]]
    if len(rec_metas) == 1 and rec_metas[0][6].dtype.itemsize < 4:
        # spec special case: single byte/char/short record var → no pad
        only = rec_metas[0][6]
        recsize = only.dtype.itemsize * int(np.prod(only.shape[1:], dtype=np.int64))
    else:
        recsize = sum(m[4] for m in rec_metas)

    # header (two passes: sizes depend only on metadata, not begins)
    def header(begins: dict[str, int]) -> bytes:
        h = [b"CDF" + bytes([version]), struct.pack(nn, numrecs)]
        if dimensions:
            h.append(struct.pack(">I", _TAG_DIM) + struct.pack(nn, len(dimensions)))
            for d in dim_names:
                h.append(_enc_name(d, version) + struct.pack(nn, dimensions[d] or 0))
        else:
            h.append(struct.pack(">I", 0) + struct.pack(nn, 0))
        h.append(_enc_att_list(global_attrs or {}, version))
        if metas:
            h.append(struct.pack(">I", _TAG_VAR) + struct.pack(nn, len(metas)))
            for nm, dimids, attrs, t, vsize, _ir, _a in metas:
                h.append(
                    _enc_name(nm, version)
                    + struct.pack(nn, len(dimids))
                    + b"".join(struct.pack(">I", d) for d in dimids)
                    + _enc_att_list(attrs, version)
                    + struct.pack(">I", t)
                    + struct.pack(nn, vsize)
                    + struct.pack(begin_fmt, begins.get(nm, 0))
                )
        else:
            h.append(struct.pack(">I", 0) + struct.pack(nn, 0))
        return b"".join(h)

    hlen = len(header({}))
    begins: dict[str, int] = {}
    off = hlen
    for nm, _d, _a, _t, vsize, is_rec, _arr in metas:  # fixed vars first
        if not is_rec:
            begins[nm] = off
            off += vsize
    rec_start = off
    for nm, _d, _a, _t, vsize, is_rec, _arr in metas:
        if is_rec:
            begins[nm] = off
            off += vsize if len(rec_metas) > 1 else recsize

    body = bytearray(rec_start - hlen)
    for nm, _d, _a, _t, vsize, is_rec, arr in metas:
        if not is_rec:
            raw = arr.tobytes()
            s = begins[nm] - hlen
            body[s : s + len(raw)] = raw
    rec_body = bytearray(recsize * numrecs)
    for nm, _d, _a, _t, vsize, is_rec, arr in metas:
        if is_rec:
            for r in range(arr.shape[0]):
                # slice, don't index: arr[r] on a 1-D var yields a numpy
                # SCALAR, which silently converts to native byte order
                raw = arr[r : r + 1].tobytes()
                s = r * recsize + (begins[nm] - rec_start)
                rec_body[s : s + len(raw)] = raw
    return header(begins) + bytes(body) + bytes(rec_body)
