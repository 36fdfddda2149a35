"""Property tests over the vendored NetCDF format stack (SURVEY §5.5):
randomized shapes, dtypes, chunkings, filters, and format variants all
round-trip bit-exactly through the pure-numpy writers/readers
(sources/netcdf3.py CDF-1/2/5; sources/hdf5.py earliest/latest libver,
v1-B-tree and v4 chunk indexes). Hypothesis shrinks any failure to a
minimal cube, which is far better debugging signal than the fixed-seed
loops in the per-format test files.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from netcdf_olap_spark.sources.hdf5 import read_hdf5, write_hdf5
from netcdf_olap_spark.sources.netcdf3 import read_netcdf3, write_netcdf3

_COMMON = dict(deadline=None, suppress_health_check=[HealthCheck.too_slow])

shape3 = st.tuples(st.integers(1, 5), st.integers(1, 5), st.integers(1, 5))
float_dtype = st.sampled_from(["<f4", "<f8"])
int_dtype = st.sampled_from(["<i2", "<i4", "<i8"])


def _arr(draw, shape, dtype):
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    if np.dtype(dtype).kind == "f":
        return rng.normal(0, 1000, shape).astype(dtype)
    return rng.integers(-30000, 30000, shape).astype(dtype)


@settings(max_examples=25, **_COMMON)
@given(data=st.data(), shape=shape3, version=st.sampled_from([1, 2, 5]))
def test_netcdf3_roundtrip_property(data, shape, version):
    nt, ny, nx = shape
    dtype = data.draw(float_dtype if version != 5 else st.one_of(float_dtype, int_dtype))
    cube = _arr(data.draw, shape, dtype)
    b = write_netcdf3(
        dimensions={"t": None, "y": ny, "x": nx},
        variables={
            "t": (("t",), np.arange(nt, dtype=np.int32), {}),
            "v": (("t", "y", "x"), cube, {"_FillValue": -1.0}),
        },
        global_attrs={"k": "prop"},
        version=version,
    )
    f = read_netcdf3(b)
    got = f.variables["v"].data
    np.testing.assert_array_equal(got.astype(cube.dtype), cube)
    assert f.variables["v"].shape == shape
    assert f.attributes == {"k": "prop"}


@settings(max_examples=25, **_COMMON)
@given(
    data=st.data(),
    shape=shape3,
    libver=st.sampled_from(["earliest", "latest"]),
    chunked=st.booleans(),
    gzip=st.one_of(st.none(), st.integers(1, 9)),
    shuffle=st.booleans(),
)
def test_hdf5_roundtrip_property(data, shape, libver, chunked, gzip, shuffle):
    dtype = data.draw(st.one_of(float_dtype, int_dtype))
    cube = _arr(data.draw, shape, dtype)
    kw = {}
    if chunked:
        kw["chunks"] = {"v": tuple(data.draw(st.integers(1, s + 1)) for s in shape)}
        kw["gzip"] = gzip
        kw["shuffle"] = shuffle
    f = read_hdf5(write_hdf5({"v": (cube, {"a": 1})}, libver=libver, **kw))
    np.testing.assert_array_equal(f.variables["v"].data, cube)
    assert f.variables["v"].dtype == np.dtype(dtype)
    assert f.variables["v"].attributes == {"a": 1}


@settings(max_examples=15, **_COMMON)
@given(
    data=st.data(),
    shape=shape3,
    index=st.sampled_from(["implicit", "fixed_array"]),
    gzip=st.one_of(st.none(), st.integers(1, 9)),
)
def test_hdf5_v4_index_roundtrip_property(data, shape, index, gzip):
    if index == "implicit":
        gzip = None  # implicit requires unfiltered chunks
    dtype = data.draw(float_dtype)
    cube = _arr(data.draw, shape, dtype)
    chunks = {"v": tuple(data.draw(st.integers(1, s + 1)) for s in shape)}
    f = read_hdf5(
        write_hdf5({"v": (cube, {})}, chunks=chunks, gzip=gzip, chunk_index=index)
    )
    np.testing.assert_array_equal(f.variables["v"].data, cube)


@settings(max_examples=15, **_COMMON)
@given(data=st.data(), shape=shape3)
def test_cross_format_same_cube(data, shape):
    """The SAME cube through all three containers (CDF-1, CDF-5, HDF5)
    reads back identically — format choice never changes values."""
    cube = _arr(data.draw, shape, "<f8")
    nt, ny, nx = shape
    via_nc3 = read_netcdf3(
        write_netcdf3(
            {"t": None, "y": ny, "x": nx},
            {"v": (("t", "y", "x"), cube, {})},
        )
    ).variables["v"].data
    via_cdf5 = read_netcdf3(
        write_netcdf3(
            {"t": None, "y": ny, "x": nx},
            {"v": (("t", "y", "x"), cube, {})},
            version=5,
        )
    ).variables["v"].data
    via_h5 = read_hdf5(write_hdf5({"v": (cube, {})})).variables["v"].data
    np.testing.assert_array_equal(via_nc3, cube)
    np.testing.assert_array_equal(via_cdf5, cube)
    np.testing.assert_array_equal(via_h5, cube)


# ---------------------------------------------------------------------------
# v2 B-tree planner/walker and fractal heap (round 7) — property tests
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=900),
    node_size=st.sampled_from([128, 256, 512, 2048]),
    rec_size=st.sampled_from([11, 17, 32]),
)
def test_btree2_plan_emit_walk_roundtrip(n, node_size, rec_size):
    """For arbitrary record counts and node geometries: the writer's
    plan distributes exactly n records, the emitted nodes parse back
    through the reader's generic walker, and records come back in
    the exact order they were inserted (in-order traversal on both
    sides). Exercises depths 0-3 and both pointer encodings (with and
    without the cumulative-count field)."""
    import struct as _struct

    from netcdf_olap_spark.sources.hdf5 import (
        _b2_emit,
        _b2_header,
        _b2_node_sizes,
        _b2_plan,
        _b2_totals,
        _Reader,
    )

    try:
        depth, plan, mns, _cum, cum_sz = _b2_plan(n, node_size, rec_size)
    except ValueError:
        return  # capacity exceeded for this geometry — legal reject
    assert _b2_totals(plan) == n

    # lay the nodes into a buffer at arbitrary (8-aligned) addresses
    sizes = _b2_node_sizes(plan, depth, rec_size, mns, cum_sz)
    addr = {}
    cursor = 64
    for path, _lv, sz in sizes:
        addr[path] = cursor
        cursor += (sz + 7) & ~7
    records = [i.to_bytes(8, "little") + bytes(rec_size - 8) for i in range(n)]
    buf = bytearray(cursor + 48)
    hdr_addr = cursor
    buf[hdr_addr : hdr_addr + 38] = _b2_header(10, node_size, rec_size, depth, addr[""], plan[0], n)
    for a, bts in _b2_emit(plan, depth, records, 10, mns, cum_sz, lambda p: addr[p]):
        buf[a : a + len(bts)] = bts

    r = _Reader.__new__(_Reader)
    r.buf = bytes(buf)
    btype, got_rec_size, recs = r._btree2_records(hdr_addr, expect={10})
    assert btype == 10 and got_rec_size == rec_size
    got = [int.from_bytes(r.buf[e : e + 8], "little") for e in recs]
    assert got == list(range(n))


@settings(max_examples=40, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=60),
)
def test_fractal_heap_layout_resolves_every_object(sizes):
    """_fh_layout → FRHP/FHDB bytes → _fractal_heap: every heap ID
    resolves to exactly its object's bytes for arbitrary object-size
    mixes (or the layout legally rejects an over-capacity heap)."""
    from netcdf_olap_spark.sources.hdf5 import (
        _FH_DBLK_HDR,
        _fh_direct_block,
        _fh_header,
        _fh_layout,
        _Reader,
    )

    try:
        offs, ids, block = _fh_layout(sizes)
    except ValueError:
        assert sum(sizes) + _FH_DBLK_HDR > 65536  # only the capacity reject
        return
    objects = [bytes([i % 251]) * sz for i, sz in enumerate(sizes)]
    fh_addr = 64
    db_addr = fh_addr + 152  # 146 rounded up
    used = _FH_DBLK_HDR + sum(sizes)
    buf = bytearray(db_addr + block)
    buf[fh_addr : fh_addr + 146] = _fh_header(len(objects), used, block, db_addr, hid_len=8)
    db = _fh_direct_block(fh_addr, objects, block)
    buf[db_addr : db_addr + len(db)] = db

    r = _Reader.__new__(_Reader)
    r.buf = bytes(buf)
    resolve = r._fractal_heap(fh_addr)
    for i, hid in enumerate(ids):
        pos, ln = resolve(hid)
        assert ln == sizes[i]
        assert r.buf[pos : pos + ln] == objects[i]


# ---------------------------------------------------------------------------
# round-7 structures: dynamic chunk indexes, paging, dense storage, compounds
# ---------------------------------------------------------------------------


@settings(max_examples=20, **_COMMON)
@given(
    data=st.data(),
    shape=st.tuples(st.integers(1, 10), st.integers(1, 6), st.integers(1, 6)),
    index=st.sampled_from(["extensible_array", "btree_v2"]),
    gzip=st.one_of(st.none(), st.integers(1, 9)),
    shuffle=st.booleans(),
)
def test_hdf5_dynamic_index_roundtrip_property(data, shape, index, gzip, shuffle):
    """The two DYNAMIC chunk indexes (extensible array with random
    super-block-spilling geometry, v2 B-trees with random node sizes
    → random depth) round-trip arbitrary cubes bit-exactly, filtered
    or not. Geometry that the writer legally refuses (paged EA
    index-block-direct blocks) is a clean reject, never bad bytes."""
    dtype = data.draw(float_dtype)
    cube = _arr(data.draw, shape, dtype)
    chunks = {"v": tuple(data.draw(st.integers(1, s)) for s in shape)}
    kw: dict = {"chunks": chunks, "gzip": gzip, "shuffle": shuffle, "chunk_index": index}
    if index == "extensible_array":
        kw["ea_params"] = data.draw(
            st.sampled_from([(32, 4, 4, 16, 10), (32, 2, 2, 2, 10), (32, 2, 2, 2, 2), (32, 2, 2, 4, 2)])
        )
    else:
        kw["bt2_node_size"] = data.draw(st.sampled_from([256, 512, 2048]))
    try:
        b = write_hdf5({"v": (cube, {"a": 1})}, **kw)
    except ValueError as e:
        assert "index-block-direct" in str(e)
        return
    f = read_hdf5(b)
    np.testing.assert_array_equal(f.variables["v"].data, cube)
    assert f.variables["v"].attributes == {"a": 1}


@settings(max_examples=20, **_COMMON)
@given(
    data=st.data(),
    n_vars=st.integers(1, 4),
    n_attrs=st.integers(1, 20),
    dense_groups=st.booleans(),
)
def test_hdf5_dense_storage_roundtrip_property(data, n_vars, n_attrs, dense_groups):
    """Dense (fractal-heap + v2-B-tree name index) attribute and group
    storage round-trips arbitrary attribute sets — names of mixed
    lengths, str/int/float values — and arbitrary variable counts."""
    variables = {}
    want_attrs = {}
    for vi in range(n_vars):
        shape = data.draw(st.tuples(st.integers(1, 4), st.integers(1, 4)))
        arr = _arr(data.draw, shape, "<f8")
        attrs = {}
        for ai in range(n_attrs):
            name = f"a{'x' * data.draw(st.integers(0, 15))}{ai}"
            attrs[name] = data.draw(
                st.one_of(
                    st.integers(-(2**31), 2**31 - 1),
                    st.floats(allow_nan=False, allow_infinity=False, width=32),
                    st.text(alphabet="abcdef ", min_size=0, max_size=12),
                )
            )
        variables[f"v{vi}"] = (arr, attrs)
        want_attrs[f"v{vi}"] = attrs
    f = read_hdf5(
        write_hdf5(variables, libver="latest", dense_attrs=True, dense_groups=dense_groups)
    )
    assert sorted(f.variables) == sorted(variables)
    for nm, (arr, _) in variables.items():
        np.testing.assert_array_equal(f.variables[nm].data, arr)
        got = {k: v for k, v in f.variables[nm].attributes.items()}
        for k, v in want_attrs[nm].items():
            if isinstance(v, float):
                assert got[k] == np.float64(np.float32(v)) or got[k] == v
            else:
                assert got[k] == v


@settings(max_examples=15, **_COMMON)
@given(
    data=st.data(),
    fa_page_bits=st.integers(1, 3),
    gzip=st.one_of(st.none(), st.integers(1, 9)),
)
def test_hdf5_paged_fixed_array_roundtrip_property(data, fa_page_bits, gzip):
    """Fixed-array indexes with tiny page sizes (2^1..2^3 elements)
    force PAGED data blocks at random chunk counts — bitmap bytes,
    per-page checksums, and partially-filled last pages all land in
    the read path."""
    shape = data.draw(st.tuples(st.integers(2, 12), st.integers(1, 6), st.integers(1, 6)))
    cube = _arr(data.draw, shape, "<f8")
    chunks = {"v": tuple(data.draw(st.integers(1, max(1, s // 2))) for s in shape)}
    f = read_hdf5(
        write_hdf5(
            {"v": (cube, {})},
            chunks=chunks,
            gzip=gzip,
            chunk_index="fixed_array",
            fa_page_bits=fa_page_bits,
        )
    )
    np.testing.assert_array_equal(f.variables["v"].data, cube)


@settings(max_examples=15, **_COMMON)
@given(
    data=st.data(),
    n_fields=st.integers(1, 5),
    chunked=st.booleans(),
    gzip=st.one_of(st.none(), st.integers(1, 9)),
)
def test_hdf5_compound_roundtrip_property(data, n_fields, chunked, gzip):
    """Compound DATA variables with arbitrary member dtypes (aligned
    offsets, padding holes included) round-trip as structured arrays
    through contiguous and chunked+filtered layouts."""
    member = st.sampled_from(["<f8", "<f4", "<i4", "<i2", "u1"])
    mshape = st.sampled_from([(), (2,), (3,), (2, 2)])
    rec = np.dtype(
        [(f"m{i}", data.draw(member), data.draw(mshape)) for i in range(n_fields)], align=True
    )
    shape = data.draw(st.tuples(st.integers(1, 6), st.integers(1, 4)))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    arr = np.zeros(shape, dtype=rec)
    for nm in rec.names:
        k = arr[nm].dtype.kind
        fshape = arr[nm].shape  # includes any member sub-array dims
        if k == "f":
            arr[nm] = rng.normal(0, 100, fshape).astype(arr[nm].dtype)
        else:
            info = np.iinfo(arr[nm].dtype)
            arr[nm] = rng.integers(info.min, info.max, fshape, dtype=arr[nm].dtype)
    kw = {}
    if chunked:
        kw = {"chunks": {"v": tuple(data.draw(st.integers(1, s)) for s in shape)}, "gzip": gzip}
    f = read_hdf5(write_hdf5({"v": (arr, {"long_name": "rec"})}, **kw))
    got = f.variables["v"].data
    assert got.dtype.names == rec.names
    for nm in rec.names:
        np.testing.assert_array_equal(got[nm], arr[nm])


@settings(max_examples=20, **_COMMON)
@given(
    data=st.data(),
    version=st.sampled_from([1, 2, 5]),
    n_vars=st.integers(1, 5),
    nrec=st.integers(0, 5),
)
def test_netcdf3_multi_record_var_roundtrip_property(data, version, n_vars, nrec):
    """Several record variables interleave per-record slabs in the
    record section (the trickiest classic-format layout, including the
    single-small-record-var no-pad special case); random mixes of
    fixed and record variables round-trip across CDF-1/2/5."""
    dims = {"rec": None, "y": data.draw(st.integers(1, 5)), "x": data.draw(st.integers(1, 5))}
    dtypes = ["<f4", "<f8", "<i4", "<i2", "i1"] + (["<i8", "<u4", "<u2", "u1"] if version == 5 else [])
    variables = {}
    for vi in range(n_vars):
        dtype = data.draw(st.sampled_from(dtypes))
        isrec = data.draw(st.booleans())
        dnames = ("rec", "y", "x") if isrec else ("y", "x")
        shape = (nrec, dims["y"], dims["x"]) if isrec else (dims["y"], dims["x"])
        variables[f"v{vi}"] = (dnames, _arr(data.draw, shape, dtype), {"n": vi})
    f = read_netcdf3(write_netcdf3(dims, variables, {"g": "x"}, version=version))
    for nm, (dn, arr, _) in variables.items():
        got = f.variables[nm].data
        if dn[0] == "rec":
            got = got[:nrec]  # another record var may have more records
        np.testing.assert_array_equal(got, arr)


# ---------------------------------------------------------------------------
# corruption robustness: a bad file must raise cleanly, never crash
# ---------------------------------------------------------------------------


def _corruptions(good: bytes, n: int, seed: int):
    import random

    rng = random.Random(seed)
    for i in range(n):
        b = bytearray(good)
        mode = i % 3
        if mode == 0:
            b = b[: rng.randrange(1, len(b))]
        elif mode == 1:
            for _ in range(rng.randrange(1, 10)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            b = b[: rng.randrange(16, len(b))]
            if b:
                b[rng.randrange(len(b))] = rng.randrange(256)
        yield bytes(b)


def test_hdf5_corrupt_bytes_raise_cleanly():
    """Truncations and random byte flips of a valid file must surface
    as ordinary exceptions — a 4000-case seeded external sweep found a
    SEGFAULT here (corrupt string-datatype size wrapping numpy's int32
    itemsize negative); this bounded twin keeps the guards honest."""
    t = np.arange(4, dtype="<i4")
    cube = np.random.default_rng(0).normal(0, 1, (4, 3, 2))
    good = write_hdf5(
        {"m": (cube, {"a": 1}), "time": (t, {})}, chunks={"m": (2, 2, 2)}, gzip=4
    )
    for b in _corruptions(good, 400, seed=42):
        try:
            read_hdf5(b)
        except Exception:
            pass  # any ordinary exception is fine; crashes are not


def test_hdf5_corrupt_string_size_is_clean_error():
    """The exact crash class: attribute string datatype whose size
    field wraps numpy's int32 itemsize negative — must raise, with the
    bounds check rejecting it before any buffer access."""
    import struct as _s

    from netcdf_olap_spark.sources.hdf5 import _DT, CLS_STRING, _Reader

    with pytest.raises(ValueError, match="implausible string"):
        _DT(CLS_STRING, 2181038120, True, False).numpy()
    r = _Reader.__new__(_Reader)
    r.buf = bytes(64)
    with pytest.raises(ValueError, match="out of file bounds"):
        r._attr_values(_DT(CLS_STRING, 4096, True, False), (), 0)


def test_netcdf3_corrupt_bytes_raise_cleanly():
    t = np.arange(4, dtype="<i4")
    cube = np.random.default_rng(0).normal(0, 1, (4, 3, 2))
    good = write_netcdf3(
        {"time": None, "y": 3, "x": 2},
        {"time": (("time",), t, {}), "m": (("time", "y", "x"), cube, {"_FillValue": -1.0})},
    )
    for b in _corruptions(good, 400, seed=7):
        try:
            read_netcdf3(b)
        except Exception:
            pass
