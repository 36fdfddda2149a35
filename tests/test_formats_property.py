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
