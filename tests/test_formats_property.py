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
